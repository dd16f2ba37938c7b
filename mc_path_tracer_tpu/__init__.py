"""mc_path_tracer_tpu — a TPU-native differentiable wavefront Monte Carlo path tracer.

A from-scratch JAX/Pallas framework with the capabilities of the CUDA/OpenGL
renderer JakeKurtz/MC-Path-Tracer (see SURVEY.md): wavefront path tracing with
multiple importance sampling, Cook-Torrance GGX + Lambertian BRDFs,
CDF-importance-sampled HDR environment lights, BVH-accelerated ray traversal,
thin-lens cameras, progressive tiled film accumulation and glTF/GLB scene
loading — extended with end-to-end differentiability (path-replay style
gradients w.r.t. material parameters, light radiance and environment texels)
and multi-chip execution via jax.sharding.

Layout:
  ops/       numerics: math conventions, samplers, BRDFs, intersection, BVH,
             environment CDFs, tone mapping, Pallas kernels.
  models/    scene-level objects: cameras, films, lights, materials, scenes,
             the wavefront integrator, preview renderer, procedural geometry.
  parallel/  device-mesh sharding of tiles/wavefronts and gradient reductions.
  utils/     IO (GLB/HDR/PNG), native-library bindings, profiling.
"""

__version__ = "0.1.0"

_LAZY = {
    "PerspectiveCamera": ("mc_path_tracer_tpu.models.camera", "PerspectiveCamera"),
    "Film": ("mc_path_tracer_tpu.models.film", "Film"),
    "Scene": ("mc_path_tracer_tpu.models.scene", "Scene"),
    "render": ("mc_path_tracer_tpu.models.integrator", "render"),
    "render_progressive": ("mc_path_tracer_tpu.models.integrator", "render_progressive"),
}

__all__ = [*_LAZY, "__version__"]


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
