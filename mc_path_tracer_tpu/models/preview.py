"""Preview renderer: the rasterizer-equivalent fast path.

The reference pairs its path tracer with an OpenGL deferred-PBR rasterizer
used as an interactive preview (Rasterizer.{h,cpp}: G-buffer geometry pass ->
PBR lighting pass + IBL -> background; debug views of each G-buffer
attachment, Rasterizer.cpp:93-124).  A TPU framework has no GL pipeline —
the TPU-native equivalent is a single-bounce deterministic ray cast over the
same scene arrays: one primary closest-hit per pixel plus an analytic
direct-light + ambient shade.  It serves the same product role (fast preview
sharing the scene with the path tracer) at interactive cost: exactly one
traversal per pixel, no sampling noise.

Output types mirror the G-buffer debug menu (RenderWindow render-mode /
Rasterizer debug views): "shaded", "position", "normal", "albedo",
"metallic_roughness", "emissive", "depth".
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mc_path_tracer_tpu.models import camera as camera_mod
from mc_path_tracer_tpu.models import lights as lights_mod
from mc_path_tracer_tpu.models.film import Film
from mc_path_tracer_tpu.models.scene import SceneData
from mc_path_tracer_tpu.ops import brdf, envmap
from mc_path_tracer_tpu.ops.intersect import intersect_bvh
from mc_path_tracer_tpu.ops.wide_bvh import intersect_wide

PREVIEW_MODES = (
    "shaded",
    "position",
    "normal",
    "albedo",
    "metallic_roughness",
    "emissive",
    "depth",
)


def _ambient_irradiance(lights: lights_mod.LightSet) -> jnp.ndarray:
    """Flat ambient standing in for the rasterizer's IBL irradiance cubemap
    (EnvironmentLight.cu irradiance convolution): the cosine-hemisphere
    integral of a constant-radiance env is pi * L_avg; we use the env's mean
    radiance as L_avg."""
    if lights_mod.env_is_hdri(lights.env):
        return jnp.mean(lights.env.tex, axis=(0, 1))
    return lights.env.color * lights.env.ls


@partial(jax.jit, static_argnames=("width", "height", "mode"))
def _preview(scene: SceneData, cam, width: int, height: int, mode: str):
    ys, xs = jnp.mgrid[0:height, 0:width]
    px = xs.reshape(-1).astype(jnp.float32)
    py = ys.reshape(-1).astype(jnp.float32)
    ro, rd = camera_mod.gen_camera_rays(
        cam, width, height, px, py, jnp.zeros((px.shape[0], 2))
    )
    if scene.wide is not None:
        hit = intersect_wide(scene.wide, scene.tris, ro, rd)
    else:
        hit = intersect_bvh(scene.bvh, scene.tris, ro, rd)
    mat = scene.materials.gather(hit.material_id, hit.uv, scene.atlas)
    hmask = hit.hit[..., None]

    if mode == "position":
        out = jnp.where(hmask, hit.position, 0.0)
    elif mode == "normal":
        out = jnp.where(hmask, hit.normal * 0.5 + 0.5, 0.0)
    elif mode == "albedo":
        out = jnp.where(hmask, mat.albedo, 0.0)
    elif mode == "metallic_roughness":
        mra = jnp.stack(
            [mat.metallic, mat.roughness, jnp.ones_like(mat.metallic)], axis=-1
        )
        out = jnp.where(hmask, mra, 0.0)
    elif mode == "emissive":
        out = jnp.where(hmask, scene.materials.emission(hit.material_id, hit.uv, scene.atlas), 0.0)
    elif mode == "depth":
        d = jnp.where(hit.hit, hit.t, 0.0)
        dmax = jnp.maximum(jnp.max(d), 1e-6)
        out = jnp.broadcast_to((d / dmax)[..., None], d.shape + (3,))
    else:  # shaded
        wo = -rd
        n = hit.normal
        lights = scene.lights
        direct = jnp.zeros_like(ro)
        nd = lights.directional.direction.shape[0]
        for i in range(nd):  # lightingPass 32-light loop equivalent
            wl = jnp.broadcast_to(lights.directional.direction[i], n.shape)
            li = lights.directional.color[i] * lights.directional.ls[i]
            f = brdf.mixture_f(mat, n, wl, wo)
            direct = direct + f * li
        ambient = _ambient_irradiance(lights) * mat.albedo * (
            1.0 - mat.metallic[..., None]
        )
        bg = (
            envmap.radiance(lights.env.tex, rd)
            if lights_mod.env_is_hdri(lights.env)
            else jnp.broadcast_to(lights.env.color * lights.env.ls, rd.shape)
        )
        emissive = scene.materials.emission(hit.material_id, hit.uv, scene.atlas)
        out = jnp.where(hmask, direct + ambient + emissive, bg)

    return out.reshape(height, width, 3)


def render_preview(
    scene, camera, width: int, height: int, mode: str = "shaded"
) -> Film:
    """Rasterizer::draw_scene equivalent: deterministic single-pass preview."""
    if mode not in PREVIEW_MODES:
        raise ValueError(f"mode {mode!r} not in {PREVIEW_MODES}")
    scene_data = scene.build() if hasattr(scene, "build") else scene
    from mc_path_tracer_tpu.models.integrator import _camera_params

    cam = _camera_params(camera, width, height)
    img = _preview(scene_data, cam, width, height, mode)
    return Film(ld=img, samples=jnp.ones((height, width), jnp.float32))
