"""Sharded rendering and differentiable train steps over a device mesh.

TPU-native scaling design (SURVEY.md §2h / §7 step 9): the film's pixel rows
are the data-parallel axis — each device path-traces its own row block
against a replicated scene/BVH.  Shardings are annotated with
jax.sharding.NamedSharding and XLA inserts the collectives: the forward pass
needs none (rows are independent); the backward pass all-reduces parameter
gradients (materials / light radiance / env texels) over ICI, overlapped
with the per-row adjoint sweeps by the XLA scheduler.

`render_sharded` is the multi-chip PathTracer::render_image;
`make_train_step` builds the inverse-rendering step used by
__graft_entry__.dryrun_multichip and the scaling benchmarks.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mc_path_tracer_tpu.models import camera as camera_mod
from mc_path_tracer_tpu.models.integrator import RenderConfig, render_tile_radiance
from mc_path_tracer_tpu.parallel.mesh import TILE_AXIS, make_mesh


def _pixel_grid(width: int, height: int):
    ys, xs = jnp.mgrid[0:height, 0:width]
    return (
        xs.reshape(-1).astype(jnp.float32),
        ys.reshape(-1).astype(jnp.float32),
    )


@functools.lru_cache(maxsize=32)
def _render_rows_fn(mesh, cfg, width, height, spp):
    """Jitted shard_map renderer for `mesh`: every device runs its own
    *local* render program over its pixel rows — local traversal while-loops,
    local straggler rescue, zero collectives in the forward pass.  (Plain
    sharding propagation would make every traversal while-iteration's
    cross-lane `any` a cross-device all-reduce — measured to scale
    *negatively*.)  Noise is pixel-keyed (rng.pixel_uniforms), so the result
    is bit-identical to the single-device render."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    def local(scene, cam, px, py, key):
        return render_tile_radiance(
            scene, cam, width, height, px, py, key, cfg, spp
        )

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(), P(TILE_AXIS), P(TILE_AXIS), P()),
            out_specs=P(TILE_AXIS),
            check_rep=False,
        )
    )


def render_sharded(
    scene_data,
    camera,
    width: int,
    height: int,
    cfg: RenderConfig = RenderConfig(),
    key=None,
    mesh=None,
):
    """Full-frame render with pixel rows sharded across the mesh.

    Returns accumulated radiance [H, W, 3] (divide by cfg.spp for the mean).
    Height must be divisible by the mesh size (pad the film otherwise).
    """
    if mesh is None:
        mesh = make_mesh()
    if key is None:
        key = jax.random.PRNGKey(0)
    n_dev = mesh.devices.size
    if height % n_dev != 0:
        raise ValueError(f"height {height} not divisible by mesh size {n_dev}")
    cam = camera if isinstance(camera, camera_mod.CameraParams) else camera.params()

    px, py = _pixel_grid(width, height)
    shard = NamedSharding(mesh, P(TILE_AXIS))
    repl = NamedSharding(mesh, P())
    px = jax.device_put(px, shard)
    py = jax.device_put(py, shard)
    scene_r = jax.device_put(scene_data, repl)
    cam_r = jax.device_put(cam, repl)
    fn = _render_rows_fn(mesh, cfg, width, height, cfg.spp)
    acc = fn(scene_r, cam_r, px, py, key)
    return acc.reshape(height, width, 3)


def _make_global(arr, sharding):
    """Build a (possibly multi-process) global jax.Array from host-replicated
    numpy data: every process holds the full array and contributes its
    addressable shards (jax.device_put cannot target non-addressable
    devices, so multi-host paths must assemble arrays this way)."""
    import numpy as _np

    a = _np.asarray(arr)
    return jax.make_array_from_callback(a.shape, sharding, lambda idx: a[idx])


def render_sharded_global(
    scene_data, camera, width, height, cfg=RenderConfig(), key=None, mesh=None
):
    """Multi-host render_sharded: identical math, but inputs are assembled
    as global arrays so the mesh may span processes (DCN).  Each process
    computes its addressable pixel rows; the returned global array's
    addressable shards are this process's rows.

    Works single-process too (then it is equivalent to render_sharded)."""
    from mc_path_tracer_tpu.parallel.mesh import make_mesh

    if mesh is None:
        mesh = make_mesh()
    if key is None:
        key = jax.random.PRNGKey(0)
    n_dev = mesh.devices.size
    if height % n_dev != 0:
        raise ValueError(f"height {height} not divisible by mesh size {n_dev}")
    cam = camera if isinstance(camera, camera_mod.CameraParams) else camera.params()

    px, py = _pixel_grid(width, height)
    shard = NamedSharding(mesh, P(TILE_AXIS))
    repl = NamedSharding(mesh, P())
    px = _make_global(px, shard)
    py = _make_global(py, shard)
    scene_r = jax.tree.map(lambda a: _make_global(a, repl), scene_data)
    cam_r = jax.tree.map(lambda a: _make_global(a, repl), cam)
    key_r = _make_global(key, repl)
    fn = _render_rows_fn(mesh, cfg, width, height, cfg.spp)
    return fn(scene_r, cam_r, px, py, key_r)


class MaterialGrads(NamedTuple):
    """The differentiable (float) slice of MaterialTable — texture-id bindings
    are int32 and held constant by differentiation."""

    albedo: jnp.ndarray
    roughness: jnp.ndarray
    metallic: jnp.ndarray
    fresnel: jnp.ndarray
    emissive: jnp.ndarray


def make_train_step(
    cfg: RenderConfig, width: int, height: int, spp: int, mesh=None
):
    """Inverse-rendering step: L2 loss of the rendered image against a target,
    differentiated w.r.t. (material table, directional ls, env texture).

    Returns a jitted fn(scene_data, cam, px, py, target_rows, key) ->
    (loss, grads) where grads is a pytree matching
    (MaterialGrads, directional.ls, env.tex).  With `mesh`, the render runs
    under shard_map (rows sharded, scene replicated) and the transpose
    all-reduces the replicated parameters' gradients over the mesh; without
    it, inputs may still carry shardings and XLA propagates them.
    """
    render_fn = (
        _render_rows_fn(mesh, cfg, width, height, spp)
        if mesh is not None
        else lambda scene, cam, px, py, key: render_tile_radiance(
            scene, cam, width, height, px, py, key, cfg, spp
        )
    )

    def loss_fn(params, scene, cam, px, py, target, key):
        mat_f, dir_ls, env_tex = params
        lights = scene.lights
        env = lights.env._replace(tex=env_tex)
        dl = lights.directional._replace(ls=dir_ls)
        scene = scene._replace(
            materials=scene.materials._replace(**mat_f._asdict()),
            lights=lights._replace(env=env, directional=dl),
        )
        acc = render_fn(scene, cam, px, py, key)
        img = acc / spp
        return jnp.mean((img - target) ** 2)

    @jax.jit
    def train_step(scene, cam, px, py, target, key):
        m = scene.materials
        params = (
            MaterialGrads(m.albedo, m.roughness, m.metallic, m.fresnel, m.emissive),
            scene.lights.directional.ls,
            scene.lights.env.tex,
        )
        loss, grads = jax.value_and_grad(loss_fn)(
            params, scene, cam, px, py, target, key
        )
        return loss, grads

    return train_step
