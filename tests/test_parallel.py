"""Multi-device sharding tests on the virtual 8-CPU mesh (SURVEY.md §2h:
tile sharding + replicated scene + gradient all-reduce)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mc_path_tracer_tpu.models.camera import PerspectiveCamera
from mc_path_tracer_tpu.models.integrator import RenderConfig, render
from mc_path_tracer_tpu.models.primitives import plane, uv_sphere
from mc_path_tracer_tpu.models.scene import Scene
from mc_path_tracer_tpu.parallel.mesh import TILE_AXIS, make_mesh
from mc_path_tracer_tpu.parallel.render import make_train_step, render_sharded


def small_scene():
    s = Scene()
    s.set_environment_color((0.3, 0.3, 0.35), ls=1.0)
    floor = s.add_material(albedo=(0.6, 0.6, 0.6), roughness=0.8)
    p, n, uv, idx = plane(30.0)
    s.add_mesh(p, idx, normals=n, uvs=uv, material_id=floor)
    m = s.add_material(albedo=(0.8, 0.3, 0.2), roughness=0.4)
    p, n, uv, idx = uv_sphere(0.8, center=(0, 0.8, 0), rings=8, segments=16)
    s.add_mesh(p, idx, normals=n, uvs=uv, material_id=m)
    s.add_directional_light((0.3, 1.0, 0.2), ls=2.0)
    return s


CAM = PerspectiveCamera(position=np.array([0.3, 2.0, 4.0]),
                        target=np.array([0.0, 0.5, 0.0]))


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_render_matches_single_device():
    """Row-sharded forward render must equal the unsharded render bitwise
    (the same program, same keys — only placement differs)."""
    s = small_scene()
    sd = s.build()
    cfg = RenderConfig(spp=2, max_depth=2)
    k = jax.random.PRNGKey(0)
    w, h = 16, 16
    single = np.asarray(render(sd, CAM, w, h, cfg, key=k).ld)
    mesh = make_mesh()
    cam = dataclasses.replace(CAM, aspect=w / h).params()
    sharded = np.asarray(render_sharded(sd, cam, w, h, cfg, key=k, mesh=mesh))
    np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-6)


def test_sharded_render_rejects_bad_height():
    s = small_scene().build()
    cam = dataclasses.replace(CAM, aspect=1.0).params()
    with pytest.raises(ValueError):
        render_sharded(s, cam, 16, 9, RenderConfig(spp=1, max_depth=2),
                       mesh=make_mesh())


def test_train_step_reduces_loss():
    """One SGD step on material albedo against a brighter target reduces the
    sharded L2 loss — exercising forward + adjoint + gradient all-reduce."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    s = small_scene()
    sd = s.build()
    w, h = 8, 8
    cfg = RenderConfig(spp=2, max_depth=2)
    mesh = make_mesh()
    shard = NamedSharding(mesh, P(TILE_AXIS))
    repl = NamedSharding(mesh, P())
    cam = jax.device_put(dataclasses.replace(CAM, aspect=w / h).params(), repl)
    ys, xs = np.mgrid[0:h, 0:w]
    px = jax.device_put(jnp.asarray(xs.reshape(-1), jnp.float32), shard)
    py = jax.device_put(jnp.asarray(ys.reshape(-1), jnp.float32), shard)
    key = jax.random.PRNGKey(0)

    # target: the same scene rendered with brighter albedo
    target_scene = small_scene()
    target_scene.material_albedo = [a * 0 + np.asarray([0.9, 0.9, 0.9]) for a in target_scene.material_albedo]
    tsd = target_scene.build()
    from mc_path_tracer_tpu.models.integrator import render_tile_radiance

    target = render_tile_radiance(tsd, cam, w, h, px.astype(jnp.float32),
                                  py.astype(jnp.float32), key, cfg, cfg.spp) / cfg.spp
    target = jax.device_put(target, shard)

    step = make_train_step(cfg, w, h, cfg.spp)
    sd = jax.device_put(sd, repl)
    loss0, grads = step(sd, cam, px, py, target, key)
    g_mat, g_ls, g_tex = grads
    assert np.isfinite(float(loss0))
    assert float(jnp.abs(g_mat.albedo).sum()) > 0

    # apply SGD on albedo
    lr = 0.5
    new_albedo = sd.materials.albedo - lr * g_mat.albedo
    sd2 = sd._replace(materials=sd.materials._replace(albedo=new_albedo))
    loss1, _ = step(sd2, cam, px, py, target, key)
    assert float(loss1) < float(loss0)
