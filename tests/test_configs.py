"""Graduated verification configs render smoke tests (scaled-down sizes so
they run on the CPU test mesh; full sizes are exercised on TPU by bench)."""

import dataclasses

import jax
import numpy as np
import pytest

from mc_path_tracer_tpu import configs
from mc_path_tracer_tpu.models.integrator import RenderConfig, render


@pytest.mark.parametrize("n", [1, 2, 3, 4])
def test_config_renders(n):
    scene, cam, cfg, (w, h) = configs.ALL_CONFIGS[n]()
    small = RenderConfig(spp=2, max_depth=min(cfg.max_depth, 3),
                         accel=cfg.accel)
    film = render(scene, cam, 32, 24, small, key=jax.random.PRNGKey(n))
    img = np.asarray(film.radiance_mean())
    assert np.isfinite(img).all()
    assert img.max() > 0


def test_config5_builds_with_lbvh():
    scene, cam, cfg, (w, h) = configs.config5_showoff()
    sd = scene.build()
    assert sd.tris.num_triangles > 90_000
    assert sd.bvh.num_nodes > 10_000
    film = render(sd, cam, 16, 12, RenderConfig(spp=1, max_depth=2),
                  key=jax.random.PRNGKey(5))
    img = np.asarray(film.radiance_mean())
    assert np.isfinite(img).all() and img.max() > 0


def test_config4_gradients():
    """Config 4's stated purpose: gradients w.r.t. roughness/albedo/F0."""
    import jax.numpy as jnp

    from mc_path_tracer_tpu.models.camera import gen_camera_rays
    from mc_path_tracer_tpu.models.integrator import trace_radiance

    scene, cam, cfg, _ = configs.config4_roughness_sweep()
    sd = scene.build()
    cp = dataclasses.replace(cam, aspect=2.0).params()
    ys, xs = np.mgrid[0:8, 0:16]
    px = jnp.asarray(xs.reshape(-1), jnp.float32)
    py = jnp.asarray(ys.reshape(-1), jnp.float32)
    ro, rd = gen_camera_rays(cp, 16, 8, px, py, jnp.zeros((128, 2)))
    key = jax.random.PRNGKey(0)
    small = RenderConfig(spp=1, max_depth=2)

    def loss(rough, albedo, f0):
        mats = sd.materials._replace(
            roughness=rough, albedo=albedo, fresnel=f0
        )
        return jnp.sum(trace_radiance(sd._replace(materials=mats),
                                      ro, rd, key, small))

    g_r, g_a, g_f = jax.grad(loss, argnums=(0, 1, 2))(
        sd.materials.roughness, sd.materials.albedo, sd.materials.fresnel
    )
    for g in (g_r, g_a, g_f):
        assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g_r).sum()) > 0
    assert float(jnp.abs(g_a).sum()) > 0
    assert float(jnp.abs(g_f).sum()) > 0
