"""End-to-end integrator tests: analytic golden values, estimator invariants,
and gradient flow (SURVEY.md §4: the verification strategy the reference
never had)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mc_path_tracer_tpu.models.camera import PerspectiveCamera
from mc_path_tracer_tpu.models.integrator import RenderConfig, render, trace_radiance
from mc_path_tracer_tpu.models.scene import Scene
from mc_path_tracer_tpu.ops import brdf


def floor_scene(albedo=(0.8, 0.4, 0.2), ls=2.0):
    """Lambertian floor + overhead directional light + black env."""
    s = Scene()
    s.set_environment_color((0, 0, 0), ls=0.0)
    mat = s.add_material(albedo=albedo, roughness=1.0, metallic=0.0)
    p = np.array([[-10, 0, -10], [10, 0, -10], [10, 0, 10], [-10, 0, 10]], np.float32)
    i = np.array([[0, 2, 1], [0, 3, 2]])
    s.add_mesh(p, i, normals=np.tile([[0, 1, 0]], (4, 1)).astype(np.float32),
               material_id=mat)
    s.add_directional_light((0, 1, 0), color=(1, 1, 1), ls=ls)
    return s


# camera deliberately off the floor diagonal (exact-edge rays are knife-edge)
CAM = PerspectiveCamera(position=np.array([0.7, 5.0, 1.3]),
                        target=np.array([0.3, 0.0, 0.1]), fov_deg=40)


def expected_direct(albedo, wo_dir, ls):
    n = jnp.array([[0.0, 1.0, 0.0]])
    wl = jnp.array([[0.0, 1.0, 0.0]])
    wo = jnp.asarray(wo_dir, jnp.float32)[None]
    m = brdf.MaterialParams(
        albedo=jnp.asarray(albedo, jnp.float32)[None],
        roughness=jnp.array([1.0]), metallic=jnp.array([0.0]),
        fresnel=jnp.full((1, 3), 0.04),
    )
    return np.asarray(brdf.mixture_f(m, n, wl, wo))[0] * ls


def test_directional_lambertian_analytic():
    """Config-1 style golden: conditioned on the (50/50) light pick the
    estimator is *deterministic* — samples are exactly 2 * f(wl,wo) * Li
    when the delta light is picked and exactly 0 when the black env is —
    so we verify the conditional values bitwise-tight and the pick rate
    within binomial bounds."""
    import dataclasses

    from mc_path_tracer_tpu.models.camera import gen_camera_rays

    s = floor_scene()
    sd = s.build()
    cam16 = dataclasses.replace(CAM, aspect=1.0)
    cp = cam16.params()
    ro, rd = gen_camera_rays(
        cp, 16, 16, jnp.array([8.0]), jnp.array([8.0]), jnp.zeros((1, 2))
    )
    wo = -np.asarray(rd)[0]
    exp = expected_direct((0.8, 0.4, 0.2), wo, 2.0)  # f * Li
    cfg = RenderConfig(spp=1, max_depth=2)
    # 64 copies of the same ray: each lane draws independent uniforms, so
    # this samples the light-pick coin 64 times in one vectorized call.
    ro64 = jnp.broadcast_to(ro, (64, 3))
    rd64 = jnp.broadcast_to(rd, (64, 3))
    vals = np.asarray(
        jax.jit(trace_radiance, static_argnames="cfg")(
            sd, ro64, rd64, jax.random.PRNGKey(1), cfg
        )
    )
    lum = vals.sum(-1)
    picked = vals[lum > 0]
    # conditional value: selection compensation x2 over the 0.5 pick prob
    np.testing.assert_allclose(
        picked, np.broadcast_to(2.0 * exp, picked.shape), rtol=1e-4
    )
    # unbiasedness: pick rate within ~4 sigma of 0.5 over 64 trials
    rate = (lum > 0).mean()
    assert 0.25 < rate < 0.75


def test_full_render_matches_expectation():
    """Full render() MC estimate agrees with the analytic mean within noise."""
    import dataclasses

    from mc_path_tracer_tpu.models.camera import gen_camera_rays

    s = floor_scene()
    film = render(s, CAM, 16, 16, RenderConfig(spp=128, max_depth=2),
                  key=jax.random.PRNGKey(7))
    img = np.asarray(film.radiance_mean())
    cam16 = dataclasses.replace(CAM, aspect=1.0)
    _, rd = gen_camera_rays(
        cam16.params(), 16, 16, jnp.array([8.0]), jnp.array([8.0]),
        jnp.zeros((1, 2)),
    )
    exp = expected_direct((0.8, 0.4, 0.2), -np.asarray(rd)[0], 2.0)
    # binomial 50/50 pick over 128 spp: sigma/mean = 1/sqrt(128) ~ 8.8%
    np.testing.assert_allclose(img[8, 8], exp, rtol=0.30)
    assert np.isfinite(img).all()
    assert (img.sum(-1) > 0).all()


def test_energy_scales_linearly_with_light():
    s1 = floor_scene(ls=1.0)
    s2 = floor_scene(ls=4.0)
    cfg = RenderConfig(spp=16, max_depth=2)
    k = jax.random.PRNGKey(3)
    i1 = np.asarray(render(s1, CAM, 8, 8, cfg, key=k).radiance_mean())
    i2 = np.asarray(render(s2, CAM, 8, 8, cfg, key=k).radiance_mean())
    np.testing.assert_allclose(i2, 4.0 * i1, rtol=1e-4)


def test_black_env_sphere_background():
    """Primary-miss pixels return the env radiance (logic:128-140)."""
    s = Scene()
    s.set_environment_color((0.2, 0.5, 0.9), ls=1.5)
    mat = s.add_material()
    # small triangle far from view center
    s.add_mesh(np.array([[50, 0, 0], [51, 0, 0], [50, 1, 0]], np.float32),
               np.array([[0, 1, 2]]), material_id=mat)
    cam = PerspectiveCamera(position=np.array([0, 0, 5.0]), target=np.zeros(3))
    film = render(s, cam, 8, 8, RenderConfig(spp=4, max_depth=2))
    img = np.asarray(film.radiance_mean())
    np.testing.assert_allclose(
        img, np.broadcast_to(np.array([0.2, 0.5, 0.9]) * 1.5, img.shape), rtol=1e-5
    )


def test_reference_quirks_mode_darker():
    """Quirk mode reproduces the reference's missing selection compensation:
    with 2 lights the fixed estimator is ~2x the quirk one on direct light."""
    s = floor_scene()
    k = jax.random.PRNGKey(11)
    fixed = np.asarray(
        render(s, CAM, 8, 8, RenderConfig(spp=64, max_depth=2), key=k).radiance_mean()
    )
    quirky = np.asarray(
        render(s, CAM, 8, 8,
               RenderConfig(spp=64, max_depth=2, reference_quirks=True),
               key=k).radiance_mean()
    )
    # fixed = quirk * 2 (selection compensation) * 2 (delta MIS weight fix)
    ratio = fixed.mean() / max(quirky.mean(), 1e-9)
    assert 3.5 < ratio < 4.5


def test_gradients_wrt_materials_and_light():
    """d(image)/d(albedo, light ls) flows and matches finite differences."""
    s = floor_scene()
    sd = s.build()
    cam = CAM
    import dataclasses

    cam16 = dataclasses.replace(cam, aspect=1.0)
    cp = cam16.params()
    from mc_path_tracer_tpu.models.camera import gen_camera_rays

    ys, xs = jnp.mgrid[0:4, 0:4]
    px = xs.reshape(-1).astype(jnp.float32)
    py = ys.reshape(-1).astype(jnp.float32)
    ro, rd = gen_camera_rays(cp, 4, 4, px, py, jnp.zeros((16, 2)))
    key = jax.random.PRNGKey(0)
    cfg = RenderConfig(spp=1, max_depth=2)

    def loss(albedo, ls):
        mats = sd.materials._replace(albedo=albedo[None])
        dl = sd.lights.directional._replace(ls=jnp.asarray([ls]))
        sd2 = sd._replace(
            materials=mats, lights=sd.lights._replace(directional=dl)
        )
        return jnp.sum(trace_radiance(sd2, ro, rd, key, cfg))

    a0 = jnp.array([0.8, 0.4, 0.2])
    g_albedo, g_ls = jax.grad(loss, argnums=(0, 1))(a0, 2.0)
    assert np.isfinite(np.asarray(g_albedo)).all() and np.isfinite(float(g_ls))
    assert float(jnp.abs(g_albedo).sum()) > 0

    # finite differences on ls (radiance is linear in ls -> exact)
    eps = 1e-2
    f0 = float(loss(a0, 2.0 - eps))
    f1 = float(loss(a0, 2.0 + eps))
    fd = (f1 - f0) / (2 * eps)
    np.testing.assert_allclose(float(g_ls), fd, rtol=1e-3)

    # finite differences on albedo[0]
    e = jnp.array([eps, 0, 0])
    fd_a = (float(loss(a0 + e, 2.0)) - float(loss(a0 - e, 2.0))) / (2 * eps)
    np.testing.assert_allclose(float(g_albedo[0]), fd_a, rtol=2e-2)


def test_render_progressive_matches_render():
    """Tiled progressive accumulation converges to the same estimator."""
    from mc_path_tracer_tpu.models.integrator import render_progressive

    s = floor_scene()
    cfg = RenderConfig(spp=4, max_depth=2)
    k = jax.random.PRNGKey(5)
    full = np.asarray(render(s, CAM, 8, 8, cfg, key=k).radiance_mean())
    last = None
    for f in render_progressive(s, CAM, 8, 8, cfg, key=k, tile=4, spp_per_pass=2):
        last = f
    prog = np.asarray(last.radiance_mean())
    assert np.asarray(last.samples).min() == 4
    # same estimator, different key folding -> agree in expectation
    assert abs(prog.mean() - full.mean()) / full.mean() < 0.35
    assert np.isfinite(prog).all()


def test_estimator_comparison_modes_agree_in_expectation():
    """light-only / brdf-only / MIS / uniform-env modes are all unbiased
    estimators of the same integral (the reference's README comparison
    figures); their converged means must agree within MC noise."""
    from mc_path_tracer_tpu.models.primitives import uv_sphere
    from mc_path_tracer_tpu.models.scene import Scene
    from mc_path_tracer_tpu.models.integrator import render

    rng = np.random.default_rng(5)
    tex = rng.uniform(0.1, 1.0, size=(16, 32, 3)).astype(np.float32)
    tex[4:7, 8:12] = 25.0  # bright lamp: makes IS vs uniform interesting
    s = Scene()
    s.set_environment_hdr(tex, ls=1.0)
    m = s.add_material(albedo=(0.7, 0.6, 0.5), roughness=0.6)
    p, n, uv, idx = uv_sphere(0.9, rings=10, segments=16)
    s.add_mesh(p, idx, normals=n, uvs=uv, material_id=m)
    cam = PerspectiveCamera(position=np.array([0.0, 0.4, 3.0]),
                            target=np.array([0.0, 0.0, 0.0]))

    means = {}
    for name, cfg in {
        "mis": RenderConfig(spp=96, max_depth=2),
        "light": RenderConfig(spp=96, max_depth=2, mis_mode="light"),
        "brdf": RenderConfig(spp=192, max_depth=2, mis_mode="brdf"),
        "uniform_env": RenderConfig(spp=192, max_depth=2,
                                    env_importance=False),
    }.items():
        img = np.asarray(
            render(s, cam, 12, 12, cfg, key=jax.random.PRNGKey(1))
            .radiance_mean())
        assert np.isfinite(img).all(), name
        means[name] = float(img.mean())
    ref = means["mis"]
    for name, m_ in means.items():
        assert abs(m_ - ref) < 0.25 * ref, (name, means)


def _variance_ratio(rough, metal, K=96, depth=3):
    """Per-pixel sample-variance ratio reuse/two-sample across K
    independent 1-spp replicates, plus an unbiasedness cross-check."""
    from mc_path_tracer_tpu.models.primitives import uv_sphere
    from mc_path_tracer_tpu.models.scene import Scene
    from mc_path_tracer_tpu.models.integrator import render

    rng = np.random.default_rng(7)
    tex = rng.uniform(0.1, 1.0, size=(16, 32, 3)).astype(np.float32)
    tex[4:7, 8:12] = 12.0  # bright lamp: non-trivial MIS weights
    s = Scene()
    s.set_environment_hdr(tex, ls=1.0)
    s.add_directional_light((0.3, 1.0, 0.2), color=(1, 1, 1), ls=1.5)
    m = s.add_material(albedo=(0.7, 0.6, 0.5), roughness=rough, metallic=metal)
    p, n, uv, idx = uv_sphere(0.9, rings=10, segments=16)
    s.add_mesh(p, idx, normals=n, uvs=uv, material_id=m)
    cam = PerspectiveCamera(position=np.array([0.0, 0.4, 3.0]),
                            target=np.array([0.0, 0.0, 0.0]))

    stats = {}
    for name, reuse in (("reuse", True), ("two_sample", False)):
        cfg = RenderConfig(spp=1, max_depth=depth, reuse_brdf_ray=reuse)
        imgs = np.stack([
            np.asarray(render(s, cam, 12, 12, cfg,
                              key=jax.random.PRNGKey(100 + k))
                       .radiance_mean())
            for k in range(K)
        ])
        assert np.isfinite(imgs).all(), name
        stats[name] = (imgs.mean(axis=0), imgs.var(axis=0, ddof=1))
    m_r, v_r = stats["reuse"]
    m_t, v_t = stats["two_sample"]
    se = np.sqrt((v_r + v_t).mean() / K) * 4.0
    assert abs(m_r.mean() - m_t.mean()) < max(se, 0.02 * m_t.mean())
    return float(v_r.mean() / v_t.mean())


def test_reuse_estimator_variance_pinned():
    """Pins the per-sample VARIANCE of the shared-sample estimator
    (reuse_brdf_ray) against the reference-shaped two-sample estimator
    (independent wb, wavefront_kernels.cu:331-356) — VERDICT r4 #4 asked
    for exactly this measurement, and it came back two-sided:

      - diffuse surfaces: parity (measured ratio ~1.02) — sharing the
        mixture sample is essentially free;
      - glossy surfaces (r=0.4, metal): ~1.45x inflation — the shared
        direction correlates the BRDF-side MIS term with the continued
        path's radiance.

    Consequence: reuse mode does NOT deliver the reference's 12-ray
    estimator quality from 9 rays on glossy scenes, so the r4 bench's
    12-ray crediting overstated delivered work there.  bench.py now runs
    the two-sample estimator by default (honest 12-traced = 12-credited
    accounting); reuse stays available for diffuse-dominant workloads.
    This test pins both regimes so a future estimator change that shifts
    either ratio shows up red."""
    r_diffuse = _variance_ratio(0.9, 0.0)
    assert 0.8 < r_diffuse < 1.25, r_diffuse
    r_glossy = _variance_ratio(0.4, 0.3)
    assert 1.15 < r_glossy < 1.8, r_glossy
