"""Environment-light CDF importance sampling tests
(reference light_initialization_kernels.cu, EnvironmentLight.cu)."""

import jax
import jax.numpy as jnp
import numpy as np

from mc_path_tracer_tpu.ops import envmap
from mc_path_tracer_tpu.ops.math import PI, equirect_uv


def make_tex(h=32, w=64, seed=0, hotspot=True):
    rng = np.random.default_rng(seed)
    tex = rng.uniform(0.05, 0.3, size=(h, w, 3)).astype(np.float32)
    if hotspot:
        tex[h // 4, w // 3] = [50.0, 40.0, 30.0]  # bright sun texel
    return jnp.asarray(tex)


def test_pdf_texture_sums_to_one():
    """g_test sanity check: sum of the pdf texture ~ 1
    (light_initialization_kernels.cu:113-133)."""
    dist = envmap.build_distribution(make_tex())
    np.testing.assert_allclose(float(jnp.sum(dist.pdf_texture)), 1.0, rtol=1e-5)


def test_marginal_and_conditional_cdfs_normalized():
    dist = envmap.build_distribution(make_tex())
    np.testing.assert_allclose(float(dist.marginal_cdf[-1]), 1.0, rtol=1e-5)
    # rows with nonzero mass end at 1 (row 0 has sin(0)=0 mass and is never
    # selected by the row CDF search — same as the reference's tables)
    row_mass = np.asarray(dist.pdf_texture.sum(axis=1))
    ends = np.asarray(dist.cond_cdf[:, -1])
    np.testing.assert_allclose(ends[row_mass > 1e-8], 1.0, rtol=1e-4)


def test_sampling_concentrates_on_hotspot():
    tex = make_tex()
    dist = envmap.build_distribution(tex)
    u = jax.random.uniform(jax.random.PRNGKey(0), (5000, 2))
    wi, uv = envmap.sample_direction(dist, u)
    h, w = 32, 64
    # fraction of samples landing on the hotspot texel ~ its pdf mass
    iy = np.asarray(uv[:, 1] * h).astype(int)
    ix = np.asarray(uv[:, 0] * w).astype(int)
    frac = float(np.mean((iy == h // 4) & (ix == w // 3)))
    mass = float(dist.pdf_texture[h // 4, w // 3])
    assert abs(frac - mass) < 0.03
    assert mass > 0.1  # the hotspot dominates


def test_sample_pdf_consistency():
    """Monte Carlo identity: E[f(wi)/pdf(wi)] over env samples equals the
    sphere integral of f; with f = L (the env radiance itself) this is the
    total env irradiance computed two ways."""
    tex = make_tex(h=16, w=32, hotspot=True)
    dist = envmap.build_distribution(tex)
    u = jax.random.uniform(jax.random.PRNGKey(1), (20000, 2))
    wi, _ = envmap.sample_direction(dist, u)
    pdf = envmap.pdf(dist, wi)
    lum = envmap.radiance(tex, wi).mean(-1)
    est = float(jnp.mean(jnp.where(pdf > 0, lum / jnp.maximum(pdf, 1e-12), 0.0)))

    # quadrature ground truth over the equirect grid
    h, w = 16, 32
    v = (np.arange(h) + 0.5) / h
    sin_t = np.sin(PI * v)
    texel_solid = (2 * PI / w) * (PI / h) * sin_t  # dphi * dtheta * sin
    truth = float(np.sum(np.asarray(tex).mean(-1) * texel_solid[:, None]))
    assert abs(est - truth) / truth < 0.15


def test_pdf_matches_reference_scaling():
    """pdf(wi) = texel_pdf * W*H / (2 pi^2 sin theta) (EnvironmentLight.cu:76-83),
    with our rounding texel binning (see ops/envmap.pdf docstring)."""
    tex = make_tex(h=8, w=16, hotspot=False)
    dist = envmap.build_distribution(tex)
    wi = jnp.asarray([[0.3, 0.5, 0.8]])
    wi = wi / jnp.linalg.norm(wi)
    uv = equirect_uv(wi)
    ix = int(round(float(uv[0, 0]) * 16)) % 16
    iy = min(int(round(float(uv[0, 1]) * 8)), 7)
    expect = float(dist.pdf_texture[iy, ix]) * 16 * 8 / (
        2 * PI * PI * float(jnp.sin(PI * uv[0, 1]))
    )
    np.testing.assert_allclose(float(envmap.pdf(dist, wi)[0]), expect, rtol=1e-5)


def test_bilinear_wrap_interpolates():
    tex = jnp.zeros((4, 4, 3)).at[1, 1].set(jnp.ones(3))
    # texel center of (1,1) is uv=(0.375, 0.375) -> exact value 1
    v = envmap.bilinear_wrap(tex, jnp.asarray([[0.375, 0.375]]))
    np.testing.assert_allclose(np.asarray(v), 1.0, atol=1e-6)
    # halfway between texels -> 0.5
    v = envmap.bilinear_wrap(tex, jnp.asarray([[0.375, 0.5]]))
    np.testing.assert_allclose(np.asarray(v), 0.5, atol=1e-6)


def test_env_texel_gradients_flow():
    tex = make_tex(h=8, w=16, hotspot=False)

    def loss(t):
        wi = jnp.asarray([[0.0, 0.2, 0.98]])
        wi = wi / jnp.linalg.norm(wi)
        return jnp.sum(envmap.radiance(t, wi))

    g = jax.grad(loss)(tex)
    assert float(jnp.abs(g).sum()) > 0
    assert np.isfinite(np.asarray(g)).all()


def test_two_level_search_matches_flat():
    """The blocked two-level CDF search returns exactly the flat
    broadcast-compare result (same searchsorted semantics)."""
    from mc_path_tracer_tpu.ops.envmap import (
        _search_rows_2level,
        build_distribution,
    )

    rng = np.random.default_rng(0)
    h, w = 37, 1500  # w above _FLAT_SEARCH_MAX and not a block multiple
    tex = rng.uniform(0.01, 3.0, size=(h, w, 3)).astype(np.float32)
    dist = build_distribution(tex)
    e = jnp.asarray(rng.random(4096).astype(np.float32))
    rows = jnp.asarray(rng.integers(0, h, size=4096).astype(np.int32))
    got = np.asarray(_search_rows_2level(dist.cond_cdf, rows, e))
    flat = np.asarray(
        jnp.clip(
            jnp.sum(
                (dist.cond_cdf[rows] <= e[:, None]).astype(jnp.int32), axis=-1
            ),
            0, w - 1,
        )
    )
    np.testing.assert_array_equal(got, flat)


def test_large_hdri_sampling_bounded_memory():
    """A 4k x 2k HDRI sampled at a 64k-lane block: the two-level path keeps
    peak transients bounded (the flat path would gather ~1 GiB) and the
    sampled texels follow the luminance distribution (hot texel gets the
    most samples)."""
    from mc_path_tracer_tpu.ops import envmap

    h, w = 2048, 4096
    tex = np.full((h, w, 3), 0.01, np.float32)
    tex[512, 1024] = 1e6  # hot sun texel (~93% of total weight)
    dist = envmap.build_distribution(tex)
    u = jax.random.uniform(jax.random.PRNGKey(0), (65536, 2))
    wi, uv = jax.jit(envmap.sample_direction)(dist, u)
    uv = np.asarray(uv)
    ix = np.round(uv[:, 0] * w).astype(np.int64) % w
    iy = np.clip(np.round(uv[:, 1] * h).astype(np.int64), 0, h - 1)
    frac_hot = np.mean((ix == 1024) & (iy == 512))
    assert frac_hot > 0.5, frac_hot  # the sun dominates the distribution
    # f/pdf identity on the hot texel
    p = np.asarray(envmap.pdf(dist, wi))
    assert np.isfinite(p).all() and (p > 0).all()
