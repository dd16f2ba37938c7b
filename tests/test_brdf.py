"""BRDF parity and physics tests (reference dMaterial.cu).

Key invariants:
  - pdf of each lobe integrates to ~1 over the hemisphere.
  - Monte Carlo white-furnace bound: integral of f*cos <= 1 (energy
    conservation up to the reference's epsilon clamps).
  - sampled directions are distributed according to the matching pdf
    (importance-sampling self-consistency).
  - gradients flow to albedo/roughness/metallic.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mc_path_tracer_tpu.ops import brdf
from mc_path_tracer_tpu.ops.math import TWO_PI, dot, normalize


def make_mat(n, albedo=(1.0, 1.0, 1.0), rough=0.5, metal=0.0):
    return brdf.MaterialParams(
        albedo=jnp.broadcast_to(jnp.asarray(albedo, jnp.float32), (n, 3)),
        roughness=jnp.full((n,), rough, jnp.float32),
        metallic=jnp.full((n,), metal, jnp.float32),
        fresnel=jnp.full((n, 3), 0.04, jnp.float32),
    )


def hemisphere_dirs(key, n):
    u = jax.random.uniform(key, (n, 2))
    e0, e1 = u[:, 0], u[:, 1]
    st = jnp.sqrt(1 - e0 * e0)
    phi = TWO_PI * e1
    return jnp.stack([st * jnp.cos(phi), e0, st * jnp.sin(phi)], axis=-1)


N_UP = jnp.array([0.0, 1.0, 0.0])


def test_diff_pdf_integrates_to_one():
    # uniform hemisphere sampling of a constant 1/2pi pdf
    n = 20000
    wi = hemisphere_dirs(jax.random.PRNGKey(0), n)
    nrm = jnp.broadcast_to(N_UP, (n, 3))
    wo = jnp.broadcast_to(normalize(jnp.array([0.3, 0.8, 0.1])), (n, 3))
    pdf = brdf.diff_pdf(nrm, wi, wo)
    # E[pdf / (1/2pi)] = integral of pdf over hemisphere
    est = float(jnp.mean(pdf * TWO_PI))
    assert abs(est - 1.0) < 0.02


def test_spec_pdf_integrates_to_one():
    """The GGX half-vector pdf mapped to wi integrates to ~1 over the *full
    sphere* (NDF normalization); sampled wi may fall below the horizon, so
    the upper-hemisphere integral alone is < 1."""
    n = 200_000
    key = jax.random.PRNGKey(1)
    u = jax.random.uniform(key, (n, 2))
    e0, e1 = u[:, 0], u[:, 1]
    y = 1.0 - 2.0 * e0
    st = jnp.sqrt(1 - y * y)
    phi = TWO_PI * e1
    wi = jnp.stack([st * jnp.cos(phi), y, st * jnp.sin(phi)], axis=-1)
    nrm = jnp.broadcast_to(N_UP, (n, 3))
    wo = jnp.broadcast_to(normalize(jnp.array([0.0, 1.0, 0.0])), (n, 3))
    mat = make_mat(n, rough=0.6)
    pdf = brdf.spec_pdf(mat, nrm, wi, wo)
    # exclude wo.h <= 0 (invalid half vectors; clamped in the reference too)
    valid = dot(normalize(wo + wi), nrm) > 0
    est = float(jnp.mean(jnp.where(valid, pdf, 0.0) * 2.0 * TWO_PI))
    assert abs(est - 1.0) < 0.08


def test_spec_sampling_matches_pdf():
    """Importance-sampling self-consistency: E[g(wi)/pdf(wi)] over sampled wi
    equals the hemisphere integral of g for a smooth test function g."""
    n = 200_000
    key = jax.random.PRNGKey(2)
    nrm = jnp.broadcast_to(N_UP, (n, 3))
    wo = jnp.broadcast_to(normalize(jnp.array([0.4, 0.9, 0.0])), (n, 3))
    mat = make_mat(n, rough=0.5)
    u = jax.random.uniform(key, (n, 2))
    wi = brdf.spec_sample_wi(mat, nrm, wo, u)
    pdf = brdf.spec_pdf(mat, nrm, wi, wo)
    g = jnp.maximum(dot(wi, nrm), 0.0)  # g = cos(theta)
    est = float(jnp.mean(jnp.where(pdf > 1e-6, g / jnp.maximum(pdf, 1e-6), 0.0)))
    # ground truth: integral of cos over hemisphere = pi
    assert abs(est - np.pi) / np.pi < 0.05


def test_diffuse_furnace_bound():
    """Integral over the hemisphere of f*? — diffuse f already includes the
    cosine (dMaterial.cu:274: kD*albedo*cos/pi), so the white-furnace
    integral of f is <= 1 for albedo 1."""
    n = 100_000
    wi = hemisphere_dirs(jax.random.PRNGKey(3), n)
    nrm = jnp.broadcast_to(N_UP, (n, 3))
    wo = jnp.broadcast_to(normalize(jnp.array([0.0, 1.0, 0.0])), (n, 3))
    mat = make_mat(n, albedo=(1, 1, 1), rough=1.0, metal=0.0)
    f = brdf.diff_f(mat, nrm, wi, wo)
    est = np.asarray(jnp.mean(f * TWO_PI, axis=0))
    assert est.max() <= 1.01
    assert est.min() > 0.3  # sanity: a white diffuse surface reflects plenty


def test_mixture_pdf_is_average():
    n = 64
    wi = hemisphere_dirs(jax.random.PRNGKey(4), n)
    nrm = jnp.broadcast_to(N_UP, (n, 3))
    wo = jnp.broadcast_to(normalize(jnp.array([0.2, 0.9, -0.1])), (n, 3))
    mat = make_mat(n, rough=0.4)
    mix = brdf.mixture_pdf(mat, nrm, wi, wo)
    d = brdf.diff_pdf(nrm, wi, wo)
    s = brdf.spec_pdf(mat, nrm, wi, wo)
    np.testing.assert_allclose(np.asarray(mix), np.asarray(0.5 * (d + s)), rtol=1e-6)


def test_brdf_gradients_flow():
    nrm = N_UP[None]
    wo = normalize(jnp.array([0.3, 0.8, 0.1]))[None]
    wi = normalize(jnp.array([-0.3, 0.8, 0.1]))[None]

    def loss(albedo, rough, metal):
        mat = brdf.MaterialParams(
            albedo=albedo[None],
            roughness=rough[None],
            metallic=metal[None],
            fresnel=jnp.full((1, 3), 0.04),
        )
        return jnp.sum(brdf.mixture_f(mat, nrm, wi, wo))

    g = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.array([0.5, 0.5, 0.5]), jnp.asarray(0.5), jnp.asarray(0.2)
    )
    assert all(np.all(np.isfinite(np.asarray(x))) for x in g)
    assert float(jnp.abs(g[0]).sum()) > 0  # albedo gradient nonzero
    assert float(jnp.abs(g[1])) > 0        # roughness gradient nonzero


def test_fresnel_schlick_limits():
    f0 = jnp.array([[0.04, 0.04, 0.04]])
    v = jnp.array([[0.0, 1.0, 0.0]])
    # glancing: v.h = 0 -> F = 1
    h = jnp.array([[1.0, 0.0, 0.0]])
    np.testing.assert_allclose(np.asarray(brdf.fresnel_schlick(f0, v, h)), 1.0, atol=1e-6)
    # normal incidence: v.h = 1 -> F = f0
    h = jnp.array([[0.0, 1.0, 0.0]])
    np.testing.assert_allclose(
        np.asarray(brdf.fresnel_schlick(f0, v, h)), np.asarray(f0), atol=1e-6
    )
