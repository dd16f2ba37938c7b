"""Sampler distribution checks (reference cuda_math/Sample.cu, dMaterial.cu)."""

import jax
import jax.numpy as jnp
import numpy as np

from mc_path_tracer_tpu.ops import sampling as s


def _u(key, n, k=2):
    return jax.random.uniform(key, (n, k))


def test_uniform_hemisphere_moments():
    # cos_theta = e0 uniform => E[y] = 0.5, pdf = 1/2pi (dMaterial.cu:232-258)
    d = s.sample_uniform_hemisphere(_u(jax.random.PRNGKey(0), 20000))
    y = np.asarray(d[:, 1])
    assert np.all(y >= 0)
    assert abs(y.mean() - 0.5) < 0.01
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-5)


def test_cosine_hemisphere_moments():
    d = s.sample_cosine_hemisphere(_u(jax.random.PRNGKey(1), 20000))
    y = np.asarray(d[:, 1])
    # E[cos theta] for cosine-weighted = 2/3
    assert abs(y.mean() - 2.0 / 3.0) < 0.01


def test_uniform_sphere_mean_zero():
    d = np.asarray(s.sample_uniform_sphere(_u(jax.random.PRNGKey(2), 40000)))
    assert np.abs(d.mean(axis=0)).max() < 0.02


def test_concentric_disk_in_unit_disk():
    p = np.asarray(s.sample_concentric_disk(_u(jax.random.PRNGKey(3), 10000)))
    r = np.linalg.norm(p, axis=-1)
    assert r.max() <= 1.0 + 1e-6
    # uniform density: E[r^2] = 1/2
    assert abs((r**2).mean() - 0.5) < 0.01


def test_power_heuristic_matches_formula():
    f, g = jnp.array([1.0, 2.0, 0.0]), jnp.array([1.0, 1.0, 0.0])
    w = np.asarray(s.power_heuristic(1, f, 1, g))
    np.testing.assert_allclose(w[:2], [0.5, 4.0 / 5.0], atol=1e-6)
    assert w[2] == 0.0  # both pdfs zero -> no NaN, weight 0


def test_power_heuristic_partition_of_unity():
    f = jnp.array([0.3, 1.5, 7.0])
    g = jnp.array([0.9, 0.2, 7.0])
    w1 = np.asarray(s.power_heuristic(1, f, 1, g))
    w2 = np.asarray(s.power_heuristic(1, g, 1, f))
    np.testing.assert_allclose(w1 + w2, 1.0, atol=1e-6)
