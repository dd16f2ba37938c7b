"""Math-convention parity tests (reference cuda_math/Vector.h)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mc_path_tracer_tpu.ops import math as m


def test_luminance_rec601():
    rgb = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0], [1, 1, 1]])
    np.testing.assert_allclose(
        m.luminance(rgb), [0.299, 0.587, 0.114, 1.0], atol=1e-6
    )


def test_equirect_roundtrip():
    rng = np.random.default_rng(0)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    uv = m.equirect_uv(jnp.asarray(d))
    d2 = m.equirect_dir(uv)
    np.testing.assert_allclose(np.asarray(d2), d, atol=1e-4)


def test_equirect_poles_and_axes():
    # +x axis maps to u=0.5 (atan2(0,1)=0), equator v=0.5
    uv = m.equirect_uv(jnp.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(uv), [0.5, 0.5], atol=1e-6)
    # +y (up) maps to v=0
    uv = m.equirect_uv(jnp.array([0.0, 1.0, 0.0]))
    assert abs(float(uv[1])) < 1e-6


def test_onb_orthonormal():
    rng = np.random.default_rng(1)
    n = rng.normal(size=(128, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    t, b = m.build_onb(jnp.asarray(n))
    np.testing.assert_allclose(np.asarray(m.dot(t, b)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m.dot(t, jnp.asarray(n))), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m.dot(b, jnp.asarray(n))), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m.length(t)), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m.length(b)), 1.0, atol=1e-5)


def test_reflect():
    i = jnp.array([1.0, -1.0, 0.0]) / np.sqrt(2)
    n = jnp.array([0.0, 1.0, 0.0])
    r = m.reflect(i, n)
    np.testing.assert_allclose(np.asarray(r), [1 / np.sqrt(2), 1 / np.sqrt(2), 0], atol=1e-6)


def test_perspective_lookat_unproject():
    # A point straight ahead should project to NDC origin.
    eye = jnp.array([0.0, 0.0, 5.0])
    view = m.look_at(eye, jnp.zeros(3), jnp.array([0.0, 1.0, 0.0]))
    proj = m.perspective(np.deg2rad(60.0), 16 / 9, 0.1, 100.0)
    p = m.transform_point(proj @ view, jnp.array([0.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(p[:2]), [0.0, 0.0], atol=1e-5)
    # depth in [-1, 1]
    assert -1.0 <= float(p[2]) <= 1.0


def test_transform_point_translation():
    t = jnp.eye(4).at[:3, 3].set(jnp.array([1.0, 2.0, 3.0]))
    p = m.transform_point(t, jnp.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]]))
    np.testing.assert_allclose(np.asarray(p), [[1, 2, 3], [2, 3, 4]], atol=1e-6)
