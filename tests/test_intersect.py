"""Intersection and BVH tests: brute-force oracle vs threaded-BVH traversal."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mc_path_tracer_tpu.ops import bvh as bvh_mod
from mc_path_tracer_tpu.ops import intersect as isect
from mc_path_tracer_tpu.utils import native


def make_tris(v0, v1, v2, mat=None):
    v0 = jnp.asarray(v0, jnp.float32)
    v1 = jnp.asarray(v1, jnp.float32)
    v2 = jnp.asarray(v2, jnp.float32)
    e1, e2 = v1 - v0, v2 - v0
    fn = jnp.cross(e1, e2)
    fn = fn / jnp.maximum(jnp.linalg.norm(fn, axis=-1, keepdims=True), 1e-12)
    t = v0.shape[0]
    if mat is None:
        mat = jnp.zeros(t, jnp.int32)
    return isect.TriangleSoA(
        v0=v0, e1=e1, e2=e2,
        n0=fn, n1=fn, n2=fn,
        uv0=jnp.zeros((t, 2)), uv1=jnp.zeros((t, 2)), uv2=jnp.zeros((t, 2)),
        material_id=mat, face_normal=fn,
    )


def single_tri():
    # CCW triangle in the z=0 plane facing +z
    return make_tris(
        [[-1.0, -1.0, 0.0]], [[1.0, -1.0, 0.0]], [[0.0, 1.0, 0.0]]
    )


def test_single_triangle_hit_and_miss():
    tris = single_tri()
    ro = jnp.array([[0.0, 0.0, 2.0], [5.0, 5.0, 2.0]])
    rd = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    h = isect.intersect_brute(tris, ro, rd)
    assert bool(h.hit[0]) and not bool(h.hit[1])
    np.testing.assert_allclose(float(h.t[0]), 2.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h.position[0]), [0, 0, 0], atol=1e-5)


def test_backface_culling():
    """det < K_EPSILON rejects: a ray from behind misses (Triangle.cu TEST_CULL)."""
    tris = single_tri()
    ro = jnp.array([[0.0, 0.0, -2.0]])
    rd = jnp.array([[0.0, 0.0, 1.0]])
    h = isect.intersect_brute(tris, ro, rd)
    assert not bool(h.hit[0])
    assert not bool(isect.occluded_brute(tris, ro, rd)[0])


def test_negative_t_rejected():
    tris = single_tri()
    ro = jnp.array([[0.0, 0.0, -2.0]])
    rd = jnp.array([[0.0, 0.0, -1.0]])  # pointing away, triangle behind
    h = isect.intersect_brute(tris, ro, rd)
    assert not bool(h.hit[0])


def test_barycentric_attr_convention():
    """Attributes interpolate as u*a1 + v*a2 + (1-u-v)*a0 (Triangle.cu:76-79)."""
    tris = single_tri()
    # per-vertex distinct normals to test interpolation
    tris = tris._replace(
        n0=jnp.array([[1.0, 0.0, 0.0]]),
        n1=jnp.array([[0.0, 1.0, 0.0]]),
        n2=jnp.array([[0.0, 0.0, 1.0]]),
        uv0=jnp.array([[0.0, 0.0]]),
        uv1=jnp.array([[1.0, 0.0]]),
        uv2=jnp.array([[0.0, 1.0]]),
    )
    # hit exactly at v2=(0,1,0): expect uv=(0,1) and normal ~ n2
    ro = jnp.array([[0.0, 0.999, 1.0]])
    rd = jnp.array([[0.0, 0.0, -1.0]])
    h = isect.intersect_brute(tris, ro, rd)
    assert bool(h.hit[0])
    assert float(h.uv[0, 1]) > 0.99
    assert float(h.normal[0, 2]) > 0.99


def random_scene(n=200, seed=0):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-2, 2, size=(n, 3)).astype(np.float32)
    d1 = rng.normal(scale=0.3, size=(n, 3)).astype(np.float32)
    d2 = rng.normal(scale=0.3, size=(n, 3)).astype(np.float32)
    return make_tris(c, c + d1, c + d2, mat=jnp.arange(n, dtype=jnp.int32) % 5)


def random_rays(n=128, seed=1):
    rng = np.random.default_rng(seed)
    ro = rng.uniform(-3, 3, size=(n, 3)).astype(np.float32)
    rd = rng.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    return jnp.asarray(ro), jnp.asarray(rd)


@pytest.mark.parametrize("method", [native.SAH, native.MIDDLE, native.EQUAL_COUNTS, native.LBVH])
def test_bvh_matches_brute_force(method):
    tris = random_scene()
    bvh, rtris = bvh_mod.build_bvh(tris, max_leaf=4, method=method)
    ro, rd = random_rays()
    ref = isect.intersect_brute(tris, ro, rd)
    out = isect.intersect_bvh(bvh, rtris, ro, rd)
    np.testing.assert_array_equal(np.asarray(out.hit), np.asarray(ref.hit))
    m = np.asarray(ref.hit)
    np.testing.assert_allclose(
        np.asarray(out.t)[m], np.asarray(ref.t)[m], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.position)[m], np.asarray(ref.position)[m], atol=1e-4
    )


def test_bvh_any_hit_matches_brute_force():
    tris = random_scene(n=150, seed=3)
    bvh, rtris = bvh_mod.build_bvh(tris, max_leaf=4)
    ro, rd = random_rays(n=256, seed=4)
    ref = isect.occluded_brute(tris, ro, rd)
    out = isect.occluded_bvh(bvh, rtris, ro, rd)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_bvh_structure_valid():
    tris = random_scene(n=97, seed=5)
    bvh, rtris = bvh_mod.build_bvh(tris, max_leaf=4)
    n = bvh.num_nodes
    skip = np.asarray(bvh.skip)
    count = np.asarray(bvh.count)
    first = np.asarray(bvh.first)
    assert np.all(skip > np.arange(n))
    assert np.all(skip <= n)
    # leaves cover every triangle exactly once
    covered = np.zeros(tris.num_triangles, bool)
    for i in range(n):
        if count[i] > 0:
            assert count[i] <= 4
            covered[first[i] : first[i] + count[i]] = True
    assert covered.all()


def test_native_builder_available():
    """The C++ builder should compile and load in this environment."""
    assert native.load_native() is not None
