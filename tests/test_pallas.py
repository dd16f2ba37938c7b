"""Pallas kernel tests (interpret mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from mc_path_tracer_tpu.ops import tonemap
from mc_path_tracer_tpu.ops.pallas.intersect_kernel import (
    intersect_dense_pallas,
    occluded_dense_pallas,
)
from mc_path_tracer_tpu.ops.pallas.tonemap_kernel import tonemap_pallas


def test_tonemap_kernel_matches_reference_ops():
    rng = np.random.default_rng(0)
    ld = jnp.asarray(rng.uniform(0, 10, size=(13, 37, 3)).astype(np.float32))
    samples = jnp.asarray(rng.integers(1, 9, size=(13, 37)).astype(np.float32))
    got = np.asarray(tonemap_pallas(ld, samples, 1.7, interpret=True))
    want = np.asarray(tonemap.quantize(tonemap.reinhard(ld, samples, 1.7)))
    np.testing.assert_array_equal(got, want)


def _random_scene(n=100, seed=0):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-2, 2, size=(n, 3)).astype(np.float32)
    d1 = rng.normal(scale=0.4, size=(n, 3)).astype(np.float32)
    d2 = rng.normal(scale=0.4, size=(n, 3)).astype(np.float32)
    tri_geo = np.concatenate([c, d1, d2], axis=1)
    return jnp.asarray(tri_geo)


def _random_rays(n=64, seed=1):
    rng = np.random.default_rng(seed)
    ro = rng.uniform(-3, 3, size=(n, 3)).astype(np.float32)
    rd = rng.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    return jnp.asarray(ro), jnp.asarray(rd)


def test_dense_intersect_matches_brute():
    from mc_path_tracer_tpu.ops.intersect import TriangleSoA, intersect_brute

    tri_geo = _random_scene()
    ro, rd = _random_rays()
    t, tid, u, v = intersect_dense_pallas(tri_geo, ro, rd, interpret=True)

    n = tri_geo.shape[0]
    zeros3 = jnp.zeros((n, 3))
    zeros2 = jnp.zeros((n, 2))
    tris = TriangleSoA(
        v0=tri_geo[:, 0:3], e1=tri_geo[:, 3:6], e2=tri_geo[:, 6:9],
        n0=zeros3, n1=zeros3, n2=zeros3, uv0=zeros2, uv1=zeros2, uv2=zeros2,
        material_id=jnp.zeros(n, jnp.int32), face_normal=zeros3,
    )
    ref = intersect_brute(tris, ro, rd)
    np.testing.assert_array_equal(np.asarray(tid >= 0), np.asarray(ref.hit))
    m = np.asarray(ref.hit)
    np.testing.assert_allclose(np.asarray(t)[m], np.asarray(ref.t)[m], rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(tid)[m], np.asarray(ref.tri_id)[m])


def test_dense_anyhit_matches_brute():
    from mc_path_tracer_tpu.ops.intersect import TriangleSoA, occluded_brute

    tri_geo = _random_scene(n=77, seed=3)
    ro, rd = _random_rays(n=96, seed=4)
    occ = occluded_dense_pallas(tri_geo, ro, rd, interpret=True)
    n = tri_geo.shape[0]
    zeros3 = jnp.zeros((n, 3))
    zeros2 = jnp.zeros((n, 2))
    tris = TriangleSoA(
        v0=tri_geo[:, 0:3], e1=tri_geo[:, 3:6], e2=tri_geo[:, 6:9],
        n0=zeros3, n1=zeros3, n2=zeros3, uv0=zeros2, uv1=zeros2, uv2=zeros2,
        material_id=jnp.zeros(n, jnp.int32), face_normal=zeros3,
    )
    ref = occluded_brute(tris, ro, rd)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(ref))
