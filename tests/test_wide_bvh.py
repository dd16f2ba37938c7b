"""Wide (16-ary, inline-leaf) BVH: traversal vs the brute-force oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from mc_path_tracer_tpu.ops import bvh as bvh_mod
from mc_path_tracer_tpu.ops import intersect as isect
from mc_path_tracer_tpu.ops import wide_bvh
from mc_path_tracer_tpu.utils import native
from tests.test_intersect import make_tris, random_rays, random_scene


def _build(tris, method=native.SAH, max_leaf=4):
    return bvh_mod.build_accel(tris, max_leaf=max_leaf, method=method)


@pytest.mark.parametrize("method", [native.SAH, native.MIDDLE, native.LBVH])
def test_wide_matches_brute_force(method):
    tris = random_scene(n=300, seed=7)
    _, wide, rtris = _build(tris, method=method)
    ro, rd = random_rays(n=256, seed=8)
    ref = isect.intersect_brute(tris, ro, rd)
    out = wide_bvh.intersect_wide(wide, rtris, ro, rd)
    np.testing.assert_array_equal(np.asarray(out.hit), np.asarray(ref.hit))
    m = np.asarray(ref.hit)
    np.testing.assert_allclose(
        np.asarray(out.t)[m], np.asarray(ref.t)[m], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.position)[m], np.asarray(ref.position)[m], atol=1e-4
    )


def test_wide_any_hit_matches_brute_force():
    tris = random_scene(n=220, seed=9)
    _, wide, rtris = _build(tris)
    ro, rd = random_rays(n=256, seed=10)
    ref = isect.occluded_brute(tris, ro, rd)
    out = wide_bvh.occluded_wide(wide, ro, rd)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_wide_any_hit_t_max():
    """Bounded shadow rays: a blocker beyond t_max does not occlude."""
    tris = make_tris([[-1, -1, 0]], [[1, -1, 0]], [[0, 1, 0]])
    _, wide, rtris = _build(tris)
    ro = jnp.array([[0.0, 0.0, 2.0], [0.0, 0.0, 2.0]])
    rd = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    t_max = jnp.array([1.0, 3.0])  # hit at t=2
    out = wide_bvh.occluded_wide(wide, ro, rd, t_max=t_max)
    assert not bool(out[0]) and bool(out[1])


def test_wide_mask_skips_rays():
    tris = random_scene(n=64, seed=11)
    _, wide, rtris = _build(tris)
    ro, rd = random_rays(n=32, seed=12)
    mask = jnp.arange(32) % 2 == 0
    out = wide_bvh.intersect_wide(wide, rtris, ro, rd, mask=mask)
    assert not np.asarray(out.hit)[~np.asarray(mask)].any()
    ref = isect.intersect_brute(tris, ro, rd)
    np.testing.assert_array_equal(
        np.asarray(out.hit)[::2], np.asarray(ref.hit)[::2]
    )


def test_wide_single_leaf_scene():
    """A scene below the leaf size builds a one-row (root=leaf) table."""
    tris = random_scene(n=10, seed=13)
    _, wide, rtris = _build(tris)
    assert wide.num_rows == 1 and wide.depth == 1
    ro, rd = random_rays(n=64, seed=14)
    ref = isect.intersect_brute(tris, ro, rd)
    out = wide_bvh.intersect_wide(wide, rtris, ro, rd)
    np.testing.assert_array_equal(np.asarray(out.hit), np.asarray(ref.hit))


def test_wide_leaf_coverage():
    """Every triangle appears in exactly one leaf row range."""
    tris = random_scene(n=137, seed=15)
    _, wide, _ = _build(tris)
    rows = np.asarray(wide.rows)
    covered = np.zeros(137, np.int32)
    for r in rows:
        if r[wide_bvh._META_COMP, 0] > 0.5:  # leaf row
            f = int(r[wide_bvh._META_COMP, 1])
            c = int(r[wide_bvh._META_COMP, 2])
            assert 0 < c <= wide_bvh.LEAF_TRIS
            covered[f : f + c] += 1
    assert (covered == 1).all()


def test_shade_attrs_packed_matches_unpacked():
    """The packed attrs row reproduces the per-array interpolation path."""
    tris = random_scene(n=150, seed=16)
    _, wide, rtris = _build(tris)
    ro, rd = random_rays(n=128, seed=17)
    out = wide_bvh.intersect_wide(wide, rtris, ro, rd)
    out_unpacked = wide_bvh.intersect_wide(
        wide, rtris._replace(attrs=None), ro, rd
    )
    np.testing.assert_allclose(
        np.asarray(out.normal), np.asarray(out_unpacked.normal), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.uv), np.asarray(out_unpacked.uv), atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(out.material_id), np.asarray(out_unpacked.material_id)
    )


def test_wide_rescue_path_matches():
    """Batches >= 64k rays take the straggler-rescue path (phase 1 + compact
    tail restart + fallback); results must equal the single-phase oracle."""
    import jax.numpy as jnp
    from mc_path_tracer_tpu.ops import wide_bvh as wb

    tris = random_scene(n=400, seed=21)
    bvh, wide, rtris = _build(tris)
    n = 4 * wb.RESCUE_LANES  # cutoff: rescue engages at this size
    ro, rd = random_rays(n=n, seed=22)
    out = wb.intersect_wide(wide, rtris, ro, rd)
    ref = isect.intersect_bvh(bvh, rtris, ro, rd)
    np.testing.assert_array_equal(np.asarray(out.hit), np.asarray(ref.hit))
    m = np.asarray(ref.hit)
    np.testing.assert_allclose(
        np.asarray(out.t)[m], np.asarray(ref.t)[m], rtol=1e-4, atol=1e-5
    )
    occ = wb.occluded_wide(wide, ro, rd)
    occ_ref = isect.occluded_bvh(bvh, rtris, ro, rd)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(occ_ref))


def test_wide_low_occupancy_route_matches():
    """Mostly-masked big batches take the compacted small route."""
    from mc_path_tracer_tpu.ops import wide_bvh as wb

    tris = random_scene(n=300, seed=31)
    bvh, wide, rtris = _build(tris)
    n = 4 * wb.RESCUE_LANES
    ro, rd = random_rays(n=n, seed=32)
    mask = (np.arange(n) % 16) == 0  # ~6% active -> small route
    mask_j = jnp.asarray(mask)
    out = wb.intersect_wide(wide, rtris, ro, rd, mask=mask_j)
    ref = isect.intersect_bvh(bvh, rtris, ro, rd, mask=mask_j)
    np.testing.assert_array_equal(np.asarray(out.hit), np.asarray(ref.hit))
    m = np.asarray(ref.hit)
    np.testing.assert_allclose(
        np.asarray(out.t)[m], np.asarray(ref.t)[m], rtol=1e-4, atol=1e-5
    )
    assert not np.asarray(out.hit)[~mask].any()


def test_wide_full_16_node_back_to_front():
    """Regression (advisor round-1 high): a full 16-child inner node whose
    near-to-far rank order is the reverse of slot order sets bit 31 of the
    packed trail; arithmetic (sign-extending) shifts then corrupt the
    remaining nibbles so children ranked >= 9 were never visited.

    Hand-packed table: root inner node with 16 leaf children, slot k's AABB
    at z in [16-k, 17-k] (slot 15 nearest -> rank r consumes slot 15-r; the
    rank-7 child is slot 8, setting bit 31).  Only slot 3 (rank 12, visited
    after the corruption point) holds a triangle on the ray; every other
    leaf's triangle is far off-axis.  The buggy traversal misses it."""
    rows = np.zeros((17, wide_bvh.N_COMP, wide_bvh.LANES), np.float32)
    # root inner row: children base=1, count=16
    for k in range(16):
        rows[0, 0:3, k] = (-2.0, -2.0, 16.0 - k)
        rows[0, 3:6, k] = (2.0, 2.0, 17.0 - k)
    rows[0, wide_bvh._META_COMP, 0] = 0.0
    rows[0, wide_bvh._META_COMP, 1] = 1.0
    rows[0, wide_bvh._META_COMP, 2] = 16.0
    # leaf rows: one triangle each (lane 0), facing -z (passes backface cull
    # for a +z ray); only slot 3's triangle lies on the ray
    for k in range(16):
        x0 = -1.0 if k == 3 else 50.0
        z = 16.0 - k + 0.25
        rows[1 + k, 0:3, 0] = (x0, -1.0, z)   # v0
        rows[1 + k, 3:6, 0] = (1.0, 2.0, 0.0)  # e1
        rows[1 + k, 6:9, 0] = (2.0, 0.0, 0.0)  # e2
        rows[1 + k, wide_bvh._META_COMP, 0] = 1.0
        rows[1 + k, wide_bvh._META_COMP, 1] = float(k)  # tri id = slot
        rows[1 + k, wide_bvh._META_COMP, 2] = 1.0
    ro = jnp.array([[0.0, 0.0, 0.0]])
    rd = jnp.array([[0.0, 0.0, 1.0]])
    t, tri_id, u, v = wide_bvh._traverse_wide(
        jnp.asarray(rows), ro, rd, depth=2, any_hit=False
    )
    assert int(tri_id[0]) == 3
    np.testing.assert_allclose(float(t[0]), 13.25, rtol=1e-5)
    occ = wide_bvh._traverse_wide(
        jnp.asarray(rows), ro, rd, depth=2, any_hit=True
    )
    assert bool(occ[0])
