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
