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
    t, tid, u, v = intersect_dense_pallas(tri_geo.T, ro, rd, interpret=True)

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
    occ = occluded_dense_pallas(tri_geo.T, ro, rd, interpret=True)
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


# ---------------------------------------------------------------------------
# Leaf-table traversal kernel (ops/pallas/traversal_kernel.py)
# ---------------------------------------------------------------------------


def _leaf_setup(n_tris=500, seed=7, max_leaf=4):
    from mc_path_tracer_tpu.ops import bvh as bvh_mod
    from mc_path_tracer_tpu.ops.pallas.traversal_kernel import build_leaf_table
    from tests.test_intersect import random_scene

    tris = random_scene(n=n_tris, seed=seed)
    _, wide, rtris = bvh_mod.build_accel(tris, max_leaf=max_leaf)
    table = build_leaf_table(wide)
    assert table is not None
    return tris, wide, rtris, table


def test_leaf_table_covers_all_triangles():
    from mc_path_tracer_tpu.ops import wide_bvh

    tris, wide, rtris, table = _leaf_setup(n_tris=300, seed=11)
    rows = np.asarray(table.rows)
    covered = np.zeros(300, np.int32)
    for r in rows:
        f = int(r[wide_bvh._META_COMP, 1])
        c = int(r[wide_bvh._META_COMP, 2])
        covered[f : f + c] += 1
    assert (covered == 1).all()
    # AABBs contain their triangles
    boxes = np.asarray(table.boxes_t)
    for li, r in enumerate(rows):
        c = int(r[wide_bvh._META_COMP, 2])
        v0 = r[0:3, :c].T
        p1 = v0 + r[3:6, :c].T
        p2 = v0 + r[6:9, :c].T
        pts = np.concatenate([v0, p1, p2], axis=0)
        assert (pts >= boxes[0:3, li][None, :] - 1e-4).all()
        assert (pts <= boxes[3:6, li][None, :] + 1e-4).all()


def test_pallas_traversal_matches_brute():
    from mc_path_tracer_tpu.ops.intersect import intersect_brute
    from mc_path_tracer_tpu.ops.pallas.traversal_kernel import intersect_pallas
    from tests.test_intersect import random_rays

    tris, wide, rtris, table = _leaf_setup(n_tris=500, seed=7)
    ro, rd = random_rays(n=600, seed=8)  # exercises ray padding (600 % 512)
    ref = intersect_brute(tris, ro, rd)
    out = intersect_pallas(table, rtris, ro, rd, interpret=True)
    np.testing.assert_array_equal(np.asarray(out.hit), np.asarray(ref.hit))
    m = np.asarray(ref.hit)
    np.testing.assert_allclose(
        np.asarray(out.t)[m], np.asarray(ref.t)[m], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.position)[m], np.asarray(ref.position)[m], atol=1e-4
    )


def test_sort_perm_semantics():
    """_sort_perm's permutation pinned against a NumPy reference: stage 1
    stable by (octant, dead last), stage 2 stable within each dispatch
    block by the 128-bin fine direction key; perm/inv mutual inverses;
    dead lanes grouped into tail blocks."""
    from mc_path_tracer_tpu.ops.pallas.traversal_kernel import _sort_perm

    rng = np.random.default_rng(5)
    for r, block in ((8192, 2048), (2048, 2048), (1000, None),
                     (6144, 2048)):
        rd = rng.normal(size=(r, 3)).astype(np.float32)
        rd /= np.linalg.norm(rd, axis=1, keepdims=True)
        mask = rng.random(r) > 0.3
        perm, inv = _sort_perm(jnp.asarray(rd), jnp.asarray(mask),
                               block=block)
        perm, inv = np.asarray(perm), np.asarray(inv)
        ar = np.arange(r)
        assert (np.sort(perm) == ar).all()
        assert (perm[inv] == ar).all() and (inv[perm] == ar).all()
        octant = (rd[:, 0] > 0) * 4 + (rd[:, 1] > 0) * 2 + (rd[:, 2] > 0)
        key = np.where(mask, octant, 8)
        p1 = np.argsort(key, kind="stable")
        if block is not None and r > block:
            a = np.abs(rd[p1])
            s = np.maximum(a.sum(1), 1e-20)
            u = np.clip((4 * a[:, 0] / s).astype(np.int32), 0, 3)
            v = np.clip((4 * a[:, 1] / s).astype(np.int32), 0, 3)
            octant_s = ((rd[p1, 0] > 0) * 4 + (rd[p1, 1] > 0) * 2
                        + (rd[p1, 2] > 0))
            fb = octant_s * 16 + u * 4 + v
            blk = ar // block
            p1 = p1[np.argsort(blk * 129 + fb, kind="stable")]
        np.testing.assert_array_equal(perm, p1)
        # dead lanes group into tail blocks (stage 2 reorders within the
        # single live/dead boundary block)
        n_live = int(mask.sum())
        tail_start = n_live if block is None else min(
            -(-n_live // block) * block, r
        )
        assert not mask[perm][tail_start:].any()


def test_merged_leaf_widths_match_brute():
    """Wide leaf rows (256/512 lanes = 2/4 merged 128-tri leaves, chunk-
    aligned with per-chunk bases) must agree with brute force for both
    closest-hit (incl. winner tri via the per-chunk base select) and
    bounded any-hit.  PROFILE_r05: per-visit fixed cost dominates the
    arena walk, so wider rows cut visit count at the same table bytes."""
    from mc_path_tracer_tpu.ops import bvh as bvh_mod
    from mc_path_tracer_tpu.ops.intersect import intersect_brute
    from mc_path_tracer_tpu.ops.pallas import traversal_kernel as tk
    from tests.test_intersect import random_rays, random_scene

    tris = random_scene(n=400, seed=33)
    _, wide, rtris = bvh_mod.build_accel(tris, max_leaf=4)
    ro, rd = random_rays(n=300, seed=34)
    ref = intersect_brute(tris, ro, rd)
    m = np.asarray(ref.hit)
    t_max = jnp.where(ref.hit, ref.t * 1.5, 2.0)
    ref_occ = m & (np.asarray(ref.t) <= np.asarray(t_max))
    for w in (256, 512):
        table = tk.build_leaf_table(wide, width=w)
        assert table is not None and table.width == w
        assert table.base.shape[1] == w // 128
        out = tk.intersect_pallas(table, rtris, ro, rd, interpret=True)
        np.testing.assert_array_equal(np.asarray(out.hit), m)
        np.testing.assert_allclose(
            np.asarray(out.t)[m], np.asarray(ref.t)[m], rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out.position)[m], np.asarray(ref.position)[m],
            atol=1e-4,
        )
        occ = tk.occluded_pallas(table, ro, rd, t_max=t_max, interpret=True)
        np.testing.assert_array_equal(np.asarray(occ), ref_occ)


def test_pallas_shading_attrs_and_miss_finiteness():
    """The winner's normal/uv agree with brute force on hit lanes, and EVERY
    Hit field is finite on miss/masked lanes (dead-lane origins ~1e32 made
    _winner_uvt overflow u/v to inf and _shade_attrs emit NaN normals that
    poisoned next-bounce ray origins — advisor r2 high finding)."""
    from mc_path_tracer_tpu.ops.intersect import intersect_brute
    from mc_path_tracer_tpu.ops.pallas.traversal_kernel import intersect_pallas
    from tests.test_intersect import random_rays

    tris, wide, rtris, table = _leaf_setup(n_tris=400, seed=21)
    ro, rd = random_rays(n=512, seed=22)
    # half the lanes are masked AND carry typical dead-lane miss positions
    mask = jnp.arange(512) % 2 == 0
    big = 1e32
    ro = jnp.where(mask[:, None], ro, ro + big * rd)
    out = intersect_pallas(table, rtris, ro, rd, mask=mask, interpret=True)
    ref = intersect_brute(tris, ro, rd)
    m = np.asarray(out.hit)
    np.testing.assert_allclose(
        np.asarray(out.normal)[m], np.asarray(ref.normal)[m], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.uv)[m], np.asarray(ref.uv)[m], atol=1e-4
    )
    for name in ("t", "position", "normal", "uv"):
        field = np.asarray(getattr(out, name))
        assert np.isfinite(field).all(), f"non-finite {name} on miss lanes"


def test_pallas_anyhit_matches_brute():
    from mc_path_tracer_tpu.ops.intersect import occluded_brute
    from mc_path_tracer_tpu.ops.pallas.traversal_kernel import occluded_pallas
    from tests.test_intersect import random_rays

    tris, wide, rtris, table = _leaf_setup(n_tris=400, seed=9)
    ro, rd = random_rays(n=512, seed=10)
    ref = occluded_brute(tris, ro, rd)
    out = occluded_pallas(table, ro, rd, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_pallas_anyhit_t_max_and_mask():
    from mc_path_tracer_tpu.ops.intersect import occluded_brute
    from mc_path_tracer_tpu.ops.pallas.traversal_kernel import occluded_pallas
    from tests.test_intersect import random_rays

    tris, wide, rtris, table = _leaf_setup(n_tris=300, seed=13)
    ro, rd = random_rays(n=512, seed=14)
    rng = np.random.default_rng(15)
    t_max = jnp.asarray(rng.uniform(0.5, 4.0, size=512).astype(np.float32))
    mask = jnp.asarray(rng.random(512) < 0.7)
    ref = occluded_brute(tris, ro, rd, t_max=t_max) & mask
    out = occluded_pallas(table, ro, rd, mask=mask, t_max=t_max, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_pallas_traversal_mask_skips_rays():
    from mc_path_tracer_tpu.ops.intersect import intersect_brute
    from mc_path_tracer_tpu.ops.pallas.traversal_kernel import intersect_pallas
    from tests.test_intersect import random_rays

    tris, wide, rtris, table = _leaf_setup(n_tris=200, seed=17)
    ro, rd = random_rays(n=512, seed=18)
    mask = jnp.arange(512) % 2 == 0
    out = intersect_pallas(table, rtris, ro, rd, mask=mask, interpret=True)
    assert not np.asarray(out.hit)[1::2].any()
    ref = intersect_brute(tris, ro, rd)
    np.testing.assert_array_equal(
        np.asarray(out.hit)[::2], np.asarray(ref.hit)[::2]
    )


def _small_render_scene():
    from mc_path_tracer_tpu.models.primitives import plane, uv_sphere
    from mc_path_tracer_tpu.models.scene import Scene

    s = Scene()
    s.set_environment_color((0.4, 0.5, 0.7), ls=1.0)
    s.add_directional_light((0.3, 1.0, 0.2), color=(1.0, 0.9, 0.8), ls=2.0)
    m0 = s.add_material(albedo=(0.8, 0.3, 0.2), roughness=0.4)
    p, n, uv, idx = uv_sphere(0.8, center=(0, 0.8, 0), rings=8, segments=12)
    s.add_mesh(p, idx, normals=n, uvs=uv, material_id=m0)
    m1 = s.add_material(albedo=(0.6, 0.6, 0.6), roughness=0.9)
    p, n, uv, idx = plane(6.0)
    s.add_mesh(p, idx, normals=n, uvs=uv, material_id=m1)
    return s


def _small_camera():
    from mc_path_tracer_tpu.models.camera import PerspectiveCamera

    return PerspectiveCamera(
        position=np.array([0.0, 1.2, 3.0]),
        target=np.array([0.0, 0.6, 0.0]),
        fov_deg=50.0,
    )


def test_integrator_pallas_accel_matches_wide():
    """End-to-end radiance through the Pallas leaf-traversal route equals the
    XLA wide route (same hits -> same estimator) on an 8x8 frame."""
    from mc_path_tracer_tpu.models.integrator import RenderConfig, render

    scene = _small_render_scene()
    sd = scene.build()
    assert sd.leaf is not None
    cam = _small_camera()
    img_p = render(sd, cam, 8, 8, RenderConfig(spp=2, max_depth=3, accel="pallas"))
    img_w = render(sd, cam, 8, 8, RenderConfig(spp=2, max_depth=3, accel="wide"))
    np.testing.assert_allclose(
        np.asarray(img_p.ld), np.asarray(img_w.ld), rtol=1e-4, atol=1e-5
    )


def test_integrator_dense_accel_matches_wide():
    """The dense Pallas route (tiny scenes) is estimator-equivalent too."""
    from mc_path_tracer_tpu.models.integrator import RenderConfig, render

    scene = _small_render_scene()
    sd = scene.build()
    assert sd.tris.num_triangles <= 2048
    cam = _small_camera()
    img_d = render(sd, cam, 8, 8, RenderConfig(spp=2, max_depth=3, accel="dense"))
    img_w = render(sd, cam, 8, 8, RenderConfig(spp=2, max_depth=3, accel="wide"))
    np.testing.assert_allclose(
        np.asarray(img_d.ld), np.asarray(img_w.ld), rtol=1e-4, atol=1e-5
    )


def test_pallas_stream_traversal_matches_resident():
    """The HBM-streaming phase-2 variant (rows in ANY memory space, 2-slot
    DMA ring driven by the SMEM worklist) returns bit-identical results to
    the VMEM-resident kernel, closest AND any-hit, including early-break
    drains (suffix-min break leaves a prefetch in flight)."""
    from mc_path_tracer_tpu.ops.pallas.traversal_kernel import _traverse
    from tests.test_intersect import random_rays

    tris, wide, rtris, table = _leaf_setup(n_tris=700, seed=31)
    ro, rd = random_rays(n=640, seed=32)
    # like-for-like: both sides run the UNION kernel (r5's auto route sends
    # resident tables to the arena kernel, whose packed-argmin t carries
    # lane bits in the low mantissa — bit-equality only holds within one
    # kernel design; arena-vs-oracle agreement is tested separately)
    t_r, id_r = _traverse(table, ro, rd, False, None, None, True,
                          stream=False, mode="union")
    t_s, id_s = _traverse(table, ro, rd, False, None, None, True,
                          stream=True, mode="union")
    np.testing.assert_array_equal(np.asarray(id_r), np.asarray(id_s))
    np.testing.assert_array_equal(np.asarray(t_r), np.asarray(t_s))

    occ_r = _traverse(table, ro, rd, True, None, None, True, stream=False,
                      mode="union")
    occ_s = _traverse(table, ro, rd, True, None, None, True, stream=True,
                      mode="union")
    np.testing.assert_array_equal(np.asarray(occ_r), np.asarray(occ_s))


def test_leaf_table_beyond_vmem_budget_streams():
    """Tables above MAX_LEAVES (the VMEM budget) but under the stream cap
    still build, and _traverse auto-selects streaming for them."""
    from mc_path_tracer_tpu.ops.pallas import traversal_kernel as tk

    tris, wide, rtris, table = _leaf_setup(n_tris=900, seed=41, max_leaf=2)
    # simulate a tiny VMEM budget so this table is "too big"
    old = tk.MAX_LEAVES
    try:
        tk.MAX_LEAVES = 1
        from tests.test_intersect import random_rays

        ro, rd = random_rays(n=256, seed=42)
        t_s, id_s = tk._traverse(table, ro, rd, False, None, None, True)
        t_r, id_r = tk._traverse(table, ro, rd, False, None, None, True,
                                 stream=False)
        np.testing.assert_array_equal(np.asarray(id_r), np.asarray(id_s))
    finally:
        tk.MAX_LEAVES = old


def test_paged_worklist_matches_brute_multi_page():
    """Tables larger than one SMEM page run the phase pipeline per page,
    carrying best-hit / occlusion state across pages (r3 VERDICT #8: the
    1M-triangle ceiling is now paged, not a fallback cliff).  Forced here
    by shrinking the page size so a small scene spans several pages."""
    from mc_path_tracer_tpu.ops import bvh as bvh_mod
    from mc_path_tracer_tpu.ops.intersect import intersect_brute, occluded_brute
    from mc_path_tracer_tpu.ops.pallas import traversal_kernel as tk
    from mc_path_tracer_tpu.ops.wide_bvh import build_wide
    from mc_path_tracer_tpu.utils import native
    from tests.test_intersect import random_rays, random_scene

    tris = random_scene(n=900, seed=51)
    nodes, cols, rtris = bvh_mod._build_binary(tris, 2, native.SAH)
    wide = build_wide(*nodes, cols["v0"], cols["e1"], cols["e2"],
                      leaf_tris=4)  # many small leaves -> several chunks
    old = (tk.PAGE_LEAVES, tk.PAGE_CHUNKS)
    try:
        tk.PAGE_LEAVES, tk.PAGE_CHUNKS = 128, 1  # 1 chunk per page
        table = tk.build_leaf_table(wide)
        assert table is not None
        n_pages = table.cboxes_t.shape[1] // 128
        assert n_pages >= 2, f"scene spans only {n_pages} page(s)"
        ro, rd = random_rays(n=300, seed=52)
        ref = intersect_brute(tris, ro, rd)
        for stream in (False, True):
            t, tri_id = tk._traverse(table, ro, rd, False, None, None, True,
                                     stream=stream)
            m = np.asarray(ref.hit)
            np.testing.assert_array_equal(np.asarray(tri_id >= 0), m)
            np.testing.assert_allclose(
                np.asarray(t)[m], np.asarray(ref.t)[m], rtol=1e-4, atol=1e-5
            )
            occ = tk._traverse(table, ro, rd, True, None, None, True,
                               stream=stream)
            np.testing.assert_array_equal(
                np.asarray(occ), np.asarray(occluded_brute(tris, ro, rd))
            )
    finally:
        tk.PAGE_LEAVES, tk.PAGE_CHUNKS = old


def test_arena_overflow_fallback_matches_brute():
    """Blocks whose per-subgroup visit lists exceed the SMEM arena fall
    back in-kernel to the ungated union walk (traversal_kernel._fallback).
    Real scenes rarely trigger it (ARENA_PAIRS has ~4-8x headroom over the
    measured distribution), so force it by shrinking the arena to nothing
    and assert closest + any-hit still match brute."""
    from mc_path_tracer_tpu.ops.intersect import intersect_brute, occluded_brute
    from mc_path_tracer_tpu.ops.pallas import traversal_kernel as tk
    from tests.test_intersect import random_rays

    tris, wide, rtris, table = _leaf_setup(n_tris=400, seed=9)
    ro, rd = random_rays(n=300, seed=10)
    old = tk.ARENA_PAIRS
    tk.ARENA_PAIRS = 4   # every non-empty block overflows
    try:
        out = tk.intersect_pallas(table, rtris, ro, rd, interpret=True)
        occ = tk.occluded_pallas(table, ro, rd, interpret=True)
    finally:
        tk.ARENA_PAIRS = old
    ref = intersect_brute(tris, ro, rd)
    np.testing.assert_array_equal(np.asarray(out.hit), np.asarray(ref.hit))
    m = np.asarray(ref.hit)
    np.testing.assert_allclose(
        np.asarray(out.t)[m], np.asarray(ref.t)[m], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(occ), np.asarray(occluded_brute(tris, ro, rd))
    )
