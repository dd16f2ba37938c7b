"""Pallas TPU traversal kernel over the wide-BVH leaf table.

This is the make-or-break Mrays/s kernel (SURVEY.md §7 "hard parts"): the
XLA wide-BVH traversal (ops/wide_bvh.py) is bound by HBM gather bandwidth —
every visited node is a fresh 5 KB row gather per ray.  Here rays are
processed in RAY_BLOCK-ray blocks with *per-block scalar control flow*,
which XLA cannot express but Pallas can.  Everything happens in ONE kernel
per block (measured: XLA versions of the cull phase cost 50-100x more than
the same math on-chip — 52 ms for the slab product, 45 ms for a [128, 640]
argsort — and a strided [·, L, 8] schedule DMA costs ~270 us/block, so
nothing is precomputed outside):

  phase -1 (vector): slab-test the block against the 128-leaf cluster
     AABBs so phase 0 runs only for touched chunks (O(touched), not O(L)).
  phase 0 (vector): slab-test the block's rays against each touched
     chunk's leaf AABBs (boxes are VMEM-resident, component-major), reduce
     to the block-min entry distance per leaf + a per-leaf bitmask of
     touching SUB_BLOCK-ray subgroups.
  phase 1 (vector histogram + scalar placement): counting-sort the active
     leaves into the SMEM worklist in near-to-far order of block-min entry
     distance; a backward sweep then writes the suffix-min oracle.
  phase 2: walk the worklist.  Each visit is ONE dynamic VMEM row slice
     ([10, 128] leaf: 128 inline triangles, component-major) plus a direct
     [SUB_BLOCK, 128] Moller-Trumbore on the VPU per touching, unresolved
     subgroup — no gathers, no per-lane divergence.  The loop BREAKS when
     the suffix-min exceeds every live ray's best hit (closest; the vector
     analogue of the reference's near-child-first stack traversal with
     tMax pruning, Triangle.cu:156-200) or when every live ray is occluded
     (any-hit; intersect_shadows, Triangle.cu:204-248).

Semantics match the reference exactly: Moller-Trumbore with backface
culling (det >= K_EPSILON), t >= 0, optional per-ray t_max for bounded
shadow rays (Triangle.cu:19-40, 74, 204-248).

Two phase-2 designs ship (r5, PROFILE_r05.md):
  - ARENA (VMEM-resident tables, the bench/default route): the sorted
    union worklist is further compacted into PER-SUBGROUP worklists in a
    shared SMEM arena, and each subgroup walks only its own near-to-far
    list — statically unrolled subgroups, ARENA_UNROLL visits per loop
    iteration (independent row loads + MTs pipeline), a packed-argmin
    closest epilogue and a per-lane any-hit occlusion accumulator (no
    cross-lane reduce per visit).  Measured vs the union walk: closest
    -29%, any-hit -41% on incoherent bounce rays.
  - UNION (streaming/paged tables): the r4 design — one walk over the
    sorted union list with per-subgroup scalar gates.

Scale: tables up to MAX_LEAVES keep rows VMEM-resident (arena kernel);
beyond that rows stay in HBM and each visit streams its 5 KB row through
a 2-slot DMA ring (the sorted SMEM worklist IS the prefetch schedule);
beyond one SMEM page the phases run per 8192-leaf page with best-hit/
occlusion state carried across pages, up to MAX_LEAVES_PAGED (~8.4M
inline triangles).  Larger scenes fall back to the XLA wide path
(ops/wide_bvh.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mc_path_tracer_tpu.ops.intersect import (
    Hit,
    TriangleSoA,
    _shade_attrs,
    winner_uvt as _winner_uvt,
)
from mc_path_tracer_tpu.ops.math import K_EPSILON, K_HUGE
from mc_path_tracer_tpu.ops.wide_bvh import LANES, N_COMP, _META_COMP, WideBVH

# 2048-ray blocks of 16 x 128-ray subgroups: the big outer block amortizes
# phases -1..1 while per-subgroup visit pruning keeps the MT work tight.
# A/B history on incoherent bounce rays (tools/ab_block.py): r3 closest
# 48.0 (256/256) -> 29.4 ms (1024/64 MXU visits); r4 VPU visits + sorted
# worklist: closest 23.2 (1024/64) -> 21.6 (2048/128), any-hit 37.2 ->
# 35.2; strided bench 533 -> 529 ms/block.  Subgroup pruning itself is
# worth 4x (sub=block measured 93.6 ms).  16 subgroups is also the
# exactness cap for the f32 bitmask rows (sums of 2^s stay integer-exact
# < 2^24).
RAY_BLOCK = 2048
# subgroup width for phase-2 visit pruning (see _make_kernel docstring)
SUB_BLOCK = 128
_FAR = 3e37

# leaf rows resident in VMEM: [L, 10, 128] f32 = L * 5 KB.  Budget 4 MB of
# the 16 MB VMEM for the table — the kernel's other residents (boxes, ray
# blocks, tn/bits matrices, pair buffers, double-buffered I/O staging) plus
# XLA's own scoped allocations need the rest: an 8 MB table (1093-leaf
# config5 scene) compiled to a 17.1 MB scoped allocation and OOMed the
# chip, and a 591-leaf table at a 2048-ray block hit 16.36 MB.  Tables
# over this stream rows from HBM (MAX_LEAVES_STREAM).
LEAF_VMEM_LIMIT = 3 * 1024 * 1024
MAX_LEAVES = LEAF_VMEM_LIMIT // (N_COMP * LANES * 4)

# beyond the VMEM budget the rows stay in HBM and phase 2 double-buffers
# each visited 5 KB leaf row through a 2-slot VMEM ring by async DMA (the
# SMEM worklist IS the prefetch schedule — the extension designed in r2's
# docstring, now implemented).  The SMEM worklist budget bounds one PAGE
# (3 arrays x 4 B per leaf); larger tables run the phase pipeline per
# 8192-leaf page, carrying best-hit / occlusion state across pages, up to
# MAX_LEAVES_PAGED (~8.4M inline triangles).  Ordering note: the counting
# sort is per page, so near-to-far holds within a page only (pages follow
# wide-BVH DFS order, which is itself spatially coherent).
PAGE_LEAVES = 8192
PAGE_CHUNKS = PAGE_LEAVES // LANES
MAX_LEAVES_PAGED = 65536
MAX_LEAVES_STREAM = PAGE_LEAVES  # back-compat alias (single-page cap)

# Leaf-row width for VMEM-resident tables (arena kernel): merging K = W/128
# DFS-adjacent 128-tri leaves into one [10, W] row (chunk-aligned, per-chunk
# base indices) halves/quarters the visit count at the same table bytes.
# PROFILE_r05's A/B law says per-visit FIXED cost dominates the arena walk
# (~73% at sub=64: solving the sub=32/64/128 timings gives ~7.6 fixed vs
# ~2.8 vector units/visit), so wider rows trade cheap vector lanes for the
# expensive per-visit loop machinery.  The r4 "leaf width is optimal"
# argument only ruled out NARROWER leaves.  A/B'd on chip in
# tools/ab_width.py; streaming/paged tables stay at 128 (union kernel).
ARENA_LEAF_W = LANES


@dataclass(frozen=True)
class LeafTable:
    """Flat leaf-only view of the wide BVH for the Pallas traversal.

    rows      [L, 10, W] f32 — leaf rows (v0/e1/e2 component-major,
              comp 9 lane 128j+1 = base triangle index of member chunk j,
              lane 128j+2 = its count; W = 128 or a merged multiple)
    boxes_t   [8, L_pad] f32 — leaf AABBs transposed, component-major
              (rows 0-5 = bmin.xyz / bmax.xyz; rows 6-7 pad)
    base      [L, W/128] f32 — base triangle index per member chunk
              (sublane-major so the kernel can scalar-read it)
    cboxes_t  [8, 128] f32 — cluster AABBs, one per 128-leaf chunk of the
              table (leaves are in wide-BVH DFS order, so consecutive
              leaves are spatially coherent).  Phase -1 culls whole chunks
              against these before any per-leaf slab work — the in-kernel
              stand-in for the reference's inner-node hierarchy pruning
              (Triangle.cu:156-200 near-child-first stack traversal).
    """

    rows: jnp.ndarray
    boxes_t: jnp.ndarray
    base: jnp.ndarray
    cboxes_t: jnp.ndarray

    @property
    def num_leaves(self) -> int:
        return self.rows.shape[0]

    @property
    def width(self) -> int:
        return self.rows.shape[2]

    @property
    def l_pad(self) -> int:
        return self.boxes_t.shape[1]


jax.tree_util.register_dataclass(
    LeafTable, data_fields=["rows", "boxes_t", "base", "cboxes_t"],
    meta_fields=[],
)


def build_leaf_table(
    wide: WideBVH, max_leaves: int = MAX_LEAVES_PAGED,
    width: int | None = LANES,
) -> LeafTable | None:
    """Extract the leaf rows of a WideBVH and their AABBs (host numpy).

    Tables up to MAX_LEAVES traverse fully VMEM-resident; larger ones
    traverse with HBM rows + double-buffered DMA (chosen per dispatch in
    _traverse), paged through SMEM in PAGE_LEAVES batches beyond one page.
    Returns None beyond MAX_LEAVES_PAGED (callers fall back to the XLA
    wide traversal).

    `width` (None = auto): leaf-row width in triangle lanes.  Widths above
    LANES merge K = width/128 DFS-adjacent leaves into one chunk-aligned
    [10, width] row (member j occupies lanes 128j..128j+127; `base` becomes
    [L, K], one base per member chunk) with the union AABB — fewer, fatter
    visits for the arena kernel at identical table bytes.  Auto picks
    ARENA_LEAF_W for resident-sized tables and 128 for streaming/paged
    ones (the union kernel's DMA ring and page machinery are 128-wide)."""
    table = np.asarray(wide.rows)
    is_leaf = table[:, _META_COMP, 0] > 0.5
    rows = table[is_leaf]
    n = rows.shape[0]
    if n == 0 or n > max_leaves:
        return None
    if width is None:
        width = ARENA_LEAF_W if n <= MAX_LEAVES else LANES
    # AABB per leaf from its inline triangles (v0, v0+e1, v0+e2), masking
    # the zero-padded absent lanes by count
    counts = rows[:, _META_COMP, 2].astype(np.int64)
    lane = np.arange(LANES)[None, :]
    present = lane < counts[:, None]
    v0 = rows[:, 0:3, :]
    p1 = v0 + rows[:, 3:6, :]
    p2 = v0 + rows[:, 6:9, :]
    pts = np.stack([v0, p1, p2], axis=0)  # [3, L, 3, 128]
    big = np.where(present[None, :, None, :], pts, np.inf)
    small = np.where(present[None, :, None, :], pts, -np.inf)
    bmin = big.min(axis=(0, 3))   # [L, 3]
    bmax = small.max(axis=(0, 3))
    base = rows[:, _META_COMP, 1:2].astype(np.float32)
    k = width // LANES
    if k > 1:
        lm = -(-n // k)
        pad = lm * k - n
        if pad:
            rows = np.concatenate(
                [rows, np.zeros((pad, N_COMP, LANES), np.float32)], axis=0
            )
            base = np.concatenate(
                [base, np.zeros((pad, 1), np.float32)], axis=0
            )
            bmin = np.concatenate(
                [bmin, np.full((pad, 3), np.inf)], axis=0
            )
            bmax = np.concatenate(
                [bmax, np.full((pad, 3), -np.inf)], axis=0
            )
        # chunk-aligned merge: member j of merged row m is original leaf
        # m*k + j at lanes 128j..128j+127 (zero-padded members carry zero
        # triangles -> det 0 -> culled, and a 0 base that can never win)
        rows = (
            rows.reshape(lm, k, N_COMP, LANES)
            .transpose(0, 2, 1, 3)
            .reshape(lm, N_COMP, width)
        )
        base = base.reshape(lm, k)
        bmin = bmin.reshape(lm, k, 3).min(axis=1)
        bmax = bmax.reshape(lm, k, 3).max(axis=1)
        n = lm
    l_pad = -(-n // 128) * 128
    boxes_t = np.zeros((8, l_pad), np.float32)
    # padding boxes are masked by static lane index in the kernel (an
    # inverted box does NOT fail the slab test); keep them inverted anyway
    boxes_t[0:3, :] = 1.0
    boxes_t[3:6, :] = -1.0
    boxes_t[0:3, :n] = bmin.T
    boxes_t[3:6, :n] = bmax.T
    # cluster AABBs: union of each 128-leaf chunk (DFS-adjacent leaves).
    # One 128-lane column block per 8192-leaf page: page p's chunk cl sits
    # at column p*128 + cl (lanes PAGE_CHUNKS..127 of each block unused).
    # Padding chunks keep inverted boxes; the kernel masks them by static
    # chunk index (an inverted box does NOT fail the slab test).
    n_chunks = l_pad // 128
    n_pages = -(-n_chunks // PAGE_CHUNKS)
    cboxes_t = np.zeros((8, 128 * n_pages), np.float32)
    cboxes_t[0:3, :] = 1.0
    cboxes_t[3:6, :] = -1.0
    for c in range(n_chunks):
        col = (c // PAGE_CHUNKS) * 128 + (c % PAGE_CHUNKS)
        lo = c * 128
        hi = min(n, lo + 128)
        cboxes_t[0:3, col] = bmin[lo:hi].min(axis=0)
        cboxes_t[3:6, col] = bmax[lo:hi].max(axis=0)
    return LeafTable(
        rows=jnp.asarray(rows),
        boxes_t=jnp.asarray(boxes_t),
        base=jnp.asarray(base),
        cboxes_t=jnp.asarray(cboxes_t),
    )


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _mt_leaf(row, ox, oy, oz, dx, dy, dz):
    """[B, 128] Moller-Trumbore of the ray block against one leaf row
    (component form; Triangle.cu:19-40 TEST_CULL semantics)."""
    v0x, v0y, v0z = row[0:1, :], row[1:2, :], row[2:3, :]
    e1x, e1y, e1z = row[3:4, :], row[4:5, :], row[5:6, :]
    e2x, e2y, e2z = row[6:7, :], row[7:8, :], row[8:9, :]
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.reciprocal(jnp.where(jnp.abs(det) > 1e-30, det, 1.0))
    tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
    uu = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    vv = (dx * qx + dy * qy + dz * qz) * inv_det
    tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    valid = (
        (det >= K_EPSILON)
        & (uu >= 0.0) & (uu <= 1.0)
        & (vv >= 0.0) & (uu + vv <= 1.0)
        & (tt >= 0.0)
    )
    return valid, tt, uu, vv


N_BUCKETS = 32

# Per-visit triangle test path: False = direct VPU Moller-Trumbore on the
# [sub, 128] subgroup x leaf pair (35 elementwise ops, no G-matrix
# assembly); True = the r3 F[sub,16] @ G[16,512] MXU factorization.  At
# sub=64 the matmul's K=16 pads to the 128-wide systolic array and its
# HIGHEST-precision f32 decomposition multiplies passes, while the VPU
# form runs ~0.3 us/visit and skips the 26-store G-load — measured faster
# (tools/profile_r04.py); the MXU path is kept for A/B.
VISIT_MXU = False


def _make_kernel(any_hit: bool, n_leaves: int, l_pad: int,
                 stream: bool = False, sub: int = 64):
    """Kernel factory.  `sub` is the subgroup width: phase 0 records, per
    leaf, a bitmask of which `sub`-ray subgroups touch its AABB, and phase 2
    runs the pair matmul + epilogue only for touching, unresolved subgroups
    (measured host-side: a 256-ray block's leaf union is ~73 leaves while
    64-ray subgroup unions are ~31 — most of a visit's lanes are waste).
    Each subgroup also keeps its own closest-hit bound (tsub) so resolved
    subgroups stop paying for stragglers; the block-level suffix-min break
    is unchanged.

    Phase -1 slab-tests the block against the 128-leaf cluster AABBs and
    gates phase 0 per chunk, so per-leaf slab work is O(touched chunks),
    not O(L) — the hierarchy pruning the XLA wide path gets from its inner
    16-ary rows, done block-wise in-kernel.  Phase 1 places active leaves
    into the worklist in near-to-far order of their block-min entry
    distance (counting sort over N_BUCKETS distance buckets): closest-hit
    then breaks at the first bucket beyond every live ray's best hit, and
    any-hit meets near occluders first so the all-occluded exit fires
    early (the vector analogue of near-child-first ordering,
    Triangle.cu:177-186)."""
    n_chunks = l_pad // LANES
    n_pages = -(-n_chunks // PAGE_CHUNKS)

    def kernel(rays_ref, rows_ref, base_ref, boxes_ref, cboxes_ref, out_ref,
               tn_mat, tn_t, bits_mat, bits_t, bk_mat, bk_t, cf_mat, cf_t,
               flags_sm, cflag_sm, n_sm, list_sm, tn_sm, suff_sm, bits_sm,
               off_sm, g_mat, best_a, best_b, tblk_sm, tsub_sm,
               *stream_scratch):
        b = rays_ref.shape[0]
        n_sub = b // sub
        ox, oy, oz = rays_ref[:, 0:1], rays_ref[:, 1:2], rays_ref[:, 2:3]
        dx, dy, dz = rays_ref[:, 3:4], rays_ref[:, 4:5], rays_ref[:, 5:6]
        live = rays_ref[:, 6:7] > 0.5
        t_max = rays_ref[:, 7:8]

        # defaults (also the all-dead fast path: phases run under
        # pl.when(alive) and a block of compacted-dead rays costs nothing)
        if any_hit:
            best_a[:, :] = jnp.zeros((b, 1), jnp.float32)
        else:
            best_a[:, :] = jnp.full((b, 1), K_HUGE, jnp.float32)
            best_b[:, :] = jnp.full((b, 1), -1.0, jnp.float32)
        alive = jnp.max(rays_ref[:, 6:7]) > 0.5

        @pl.when(alive)
        def _phases():
            _kernel_phases(
                rays_ref, rows_ref, base_ref, boxes_ref, cboxes_ref,
                tn_mat, tn_t, bits_mat, bits_t, bk_mat, bk_t, cf_mat, cf_t,
                flags_sm, cflag_sm, n_sm, list_sm, tn_sm, suff_sm, bits_sm,
                off_sm, g_mat, best_a, best_b, tblk_sm, tsub_sm,
                stream_scratch,
                ox, oy, oz, dx, dy, dz, live, t_max, b, n_sub,
            )

        out_ref[:, 0:1] = best_a[:, :]
        if not any_hit:
            out_ref[:, 3:4] = jnp.where(
                best_a[:, :] < K_HUGE, best_b[:, :], -1.0
            )

    def _slab(boxes, sl, ox, oy, oz, ix, iy, iz):
        t0 = (boxes[0:1, sl] - ox) * ix
        t1 = (boxes[3:4, sl] - ox) * ix
        tn = jnp.minimum(t0, t1)
        tf = jnp.maximum(t0, t1)
        t0 = (boxes[1:2, sl] - oy) * iy
        t1 = (boxes[4:5, sl] - oy) * iy
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        t0 = (boxes[2:3, sl] - oz) * iz
        t1 = (boxes[5:6, sl] - oz) * iz
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        return tn, tf

    def _kernel_phases(rays_ref, rows_ref, base_ref, boxes_ref, cboxes_ref,
                       tn_mat, tn_t, bits_mat, bits_t, bk_mat, bk_t,
                       cf_mat, cf_t,
                       flags_sm, cflag_sm, n_sm, list_sm, tn_sm, suff_sm,
                       bits_sm, off_sm, g_mat, best_a, best_b, tblk_sm,
                       tsub_sm, stream_scratch,
                       ox, oy, oz, dx, dy, dz, live, t_max, b, n_sub):
        eps = 1e-12
        ix = jnp.reciprocal(jnp.where(jnp.abs(dx) > eps, dx,
                                      jnp.where(dx >= 0, eps, -eps)))
        iy = jnp.reciprocal(jnp.where(jnp.abs(dy) > eps, dy,
                                      jnp.where(dy >= 0, eps, -eps)))
        iz = jnp.reciprocal(jnp.where(jnp.abs(dz) > eps, dz,
                                      jnp.where(dz >= 0, eps, -eps)))
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        lane_s = jax.lax.broadcasted_iota(jnp.int32, (sub, LANES), 1)

        # ---- setup: per-pair Moller-Trumbore as ONE MXU matmul per
        # subgroup visit.  det, u*det, v*det and t*det are all LINEAR in the
        # per-ray features F = [d, m, o', 1] (m = d x o', o' = o - c
        # re-centred about the block origin centroid c for conditioning):
        #     det     = d . n            n = e2 x e1
        #     u*det   = d . (v0' x e2) - m . e2
        #     v*det   = m . e1 - d . (v0' x e1)
        #     t*det   = o' . w - v0' . w w  = e1 x e2
        # so the [S, 128] pair matrix for one leaf is F[S, 16] @ G[16, 4*128]
        # (coefficients per output block in the lane dim).  The winning
        # lane's u, v are NOT extracted here — the host wrapper re-runs
        # exact single-triangle MT on the winner (intersect_pallas), which
        # keeps the epilogue lean.  Semantics (cull det >= K_EPSILON,
        # 0 <= u, 0 <= v, u + v <= 1, t >= 0) match Triangle.cu:19-40.
        # conditioning centroid: LIVE rays only (dead lanes may carry
        # o + K_HUGE*d miss positions ~1e32 which would wreck the mean),
        # clamped to the scene bounds for rays that are live but far away.
        # Scene bounds come from the cluster boxes: their inverted padding
        # entries (bmin=+1, bmax=-1) are neutral under min/max.
        lv = live.astype(jnp.float32)
        nl = jnp.maximum(jnp.sum(lv), 1.0)
        sb_min = [jnp.float32(_FAR)] * 3
        sb_max = [jnp.float32(-_FAR)] * 3
        for pg in range(n_pages):
            sl = slice(pg * LANES, (pg + 1) * LANES)
            for ax in range(3):
                sb_min[ax] = jnp.minimum(
                    sb_min[ax], jnp.min(cboxes_ref[ax:ax + 1, sl])
                )
                sb_max[ax] = jnp.maximum(
                    sb_max[ax], jnp.max(cboxes_ref[3 + ax:4 + ax, sl])
                )
        # mask with where (NOT ox * lv): a NaN/inf origin in a DEAD lane
        # would survive multiply-by-zero (NaN*0 = NaN) and poison the
        # centroid, silently missing the whole block
        cx = jnp.clip(jnp.sum(jnp.where(live, ox, 0.0)) / nl,
                      sb_min[0], sb_max[0])
        cy = jnp.clip(jnp.sum(jnp.where(live, oy, 0.0)) / nl,
                      sb_min[1], sb_max[1])
        cz = jnp.clip(jnp.sum(jnp.where(live, oz, 0.0)) / nl,
                      sb_min[2], sb_max[2])
        pox, poy, poz = ox - cx, oy - cy, oz - cz
        mx = dy * poz - dz * poy
        my = dz * pox - dx * poz
        mz = dx * poy - dy * pox
        ones = jnp.ones((b, 1), jnp.float32)
        feats = jnp.concatenate(
            [dx, dy, dz, mx, my, mz, pox, poy, poz, ones,
             jnp.zeros((b, 6), jnp.float32)],
            axis=1,
        )
        g_mat[:, :] = jnp.zeros((16, 4 * LANES), jnp.float32)

        # per-subgroup state: closest -> max best-t over the subgroup's
        # live rays (skip/stop bound); any-hit -> 1.0 when every live ray
        # in the subgroup is occluded (done flag).  Subgroups with no live
        # rays start resolved, which is the dead-lane fast path at
        # subgroup granularity.  tblk_sm[0] is the block bound (closest) /
        # the all-occluded flag that also gates later pages (any-hit).
        for s_i in range(n_sub):
            sl_ = slice(s_i * sub, (s_i + 1) * sub)
            if any_hit:
                tsub_sm[s_i] = jnp.min(
                    jnp.where(live[sl_], 0.0, 1.0)
                )
            else:
                tsub_sm[s_i] = jnp.max(
                    jnp.where(live[sl_], K_HUGE, -1.0)
                )
        tblk = tsub_sm[0]
        for s_i in range(1, n_sub):
            if any_hit:
                tblk = jnp.minimum(tblk, tsub_sm[s_i])
            else:
                tblk = jnp.maximum(tblk, tsub_sm[s_i])
        tblk_sm[0] = tblk

        if stream:
            row_buf, dma_sem = stream_scratch

            def _row_dma(i):
                """DMA descriptor for worklist entry i -> ring slot i%2."""
                slot = jax.lax.rem(i, 2)
                return pltpu.make_async_copy(
                    rows_ref.at[list_sm[i]], row_buf.at[slot],
                    dma_sem.at[slot],
                )

        def _load_g(row):
            """Assemble G[16, 512] for one [10, 128] leaf row."""
            v0x, v0y, v0z = row[0:1] - cx, row[1:2] - cy, row[2:3] - cz
            e1x, e1y, e1z = row[3:4], row[4:5], row[5:6]
            e2x, e2y, e2z = row[6:7], row[7:8], row[8:9]
            wx = e1y * e2z - e1z * e2y
            wy = e1z * e2x - e1x * e2z
            wz = e1x * e2y - e1y * e2x
            ax = v0y * e2z - v0z * e2y
            ay = v0z * e2x - v0x * e2z
            az = v0x * e2y - v0y * e2x
            bx = v0y * e1z - v0z * e1y
            by = v0z * e1x - v0x * e1z
            bz = v0x * e1y - v0y * e1x
            c0 = v0x * wx + v0y * wy + v0z * wz
            # det block (lanes 0:128): k = d -> n = -w
            g_mat[0:1, 0:LANES] = -wx
            g_mat[1:2, 0:LANES] = -wy
            g_mat[2:3, 0:LANES] = -wz
            # u*det block: k = d -> v0' x e2 ; k = m -> -e2
            g_mat[0:1, LANES:2 * LANES] = ax
            g_mat[1:2, LANES:2 * LANES] = ay
            g_mat[2:3, LANES:2 * LANES] = az
            g_mat[3:4, LANES:2 * LANES] = -e2x
            g_mat[4:5, LANES:2 * LANES] = -e2y
            g_mat[5:6, LANES:2 * LANES] = -e2z
            # v*det block: k = d -> -(v0' x e1) ; k = m -> e1
            g_mat[0:1, 2 * LANES:3 * LANES] = -bx
            g_mat[1:2, 2 * LANES:3 * LANES] = -by
            g_mat[2:3, 2 * LANES:3 * LANES] = -bz
            g_mat[3:4, 2 * LANES:3 * LANES] = e1x
            g_mat[4:5, 2 * LANES:3 * LANES] = e1y
            g_mat[5:6, 2 * LANES:3 * LANES] = e1z
            # t*det block: k = o' -> w ; k = 1 -> -(v0' . w)
            g_mat[6:7, 3 * LANES:4 * LANES] = wx
            g_mat[7:8, 3 * LANES:4 * LANES] = wy
            g_mat[8:9, 3 * LANES:4 * LANES] = wz
            g_mat[9:10, 3 * LANES:4 * LANES] = -c0

        def _pairs(sl_):
            p = jax.lax.dot_general(
                feats[sl_], g_mat[:, :],
                (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            det = p[:, 0:LANES]
            up = p[:, LANES:2 * LANES]
            vp = p[:, 2 * LANES:3 * LANES]
            tp = p[:, 3 * LANES:4 * LANES]
            valid = (
                (det >= K_EPSILON)
                & (up >= 0.0) & (vp >= 0.0) & (up + vp <= det)
                & (tp >= 0.0) & live[sl_]
            )
            return det, tp, valid

        def _sub_gate(i, s_i):
            bit_ok = jnp.bool_(True) if n_sub == 1 else (
                jax.lax.shift_right_logical(bits_sm[i], s_i) & 1
            ) == 1
            if any_hit:
                return bit_ok & (tsub_sm[s_i] < 0.5)
            return bit_ok & (tn_sm[i] <= tsub_sm[s_i])

        def _page(p):
            """Phases -1..2 for the PAGE_LEAVES-sized leaf page p; best-hit /
            occlusion state (best_a/b, tsub_sm, tblk_sm) carries across
            pages, so page p+1 starts pre-pruned by everything page p
            resolved."""
            base_c = p * PAGE_CHUNKS
            nc_p = min(PAGE_CHUNKS, n_chunks - base_c)

            # ---- phase -1: cull whole 128-leaf chunks against their
            # cluster AABBs (one [B, 128] slab for the whole page), so
            # phase 0 pays per-leaf slab work only for touched chunks
            tn_mat[:, :] = jnp.full((PAGE_CHUNKS, LANES), _FAR, jnp.float32)
            ctn, ctf = _slab(cboxes_ref, slice(p * LANES, (p + 1) * LANES),
                             ox, oy, oz, ix, iy, iz)
            chit = (ctn <= ctf) & (ctf >= 0.0) & live
            if any_hit:
                chit = chit & (ctn <= t_max)
            chit = chit & (lane < nc_p)
            cf_mat[:, :] = jnp.zeros((8, LANES), jnp.float32)
            cf_mat[0:1, :] = jnp.max(jnp.where(chit, 1.0, 0.0), axis=0,
                                     keepdims=True)
            cf_t[:, :] = cf_mat[:, :].T
            for cl in range(nc_p):
                cflag_sm[cl] = (cf_t[cl, 0] > 0.5).astype(jnp.int32)
                flags_sm[cl] = 0

            # ---- phase 0: block-min leaf entry distances + per-leaf
            # subgroup bitmasks, 128 leaves at a time (touched chunks only),
            # written in natural lane layout (NO per-chunk transposes — a
            # (1,128)->(128,1) relayout spans 16 sublane tiles and costs
            # more than the slab)
            for cl in range(nc_p):
                @pl.when(cflag_sm[cl] == 1)
                def _(cl=cl):
                    g = base_c + cl
                    sl = slice(g * LANES, (g + 1) * LANES)
                    tn, tf = _slab(boxes_ref, sl, ox, oy, oz, ix, iy, iz)
                    hit = (tn <= tf) & (tf >= 0.0) & live
                    if any_hit:
                        hit = hit & (tn <= t_max)
                    # padding lanes masked by static index (an inverted
                    # padding box does NOT fail the slab test)
                    n_here = n_leaves - g * LANES
                    if n_here < LANES:
                        hit = hit & (lane < n_here)
                    tnm = jnp.where(hit, jnp.maximum(tn, 0.0), _FAR)
                    tnb = jnp.min(tnm, axis=0, keepdims=True)   # (1, 128)
                    tn_mat[cl:cl + 1, :] = tnb
                    flags_sm[cl] = (jnp.min(tnb) < _FAR).astype(jnp.int32)
                    if n_sub > 1:
                        bits = jnp.zeros((1, LANES), jnp.float32)
                        for s_i in range(n_sub):
                            hs = jnp.max(
                                jnp.where(hit[s_i * sub:(s_i + 1) * sub],
                                          1.0, 0.0),
                                axis=0, keepdims=True,
                            )
                            bits = bits + hs * float(1 << s_i)
                        bits_mat[cl:cl + 1, :] = bits

            # ---- phase 1: near-to-far counting sort of active leaves into
            # the SMEM worklist.  Bucket each leaf's entry distance
            # (vectorized), histogram the buckets (vector reduces),
            # prefix-sum the offsets (scalar, N_BUCKETS), then place
            # (scalar loop).  Inactive leaves quantize to bucket N_BUCKETS,
            # whose region starts at n — their branch-free writes land in
            # the worklist tail and are never read.
            tmin = jnp.min(tn_mat[:, :])
            fin = tn_mat[:, :] < _FAR
            tmax = jnp.max(jnp.where(fin, tn_mat[:, :], -_FAR))
            scale = float(N_BUCKETS) / jnp.maximum(tmax - tmin, 1e-30)
            q = jnp.clip((tn_mat[:, :] - tmin) * scale, 0.0,
                         float(N_BUCKETS - 1))
            bk_mat[:, :] = jnp.where(fin, jnp.floor(q), float(N_BUCKETS))

            # ONE small (PAGE_CHUNKS, 128) -> (128, PAGE_CHUNKS) transpose
            # makes every leaf's entry distance / bucket / subgroup bitmask
            # scalar-readable (dynamic sublane + static lane index)
            tn_t[:, :] = tn_mat[:, :].T
            bk_t[:, :] = bk_mat[:, :].T
            if n_sub > 1:
                bits_t[:, :] = bits_mat[:, :].T

            for k in range(N_BUCKETS):
                off_sm[k + 1] = jnp.sum(
                    (bk_mat[:, :] == float(k)).astype(jnp.float32)
                ).astype(jnp.int32)
            off_sm[0] = 0
            for k in range(N_BUCKETS):
                off_sm[k + 1] = off_sm[k] + off_sm[k + 1]
            n_sm[0] = off_sm[N_BUCKETS]

            for cl in range(nc_p):
                @pl.when(flags_sm[cl] == 1)
                def _(cl=cl):
                    def body(j, _):
                        bkt = bk_t[j, cl].astype(jnp.int32)
                        pos = off_sm[bkt]
                        list_sm[pos] = (base_c + cl) * LANES + j
                        tn_sm[pos] = tn_t[j, cl]
                        if n_sub > 1:
                            bits_sm[pos] = bits_t[j, cl].astype(jnp.int32)
                        off_sm[bkt] = pos + 1
                        return 0

                    jax.lax.fori_loop(0, LANES, body, 0)

            n = n_sm[0]

            if not any_hit:
                # ---- phase 1b: suffix-min of entry distances (break
                # oracle; the sorted order makes it ~monotonic, so the
                # break fires at the first too-far bucket)
                suff_sm[n] = _FAR

                def back(j, m):
                    idx = n - 1 - j
                    m = jnp.minimum(m, tn_sm[idx])
                    suff_sm[idx] = m
                    return m

                jax.lax.fori_loop(0, n, back, jnp.float32(_FAR))

                # ---- phase 2: closest hit over the worklist; per-subgroup
                # visits gated by phase-0 bitmask + the subgroup's bound
                def body(carry):
                    i, _ = carry
                    if stream:
                        # prefetch i+1 while visiting i; the wait must run
                        # even when the visit is skipped (semaphore
                        # bookkeeping)
                        @pl.when(i + 1 < n)
                        def _pref():
                            _row_dma(i + 1).start()

                        _row_dma(i).wait()

                    @pl.when(tn_sm[i] <= tblk_sm[0])
                    def _visit():
                        l = list_sm[i]
                        if stream:
                            row = row_buf[jax.lax.rem(i, 2)]
                        else:
                            row = rows_ref[l]
                        if VISIT_MXU:
                            _load_g(row)
                        for s_i in range(n_sub):
                            @pl.when(_sub_gate(i, s_i))
                            def _sub(s_i=s_i):
                                sl_ = slice(s_i * sub, (s_i + 1) * sub)
                                if VISIT_MXU:
                                    det, tp, valid = _pairs(sl_)
                                    rcp = jnp.reciprocal(
                                        jnp.where(det >= K_EPSILON, det, 1.0)
                                    )
                                    tt = tp * rcp
                                else:
                                    valid, tt, _, _ = _mt_leaf(
                                        row, ox[sl_], oy[sl_], oz[sl_],
                                        dx[sl_], dy[sl_], dz[sl_],
                                    )
                                    valid = valid & live[sl_]
                                t_best = best_a[sl_, :]
                                tmask = jnp.where(
                                    valid & (tt < t_best), tt, K_HUGE
                                )
                                tb = jnp.min(tmask, axis=1, keepdims=True)
                                is_min = (tmask <= tb) & (tmask < K_HUGE)
                                first = jnp.min(
                                    jnp.where(is_min, lane_s, LANES),
                                    axis=1, keepdims=True,
                                )
                                closer = tb < t_best
                                best_a[sl_, :] = jnp.where(
                                    closer, tb, t_best
                                )
                                best_b[sl_, :] = jnp.where(
                                    closer,
                                    base_ref[l, 0]
                                    + first.astype(jnp.float32),
                                    best_b[sl_, :],
                                )
                                tsub_sm[s_i] = jnp.max(
                                    jnp.where(live[sl_], best_a[sl_, :],
                                              -1.0)
                                )
                        tblk = tsub_sm[0]
                        for s_i in range(1, n_sub):
                            tblk = jnp.maximum(tblk, tsub_sm[s_i])
                        tblk_sm[0] = tblk

                    stop = suff_sm[i + 1] > tblk_sm[0]
                    return i + 1, stop

                if stream:
                    @pl.when(n > 0)
                    def _warm():
                        _row_dma(0).start()

                final_i, _ = jax.lax.while_loop(
                    lambda c: (c[0] < n) & jnp.logical_not(c[1]),
                    body, (jnp.int32(0), n == 0),
                )
                if stream:
                    # an early break leaves the prefetched row in flight
                    @pl.when(final_i < n)
                    def _drain():
                        _row_dma(final_i).wait()
            else:
                # ---- phase 2: any hit over the worklist; per-subgroup
                # visits gated by phase-0 bitmask + the subgroup's done
                # flag; exit when every subgroup is fully occluded
                def body(carry):
                    i, _ = carry
                    if stream:
                        @pl.when(i + 1 < n)
                        def _pref():
                            _row_dma(i + 1).start()

                        _row_dma(i).wait()
                        row = row_buf[jax.lax.rem(i, 2)]
                    else:
                        row = rows_ref[list_sm[i]]
                    if VISIT_MXU:
                        _load_g(row)
                    for s_i in range(n_sub):
                        @pl.when(_sub_gate(i, s_i))
                        def _sub(s_i=s_i):
                            sl_ = slice(s_i * sub, (s_i + 1) * sub)
                            if VISIT_MXU:
                                det, tp, valid = _pairs(sl_)
                                valid = valid & (tp <= t_max[sl_] * det)
                            else:
                                valid, tt, _, _ = _mt_leaf(
                                    row, ox[sl_], oy[sl_], oz[sl_],
                                    dx[sl_], dy[sl_], dz[sl_],
                                )
                                valid = (valid & live[sl_]
                                         & (tt <= t_max[sl_]))
                            hit_here = jnp.max(
                                jnp.where(valid, 1.0, 0.0),
                                axis=1, keepdims=True,
                            )
                            best_a[sl_, :] = jnp.maximum(
                                best_a[sl_, :], hit_here
                            )
                            tsub_sm[s_i] = jnp.min(
                                jnp.where(live[sl_], best_a[sl_, :], 1.0)
                            )
                    done = tsub_sm[0]
                    for s_i in range(1, n_sub):
                        done = jnp.minimum(done, tsub_sm[s_i])
                    return i + 1, done >= 0.5

                if stream:
                    @pl.when(n > 0)
                    def _warm():
                        _row_dma(0).start()

                final_i, _ = jax.lax.while_loop(
                    lambda c: (c[0] < n) & jnp.logical_not(c[1]),
                    body, (jnp.int32(0), n == 0),
                )
                if stream:
                    # an early exit leaves the prefetched row in flight
                    @pl.when(final_i < n)
                    def _drain():
                        _row_dma(final_i).wait()
                # refresh the all-occluded flag that gates later pages
                done = tsub_sm[0]
                for s_i in range(1, n_sub):
                    done = jnp.minimum(done, tsub_sm[s_i])
                tblk_sm[0] = done

        for p in range(n_pages):
            if any_hit and p > 0:
                # skip whole later pages once every live ray is occluded
                @pl.when(tblk_sm[0] < 0.5)
                def _gated(p=p):
                    _page(p)
            else:
                _page(p)

    return kernel


# ---------------------------------------------------------------------------
# Arena kernel: per-subgroup compacted worklists (r5)
# ---------------------------------------------------------------------------
#
# The union-worklist kernel above pays, per visited leaf, 16 scalar subgroup
# gates plus a [SUB_BLOCK, 128] MT for every subgroup that touches it — and
# host-side analysis (tools/subgroup_analysis.py) shows the touch sets are
# tiny: a live bounce ray overlaps only ~2.5 leaf AABBs, an 8-ray subgroup
# ~7, a 32-ray subgroup ~17, while the 2048-ray block union is ~240.  The
# arena kernel therefore compacts the sorted union worklist into
# PER-SUBGROUP worklists (a shared SMEM arena carved by prefix-summed touch
# counts), and phase 2 walks each subgroup's own near-to-far list with no
# gates, a [sub, 128] VPU Moller-Trumbore per visit, and a per-subgroup
# early break — cutting phase-2 vector work ~2.6-5x at sub=32..8 (modeled;
# the A/B in tools/ab_block.py measures it).  Resident single-page tables
# only; streaming/paged scenes keep the union kernel above.

# shared arena capacity in (subgroup, leaf) visit pairs; a block whose
# per-subgroup touch lists don't fit falls back in-kernel to an ungated
# full-block walk of the union worklist (rare: the mean is ~1-2k pairs)
ARENA_PAIRS = 8192
# default subgroup width for the arena kernel (A/B'd separately from the
# union kernel's SUB_BLOCK; see PROFILE_r05.md)
ARENA_SUB = 64
# visits per phase-2 loop iteration: row loads + MTs of a group are
# independent and pipeline; break checks amortize over the group
ARENA_UNROLL = 8


def _bit_index(x):
    """Index of the (isolated, power-of-two) bit x in [1, 2^15]: 4-step
    scalar binary search (Mosaic has no ctz)."""
    b = jnp.int32(0)
    c8 = x >= 256
    b = b + jnp.where(c8, 8, 0)
    x = jnp.where(c8, jax.lax.shift_right_logical(x, 8), x)
    c4 = x >= 16
    b = b + jnp.where(c4, 4, 0)
    x = jnp.where(c4, jax.lax.shift_right_logical(x, 4), x)
    c2 = x >= 4
    b = b + jnp.where(c2, 2, 0)
    x = jnp.where(c2, jax.lax.shift_right_logical(x, 2), x)
    return b + jnp.where(x >= 2, 1, 0)


def _make_arena_kernel(any_hit: bool, n_leaves: int, l_pad: int, sub: int,
                       block: int, unroll: int = ARENA_UNROLL,
                       static_row: bool = False, width: int = LANES,
                       stages: int = 3):
    # static_row: DIAGNOSTIC ONLY (tools/ab_block.py) — phase 2 reads row 0
    # instead of the worklist row, isolating the dynamic-row-load cost.
    # Results are wrong; never routed from the public wrappers.
    # stages: DIAGNOSTIC ONLY (tools/phase_cost.py) — 3 = full kernel,
    # 2 = stop after phase 1d (skip the walk), 1 = stop after phase 1
    # (skip arena placement + walk), 0 = defaults only (no phases at
    # all; isolates dispatch + I/O staging).  Results are wrong below 3.
    n_chunks = l_pad // LANES        # <= 5 for resident tables (MAX_LEAVES)
    nc_pad = 8                       # sublane-aligned chunk-matrix height
    assert n_chunks <= nc_pad
    n_sub = block // sub
    n_words = -(-n_sub // 16)        # 16-bit subgroup-touch words
    cap = l_pad + 8                  # union worklist capacity (incl. tail)
    w = width                        # leaf-row triangle lanes (128 * n_k)
    n_k = width // LANES             # member chunks per merged row
    assert width % LANES == 0 and (width & (width - 1)) == 0
    # packed-argmin quantization: clearing the low log2(w) mantissa bits of
    # a non-negative f32 t changes it by <= w ulp ~ w * 2^-23 relative
    argmin_margin = 1.0 + width * 2.0 ** -23

    def kernel(rays_ref, rows_ref, base_ref, boxes_ref, cboxes_ref, out_ref,
               tn_mat, tn_t, bk_mat, bk_t, bits_mat, bits_t, cf_mat, cf_t,
               flags_sm, cflag_sm, n_sm, list_sm, tn_sm, blo_sm, suff_sm,
               bits2_sm, off_sm, cnt_sm, off2_sm, cur_sm,
               ar_leaf, ar_tn, ar_blo, best_a, best_b):
        b = rays_ref.shape[0]
        live = rays_ref[:, 6:7] > 0.5

        if any_hit:
            best_a[:, :] = jnp.zeros((b, 1), jnp.float32)
        else:
            best_a[:, :] = jnp.full((b, 1), K_HUGE, jnp.float32)
            best_b[:, :] = jnp.full((b, 1), -1.0, jnp.float32)
        alive = (jnp.max(rays_ref[:, 6:7]) > 0.5) if stages > 0 else (
            jnp.bool_(False)
        )

        @pl.when(alive)
        def _phases():
            ox, oy, oz = rays_ref[:, 0:1], rays_ref[:, 1:2], rays_ref[:, 2:3]
            dx, dy, dz = rays_ref[:, 3:4], rays_ref[:, 4:5], rays_ref[:, 5:6]
            t_max = rays_ref[:, 7:8]
            eps = 1e-12
            ix = jnp.reciprocal(jnp.where(jnp.abs(dx) > eps, dx,
                                          jnp.where(dx >= 0, eps, -eps)))
            iy = jnp.reciprocal(jnp.where(jnp.abs(dy) > eps, dy,
                                          jnp.where(dy >= 0, eps, -eps)))
            iz = jnp.reciprocal(jnp.where(jnp.abs(dz) > eps, dz,
                                          jnp.where(dz >= 0, eps, -eps)))
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
            lane_s = jax.lax.broadcasted_iota(jnp.int32, (sub, w), 1)

            def _slab(boxes, sl):
                t0 = (boxes[0:1, sl] - ox) * ix
                t1 = (boxes[3:4, sl] - ox) * ix
                tn = jnp.minimum(t0, t1)
                tf = jnp.maximum(t0, t1)
                t0 = (boxes[1:2, sl] - oy) * iy
                t1 = (boxes[4:5, sl] - oy) * iy
                tn = jnp.maximum(tn, jnp.minimum(t0, t1))
                tf = jnp.minimum(tf, jnp.maximum(t0, t1))
                t0 = (boxes[2:3, sl] - oz) * iz
                t1 = (boxes[5:6, sl] - oz) * iz
                tn = jnp.maximum(tn, jnp.minimum(t0, t1))
                tf = jnp.minimum(tf, jnp.maximum(t0, t1))
                return tn, tf

            # ---- phase -1: chunk cull against cluster AABBs ----
            tn_mat[:, :] = jnp.full((nc_pad, LANES), _FAR, jnp.float32)
            bits_mat[:, :] = jnp.zeros((n_words * nc_pad, LANES), jnp.float32)
            ctn, ctf = _slab(cboxes_ref, slice(0, LANES))
            chit = (ctn <= ctf) & (ctf >= 0.0) & live
            if any_hit:
                chit = chit & (ctn <= t_max)
            chit = chit & (lane < n_chunks)
            cf_mat[:, :] = jnp.zeros((8, LANES), jnp.float32)
            cf_mat[0:1, :] = jnp.max(jnp.where(chit, 1.0, 0.0), axis=0,
                                     keepdims=True)
            cf_t[:, :] = cf_mat[:, :].T
            for cl in range(n_chunks):
                cflag_sm[cl] = (cf_t[cl, 0] > 0.5).astype(jnp.int32)
                flags_sm[cl] = 0
            for s_i in range(n_sub):
                cnt_sm[s_i] = 0

            # ---- phase 0: per-leaf block-min entry distance, subgroup
            # touch bitmask words, and per-subgroup touch counts ----
            for cl in range(n_chunks):
                @pl.when(cflag_sm[cl] == 1)
                def _(cl=cl):
                    sl = slice(cl * LANES, (cl + 1) * LANES)
                    tn, tf = _slab(boxes_ref, sl)
                    hit = (tn <= tf) & (tf >= 0.0) & live
                    if any_hit:
                        hit = hit & (tn <= t_max)
                    n_here = n_leaves - cl * LANES
                    if n_here < LANES:
                        hit = hit & (lane < n_here)
                    tnm = jnp.where(hit, jnp.maximum(tn, 0.0), _FAR)
                    tnb = jnp.min(tnm, axis=0, keepdims=True)
                    tn_mat[cl:cl + 1, :] = tnb
                    flags_sm[cl] = (jnp.min(tnb) < _FAR).astype(jnp.int32)
                    hitf = jnp.where(hit, 1.0, 0.0)
                    for w in range(n_words):
                        bits = jnp.zeros((1, LANES), jnp.float32)
                        for bb in range(16):
                            s_i = w * 16 + bb
                            if s_i >= n_sub:
                                break
                            hs = jnp.max(hitf[s_i * sub:(s_i + 1) * sub],
                                         axis=0, keepdims=True)
                            bits = bits + hs * float(1 << bb)
                            cnt_sm[s_i] = cnt_sm[s_i] + jnp.sum(hs).astype(
                                jnp.int32
                            )
                        bits_mat[w * nc_pad + cl:w * nc_pad + cl + 1, :] = bits

            # ---- phase 1: near-to-far counting sort into the union list
            # (identical scheme to the union kernel) ----
            tmin = jnp.min(tn_mat[:, :])
            fin = tn_mat[:, :] < _FAR
            tmax = jnp.max(jnp.where(fin, tn_mat[:, :], -_FAR))
            inv_scale = jnp.maximum(tmax - tmin, 1e-30) / float(N_BUCKETS)
            scale = jnp.reciprocal(inv_scale)
            q = jnp.clip((tn_mat[:, :] - tmin) * scale, 0.0,
                         float(N_BUCKETS - 1))
            bk_mat[:, :] = jnp.where(fin, jnp.floor(q), float(N_BUCKETS))
            tn_t[:, :] = tn_mat[:, :].T
            bk_t[:, :] = bk_mat[:, :].T
            bits_t[:, :] = bits_mat[:, :].T

            for k in range(N_BUCKETS):
                off_sm[k + 1] = jnp.sum(
                    (bk_mat[:, :] == float(k)).astype(jnp.float32)
                ).astype(jnp.int32)
            off_sm[0] = 0
            for k in range(N_BUCKETS):
                off_sm[k + 1] = off_sm[k] + off_sm[k + 1]
            n_sm[0] = off_sm[N_BUCKETS]

            for cl in range(n_chunks):
                @pl.when(flags_sm[cl] == 1)
                def _(cl=cl):
                    def body(j, _):
                        bkt = bk_t[j, cl].astype(jnp.int32)
                        pos = off_sm[bkt]
                        list_sm[pos] = cl * LANES + j
                        tn_sm[pos] = tn_t[j, cl]
                        # conservative lower bound for every later entry
                        # (buckets are non-decreasing along the list):
                        # floor(q) <= q  =>  tmin + bkt*inv_scale <= tn, up
                        # to f32 rounding — the 1-2e-6 margin absorbs it
                        blo_sm[pos] = (
                            tmin
                            + bkt.astype(jnp.float32) * inv_scale * 0.999998
                        )
                        for w in range(n_words):
                            bits2_sm[w * cap + pos] = bits_t[
                                j, w * nc_pad + cl
                            ].astype(jnp.int32)
                        off_sm[bkt] = pos + 1
                        return 0

                    jax.lax.fori_loop(0, LANES, body, 0)

            n = n_sm[0]

            # ---- phase 1c: carve the arena (prefix-sum of touch counts)
            off2_sm[0] = 0
            for s_i in range(n_sub):
                off2_sm[s_i + 1] = off2_sm[s_i] + cnt_sm[s_i]
                cur_sm[s_i] = off2_sm[s_i]
            ovf = off2_sm[n_sub] > ARENA_PAIRS
            n_sm[1] = ovf.astype(jnp.int32)

            if stages < 2:
                return

            # ---- phase 1d: distribute sorted union entries into the
            # per-subgroup lists (iterates exactly the set bits)
            @pl.when(jnp.logical_not(ovf))
            def _place():
                def body(i, _):
                    t_i = tn_sm[i]
                    b_i = blo_sm[i]
                    l_i = list_sm[i]
                    for w in range(n_words):
                        v0 = bits2_sm[w * cap + i]

                        def wbody(v, w=w):
                            lsb = v & (-v)
                            s_i = w * 16 + _bit_index(lsb)
                            pos = cur_sm[s_i]
                            ar_leaf[pos] = l_i
                            ar_tn[pos] = t_i
                            ar_blo[pos] = b_i
                            cur_sm[s_i] = pos + 1
                            return v & (v - 1)

                        jax.lax.while_loop(lambda v: v != 0, wbody, v0)
                    return 0

                jax.lax.fori_loop(0, n, body, 0)

            if stages < 3:
                return

            # ---- phase 2 (arena): each subgroup walks its own list.
            # STATIC unroll over subgroups (dynamic sublane slices measured
            # ~600 serial cycles/visit in the first arena cut — static
            # slices are near-free), and ARENA_UNROLL visits per loop
            # iteration: the row loads + MTs of a group are independent and
            # pipeline in the VLIW schedule; the serial break/bound check
            # runs once per group on the merged state (stale by at most
            # ARENA_UNROLL-1 visits — conservative, never wrong).
            @pl.when(jnp.logical_not(ovf))
            def _walk():
                for s in range(n_sub):
                    sl_ = slice(s * sub, (s + 1) * sub)
                    oxs, oys, ozs = ox[sl_], oy[sl_], oz[sl_]
                    dxs, dys, dzs = dx[sl_], dy[sl_], dz[sl_]
                    lives = live[sl_]
                    start = off2_sm[s]
                    end = off2_sm[s + 1]
                    if any_hit:
                        tms = t_max[sl_]

                        # branchless group: occlusion accumulates PER LANE
                        # (one vector OR per visit, no cross-lane reduce);
                        # the done check reduces the accumulator once per
                        # group.  Out-of-list visits fold into the valid
                        # mask; their row index is clamped in-bounds.
                        def bd(c, oxs=oxs, oys=oys, ozs=ozs, dxs=dxs,
                               dys=dys, dzs=dzs, lives=lives, tms=tms,
                               end=end):
                            j, _, acc = c
                            for k in range(unroll):
                                l = ar_leaf[j + k]
                                if static_row:
                                    row = rows_ref[0]
                                else:
                                    row = rows_ref[jnp.clip(
                                        l, 0, n_leaves - 1)]
                                valid, tt, _, _ = _mt_leaf(
                                    row, oxs, oys, ozs, dxs, dys, dzs
                                )
                                valid = valid & lives & (tt <= tms)
                                if k > 0:
                                    valid = valid & (j + k < end)
                                # f32 accumulator: Mosaic cannot carry an
                                # i1 vector through an scf.while
                                acc = jnp.maximum(
                                    acc, jnp.where(valid, 1.0, 0.0)
                                )
                            done = jnp.min(jnp.where(
                                lives,
                                jnp.max(acc, axis=1, keepdims=True),
                                1.0,
                            )) >= 0.5
                            return j + unroll, done, acc

                        _, _, acc = jax.lax.while_loop(
                            lambda c: (c[0] < end) & jnp.logical_not(c[1]),
                            bd,
                            (start, start >= end,
                             jnp.zeros((sub, w), jnp.float32)),
                        )
                        best_a[sl_, :] = jnp.maximum(
                            best_a[sl_, :],
                            jnp.max(acc, axis=1, keepdims=True),
                        )
                    else:
                        def bd(c, oxs=oxs, oys=oys, ozs=ozs, dxs=dxs,
                               dys=dys, dzs=dzs, lives=lives, sl_=sl_,
                               end=end):
                            j, _ = c
                            for k in range(unroll):
                                def _v(k=k):
                                    l = ar_leaf[j + k]
                                    row = rows_ref[0] if static_row else rows_ref[l]
                                    valid, tt, _, _ = _mt_leaf(
                                        row, oxs, oys, ozs, dxs, dys, dzs
                                    )
                                    valid = valid & lives
                                    # packed argmin: t >= 0 so its f32 bit
                                    # pattern orders like the value; clear
                                    # the low log2(w) mantissa bits and
                                    # pack the lane index there, then ONE
                                    # lane-min reduce yields winner t AND
                                    # lane (replacing two w-lane
                                    # reductions).  t is quantized by
                                    # <= w * 2^-23 relative; the exact
                                    # winner t is recomputed by the host
                                    # epilogue (_winner_uvt), and the
                                    # break bound compensates below.
                                    ti = jax.lax.bitcast_convert_type(
                                        tt, jnp.int32
                                    )
                                    key = jnp.where(
                                        valid, (ti & -w) | lane_s,
                                        jnp.int32(2**31 - 1),
                                    )
                                    kb = jnp.min(key, axis=1, keepdims=True)
                                    bk = jax.lax.bitcast_convert_type(
                                        best_a[sl_, :], jnp.int32
                                    )
                                    closer = kb < bk
                                    best_a[sl_, :] = (
                                        jax.lax.bitcast_convert_type(
                                            jnp.where(closer, kb, bk),
                                            jnp.float32,
                                        )
                                    )
                                    # winner tri id: member chunk kk of a
                                    # merged row has its own base
                                    lane_w = kb & (w - 1)
                                    bsel = base_ref[l, 0]
                                    for kk in range(1, n_k):
                                        bsel = jnp.where(
                                            jax.lax.shift_right_logical(
                                                lane_w, 7
                                            ) == kk,
                                            base_ref[l, kk], bsel,
                                        )
                                    best_b[sl_, :] = jnp.where(
                                        closer,
                                        bsel
                                        + (lane_w & 127).astype(jnp.float32),
                                        best_b[sl_, :],
                                    )
                                if k == 0:
                                    _v()
                                else:
                                    pl.when(j + k < end)(_v)
                            # 1 + w*2^-23 margin: best_a carries t
                            # quantized DOWN (plus lane bits), so the raw
                            # max could break one leaf too early
                            tsub2 = jnp.max(jnp.where(
                                lives, best_a[sl_, :], -1.0
                            )) * argmin_margin
                            jn = j + unroll
                            stop = jnp.where(
                                jn < end, ar_blo[jn] > tsub2, False
                            )
                            return jn, stop

                        jax.lax.while_loop(
                            lambda c: (c[0] < end) & jnp.logical_not(c[1]),
                            bd, (start, start >= end),
                        )

            # ---- phase 2 (overflow fallback): ungated full-block walk of
            # the sorted union list with the block-level break.  Rare (the
            # arena covers the measured distribution with ~4-8x headroom);
            # correctness path, not a fast path.
            @pl.when(ovf)
            def _fallback():
                if not any_hit:
                    suff_sm[n] = _FAR

                    def back(j, m):
                        idx = n - 1 - j
                        m = jnp.minimum(m, tn_sm[idx])
                        suff_sm[idx] = m
                        return m

                    jax.lax.fori_loop(0, n, back, jnp.float32(_FAR))

                    def bd(c):
                        i, tblk, _ = c

                        @pl.when(tn_sm[i] <= tblk)
                        def _visit():
                            l = list_sm[i]
                            row = rows_ref[l]
                            valid, tt, _, _ = _mt_leaf(
                                row, ox, oy, oz, dx, dy, dz
                            )
                            valid = valid & live
                            t_best = best_a[:, :]
                            tmask = jnp.where(
                                valid & (tt < t_best), tt, K_HUGE
                            )
                            tb = jnp.min(tmask, axis=1, keepdims=True)
                            is_min = (tmask <= tb) & (tmask < K_HUGE)
                            lane_b = jax.lax.broadcasted_iota(
                                jnp.int32, (b, w), 1
                            )
                            first = jnp.min(
                                jnp.where(is_min, lane_b, w),
                                axis=1, keepdims=True,
                            )
                            closer = tb < t_best
                            best_a[:, :] = jnp.where(closer, tb, t_best)
                            bsel = base_ref[l, 0]
                            for kk in range(1, n_k):
                                bsel = jnp.where(
                                    jax.lax.shift_right_logical(
                                        first, 7
                                    ) == kk,
                                    base_ref[l, kk], bsel,
                                )
                            best_b[:, :] = jnp.where(
                                closer,
                                bsel + (first & 127).astype(jnp.float32),
                                best_b[:, :],
                            )

                        tblk2 = jnp.max(jnp.where(live, best_a[:, :], -1.0))
                        stop = suff_sm[i + 1] > tblk2
                        return i + 1, tblk2, stop

                    jax.lax.while_loop(
                        lambda c: (c[0] < n) & jnp.logical_not(c[2]),
                        bd, (jnp.int32(0),
                             jnp.max(jnp.where(live, K_HUGE, -1.0)),
                             n == 0),
                    )
                else:
                    def bd(c):
                        i, _ = c
                        row = rows_ref[list_sm[i]]
                        valid, tt, _, _ = _mt_leaf(
                            row, ox, oy, oz, dx, dy, dz
                        )
                        valid = valid & live & (tt <= t_max)
                        hit_here = jnp.max(
                            jnp.where(valid, 1.0, 0.0),
                            axis=1, keepdims=True,
                        )
                        nb = jnp.maximum(best_a[:, :], hit_here)
                        best_a[:, :] = nb
                        done = jnp.min(jnp.where(live, nb, 1.0)) >= 0.5
                        return i + 1, done

                    jax.lax.while_loop(
                        lambda c: (c[0] < n) & jnp.logical_not(c[1]),
                        bd, (jnp.int32(0), n == 0),
                    )

        out_ref[:, 0:1] = best_a[:, :]
        if not any_hit:
            out_ref[:, 3:4] = jnp.where(
                best_a[:, :] < K_HUGE, best_b[:, :], -1.0
            )

    return kernel


def _traverse_arena(table: LeafTable, packed, any_hit, interpret,
                    block: int, sub: int, unroll: int = ARENA_UNROLL,
                    static_row: bool = False, stages: int = 3):
    r_pad = packed.shape[0]
    nb = r_pad // block
    l_pad = table.l_pad
    n_sub = block // sub
    assert block % sub == 0 and sub % 8 == 0 and n_sub <= 256
    cap = l_pad + 8
    kernel = _make_arena_kernel(any_hit, table.num_leaves, l_pad, sub, block,
                                unroll=unroll, static_row=static_row,
                                width=table.width, stages=stages)
    n_words = -(-n_sub // 16)
    nc_pad = 8
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((r_pad, 8), jnp.float32),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # rows (resident)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # base
            pl.BlockSpec(memory_space=pltpu.VMEM),   # boxes_t
            pl.BlockSpec(memory_space=pltpu.VMEM),   # cboxes_t
        ],
        out_specs=pl.BlockSpec((block, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nc_pad, LANES), jnp.float32),        # tn_mat
            pltpu.VMEM((LANES, nc_pad), jnp.float32),        # tn_t
            pltpu.VMEM((nc_pad, LANES), jnp.float32),        # bk_mat
            pltpu.VMEM((LANES, nc_pad), jnp.float32),        # bk_t
            pltpu.VMEM((n_words * nc_pad, LANES), jnp.float32),  # bits_mat
            pltpu.VMEM((LANES, n_words * nc_pad), jnp.float32),  # bits_t
            pltpu.VMEM((8, LANES), jnp.float32),             # cf_mat
            pltpu.VMEM((LANES, 8), jnp.float32),             # cf_t
            pltpu.SMEM((nc_pad,), jnp.int32),                # flags
            pltpu.SMEM((nc_pad,), jnp.int32),                # cflag
            pltpu.SMEM((8,), jnp.int32),                     # n / ovf
            pltpu.SMEM((cap,), jnp.int32),                   # union list
            pltpu.SMEM((cap,), jnp.float32),                 # union tn
            pltpu.SMEM((cap,), jnp.float32),                 # union bucket-lo
            pltpu.SMEM((cap + 1,), jnp.float32),             # suffix minima
            pltpu.SMEM((n_words * cap,), jnp.int32),         # union bits
            pltpu.SMEM((N_BUCKETS + 2,), jnp.int32),         # bucket offsets
            pltpu.SMEM((n_sub + 8,), jnp.int32),             # touch counts
            pltpu.SMEM((n_sub + 8,), jnp.int32),             # arena offsets
            pltpu.SMEM((n_sub + 8,), jnp.int32),             # arena cursors
            pltpu.SMEM((ARENA_PAIRS + 8,), jnp.int32),       # arena leaf ids
            pltpu.SMEM((ARENA_PAIRS + 8,), jnp.float32),     # arena tn
            pltpu.SMEM((ARENA_PAIRS + 8,), jnp.float32),     # arena bucket-lo
            pltpu.VMEM((block, 1), jnp.float32),             # best t / occ
            pltpu.VMEM((block, 1), jnp.float32),             # best tri id
        ],
        # measured scoped need: 25.5 MB standalone at block=2048/sub=16
        # (the unrolled phase-0 subgroup reduces spill the [block,128] hit
        # matrix) and 32.1 MB when embedded under shard_map + jax.checkpoint
        # (XLA stacks its surrounding copies into the same scoped budget);
        # 40 MB is bounded headroom on the 128 MB-VMEM part without
        # masking order-of-magnitude footprint regressions
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=40 * 1024 * 1024,
        ),
        interpret=interpret,
    )(packed, table.rows, table.base, table.boxes_t, table.cboxes_t)


# ---------------------------------------------------------------------------
# Host-facing wrappers
# ---------------------------------------------------------------------------


def _dir_bins(rd, fine: bool):
    """Direction bin index: octant (3 bits), optionally refined by the
    normalized |d| simplex coordinates quantized 4x4 (7 bits total, 128
    bins).  Cheap VPU math; used as the sort key for coherent dispatch."""
    octant = (
        (rd[:, 0] > 0).astype(jnp.int32) * 4
        + (rd[:, 1] > 0).astype(jnp.int32) * 2
        + (rd[:, 2] > 0).astype(jnp.int32)
    )
    if not fine:
        return octant, 8
    a = jnp.abs(rd)
    s = jnp.maximum(a.sum(axis=1), 1e-20)
    u = jnp.clip((4.0 * a[:, 0] / s).astype(jnp.int32), 0, 3)
    v = jnp.clip((4.0 * a[:, 1] / s).astype(jnp.int32), 0, 3)
    return octant * 16 + u * 4 + v, 128


def _sort_perm(rd, mask, fine: bool = False, block: int | None = None):
    """Stable permutation grouping lanes by direction bin, dead lanes
    last.  Stability preserves the caller's tile-major order inside each
    bin, so sorted blocks are direction-coherent AND origin-tight —
    measured 81 -> 48 ms (closest) / 143 -> 82 ms (any-hit) on 64k/128k
    diffuse-bounce dispatches at 256-ray blocks (tools/ab_block.py).
    Dead lanes compact into all-dead tail blocks, which the kernel's
    `alive` fast path skips entirely.

    The argsorts themselves are cheap (0.55 ms for 128k lanes measured
    stand-alone); the sorted path's real overhead is the data MOVEMENT
    around them, so the callers gather the pre-packed [R, 8] ray rows
    once instead of each component separately (see intersect_pallas).
    A counting-rank (one-hot cumsum) replacement for the argsorts was
    built and measured SLOWER on chip (stage-0 2.19 -> 3.25 ms closest,
    5.99 -> 6.93 any-hit, tools/phase_cost.py r5) — reverted."""
    # fine=True (128 bins) measured slightly WORSE than octants (49.6 vs
    # 48.0 ms closest, 86 vs 82 ms any-hit): finer bins fragment the stable
    # sort's tile-locality — each bin draws from the whole dispatch, so
    # origins spread.  8 octants balance direction vs origin coherence.
    bins, nb = _dir_bins(rd, fine)
    key = bins if mask is None else jnp.where(mask, bins, nb)
    perm = jnp.argsort(key, stable=True)
    if block is not None and rd.shape[0] > block:
        # secondary BLOCK-LOCAL fine-direction ordering: re-sorting within
        # each block aligns the 64-ray subgroups to tight direction cones
        # (subgroup bitmask pruning turns intra-block order into real
        # skipped visits) without moving rays across blocks — the failure
        # mode that made a *global* fine sort lose (origins fragment).
        fbins, fnb = _dir_bins(rd[perm], True)
        blk = jnp.arange(perm.shape[0], dtype=jnp.int32) // block
        perm2 = jnp.argsort(blk * (fnb + 1) + fbins, stable=True)
        perm = perm[perm2]
    inv = jnp.zeros_like(perm).at[perm].set(
        jnp.arange(perm.shape[0], dtype=perm.dtype)
    )
    return perm, inv


def _pack_rays(ro, rd, mask, t_max, r_pad):
    r = ro.shape[0]
    live = jnp.ones(r, jnp.float32) if mask is None else mask.astype(jnp.float32)
    tm = jnp.full(r, 1e32, jnp.float32) if t_max is None else t_max
    packed = jnp.concatenate(
        [ro, rd, live[:, None], tm[:, None]], axis=1
    ).astype(jnp.float32)
    if r_pad > r:
        packed = jnp.pad(packed, ((0, r_pad - r), (0, 0)))
    return packed


def _traverse(table: LeafTable, ro, rd, any_hit, mask, t_max, interpret,
              block: int = RAY_BLOCK, stream: bool | None = None,
              sub: int | None = None, mode: str = "auto",
              unroll: int = ARENA_UNROLL, static_row: bool = False,
              stages: int = 3):
    """mode: "auto" routes resident single-page tables to the arena kernel
    (per-subgroup worklists) and everything else to the union kernel;
    "arena"/"union" force a kernel for A/B harnesses."""
    r = ro.shape[0]
    r_pad = -(-r // block) * block
    packed = _pack_rays(ro, rd, mask, t_max, r_pad)
    return _traverse_packed(table, packed, r, any_hit, interpret,
                            block=block, stream=stream, sub=sub, mode=mode,
                            unroll=unroll, static_row=static_row,
                            stages=stages)


def _traverse_packed(table: LeafTable, packed, r, any_hit, interpret,
                     block: int = RAY_BLOCK, stream: bool | None = None,
                     sub: int | None = None, mode: str = "auto",
                     unroll: int = ARENA_UNROLL, static_row: bool = False,
                     stages: int = 3):
    """_traverse on pre-packed [r_pad, 8] ray rows (o.xyz d.xyz live
    t_max).  The sorted wrappers pack FIRST and permute the packed rows
    with ONE row gather — four separate component gathers measured as the
    bulk of the sorted path's 2.2/5.7 ms per-dispatch overhead
    (tools/phase_cost.py r5; the argsorts themselves are 0.55 ms)."""
    r_pad = packed.shape[0]
    nb = r_pad // block
    l_pad = table.l_pad
    n_chunks = l_pad // LANES
    # 128-row equivalents so the VMEM-budget comparison is width-agnostic
    eq128 = table.num_leaves * (table.width // LANES)
    if stream is None:
        stream = eq128 > MAX_LEAVES
    # merged (wide-row) tables only exist at resident sizes and only the
    # arena kernel understands them; the union/stream kernel is 128-wide
    arena = mode == "arena" or table.width > LANES or (
        mode == "auto" and not stream and eq128 <= MAX_LEAVES
    )
    if arena:
        out = _traverse_arena(table, packed, any_hit, interpret, block,
                              ARENA_SUB if sub is None else sub,
                              unroll=unroll, static_row=static_row,
                              stages=stages)
        if any_hit:
            return out[:r, 0] > 0.5
        return out[:r, 0], out[:r, 3].astype(jnp.int32)
    if sub is None:
        sub = SUB_BLOCK
    assert table.width == LANES, "union/stream kernel is 128-lane only"
    assert block % sub == 0
    n_sub = block // sub
    # f32 bitmask rows hold sums of 2^s exactly only below the 24-bit
    # mantissa; 16 subgroups max keeps them integer-exact
    assert n_sub <= 16
    kernel = _make_kernel(any_hit, table.num_leaves, l_pad, stream=stream,
                          sub=sub)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((r_pad, 8), jnp.float32),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(                            # rows: VMEM-resident or
                memory_space=pl.ANY if stream else pltpu.VMEM
            ),                                       # HBM + per-visit DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),   # base (resident)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # boxes_t (resident)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # cboxes_t (resident)
        ],
        out_specs=pl.BlockSpec((block, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((PAGE_CHUNKS, LANES), jnp.float32),  # tn_mat (page)
            pltpu.VMEM((LANES, PAGE_CHUNKS), jnp.float32),  # tn_t
            pltpu.VMEM((PAGE_CHUNKS, LANES), jnp.float32),  # bits
            pltpu.VMEM((LANES, PAGE_CHUNKS), jnp.float32),  # bits_t
            pltpu.VMEM((PAGE_CHUNKS, LANES), jnp.float32),  # bk_mat
            pltpu.VMEM((LANES, PAGE_CHUNKS), jnp.float32),  # bk_t
            pltpu.VMEM((8, LANES), jnp.float32),     # cf_mat (chunk flags)
            pltpu.VMEM((LANES, 8), jnp.float32),     # cf_t
            pltpu.SMEM((PAGE_CHUNKS,), jnp.int32),   # flags (page)
            pltpu.SMEM((PAGE_CHUNKS,), jnp.int32),   # chunk-touched flags
            pltpu.SMEM((8,), jnp.int32),             # n
            pltpu.SMEM((PAGE_LEAVES + 8,), jnp.int32),    # worklist (page)
            pltpu.SMEM((PAGE_LEAVES + 8,), jnp.float32),  # entry distances
            pltpu.SMEM((PAGE_LEAVES + 8,), jnp.float32),  # suffix minima
            pltpu.SMEM((PAGE_LEAVES + 8,), jnp.int32),    # subgroup bitmasks
            pltpu.SMEM((N_BUCKETS + 2,), jnp.int32),  # bucket offsets
            pltpu.VMEM((16, 4 * LANES), jnp.float32),   # G coefficients
            pltpu.VMEM((block, 1), jnp.float32),        # best t / occ
            pltpu.VMEM((block, 1), jnp.float32),        # best tri id
            pltpu.SMEM((1,), jnp.float32),              # block max-best t
            pltpu.SMEM((n_sub,), jnp.float32),          # per-subgroup bound
        ] + ([
            pltpu.VMEM((2, N_COMP, LANES), jnp.float32),  # DMA row ring
            pltpu.SemaphoreType.DMA((2,)),
        ] if stream else []),
        # measured scoped need: 16.36 MB resident at a 2048-ray block and
        # 25.95 MB for the streaming any-hit on an 11.4k-leaf scene; 40 MB
        # (matching the arena kernel) gives bounded headroom without
        # masking real VMEM-footprint regressions (ADVICE r4 — the old
        # 100 MB ceiling existed only for the rows-resident big-scene
        # experiment, a documented null result)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=40 * 1024 * 1024,
        ),
        interpret=interpret,
    )(packed, table.rows, table.base, table.boxes_t, table.cboxes_t)
    if any_hit:
        return out[:r, 0] > 0.5
    t = out[:r, 0]
    tri_id = out[:r, 3].astype(jnp.int32)
    return t, tri_id


# (_winner_uvt imported from ops.intersect: exact (u, v, t) for the winning
# triangle — one [R]-wide gather + MT, cheaper and more precise than
# extracting them from the matmul pair matrix)


def intersect_pallas(
    table: LeafTable,
    tris: TriangleSoA,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    interpret: bool = False,
    sort: bool = False,
) -> Hit:
    """Closest-hit traversal (reference intersect(), Triangle.cu:144-200).

    `sort=True` dispatches the kernel over octant-grouped, dead-compacted
    lanes (see _sort_perm): rays are packed FIRST and permuted as [R, 8]
    rows in ONE gather (component-wise gathers measured as the bulk of the
    sorted path's overhead, tools/phase_cost.py r5), and only (t, tri_id)
    are unsorted — two [R] gathers — before the exact winner recompute,
    which runs in caller order."""
    if sort:
        perm, inv = _sort_perm(ray_d, mask, block=RAY_BLOCK)
        r = ray_o.shape[0]
        r_pad = -(-r // RAY_BLOCK) * RAY_BLOCK
        packed = _pack_rays(ray_o, ray_d, mask, None, r_pad)
        if r_pad > r:
            perm = jnp.concatenate(
                [perm, jnp.arange(r, r_pad, dtype=perm.dtype)]
            )
        t_s, id_s = _traverse_packed(table, packed[perm], r, False,
                                     interpret)
        t, tri_id = t_s[inv], id_s[inv]
    else:
        t, tri_id = _traverse(table, ray_o, ray_d, False, mask, None, interpret)
    hit = tri_id >= 0
    u, v, t_exact = _winner_uvt(tris, tri_id, ray_o, ray_d)
    # Sanitize miss/masked lanes: dead-lane origins can be ~1e32 (o +
    # K_HUGE*d), where MT on dummy triangle 0 overflows u/v to +/-inf and
    # _shade_attrs would emit NaN normals/uvs that poison next-bounce ray
    # origins.  Misses must stay finite (u = v = 0, t = K_HUGE).
    u = jnp.where(hit, u, 0.0)
    v = jnp.where(hit, v, 0.0)
    t = jnp.where(hit, t_exact, K_HUGE)
    return _shade_attrs(tris, tri_id, u, v, ray_o, ray_d, t, hit)


def occluded_pallas(
    table: LeafTable,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    t_max: jnp.ndarray | None = None,
    interpret: bool = False,
    sort: bool = False,
) -> jnp.ndarray:
    """Any-hit traversal (reference intersect_shadows, Triangle.cu:204-248).

    sort=True packs first and permutes [R, 8] rows in one gather, as in
    intersect_pallas."""
    if sort:
        perm, inv = _sort_perm(ray_d, mask, block=RAY_BLOCK)
        r = ray_o.shape[0]
        r_pad = -(-r // RAY_BLOCK) * RAY_BLOCK
        packed = _pack_rays(ray_o, ray_d, mask, t_max, r_pad)
        if r_pad > r:
            perm = jnp.concatenate(
                [perm, jnp.arange(r, r_pad, dtype=perm.dtype)]
            )
        occ = _traverse_packed(table, packed[perm], r, True, interpret)
        return occ[inv]
    return _traverse(table, ray_o, ray_d, True, mask, t_max, interpret)
