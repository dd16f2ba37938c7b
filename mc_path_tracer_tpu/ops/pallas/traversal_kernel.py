"""Pallas TPU traversal kernel over the wide-BVH leaf table.

This is the make-or-break Mrays/s kernel (SURVEY.md §7 "hard parts"): the
XLA wide-BVH traversal (ops/wide_bvh.py) is bound by HBM gather bandwidth —
every visited node is a fresh 5 KB row gather per ray.  Here the whole leaf
table lives in VMEM and rays are processed in 512-ray blocks with *per-block
scalar control flow*, which XLA cannot express but Pallas can.  Everything
happens in ONE kernel per block (measured: XLA versions of the cull phase
cost 50-100x more than the same math on-chip — 52 ms for the slab product,
45 ms for a [128, 640] argsort — and a strided [·, L, 8] schedule DMA costs
~270 us/block, so nothing is precomputed outside):

  phase 0 (vector): slab-test the block's 512 rays against every leaf AABB,
     128 leaves at a time (boxes are VMEM-resident, component-major), and
     reduce to the block-min entry distance per leaf.
  phase 1 (scalar): compact the active leaves into an SMEM worklist
     (unconditional write + conditional advance — no branches), skipping
     128-leaf chunks with no activity; then a backward sweep writes the
     suffix-min of the entry distances.
  phase 2: walk the worklist.  Each visit is ONE dynamic VMEM row slice
     ([10, 128] leaf: 128 inline triangles, component-major) plus a fully
     vectorized [512, 128] Moller-Trumbore on the VPU — no gathers, no
     per-lane divergence.  A visit is skipped when the leaf's entry
     distance exceeds every live ray's current best hit, and the loop
     BREAKS when the suffix-min does (no later leaf can matter) — the
     vector analogue of the reference's near-child-first stack traversal
     with tMax pruning (Triangle.cu:156-200).  The any-hit variant instead
     exits when every live ray is occluded (intersect_shadows,
     Triangle.cu:204-248).

Semantics match the reference exactly: Moller-Trumbore with backface
culling (det >= K_EPSILON), t >= 0, optional per-ray t_max for bounded
shadow rays (Triangle.cu:19-40, 74, 204-248).

Scale: the leaf table must fit in VMEM (LEAF_VMEM_LIMIT); larger scenes
fall back to the XLA wide path (ops/wide_bvh.py) — an HBM-streaming
double-buffered variant is the designed extension (the SMEM worklist is
exactly a DMA prefetch schedule).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mc_path_tracer_tpu.ops.intersect import Hit, TriangleSoA, _shade_attrs
from mc_path_tracer_tpu.ops.math import K_EPSILON, K_HUGE
from mc_path_tracer_tpu.ops.wide_bvh import LANES, N_COMP, _META_COMP, WideBVH

RAY_BLOCK = 512
_FAR = 3e37

# leaf rows resident in VMEM: [L, 10, 128] f32 = L * 5 KB.  Budget ~8 MB of
# the ~16 MB VMEM for the table (the rest: ray blocks, work arrays, lists).
LEAF_VMEM_LIMIT = 8 * 1024 * 1024
MAX_LEAVES = LEAF_VMEM_LIMIT // (N_COMP * LANES * 4)


@dataclass(frozen=True)
class LeafTable:
    """Flat leaf-only view of the wide BVH for the Pallas traversal.

    rows      [L, 10, 128] f32 — leaf rows (v0/e1/e2 component-major,
              comp 9 lane 1 = base triangle index, lane 2 = count)
    boxes_t   [8, L_pad] f32 — leaf AABBs transposed, component-major
              (rows 0-5 = bmin.xyz / bmax.xyz; rows 6-7 pad)
    base      [L, 1] f32 — base triangle index per leaf (sublane-major so
              the kernel can scalar-read it)
    """

    rows: jnp.ndarray
    boxes_t: jnp.ndarray
    base: jnp.ndarray

    @property
    def num_leaves(self) -> int:
        return self.rows.shape[0]

    @property
    def l_pad(self) -> int:
        return self.boxes_t.shape[1]


jax.tree_util.register_dataclass(
    LeafTable, data_fields=["rows", "boxes_t", "base"], meta_fields=[]
)


def build_leaf_table(wide: WideBVH) -> LeafTable | None:
    """Extract the leaf rows of a WideBVH and their AABBs (host numpy).

    Returns None when the table would not fit the VMEM budget (callers fall
    back to the XLA wide traversal)."""
    table = np.asarray(wide.rows)
    is_leaf = table[:, _META_COMP, 0] > 0.5
    rows = table[is_leaf]
    n = rows.shape[0]
    if n == 0 or n > MAX_LEAVES:
        return None
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
    l_pad = -(-n // 128) * 128
    boxes_t = np.zeros((8, l_pad), np.float32)
    # padding boxes are masked by static lane index in the kernel (an
    # inverted box does NOT fail the slab test); keep them inverted anyway
    boxes_t[0:3, :] = 1.0
    boxes_t[3:6, :] = -1.0
    boxes_t[0:3, :n] = bmin.T
    boxes_t[3:6, :n] = bmax.T
    base = rows[:, _META_COMP, 1:2].astype(np.float32)
    return LeafTable(
        rows=jnp.asarray(rows),
        boxes_t=jnp.asarray(boxes_t),
        base=jnp.asarray(base),
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


def _make_kernel(any_hit: bool, n_leaves: int, l_pad: int):
    n_chunks = l_pad // LANES
    nc_pad = -(-n_chunks // 8) * 8

    def kernel(rays_ref, rows_ref, base_ref, boxes_ref, out_ref,
               tn_mat, tn_t, flags_sm, n_sm, list_sm, tn_sm, suff_sm):
        b = rays_ref.shape[0]
        ox, oy, oz = rays_ref[:, 0:1], rays_ref[:, 1:2], rays_ref[:, 2:3]
        dx, dy, dz = rays_ref[:, 3:4], rays_ref[:, 4:5], rays_ref[:, 5:6]
        live = rays_ref[:, 6:7] > 0.5
        t_max = rays_ref[:, 7:8]
        eps = 1e-12
        ix = jnp.reciprocal(jnp.where(jnp.abs(dx) > eps, dx,
                                      jnp.where(dx >= 0, eps, -eps)))
        iy = jnp.reciprocal(jnp.where(jnp.abs(dy) > eps, dy,
                                      jnp.where(dy >= 0, eps, -eps)))
        iz = jnp.reciprocal(jnp.where(jnp.abs(dz) > eps, dz,
                                      jnp.where(dz >= 0, eps, -eps)))
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

        # ---- phase 0: block-min leaf entry distances, 128 leaves at a
        # time, written to the chunk-row matrix in its natural lane layout
        # (NO per-chunk transposes — a (1,128)->(128,1) relayout spans 16
        # sublane tiles and costs more than the whole slab)
        for c in range(n_chunks):
            sl = slice(c * LANES, (c + 1) * LANES)
            t0 = (boxes_ref[0:1, sl] - ox) * ix
            t1 = (boxes_ref[3:4, sl] - ox) * ix
            tn = jnp.minimum(t0, t1)
            tf = jnp.maximum(t0, t1)
            t0 = (boxes_ref[1:2, sl] - oy) * iy
            t1 = (boxes_ref[4:5, sl] - oy) * iy
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
            t0 = (boxes_ref[2:3, sl] - oz) * iz
            t1 = (boxes_ref[5:6, sl] - oz) * iz
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
            hit = (tn <= tf) & (tf >= 0.0) & live
            if any_hit:
                hit = hit & (tn <= t_max)
            # padding lanes masked by static index (an inverted padding box
            # does NOT fail the slab test)
            n_here = n_leaves - c * LANES
            if n_here < LANES:
                hit = hit & (lane < n_here)
            tnb = jnp.min(
                jnp.where(hit, jnp.maximum(tn, 0.0), _FAR),
                axis=0, keepdims=True,
            )                                      # (1, 128)
            tn_mat[c:c + 1, :] = tnb
            flags_sm[c] = (jnp.min(tnb) < _FAR).astype(jnp.int32)

        # ONE small (nc_pad, 128) -> (128, nc_pad) transpose makes every
        # leaf's entry distance scalar-readable (dynamic sublane + static
        # lane index)
        tn_t[:, :] = tn_mat[:, :].T

        # ---- phase 1: compact active leaves into the SMEM worklist
        n_sm[0] = 0

        for c in range(n_chunks):
            @pl.when(flags_sm[c] == 1)
            def _(c=c):
                def body(j, _):
                    tn = tn_t[j, c]
                    n = n_sm[0]
                    # unconditional write + conditional advance: branch-free
                    list_sm[n] = c * LANES + j
                    tn_sm[n] = tn
                    n_sm[0] = n + (tn < _FAR).astype(jnp.int32)
                    return 0

                jax.lax.fori_loop(0, LANES, body, 0)

        n = n_sm[0]

        if not any_hit:
            # ---- phase 1b: suffix-min of entry distances (break oracle)
            suff_sm[n] = _FAR

            def back(j, m):
                idx = n - 1 - j
                m = jnp.minimum(m, tn_sm[idx])
                suff_sm[idx] = m
                return m

            jax.lax.fori_loop(0, n, back, jnp.float32(_FAR))

            # ---- phase 2: closest hit over the worklist
            def cond(carry):
                i, stop = carry[0], carry[1]
                return (i < n) & jnp.logical_not(stop)

            def visit(args):
                i, t_best, u_b, v_b, id_b, _ = args
                l = list_sm[i]
                row = rows_ref[l]
                valid, tt, uu, vv = _mt_leaf(row, ox, oy, oz, dx, dy, dz)
                valid = valid & live & (tt < t_best)
                tmask = jnp.where(valid, tt, K_HUGE)
                tb = jnp.min(tmask, axis=1, keepdims=True)
                is_min = (tmask <= tb) & (tmask < K_HUGE)
                first = jnp.min(
                    jnp.where(is_min, lane, LANES), axis=1, keepdims=True
                )
                onehot = (lane == first).astype(jnp.float32)
                closer = tb < t_best
                t_best = jnp.where(closer, tb, t_best)
                id_b = jnp.where(
                    closer, base_ref[l, 0] + first.astype(jnp.float32), id_b
                )
                u_b = jnp.where(
                    closer, jnp.sum(uu * onehot, axis=1, keepdims=True), u_b
                )
                v_b = jnp.where(
                    closer, jnp.sum(vv * onehot, axis=1, keepdims=True), v_b
                )
                t_blk = jnp.max(jnp.where(live, t_best, -1.0))
                return i, t_best, u_b, v_b, id_b, t_blk

            def body(carry):
                i, _, t_best, u_b, v_b, id_b, t_blk = carry
                args = (i, t_best, u_b, v_b, id_b, t_blk)
                do = tn_sm[i] <= t_blk
                _, t_best, u_b, v_b, id_b, t_blk = jax.lax.cond(
                    do, visit, lambda a: a, args
                )
                stop = suff_sm[i + 1] > t_blk
                return i + 1, stop, t_best, u_b, v_b, id_b, t_blk

            init = (
                jnp.int32(0),
                n == 0,
                jnp.full((b, 1), K_HUGE, jnp.float32),
                jnp.zeros((b, 1), jnp.float32),
                jnp.zeros((b, 1), jnp.float32),
                jnp.zeros((b, 1), jnp.float32),
                jnp.max(jnp.where(live, K_HUGE, -1.0)),
            )
            out = jax.lax.while_loop(cond, body, init)
            _, _, t_best, u_b, v_b, id_b = out[:6]
            out_ref[:, 0:1] = t_best
            out_ref[:, 1:2] = u_b
            out_ref[:, 2:3] = v_b
            out_ref[:, 3:4] = jnp.where(t_best < K_HUGE, id_b, -1.0)
        else:
            # ---- phase 2: any hit over the worklist (occ carried as f32:
            # Mosaic cannot yield padded i1 vectors through a while loop)
            def cond(carry):
                i, stop = carry[0], carry[1]
                return (i < n) & jnp.logical_not(stop)

            def body(carry):
                i, _, occ = carry
                l = list_sm[i]
                row = rows_ref[l]
                valid, tt, _, _ = _mt_leaf(row, ox, oy, oz, dx, dy, dz)
                hit_here = jnp.max(
                    jnp.where(valid & live & (tt <= t_max), 1.0, 0.0),
                    axis=1, keepdims=True,
                )
                occ = jnp.maximum(occ, hit_here)
                stop = jnp.min(jnp.where(live, occ, 1.0)) >= 0.5
                return i + 1, stop, occ

            init = (jnp.int32(0), n == 0, jnp.zeros((b, 1), jnp.float32))
            _, _, occ = jax.lax.while_loop(cond, body, init)
            out_ref[:, 0:1] = occ

    return kernel


# ---------------------------------------------------------------------------
# Host-facing wrappers
# ---------------------------------------------------------------------------


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


def _traverse(table: LeafTable, ro, rd, any_hit, mask, t_max, interpret):
    r = ro.shape[0]
    r_pad = -(-r // RAY_BLOCK) * RAY_BLOCK
    packed = _pack_rays(ro, rd, mask, t_max, r_pad)
    nb = r_pad // RAY_BLOCK
    l_pad = table.l_pad
    n_chunks = l_pad // LANES
    kernel = _make_kernel(any_hit, table.num_leaves, l_pad)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((r_pad, 8), jnp.float32),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((RAY_BLOCK, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # rows (resident)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # base (resident)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # boxes_t (resident)
        ],
        out_specs=pl.BlockSpec((RAY_BLOCK, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((-(-n_chunks // 8) * 8, LANES), jnp.float32),  # tn_mat
            pltpu.VMEM((LANES, -(-n_chunks // 8) * 8), jnp.float32),  # tn_t
            pltpu.SMEM((n_chunks,), jnp.int32),      # flags
            pltpu.SMEM((8,), jnp.int32),             # n
            pltpu.SMEM((l_pad + 8,), jnp.int32),     # worklist
            pltpu.SMEM((l_pad + 8,), jnp.float32),   # entry distances
            pltpu.SMEM((l_pad + 8,), jnp.float32),   # suffix minima
        ],
        interpret=interpret,
    )(packed, table.rows, table.base, table.boxes_t)
    if any_hit:
        return out[:r, 0] > 0.5
    t = out[:r, 0]
    tri_id = out[:r, 3].astype(jnp.int32)
    return t, tri_id, out[:r, 1], out[:r, 2]


def intersect_pallas(
    table: LeafTable,
    tris: TriangleSoA,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    interpret: bool = False,
) -> Hit:
    """Closest-hit traversal (reference intersect(), Triangle.cu:144-200)."""
    t, tri_id, u, v = _traverse(
        table, ray_o, ray_d, False, mask, None, interpret
    )
    hit = tri_id >= 0
    return _shade_attrs(
        tris, tri_id, u, v, ray_o, ray_d, jnp.where(hit, t, K_HUGE), hit
    )


def occluded_pallas(
    table: LeafTable,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    t_max: jnp.ndarray | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Any-hit traversal (reference intersect_shadows, Triangle.cu:204-248)."""
    return _traverse(table, ray_o, ray_d, True, mask, t_max, interpret)
