"""Pallas TPU traversal kernel over the wide-BVH leaf table.

This is the make-or-break Mrays/s kernel (SURVEY.md §7 "hard parts"): the
XLA wide-BVH traversal (ops/wide_bvh.py) is bound by HBM gather bandwidth —
every visited node is a fresh 5 KB row gather per ray.  Here the whole leaf
table lives in VMEM and rays are processed in blocks with *per-block scalar
control flow*, which XLA cannot express but Pallas can:

  1. Prefilter (plain fused XLA, ops on [NB, B, L]): slab-test every ray
     block against every leaf AABB, reduce to the block-min entry distance
     per leaf, and argsort -> each block gets a front-to-back ordered list
     of only the leaves its rays can touch.
  2. Kernel (Pallas, grid over ray blocks): walk the block's sorted active
     list with a while loop.  Each visit is ONE dynamic VMEM row slice
     ([10, 128] leaf: 128 inline triangles, component-major) plus a fully
     vectorized [B, 128] Moller-Trumbore on the VPU — no gathers, no
     per-lane divergence.  The loop BREAKS as soon as the next leaf's entry
     distance exceeds every live ray's current best hit (front-to-back
     order makes the remaining leaves provably irrelevant), the vector
     analogue of the reference's near-child-first stack traversal
     (Triangle.cu:156-200).  The any-hit variant instead exits when every
     live ray is occluded (reference intersect_shadows, Triangle.cu:204-248).

Semantics match the reference exactly: Moller-Trumbore with backface
culling (det >= K_EPSILON), t >= 0, optional per-ray t_max for bounded
shadow rays (Triangle.cu:19-40, 74, 204-248).

Scale: the leaf table must fit in VMEM (LEAF_VMEM_LIMIT); larger scenes
fall back to the XLA wide path (ops/wide_bvh.py) — an HBM-streaming
double-buffered variant is the designed extension (the sorted active list
is exactly a DMA prefetch schedule).
"""

from __future__ import annotations

import functools
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
_FAR = jnp.float32(3e37)

# leaf rows resident in VMEM: [L, 10, 128] f32 = L * 5 KB.  Budget ~8 MB of
# the ~16 MB VMEM for the table (the rest: ray blocks, work arrays, lists).
LEAF_VMEM_LIMIT = 8 * 1024 * 1024
MAX_LEAVES = LEAF_VMEM_LIMIT // (N_COMP * LANES * 4)


@dataclass(frozen=True)
class LeafTable:
    """Flat leaf-only view of the wide BVH for the Pallas traversal.

    rows      [L, 10, 128] f32 — leaf rows (v0/e1/e2 component-major,
              comp 9 lane 1 = base triangle index, lane 2 = count)
    boxes_t   [8, L_pad] f32 — leaf AABBs transposed for the prefilter
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
    # inverted boxes for padding -> slab test can never pass the hit mask
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
# Prefilter: block-min leaf entry distance + front-to-back active list
# ---------------------------------------------------------------------------


def _safe_inv(d):
    return jnp.reciprocal(
        jnp.where(jnp.abs(d) > 1e-12, d, jnp.where(d >= 0, 1e-12, -1e-12))
    )


def _prefilter(boxes_t, n_leaves, ro, rd, live, t_cap):
    """Per ray-block front-to-back leaf schedule.

    Returns (sched [NB, L_pad, 8] f32, nact [NB] i32): for each block, the
    active leaves sorted by the block-min entry distance (sched[..., 0] =
    leaf index as f32, sched[..., 1] = that distance) and the active count.
    The 8-wide minor dim satisfies the TPU block-tiling rules so the kernel
    can dynamic-sublane-read scalars from it.  XLA fuses the whole
    [NB, B, L] slab test into the block reduction — nothing big
    materializes."""
    r = ro.shape[0]
    nb = r // RAY_BLOCK
    o = ro.reshape(nb, RAY_BLOCK, 3)
    d = rd.reshape(nb, RAY_BLOCK, 3)
    inv = _safe_inv(d)
    tn = jnp.full((nb, RAY_BLOCK, boxes_t.shape[1]), -jnp.inf)
    tf = jnp.full((nb, RAY_BLOCK, boxes_t.shape[1]), jnp.inf)
    for a in range(3):
        t0 = (boxes_t[a][None, None, :] - o[:, :, a, None]) * inv[:, :, a, None]
        t1 = (boxes_t[3 + a][None, None, :] - o[:, :, a, None]) * inv[:, :, a, None]
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    hit = (tn <= tf) & (tf >= 0.0)
    hit = hit & live.reshape(nb, RAY_BLOCK, 1)
    if t_cap is not None:
        hit = hit & (tn <= t_cap.reshape(nb, RAY_BLOCK, 1))
    tnb = jnp.min(jnp.where(hit, jnp.maximum(tn, 0.0), _FAR), axis=1)  # [NB, L]
    # mask the padding lanes explicitly: an inverted padding box does NOT
    # fail the slab test (per-axis min/max reorders the interval), so
    # padding must be excluded by index, not geometry
    lane_ok = jnp.arange(boxes_t.shape[1]) < n_leaves
    tnb = jnp.where(lane_ok[None, :], tnb, _FAR)
    order = jnp.argsort(tnb, axis=1)
    tn_sorted = jnp.take_along_axis(tnb, order, axis=1)
    nact = jnp.sum(tnb < _FAR, axis=1).astype(jnp.int32)
    sched = jnp.stack(
        [order.astype(jnp.float32), tn_sorted] + [jnp.zeros_like(tn_sorted)] * 6,
        axis=-1,
    )
    return sched, nact


# ---------------------------------------------------------------------------
# Kernels
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


def _load_rays(rays_ref):
    ox, oy, oz = rays_ref[:, 0:1], rays_ref[:, 1:2], rays_ref[:, 2:3]
    dx, dy, dz = rays_ref[:, 3:4], rays_ref[:, 4:5], rays_ref[:, 5:6]
    live = rays_ref[:, 6:7] > 0.5
    return ox, oy, oz, dx, dy, dz, live


def _closest_kernel(nact_ref, rays_ref, rows_ref, base_ref, sched_ref,
                    out_ref):
    b = rays_ref.shape[0]
    l_pad = sched_ref.shape[1]
    ox, oy, oz, dx, dy, dz, live = _load_rays(rays_ref)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    n = nact_ref[pl.program_id(0)]

    def cond(carry):
        i, stop, *_ = carry
        return (i < n) & jnp.logical_not(stop)

    def body(carry):
        i, _, t_best, u_b, v_b, id_b = carry
        l = sched_ref[0, i, 0].astype(jnp.int32)
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
        base = base_ref[l, 0]
        id_b = jnp.where(
            closer, base + first.astype(jnp.float32), id_b
        )
        u_b = jnp.where(closer, jnp.sum(uu * onehot, axis=1, keepdims=True), u_b)
        v_b = jnp.where(closer, jnp.sum(vv * onehot, axis=1, keepdims=True), v_b)
        # front-to-back break: no later leaf can beat every ray's best
        t_blk = jnp.max(jnp.where(live, t_best, -1.0))
        nxt = jnp.minimum(i + 1, l_pad - 1)
        stop = sched_ref[0, nxt, 1] > t_blk
        return i + 1, stop, t_best, u_b, v_b, id_b

    init = (
        jnp.int32(0),
        jnp.bool_(False),
        jnp.full((b, 1), K_HUGE, jnp.float32),
        jnp.zeros((b, 1), jnp.float32),
        jnp.zeros((b, 1), jnp.float32),
        jnp.full((b, 1), -1.0, jnp.float32),
    )
    steps, _, t_best, u_b, v_b, id_b = jax.lax.while_loop(cond, body, init)
    out_ref[:, 0:1] = t_best
    out_ref[:, 1:2] = u_b
    out_ref[:, 2:3] = v_b
    out_ref[:, 3:4] = jnp.where(t_best < K_HUGE, id_b, -1.0)
    # perf observability: leaf visits this block took (utils/profiling)
    out_ref[:, 4:5] = jnp.full((b, 1), 1.0, jnp.float32) * steps.astype(jnp.float32)


def _anyhit_kernel(nact_ref, rays_ref, rows_ref, base_ref, sched_ref,
                   out_ref):
    b = rays_ref.shape[0]
    ox, oy, oz, dx, dy, dz, live = _load_rays(rays_ref)
    t_max = rays_ref[:, 7:8]
    n = nact_ref[pl.program_id(0)]

    def cond(carry):
        i, stop, _ = carry
        return (i < n) & jnp.logical_not(stop)

    def body(carry):
        # occ carried as f32 0/1: Mosaic cannot yield padded i1 vectors
        # through a while loop
        i, _, occ = carry
        l = sched_ref[0, i, 0].astype(jnp.int32)
        row = rows_ref[l]
        valid, tt, _, _ = _mt_leaf(row, ox, oy, oz, dx, dy, dz)
        hit_here = jnp.max(
            jnp.where(valid & live & (tt <= t_max), 1.0, 0.0),
            axis=1, keepdims=True,
        )
        occ = jnp.maximum(occ, hit_here)
        stop = jnp.min(jnp.where(live, occ, 1.0)) >= 0.5
        return i + 1, stop, occ

    init = (jnp.int32(0), jnp.bool_(False), jnp.zeros((b, 1), jnp.float32))
    _, _, occ = jax.lax.while_loop(cond, body, init)
    out_ref[:, 0:1] = occ


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
    live = packed[:, 6] > 0.5
    sched, nact = _prefilter(
        table.boxes_t, table.num_leaves, packed[:, 0:3], packed[:, 3:6],
        live, packed[:, 7] if any_hit and t_max is not None else None,
    )
    nb = r_pad // RAY_BLOCK
    l_pad = sched.shape[1]
    kernel = _anyhit_kernel if any_hit else _closest_kernel
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((RAY_BLOCK, 8), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # rows (resident)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # base
            pl.BlockSpec((1, l_pad, 8), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RAY_BLOCK, 8), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((r_pad, 8), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(nact, packed, table.rows, table.base, sched)
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
