"""Wide (16-ary) BVH with 128 inline leaf triangles — the gather-optimal
acceleration structure for TPU.

Why this shape (all numbers measured on the target chip at 64k lanes):
  - XLA row gathers are row-count-bound: ~1 ms per 64k-row gather for any
    row width up to ~1 KB (2-3.5 ms at 5 KB).  The binary skip-link
    traversal (ops/intersect.py) pays 5 narrow gathers per step and visits
    100-300 nodes per ray — gather-bound end to end.  Packing node + leaf
    payload into one fat row and visiting only *hit* nodes cuts rows
    touched per ray to ~10-40.
  - Slicing the minor (lane) dimension of a gathered row costs ~0.6 ms per
    unaligned slice (lane-crossing relayout), which dwarfs the math.  Rows
    are therefore **component-major** [10, 128]: component c of all 128
    triangles lives in row[c, :], so every triangle test is one fully
    vectorized [R, 128] VPU op with zero lane slicing.  Scalar metadata is
    read with exact one-hot dot products, not lane slices.
  - An inner row holds the AABBs of up to 16 children (components 0-5,
    lanes 0-15); a leaf row holds up to 128 triangles (components 0-8 =
    v0.xyz e1.xyz e2.xyz).  Component 9 lane 0/1/2 = (is_leaf, base, count).
  - Instead of the reference's 64-deep per-thread stack (Triangle.cu:
    156-200), each lane keeps a *trail*: per level, the untried hit
    children packed as 4-bit slots in two int32s, consumed near-to-far
    (closest-hit; the vector equivalent of the reference's dirIsNeg
    near-child-first ordering) or in slot order (any-hit).  The wide tree
    is shallow (depth 3-5), and push/pop are static one-hot selects over
    the level axis — no scatters, one instruction stream for all lanes.

Capability parity: closest-hit and any-hit traversal semantics match the
reference's intersect()/intersect_shadows() (Triangle.cu:144-248) —
Moller-Trumbore with backface culling, t >= 0, optional t_max for bounded
shadow rays (area lights).  The build collapses the binary SAH tree
(native/bvh.cpp, reference BVH.cu:53-334) so split quality is inherited.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from mc_path_tracer_tpu.ops.intersect import (
    Hit,
    TriangleSoA,
    _shade_attrs,
)
from mc_path_tracer_tpu.ops.math import K_EPSILON, K_HUGE

N_COMP = 10
LANES = 128
BRANCHING = 16          # children per inner row
LEAF_TRIS = LANES       # triangles inline per leaf row

_META_COMP = 9          # component row: lane 0 is_leaf, 1 base/first, 2 count
_FAR = jnp.float32(3e37)


@dataclass(frozen=True)
class WideBVH:
    """Wide-BVH row table.  `depth` is jit-static metadata (it sets the
    trail-stack size, a structural property of the compiled traversal)."""

    rows: jnp.ndarray   # [N, 10, 128] f32 (pytree leaf)
    depth: int          # static: wide-tree depth in levels

    @property
    def num_rows(self) -> int:
        return self.rows.shape[0]


jax.tree_util.register_dataclass(
    WideBVH, data_fields=["rows"], meta_fields=["depth"]
)


def build_wide(
    bmin: np.ndarray,
    bmax: np.ndarray,
    first: np.ndarray,
    count: np.ndarray,
    skip: np.ndarray,
    tri_v0: np.ndarray,
    tri_e1: np.ndarray,
    tri_e2: np.ndarray,
    branching: int = BRANCHING,
    leaf_tris: int = LEAF_TRIS,
) -> WideBVH:
    """Collapse a threaded binary BVH (depth-first bmin/bmax/first/count/skip
    arrays, triangles already in leaf order) into the wide row table.

    Host-side numpy; runs at scene build.
    """
    n = bmin.shape[0]
    left = np.arange(1, n + 1)          # left child of inner i is i+1
    right = np.empty(n, np.int64)
    right[: n - 1] = skip[1:]           # right child = skip of left child
    right[n - 1] = n

    # subtree triangle ranges: leaves own contiguous [first, first+count)
    # in depth-first leaf order, so a subtree's triangles are the contiguous
    # union; reverse scan fills inner nodes from their children.
    tf = np.array(first, np.int64)
    tc = np.array(count, np.int64)
    for i in range(n - 1, -1, -1):
        if count[i] == 0:
            l, r = left[i], right[i]
            tf[i] = tf[l]
            tc[i] = tc[l] + tc[r]

    rows: list = []

    def new_row():
        rows.append(None)
        return len(rows) - 1

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 10000))

    def merged_entries(cut):
        """Children of a wide node: cut subtrees in DFS (= triangle-range)
        order, with runs of adjacent small subtrees merged into single fuller
        leaves (their triangle ranges are contiguous, so a merged leaf is
        just a wider range; its AABB is the union).  Raises leaf fill from
        ~60% toward capacity, shrinking both rows and traversal steps."""
        entries = []  # ("node", id) | ("leaf", tf, tc, bmin, bmax)
        for c in sorted(cut, key=lambda x: tf[x]):
            if tc[c] > leaf_tris:
                entries.append(("node", c))
                continue
            if (
                entries
                and entries[-1][0] == "leaf"
                and entries[-1][2] + tc[c] <= leaf_tris
            ):
                _, f0, c0, lo, hi = entries[-1]
                entries[-1] = (
                    "leaf", f0, c0 + int(tc[c]),
                    np.minimum(lo, bmin[c]), np.maximum(hi, bmax[c]),
                )
            else:
                entries.append(
                    ("leaf", int(tf[c]), int(tc[c]),
                     bmin[c].copy(), bmax[c].copy())
                )
        return entries

    def fill(i: int, rid: int) -> int:
        """Build the wide node for binary subtree i into row rid; returns
        subtree depth in wide levels."""
        if tc[i] <= leaf_tris:
            rows[rid] = ("leaf", int(tf[i]), int(tc[i]))
            return 1
        # collect up to `branching` cut nodes under i, expanding the
        # largest-triangle-count inner node first (greedy SAH-ish cut)
        cut = [left[i], right[i]]
        while len(merged_entries(cut)) < branching:
            cand = [c for c in cut if count[c] == 0 and tc[c] > leaf_tris]
            if not cand:
                break
            c = max(cand, key=lambda x: tc[x])
            cut.remove(c)
            cut.extend([left[c], right[c]])
        entries = merged_entries(cut)
        base = len(rows)
        for _ in entries:
            new_row()
        boxes = []
        d = 0
        for k, e in enumerate(entries):
            if e[0] == "node":
                boxes.append((bmin[e[1]].copy(), bmax[e[1]].copy()))
                d = max(d, fill(e[1], base + k))
            else:
                _, f, c, lo, hi = e
                rows[base + k] = ("leaf", f, c)
                boxes.append((lo, hi))
                d = max(d, 1)
        rows[rid] = ("inner", base, boxes)
        return 1 + d

    root = new_row()
    depth = fill(0, root)
    sys.setrecursionlimit(old_limit)

    table = np.zeros((len(rows), N_COMP, LANES), np.float32)
    tri9 = np.stack([tri_v0, tri_e1, tri_e2], axis=1).reshape(-1, 9)
    for rid, row in enumerate(rows):
        if row[0] == "leaf":
            _, f, c = row
            # components 0..8 = v0.xyz e1.xyz e2.xyz over the lane axis;
            # absent lanes stay zero (e1 = e2 = 0 -> det 0 -> culled)
            table[rid, 0:9, :c] = tri9[f : f + c].T.astype(np.float32)
            table[rid, _META_COMP, 0] = 1.0
            table[rid, _META_COMP, 1] = float(f)
            table[rid, _META_COMP, 2] = float(c)
        else:
            _, base, boxes = row
            # components 0..5 = child bmin.xyz bmax.xyz, lanes 0..15;
            # absent children masked by count at traversal (an inverted
            # padding box does NOT fail the slab test)
            for k, (lo, hi) in enumerate(boxes):
                table[rid, 0:3, k] = lo
                table[rid, 3:6, k] = hi
            table[rid, _META_COMP, 0] = 0.0
            table[rid, _META_COMP, 1] = float(base)
            table[rid, _META_COMP, 2] = float(len(boxes))
    return WideBVH(rows=jnp.asarray(table), depth=depth)


# ---------------------------------------------------------------------------
# Traversal
# ---------------------------------------------------------------------------

WIDE_UNROLL = 4

# exact scalar extraction from the meta component: one-hot dot (all stored
# meta values are small integers, exact in f32 — no denormal bitcasts, which
# TPU arithmetic would flush to zero)
_SEL = np.zeros((LANES, 3), np.float32)
_SEL[0, 0] = _SEL[1, 1] = _SEL[2, 2] = 1.0


def _run_phase(
    rows: jnp.ndarray,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    depth: int,
    any_hit: bool,
    t_max: jnp.ndarray | None,
    d0: jnp.ndarray,
    seeds,
    max_steps,
):
    """One lockstep traversal run from a fresh root trail.  Per while-step
    each lane either consumes one untried hit child from its trail (one row
    gather + tests) or pops a level.  All lanes run the identical
    instruction stream; finished lanes idle on row 0.

    `seeds` = (t_best, tri_id, u, v, occ, lane_steps) carried in — a later
    phase restarts stragglers from the root with the t_best found so far,
    which prunes the already-resolved part of the tree immediately.
    Returns the updated seeds plus the final per-lane depth d.
    """
    num_rays = ray_o.shape[0]
    n_rows = rows.shape[0]
    inv_d = jnp.reciprocal(
        jnp.where(jnp.abs(ray_d) > 1e-12, ray_d, jnp.where(ray_d >= 0, 1e-12, -1e-12))
    )
    ox, oy, oz = ray_o[:, 0:1], ray_o[:, 1:2], ray_o[:, 2:3]
    dx, dy, dz = ray_d[:, 0:1], ray_d[:, 1:2], ray_d[:, 2:3]
    ix, iy, iz = inv_d[:, 0:1], inv_d[:, 1:2], inv_d[:, 2:3]
    levels = depth + 1
    sel = jnp.asarray(_SEL)
    lane = jnp.arange(LANES, dtype=jnp.int32)[None, :]
    slot16 = jnp.arange(16, dtype=jnp.int32)[None, :]

    def one_step(d, bases, los, his, cnts, t_best, tri_id, u_best, v_best, occ):
        # read the trail top (static one-hot over levels).  Each level holds
        # the children's base row plus the untried child slots packed as
        # nibbles in (lo, hi) and the remaining count.
        b = jnp.zeros(num_rays, jnp.int32)
        lo = jnp.zeros(num_rays, jnp.int32)
        hi = jnp.zeros(num_rays, jnp.int32)
        cnt = jnp.zeros(num_rays, jnp.int32)
        for l in range(levels):
            at = d == l
            b = jnp.where(at, bases[l], b)
            lo = jnp.where(at, los[l], lo)
            hi = jnp.where(at, his[l], hi)
            cnt = jnp.where(at, cnts[l], cnt)
        alive = d >= 0
        pop = alive & (cnt == 0)
        consume = alive & ~pop
        d_after = jnp.where(pop, d - 1, d)

        k = lo & 15                               # next untried child
        row_idx = jnp.where(consume, b + k, 0)
        row = rows[row_idx]                       # [R, 10, 128] — THE gather

        # HIGHEST precision is required: the TPU default lowers f32 dots to
        # bf16 passes, which silently rounds stored integers > 256 (leaf
        # base triangle indices / child row bases on real scenes) and sends
        # the traversal to garbage rows.  CPU is unaffected, so only
        # on-chip runs ever saw it.
        meta = jax.lax.dot_general(
            row[:, _META_COMP, :], sel,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                          # [R, 3] exact
        is_leaf = consume & (meta[:, 0] > 0.5)
        is_inner = consume & ~is_leaf
        base_or_first = meta[:, 1].astype(jnp.int32)
        count_f = meta[:, 2]

        # ---- inner: slab-test child AABBs (lanes 0..15; full-lane math) ----
        t0x = (row[:, 0, :] - ox) * ix
        t1x = (row[:, 3, :] - ox) * ix
        t0y = (row[:, 1, :] - oy) * iy
        t1y = (row[:, 4, :] - oy) * iy
        t0z = (row[:, 2, :] - oz) * iz
        t1z = (row[:, 5, :] - oz) * iz
        tnear = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.minimum(t0z, t1z),
        )
        tfar = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.maximum(t0z, t1z),
        )
        # NOTE: an inverted padding box does NOT fail the slab test (per-axis
        # min/max reorders the interval), so absent children must be masked
        # by count explicitly.
        child_hit = (
            (tnear <= tfar)
            & (tfar >= 0.0)
            & (tnear <= t_best[:, None])
            & (lane.astype(jnp.float32) < count_f[:, None])
            & is_inner[:, None]
        )
        cnt_new = jnp.sum(child_hit.astype(jnp.int32), axis=-1)
        if any_hit:
            # any-hit needs no ordering: pack hit slots in slot order
            rank = jnp.cumsum(child_hit.astype(jnp.int32), axis=-1) - 1
            rank = rank[:, :16]
            hit16 = child_hit[:, :16]
        else:
            # near-to-far nibble order: rank each hit child by counting hit
            # children strictly nearer (ties by slot).  Front-to-back
            # consumption tightens t_best as early as possible so later
            # pushes are culled (the reference's dirIsNeg near-child-first
            # ordering, Triangle.cu:177-186, vectorized).
            tn16 = jnp.where(child_hit, tnear, _FAR)[:, :16]
            hit16 = child_hit[:, :16]
            ta, tb_ = tn16[:, :, None], tn16[:, None, :]
            ja, jb = slot16[:, :, None], slot16[:, None, :]
            nearer = (tb_ < ta) | ((tb_ == ta) & (jb < ja))
            rank = jnp.sum((nearer & hit16[:, None, :]).astype(jnp.int32), axis=-1)
        shift = 4 * jnp.where(rank < 8, rank, rank - 8)
        in_lo = hit16 & (rank < 8)
        in_hi = hit16 & (rank >= 8)
        lo_new = jnp.sum(jnp.where(in_lo, slot16 << shift, 0), axis=-1)
        hi_new = jnp.sum(jnp.where(in_hi, slot16 << shift, 0), axis=-1)
        push = is_inner & (cnt_new > 0)

        # ---- leaf: 128 inline triangles, fully vectorized over lanes ----
        v0x, v0y, v0z = row[:, 0, :], row[:, 1, :], row[:, 2, :]
        e1x, e1y, e1z = row[:, 3, :], row[:, 4, :], row[:, 5, :]
        e2x, e2y, e2z = row[:, 6, :], row[:, 7, :], row[:, 8, :]
        # Moller-Trumbore, component form (Triangle.cu:19-40 TEST_CULL)
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
            & is_leaf[:, None]
        )
        if any_hit:
            if t_max is not None:
                valid = valid & (tt <= t_max[:, None])
            occ = occ | jnp.any(valid, axis=-1)
        else:
            tmask = jnp.where(valid, tt, K_HUGE)
            tb = jnp.min(tmask, axis=-1)
            # gather-free payload select: one-hot of the (first) min lane
            is_min = (tmask <= tb[:, None]) & (tmask < K_HUGE)
            first_min = jnp.min(jnp.where(is_min, lane, LANES), axis=-1)
            onehot = (lane == first_min[:, None]).astype(jnp.float32)
            closer = tb < t_best
            t_best = jnp.where(closer, tb, t_best)
            tri_id = jnp.where(closer, base_or_first + first_min, tri_id)
            u_best = jnp.where(closer, jnp.sum(uu * onehot, axis=-1), u_best)
            v_best = jnp.where(closer, jnp.sum(vv * onehot, axis=-1), v_best)

        # ---- trail update: advance the order at d; push children at d+1 ----
        # Shifts must be LOGICAL: with >= 9 hit children the rank-7 nibble can
        # set bit 31 of `lo`, and an arithmetic >> would sign-extend, turning
        # the incoming nibble into 15 and corrupting the remaining trail
        # (missed hits / light leaks on dense 16-wide nodes).
        d_next = jnp.where(push, d_after + 1, d_after)
        lo_adv = ((lo >> 4) & 0x0FFFFFFF) | ((hi & 15) << 28)
        hi_adv = (hi >> 4) & 0x0FFFFFFF
        new_bases, new_los, new_his, new_cnts = [], [], [], []
        for l in range(levels):
            at_top = consume & (d == l)
            at_push = push & (d_next == l)
            new_los.append(
                jnp.where(at_push, lo_new, jnp.where(at_top, lo_adv, los[l]))
            )
            new_his.append(
                jnp.where(at_push, hi_new, jnp.where(at_top, hi_adv, his[l]))
            )
            new_cnts.append(
                jnp.where(at_push, cnt_new, jnp.where(at_top, cnt - 1, cnts[l]))
            )
            new_bases.append(jnp.where(at_push, base_or_first, bases[l]))
        if any_hit:
            d_next = jnp.where(occ, -1, d_next)
        return (
            d_next, new_bases, new_los, new_his, new_cnts,
            t_best, tri_id, u_best, v_best, occ, alive,
        )

    def cond(state):
        d = state[0]
        steps = state[-1]
        return jnp.any(d >= 0) & (steps < max_steps)

    def body(state):
        *s, lane_steps, steps = state
        for _ in range(WIDE_UNROLL):
            *s, alive = one_step(*s)
            lane_steps = lane_steps + alive.astype(jnp.int32)
        return (*s, lane_steps, steps + WIDE_UNROLL)

    t_best0, tri_id0, u0, v0, occ0, lane_steps0 = seeds
    zeros = lambda: [jnp.zeros(num_rays, jnp.int32) for _ in range(levels)]
    cnts0 = [
        jnp.where(d0 >= 0, 1, 0) if l == 0 else jnp.zeros(num_rays, jnp.int32)
        for l in range(levels)
    ]
    state = (
        d0,
        zeros(),            # bases (root row is 0)
        zeros(),            # los: root trail nibble 0 -> the root row itself
        zeros(),            # his
        cnts0,
        t_best0,
        tri_id0,
        u0,
        v0,
        occ0,
        lane_steps0,
        jnp.zeros((), jnp.int32),
    )
    out = jax.lax.while_loop(cond, body, state)
    return out[5], out[6], out[7], out[8], out[9], out[10], out[0]


# phase-1 step budget (multiple of WIDE_UNROLL) and rescue width: phase 1
# runs the full batch in lockstep for RESCUE_STEPS, then the unresolved
# stragglers (typically <10% of lanes — the lockstep tail would otherwise
# stall the whole batch at full gather bandwidth) restart at RESCUE_LANES.
RESCUE_STEPS = 16
RESCUE_LANES = 16384


def _fresh_seeds(num_rays):
    return (
        jnp.full(num_rays, K_HUGE, jnp.float32),
        jnp.full(num_rays, -1, jnp.int32),
        jnp.zeros(num_rays, jnp.float32),
        jnp.zeros(num_rays, jnp.float32),
        jnp.zeros(num_rays, bool),
        jnp.zeros(num_rays, jnp.int32),
    )


def _traverse_wide(
    rows: jnp.ndarray,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    depth: int,
    any_hit: bool,
    mask: jnp.ndarray | None = None,
    t_max: jnp.ndarray | None = None,
    debug_steps: bool = False,
):
    """Trail-stack traversal with straggler rescue.

    Lockstep cost is max-lane-bound while per-lane work is heavily skewed
    (median ~6 rows, tail ~50+), and idle lanes still pay full gather
    bandwidth.  So: phase 1 runs everyone for RESCUE_STEPS; phase 2
    restarts the unresolved tail (compacted to RESCUE_LANES lanes, seeded
    with phase-1 t_best so the resolved subtree prunes instantly); phase 3
    is a full-width fallback for the (normally empty) overflow, so the
    result is exact for any straggler count.
    """
    num_rays = ray_o.shape[0]
    n_rows = rows.shape[0]
    full_steps = 8 * n_rows + 64
    d0 = jnp.zeros(num_rays, jnp.int32)
    if mask is not None:
        d0 = jnp.where(mask, 0, -1)
    seeds = _fresh_seeds(num_rays)

    if num_rays < 4 * RESCUE_LANES:
        out = _run_phase(
            rows, ray_o, ray_d, depth, any_hit, t_max, d0, seeds, full_steps
        )
        t_best, tri_id, u, v, occ, lane_steps, _ = out
    else:
        rescue = RESCUE_LANES

        def compacted_run(want, seedsw, max_steps):
            """Run one phase on the `want` lanes compacted to RESCUE_LANES
            (active-first argsort), scattered back into full-width seeds."""
            perm = jnp.argsort(jnp.where(want, 0, 1))[:rescue]
            sub = lambda a: a[perm]
            outs = _run_phase(
                rows, sub(ray_o), sub(ray_d), depth, any_hit,
                None if t_max is None else sub(t_max),
                jnp.where(want[perm], 0, -1),
                tuple(sub(a) for a in seedsw), max_steps,
            )
            merged = tuple(
                a.at[perm].set(o) for a, o in zip(seedsw, outs[:6])
            )
            selected = jnp.zeros(num_rays, bool).at[perm].set(True)
            return merged, want & ~selected

        def fallback(leftover, seedsw):
            """Exact full-width pass for compaction overflow (normally a
            zero-iteration while)."""
            return _run_phase(
                rows, ray_o, ray_d, depth, any_hit, t_max,
                jnp.where(leftover, 0, -1), seedsw, full_steps,
            )[:6]

        def small_route(_):
            # few active lanes (late bounces after RR, mixed sky blocks):
            # skip the full-width phase entirely — the whole traversal runs
            # compacted at RESCUE_LANES, 4x less gather bandwidth
            merged, leftover = compacted_run(d0 >= 0, seeds, full_steps)
            return fallback(leftover, merged)

        def full_route(_):
            # phase 1: full width, bounded steps
            *p1, d1 = _run_phase(
                rows, ray_o, ray_d, depth, any_hit, t_max, d0, seeds,
                RESCUE_STEPS,
            )
            # phase 2 (x2 rounds): compact the straggler tail, restart from
            # the root (seeded with phase-1 t_best: the resolved subtree
            # prunes instantly).  Two rounds cover tails up to 2x the rescue
            # width — horizon-grazing blocks leave ~half the batch
            # unresolved at phase-1's budget, and one round would spill them
            # into the expensive full-width fallback.  A no-op round costs
            # one zero-iteration while.  Phase 3: exact full-width fallback.
            merged, leftover = compacted_run(d1 >= 0, tuple(p1), full_steps)
            merged, leftover = compacted_run(leftover, merged, full_steps)
            return fallback(leftover, merged)

        n_active = jnp.sum((d0 >= 0).astype(jnp.int32))
        t_best, tri_id, u, v, occ, lane_steps = jax.lax.cond(
            n_active <= rescue, small_route, full_route, None
        )
    if debug_steps:
        return t_best, tri_id, u, v, occ, lane_steps
    if any_hit:
        return occ
    return t_best, tri_id, u, v


def intersect_wide(
    wide: WideBVH,
    tris: TriangleSoA,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    mask: jnp.ndarray | None = None,
) -> Hit:
    """Closest-hit traversal (reference intersect(), Triangle.cu:144-200)."""
    t, tri_id, u, v = _traverse_wide(
        wide.rows, ray_o, ray_d, wide.depth, any_hit=False, mask=mask
    )
    hit = tri_id >= 0
    return _shade_attrs(
        tris, tri_id, u, v, ray_o, ray_d, jnp.where(hit, t, K_HUGE), hit
    )


def occluded_wide(
    wide: WideBVH,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    t_max: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Any-hit traversal (reference intersect_shadows, Triangle.cu:204-248)."""
    return _traverse_wide(
        wide.rows, ray_o, ray_d, wide.depth, any_hit=True, mask=mask, t_max=t_max
    )
