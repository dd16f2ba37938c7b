"""Ray-triangle intersection and BVH traversal, vectorized for TPU.

Parity targets (reference: CUDA-RayTracer/Triangle.cu):
  - Moller-Trumbore with backface culling: det < K_EPSILON rejects
    (Triangle.cu:7, 19-40, the TEST_CULL path); t < 0 rejects (Triangle.cu:74).
  - Barycentric attribute convention u*a1 + v*a2 + (1-u-v)*a0
    (Triangle.cu:76-79).
  - Closest-hit returns position/shading-normal/uv/t/material id; any-hit is
    an early-out boolean (Triangle.cu:144-248).

TPU-native design (not a port):
  - The reference traverses a binary BVH with a 64-deep per-thread stack
    (Triangle.cu:156-200).  Divergent per-lane stacks are hostile to an
    8x128-lane vector unit, so we use a *threaded* (skip-link) BVH laid out
    in depth-first order: every ray carries only a current node index; on an
    AABB hit it advances to idx+1 (first child), on a miss (or after testing
    a leaf) it jumps to the node's skip link.  All lanes execute an identical
    instruction sequence; the only divergence is the gathered node index —
    which XLA lowers to a dense gather.  Front-to-back ordering is traded for
    uniform control flow; correctness is preserved because leaf hits shrink
    t_best which tightens subsequent AABB rejection.
  - Leaves hold up to `max_leaf_prims` contiguous triangles (triangles are
    reordered at build so a static, masked inner loop covers them).
  - A dense "brute force" path (all rays x all triangles, tiled) is provided
    for tiny scenes and as the ground truth oracle for BVH tests.

Everything here is wrapped in stop_gradient by the integrator: intersection
outputs depend on scene geometry only, which is not differentiated (gradients
target materials / light radiance / env texels; SURVEY.md §7).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mc_path_tracer_tpu.ops.math import K_EPSILON, K_HUGE, build_onb, normalize


class TriangleSoA(NamedTuple):
    """Flat world-space triangle arrays (replacing dTriangle's pointer-rich
    struct, Triangle.h:11-23, with indexed SoA)."""

    v0: jnp.ndarray          # [T, 3]
    e1: jnp.ndarray          # [T, 3] v1 - v0
    e2: jnp.ndarray          # [T, 3] v2 - v0
    n0: jnp.ndarray          # [T, 3] shading normals
    n1: jnp.ndarray          # [T, 3]
    n2: jnp.ndarray          # [T, 3]
    uv0: jnp.ndarray         # [T, 2]
    uv1: jnp.ndarray         # [T, 2]
    uv2: jnp.ndarray         # [T, 2]
    material_id: jnp.ndarray  # [T] int32
    face_normal: jnp.ndarray  # [T, 3]
    # packed shading-attribute rows [T, 16] (n0 n1 n2 uv0 uv1 uv2 mat) or
    # [T, 28] when per-vertex tangents exist (+ tan0 tan1 tan2 as xyzw):
    # row gathers cost the same at any width on TPU, so hit shading reads
    # one wide row instead of many narrow gathers.  Built by the BVH
    # reorder (ops/bvh._build_binary); None before that.
    attrs: jnp.ndarray | None = None
    # per-vertex tangents [T, 4] (xyz world tangent + w handedness, the
    # reference's dVertex tangent/bitangent carriers, Triangle.h:11-23 /
    # Vertex.h); None when the mesh pipeline did not compute them
    tan0: jnp.ndarray | None = None
    tan1: jnp.ndarray | None = None
    tan2: jnp.ndarray | None = None

    @property
    def num_triangles(self) -> int:
        return self.v0.shape[0]


class BVHArrays(NamedTuple):
    """Threaded (skip-link) BVH in depth-first order.

    node i: AABB [bmin, bmax]; if count > 0 it is a leaf owning triangles
    [first, first+count) of the reordered TriangleSoA; skip is the node to
    visit when the AABB misses (or after a leaf) — the DFS successor of the
    subtree.  skip == num_nodes terminates traversal.

    `packed` carries the same data as one [N, 8] f32 row per node
    (bmin, bmax, bitcast(first*16+count), bitcast(skip)) so each traversal
    step costs a single contiguous 32-byte gather — the HBM-bandwidth
    shape TPU gathers want.
    """

    bmin: jnp.ndarray   # [N, 3] f32
    bmax: jnp.ndarray   # [N, 3] f32
    first: jnp.ndarray  # [N] int32 (leaf: triangle offset; inner: unused)
    count: jnp.ndarray  # [N] int32 (0 for inner nodes)
    skip: jnp.ndarray   # [N] int32
    packed: jnp.ndarray  # [N, 8] f32 (see above)

    @property
    def num_nodes(self) -> int:
        return self.bmin.shape[0]


def pack_bvh(bmin, bmax, first, count, skip) -> BVHArrays:
    """Assemble BVHArrays with the packed gather-friendly node table.
    Requires count < 16 (max_leaf_prims <= 15)."""
    bc = jax.lax.bitcast_convert_type
    meta = bc(first.astype(jnp.int32) * 16 + count.astype(jnp.int32), jnp.float32)
    skip_f = bc(skip.astype(jnp.int32), jnp.float32)
    packed = jnp.concatenate(
        [
            jnp.asarray(bmin, jnp.float32),
            jnp.asarray(bmax, jnp.float32),
            meta[:, None],
            skip_f[:, None],
        ],
        axis=1,
    )
    return BVHArrays(
        bmin=bmin, bmax=bmax, first=first, count=count, skip=skip, packed=packed
    )


class Hit(NamedTuple):
    """Vectorized intersection record (reference Isect, Isect.cuh:4-16:
    position, normal, tangent, bitangent, texcoord, t, was_found, tri_id,
    material)."""

    hit: jnp.ndarray          # [R] bool
    t: jnp.ndarray            # [R]
    tri_id: jnp.ndarray       # [R] int32 (-1 on miss)
    position: jnp.ndarray     # [R, 3]
    normal: jnp.ndarray       # [R, 3] interpolated shading normal
    uv: jnp.ndarray           # [R, 2] texture coords
    material_id: jnp.ndarray  # [R] int32
    tangent: jnp.ndarray      # [R, 3] shading tangent (orthonormal to normal)
    bitangent: jnp.ndarray    # [R, 3] n x t * handedness


def moller_trumbore(
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    v0: jnp.ndarray,
    e1: jnp.ndarray,
    e2: jnp.ndarray,
):
    """Batched Moller-Trumbore with backface culling.

    Inputs broadcast: rays [..., 3] against triangles [..., 3] (caller aligns
    batch axes).  Returns (valid, t, u, v) with the reference's semantics:
    det < K_EPSILON or t < 0 -> miss (Triangle.cu:19-40, 74).
    """
    pvec = jnp.cross(ray_d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.reciprocal(jnp.where(jnp.abs(det) > 1e-30, det, 1.0))
    tvec = ray_o - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(ray_d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    valid = (
        (det >= K_EPSILON)
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t >= 0.0)
    )
    return valid, t, u, v


def winner_uvt(tris: TriangleSoA, tri_id, ray_o, ray_d):
    """Exact per-ray Moller-Trumbore on one known triangle (the traversal
    winner): a single [R]-wide row gather + MT.  Used by the Pallas wrapper
    to recover numerically exact (u, v, t) and by the preview wireframe to
    recover barycentrics.  Caller must sanitize miss lanes (tri_id < 0)."""
    idx = jnp.maximum(tri_id, 0)
    v0 = tris.v0[idx]
    e1 = tris.e1[idx]
    e2 = tris.e2[idx]
    p = jnp.cross(ray_d, e2)
    det = jnp.sum(e1 * p, axis=-1)
    inv_det = jnp.reciprocal(jnp.where(jnp.abs(det) > 1e-30, det, 1.0))
    tv = ray_o - v0
    u = jnp.sum(tv * p, axis=-1) * inv_det
    q = jnp.cross(tv, e1)
    v = jnp.sum(ray_d * q, axis=-1) * inv_det
    t = jnp.sum(e2 * q, axis=-1) * inv_det
    return u, v, t


def _tangent_frame(n, tan4):
    """Orthonormal shading frame from an interpolated xyzw tangent (the
    reference interpolates tangent/bitangent per hit, Triangle.cu:66-93):
    Gram-Schmidt the tangent against the shading normal, bitangent =
    (n x t) * w (glTF handedness)."""
    t_raw = tan4[..., 0:3]
    t_ortho = t_raw - n * jnp.sum(n * t_raw, axis=-1, keepdims=True)
    bad = jnp.sum(t_ortho * t_ortho, axis=-1, keepdims=True) < 1e-12
    t_fb, _ = build_onb(n)
    t_vec = normalize(jnp.where(bad, t_fb, t_ortho))
    b_vec = jnp.cross(n, t_vec) * tan4[..., 3:4]
    return t_vec, b_vec


def _shade_attrs(tris: TriangleSoA, tri_id, u, v, ray_o, ray_d, t, hit):
    """Interpolate hit attributes with the reference's barycentric convention
    u*a1 + v*a2 + (1-u-v)*a0 (Triangle.cu:76-79)."""
    tid = jnp.maximum(tri_id, 0)
    w = (1.0 - u - v)[..., None]
    uu, vv = u[..., None], v[..., None]
    if tris.attrs is not None:
        a = tris.attrs[tid]                    # one wide row gather
        n = normalize(uu * a[..., 3:6] + vv * a[..., 6:9] + w * a[..., 0:3])
        uv = uu * a[..., 11:13] + vv * a[..., 13:15] + w * a[..., 9:11]
        mat = jnp.where(hit, a[..., 15].astype(jnp.int32), 0)
        if a.shape[-1] >= 28:
            tan4 = uu * a[..., 20:24] + vv * a[..., 24:28] + w * a[..., 16:20]
            t_vec, b_vec = _tangent_frame(n, tan4)
        else:
            t_vec, b_vec = build_onb(n)
    else:
        n = normalize(uu * tris.n1[tid] + vv * tris.n2[tid] + w * tris.n0[tid])
        uv = uu * tris.uv1[tid] + vv * tris.uv2[tid] + w * tris.uv0[tid]
        mat = jnp.where(hit, tris.material_id[tid], 0)
        if tris.tan0 is not None:
            tan4 = (uu * tris.tan1[tid] + vv * tris.tan2[tid]
                    + w * tris.tan0[tid])
            t_vec, b_vec = _tangent_frame(n, tan4)
        else:
            t_vec, b_vec = build_onb(n)
    pos = ray_o + t[..., None] * ray_d
    return Hit(
        hit=hit,
        t=t,
        tri_id=jnp.where(hit, tri_id, -1),
        position=pos,
        normal=n,
        uv=uv,
        material_id=mat,
        tangent=t_vec,
        bitangent=b_vec,
    )


# ---------------------------------------------------------------------------
# Brute-force (dense) intersection — oracle + tiny-scene fast path
# ---------------------------------------------------------------------------


def intersect_brute(tris: TriangleSoA, ray_o: jnp.ndarray, ray_d: jnp.ndarray) -> Hit:
    """Closest hit of rays [R, 3] against *all* triangles (dense [R, T])."""
    ro = ray_o[:, None, :]
    rd = ray_d[:, None, :]
    valid, t, u, v = moller_trumbore(ro, rd, tris.v0[None], tris.e1[None], tris.e2[None])
    t_masked = jnp.where(valid, t, K_HUGE)
    best = jnp.argmin(t_masked, axis=-1)
    r = jnp.arange(ray_o.shape[0])
    t_best = t_masked[r, best]
    hit = t_best < K_HUGE
    return _shade_attrs(
        tris, best.astype(jnp.int32), u[r, best], v[r, best], ray_o, ray_d, t_best, hit
    )


def occluded_brute(
    tris: TriangleSoA,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    t_max: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Any-hit: True where some triangle blocks the ray (reference
    intersect_shadows, Triangle.cu:204-248).  The reference's lights live at
    infinity so it has no t_max; area lights (our completion of the
    abandoned dAreaLight) need blockers *between* surface and light, so an
    optional per-ray t_max bounds the test."""
    ro = ray_o[:, None, :]
    rd = ray_d[:, None, :]
    valid, t, _, _ = moller_trumbore(ro, rd, tris.v0[None], tris.e1[None], tris.e2[None])
    if t_max is not None:
        valid = valid & (t <= t_max[:, None])
    return jnp.any(valid, axis=-1)


# ---------------------------------------------------------------------------
# Threaded-BVH traversal
# ---------------------------------------------------------------------------


def _slab_test(bmin, bmax, ray_o, inv_d, t_best):
    """AABB slab test with precomputed inverse direction
    (reference Bounds3f.h:121-153)."""
    t0 = (bmin - ray_o) * inv_d
    t1 = (bmax - ray_o) * inv_d
    tnear = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tfar = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return (tnear <= tfar) & (tfar >= 0.0) & (tnear <= t_best)


# Rays per lockstep while_loop.  Chunking here is a fallback for callers
# that pass very large batches directly; the integrator already blocks the
# frame into ~64k-ray chunks (one dispatch per chunk through the whole
# bounce pipeline), which is the efficient path.
TRAVERSE_CHUNK = 131072

# Traversal steps executed per while_loop iteration.  The loop condition is
# a cross-lane reduction whose evaluation carries substantial per-iteration
# overhead on the TPU runtime; unrolling amortizes it (finished lanes are
# masked, so the extra in-iteration steps are cheap wasted lanes at worst).
TRAVERSE_UNROLL = 8


def _traverse_chunk(
    packed_nodes: jnp.ndarray,   # [N, 8]
    tri_geo: jnp.ndarray,        # [T, 9] (v0, e1, e2)
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    start_idx: jnp.ndarray,
    max_leaf_prims: int,
    any_hit: bool,
    max_steps: int,
    t_max: jnp.ndarray | None = None,
):
    """Single-chunk skip-link traversal.  One 32-byte node gather per step;
    leaf triangles via masked 36-byte gathers.  Lockstep over the chunk's
    lanes only, so a chunk whose rays all finish early exits early."""
    num_rays = ray_o.shape[0]
    n_nodes = packed_nodes.shape[0]
    n_tris = tri_geo.shape[0]
    bc = jax.lax.bitcast_convert_type
    inv_d = jnp.reciprocal(
        jnp.where(jnp.abs(ray_d) > 1e-12, ray_d, jnp.where(ray_d >= 0, 1e-12, -1e-12))
    )

    def cond(state):
        idx, t_best, tri_id, u, v, occ, steps = state
        active = idx < n_nodes
        if any_hit:
            active = active & ~occ
        return jnp.any(active) & (steps < max_steps)

    def one_step(idx, t_best, tri_id, u_best, v_best, occ):
        safe = jnp.minimum(idx, n_nodes - 1)
        row = packed_nodes[safe]                    # [R, 8] single gather
        bmin = row[:, 0:3]
        bmax = row[:, 3:6]
        meta = bc(row[:, 6], jnp.int32)
        first = meta >> 4
        count = meta & 15
        skip = bc(row[:, 7], jnp.int32)
        live = idx < n_nodes
        if any_hit:
            live = live & ~occ

        box_hit = _slab_test(bmin, bmax, ray_o, inv_d, t_best) & live
        is_leaf = (count > 0) & box_hit

        # masked static loop over the (<= max_leaf_prims) leaf triangles
        for k in range(max_leaf_prims):
            in_leaf = is_leaf & (k < count)
            tid = jnp.minimum(first + k, n_tris - 1)
            g = tri_geo[tid]                        # [R, 9] gather
            valid, t, u, v = moller_trumbore(
                ray_o, ray_d, g[:, 0:3], g[:, 3:6], g[:, 6:9]
            )
            valid = valid & in_leaf
            if any_hit:
                if t_max is not None:
                    valid = valid & (t <= t_max)
                occ = occ | valid
            else:
                closer = valid & (t < t_best)
                t_best = jnp.where(closer, t, t_best)
                tri_id = jnp.where(closer, tid, tri_id)
                u_best = jnp.where(closer, u, u_best)
                v_best = jnp.where(closer, v, v_best)

        # inner-node hit -> descend (DFS successor is idx+1); else skip
        idx = jnp.where(live, jnp.where(box_hit & ~is_leaf, idx + 1, skip), idx)
        return idx, t_best, tri_id, u_best, v_best, occ

    def body(state):
        idx, t_best, tri_id, u_best, v_best, occ, steps = state
        # TRAVERSE_UNROLL steps per loop-condition evaluation (the cond's
        # cross-lane reduction dominates per-iteration cost on this runtime)
        for _ in range(TRAVERSE_UNROLL):
            idx, t_best, tri_id, u_best, v_best, occ = one_step(
                idx, t_best, tri_id, u_best, v_best, occ
            )
        return idx, t_best, tri_id, u_best, v_best, occ, steps + TRAVERSE_UNROLL

    state = (
        start_idx,
        jnp.full(num_rays, K_HUGE, jnp.float32),
        jnp.full(num_rays, -1, jnp.int32),
        jnp.zeros(num_rays, jnp.float32),
        jnp.zeros(num_rays, jnp.float32),
        jnp.zeros(num_rays, bool),
        jnp.zeros((), jnp.int32),
    )
    idx, t_best, tri_id, u, v, occ, _ = jax.lax.while_loop(cond, body, state)
    return t_best, tri_id, u, v, occ


def _traverse(
    bvh: BVHArrays,
    tris: TriangleSoA,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    max_leaf_prims: int,
    any_hit: bool,
    max_steps: int | None = None,
    mask: jnp.ndarray | None = None,
    t_max: jnp.ndarray | None = None,
):
    """Skip-link traversal over all rays.  Returns (t, tri_id, u, v) for
    closest-hit, or a bool occlusion mask for any_hit=True.

    Rays with mask=False start at the terminal node and cost zero traversal
    steps (the vectorized equivalent of the reference's queue compaction).
    Large batches are processed in chunks of TRAVERSE_CHUNK rays via
    lax.map: lockstep cost is paid per chunk, not per frame, so a mostly-
    finished chunk stops stepping long before the frame's worst-case ray.
    """
    num_rays = ray_o.shape[0]
    n_nodes = bvh.num_nodes
    if max_steps is None:
        max_steps = 4 * n_nodes + 8
    tri_geo = jnp.concatenate([tris.v0, tris.e1, tris.e2], axis=1)

    start_idx = jnp.zeros(num_rays, jnp.int32)
    if mask is not None:
        start_idx = jnp.where(mask, start_idx, n_nodes)

    if num_rays > 2 * TRAVERSE_CHUNK:
        pad = (-num_rays) % TRAVERSE_CHUNK

        def padded(x, fill):
            return jnp.concatenate(
                [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)], axis=0
            ).reshape((num_rays + pad) // TRAVERSE_CHUNK, TRAVERSE_CHUNK, *x.shape[1:])

        tmax_in = (
            padded(t_max, 0.0)
            if t_max is not None
            else padded(jnp.full(num_rays, K_HUGE, jnp.float32), 0.0)
        )

        def run(args):
            ro, rd, si, tm = args
            return _traverse_chunk(
                bvh.packed, tri_geo, ro, rd, si, max_leaf_prims, any_hit,
                max_steps, t_max=tm if t_max is not None else None,
            )

        t, tri_id, u, v, occ = jax.lax.map(
            run,
            (padded(ray_o, 0.0), padded(ray_d, 1.0), padded(start_idx, n_nodes),
             tmax_in),
        )
        unpad = lambda x: x.reshape(-1, *x.shape[2:])[:num_rays]
        t, tri_id, u, v, occ = map(unpad, (t, tri_id, u, v, occ))
    else:
        t, tri_id, u, v, occ = _traverse_chunk(
            bvh.packed, tri_geo, ray_o, ray_d, start_idx,
            max_leaf_prims, any_hit, max_steps, t_max=t_max,
        )

    if any_hit:
        return occ
    return t, tri_id, u, v


def intersect_bvh(
    bvh: BVHArrays,
    tris: TriangleSoA,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    max_leaf_prims: int = 4,
    mask: jnp.ndarray | None = None,
) -> Hit:
    """Closest-hit traversal (reference intersect(), Triangle.cu:144-200)."""
    t, tri_id, u, v = _traverse(
        bvh, tris, ray_o, ray_d, max_leaf_prims, any_hit=False, mask=mask
    )
    hit = tri_id >= 0
    return _shade_attrs(tris, tri_id, u, v, ray_o, ray_d, jnp.where(hit, t, K_HUGE), hit)


def occluded_bvh(
    bvh: BVHArrays,
    tris: TriangleSoA,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    max_leaf_prims: int = 4,
    mask: jnp.ndarray | None = None,
    t_max: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Any-hit traversal (reference intersect_shadows, Triangle.cu:204-248)."""
    return _traverse(
        bvh, tris, ray_o, ray_d, max_leaf_prims, any_hit=True, mask=mask,
        t_max=t_max,
    )
