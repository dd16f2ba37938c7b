"""Pallas dense intersection kernel: all rays x all triangles in VMEM.

For small scenes (<= a few thousand triangles) BVH gathers are pure
overhead on TPU — the winning layout is dense: stream ray blocks through
VMEM and test every triangle with fully-vectorized Moller-Trumbore on the
VPU, keeping a running closest hit.  No gathers, no divergence, perfect
lane utilization; this is the TPU answer to the reference's wf_extend /
wf_shadow kernels (wavefront_kernels.cu:253-293) at small scene scale.

Triangle data layout: [T, 9] = (v0, e1, e2), padded to a multiple of 8 rows
with degenerate triangles (e1 = e2 = 0 -> det 0 -> culled).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mc_path_tracer_tpu.ops.math import K_EPSILON, K_HUGE

RAY_BLOCK = 512
TRI_BLOCK = 128


def _mt_block(ro, rd, tri):
    """Rays [R, 3] x triangles [T, 9] -> (valid [R, T], t, u, v)."""
    v0 = tri[None, :, 0:3]
    e1 = tri[None, :, 3:6]
    e2 = tri[None, :, 6:9]
    ro = ro[:, None, :]
    rd = rd[:, None, :]
    pvec = jnp.cross(rd, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > 1e-30, 1.0 / det, 0.0)
    tvec = ro - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(rd * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    valid = (
        (det >= K_EPSILON)
        & (u >= 0.0) & (u <= 1.0)
        & (v >= 0.0) & (u + v <= 1.0)
        & (t >= 0.0)
    )
    return valid, t, u, v


def _closest_kernel(ro_ref, rd_ref, tri_ref, t_ref, id_ref, u_ref, v_ref):
    n_tri_blocks = tri_ref.shape[0] // TRI_BLOCK
    ro = ro_ref[:]
    rd = rd_ref[:]

    def body(b, carry):
        t_best, id_best, u_best, v_best = carry
        tri = tri_ref[pl.ds(b * TRI_BLOCK, TRI_BLOCK), :]
        valid, t, u, v = _mt_block(ro, rd, tri)
        t = jnp.where(valid, t, K_HUGE)
        tb = jnp.min(t, axis=-1)
        # gather-free payload select: one-hot of the (first) min column
        is_min = (t <= tb[:, None]) & (t < K_HUGE)
        col = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
        first_min = jnp.min(jnp.where(is_min, col, TRI_BLOCK), axis=-1)
        sel = col == first_min[:, None]
        selx = sel.astype(t.dtype)
        closer = tb < t_best
        t_best = jnp.where(closer, tb, t_best)
        id_best = jnp.where(
            closer, b * TRI_BLOCK + first_min, id_best
        )
        u_best = jnp.where(closer, jnp.sum(u * selx, axis=-1), u_best)
        v_best = jnp.where(closer, jnp.sum(v * selx, axis=-1), v_best)
        return t_best, id_best, u_best, v_best

    shape = (ro.shape[0],)
    init = (
        jnp.full(shape, K_HUGE, jnp.float32),
        jnp.full(shape, -1, jnp.int32),
        jnp.zeros(shape, jnp.float32),
        jnp.zeros(shape, jnp.float32),
    )
    t_best, id_best, u_best, v_best = jax.lax.fori_loop(
        0, n_tri_blocks, body, init
    )
    t_ref[:] = t_best
    id_ref[:] = id_best
    u_ref[:] = u_best
    v_ref[:] = v_best


def _anyhit_kernel(ro_ref, rd_ref, tri_ref, occ_ref):
    n_tri_blocks = tri_ref.shape[0] // TRI_BLOCK
    ro = ro_ref[:]
    rd = rd_ref[:]

    def body(b, occ):
        tri = tri_ref[pl.ds(b * TRI_BLOCK, TRI_BLOCK), :]
        valid, _, _, _ = _mt_block(ro, rd, tri)
        return occ | jnp.any(valid, axis=-1)

    occ = jax.lax.fori_loop(0, n_tri_blocks, body,
                            jnp.zeros((ro.shape[0],), jnp.bool_))
    occ_ref[:] = occ


def _pad_tris(tri_geo: jnp.ndarray) -> jnp.ndarray:
    t = tri_geo.shape[0]
    pad = (-t) % TRI_BLOCK
    return jnp.pad(tri_geo, ((0, pad), (0, 0)))


@functools.partial(jax.jit, static_argnames=("interpret",))
def intersect_dense_pallas(
    tri_geo: jnp.ndarray,  # [T, 9] (v0, e1, e2)
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    interpret: bool = False,
):
    """Closest hit over all triangles: returns (t, tri_id, u, v); tri_id=-1
    on miss."""
    tri_p = _pad_tris(tri_geo)
    r = ray_o.shape[0]
    pad = (-r) % RAY_BLOCK
    ro = jnp.pad(ray_o, ((0, pad), (0, 0)))
    rd = jnp.pad(ray_d, ((0, pad), (0, 0)), constant_values=1.0)
    grid = (ro.shape[0] // RAY_BLOCK,)
    t, tid, u, v = pl.pallas_call(
        _closest_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((ro.shape[0],), jnp.float32),
            jax.ShapeDtypeStruct((ro.shape[0],), jnp.int32),
            jax.ShapeDtypeStruct((ro.shape[0],), jnp.float32),
            jax.ShapeDtypeStruct((ro.shape[0],), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((RAY_BLOCK, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full triangle table
        ],
        out_specs=(
            pl.BlockSpec((RAY_BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(ro, rd, tri_p)
    return t[:r], tid[:r], u[:r], v[:r]


@functools.partial(jax.jit, static_argnames=("interpret",))
def occluded_dense_pallas(
    tri_geo: jnp.ndarray,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    tri_p = _pad_tris(tri_geo)
    r = ray_o.shape[0]
    pad = (-r) % RAY_BLOCK
    ro = jnp.pad(ray_o, ((0, pad), (0, 0)))
    rd = jnp.pad(ray_d, ((0, pad), (0, 0)), constant_values=1.0)
    grid = (ro.shape[0] // RAY_BLOCK,)
    occ = pl.pallas_call(
        _anyhit_kernel,
        out_shape=jax.ShapeDtypeStruct((ro.shape[0],), jnp.bool_),
        grid=grid,
        in_specs=[
            pl.BlockSpec((RAY_BLOCK, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RAY_BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(ro, rd, tri_p)
    return occ[:r]


# ---------------------------------------------------------------------------
# SoA wrappers: the product-facing dense path (RenderConfig accel="dense",
# auto-selected for scenes <= DENSE_ACCEL_MAX_TRIS on TPU)
# ---------------------------------------------------------------------------


def _tri_geo(tris) -> jnp.ndarray:
    return jnp.concatenate([tris.v0, tris.e1, tris.e2], axis=1)


def intersect_dense_soa(tris, ray_o, ray_d, mask=None, interpret=False):
    """Closest hit over all triangles, returning a shaded Hit record
    (reference wf_extend at small scene scale, wavefront_kernels.cu:253-272).
    """
    from mc_path_tracer_tpu.ops.intersect import _shade_attrs
    from mc_path_tracer_tpu.ops.math import K_HUGE

    t, tid, u, v = intersect_dense_pallas(
        _tri_geo(tris), ray_o, ray_d, interpret=interpret
    )
    hit = tid >= 0
    if mask is not None:
        hit = hit & mask
        tid = jnp.where(mask, tid, -1)
    return _shade_attrs(
        tris, tid, u, v, ray_o, ray_d, jnp.where(hit, t, K_HUGE), hit
    )


def occluded_dense_soa(tris, ray_o, ray_d, mask=None, t_max=None,
                       interpret=False):
    """Any-hit over all triangles with optional per-ray t_max (reference
    intersect_shadows semantics, Triangle.cu:204-248)."""
    if t_max is None:
        occ = occluded_dense_pallas(_tri_geo(tris), ray_o, ray_d,
                                    interpret=interpret)
    else:
        # bounded shadow rays reuse the closest-hit kernel: occluded iff the
        # nearest hit lies inside (0, t_max]
        t, tid, _, _ = intersect_dense_pallas(
            _tri_geo(tris), ray_o, ray_d, interpret=interpret
        )
        occ = (tid >= 0) & (t <= t_max)
    if mask is not None:
        occ = occ & mask
    return occ
