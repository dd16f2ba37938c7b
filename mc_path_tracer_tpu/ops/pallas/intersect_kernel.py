"""Pallas dense intersection kernel: all rays x all triangles in VMEM.

For small scenes (<= a few thousand triangles) BVH gathers are pure
overhead on TPU — the winning layout is dense: stream ray blocks through
VMEM and test every triangle with fully-vectorized Moller-Trumbore on the
VPU, keeping a running closest hit.  No gathers, no divergence, perfect
lane utilization; this is the TPU answer to the reference's wf_extend /
wf_shadow kernels (wavefront_kernels.cu:253-293) at small scene scale.

Triangle data layout: component-major [9, T_pad] = rows (v0.xyz, e1.xyz,
e2.xyz), T padded to a multiple of 128 lanes with degenerate triangles
(e1 = e2 = 0 -> det 0 -> culled).  Component-major keeps every kernel value
in the natural (sublane, lane) = (ray, triangle) layout — the AoS form
([T, 9] + cross products over a size-3 trailing axis) does not lower
through Mosaic (caught by the round-3 on-chip gate, tests_tpu.py) and
would be lane-hostile even if it did.
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


def _mt_cm(row, ox, oy, oz, dx, dy, dz):
    """Component-major Moller-Trumbore: ray components [R, 1] x one
    triangle row block [9, 128] -> (valid, t, u, v) each [R, 128]
    (Triangle.cu:19-40 TEST_CULL semantics)."""
    v0x, v0y, v0z = row[0:1, :], row[1:2, :], row[2:3, :]
    e1x, e1y, e1z = row[3:4, :], row[4:5, :], row[5:6, :]
    e2x, e2y, e2z = row[6:7, :], row[7:8, :], row[8:9, :]
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.reciprocal(jnp.where(jnp.abs(det) > 1e-30, det, 1.0))
    tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    valid = (
        (det >= K_EPSILON)
        & (u >= 0.0) & (u <= 1.0)
        & (v >= 0.0) & (u + v <= 1.0)
        & (t >= 0.0)
    )
    return valid, t, u, v


def _split_rays(ro_ref, rd_ref):
    ro = ro_ref[:]
    rd = rd_ref[:]
    return (ro[:, 0:1], ro[:, 1:2], ro[:, 2:3],
            rd[:, 0:1], rd[:, 1:2], rd[:, 2:3])


def _closest_kernel(ro_ref, rd_ref, tri_ref, out_ref):
    n_tri_blocks = tri_ref.shape[1] // TRI_BLOCK
    ox, oy, oz, dx, dy, dz = _split_rays(ro_ref, rd_ref)
    r = ro_ref.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (r, TRI_BLOCK), 1)

    def body(b, carry):
        t_best, id_best, u_best, v_best = carry
        row = tri_ref[:, pl.ds(b * TRI_BLOCK, TRI_BLOCK)]
        valid, t, u, v = _mt_cm(row, ox, oy, oz, dx, dy, dz)
        t = jnp.where(valid, t, K_HUGE)
        tb = jnp.min(t, axis=-1, keepdims=True)
        # gather-free payload select: one-hot of the (first) min column
        is_min = (t <= tb) & (t < K_HUGE)
        first_min = jnp.min(
            jnp.where(is_min, lane, TRI_BLOCK), axis=-1, keepdims=True
        )
        sel = (lane == first_min).astype(t.dtype)
        closer = tb < t_best
        t_best = jnp.where(closer, tb, t_best)
        id_best = jnp.where(
            closer, (b * TRI_BLOCK + first_min).astype(jnp.float32), id_best
        )
        u_best = jnp.where(
            closer, jnp.sum(u * sel, axis=-1, keepdims=True), u_best
        )
        v_best = jnp.where(
            closer, jnp.sum(v * sel, axis=-1, keepdims=True), v_best
        )
        return t_best, id_best, u_best, v_best

    init = (
        jnp.full((r, 1), K_HUGE, jnp.float32),
        jnp.full((r, 1), -1.0, jnp.float32),
        jnp.zeros((r, 1), jnp.float32),
        jnp.zeros((r, 1), jnp.float32),
    )
    t_best, id_best, u_best, v_best = jax.lax.fori_loop(
        0, n_tri_blocks, body, init
    )
    out_ref[:, 0:1] = t_best
    out_ref[:, 1:2] = id_best
    out_ref[:, 2:3] = u_best
    out_ref[:, 3:4] = v_best


def _anyhit_kernel(ro_ref, rd_ref, tri_ref, out_ref):
    n_tri_blocks = tri_ref.shape[1] // TRI_BLOCK
    ox, oy, oz, dx, dy, dz = _split_rays(ro_ref, rd_ref)
    r = ro_ref.shape[0]

    def body(b, occ):
        row = tri_ref[:, pl.ds(b * TRI_BLOCK, TRI_BLOCK)]
        valid, _, _, _ = _mt_cm(row, ox, oy, oz, dx, dy, dz)
        return jnp.maximum(
            occ, jnp.max(valid.astype(jnp.float32), axis=-1, keepdims=True)
        )

    occ = jax.lax.fori_loop(0, n_tri_blocks, body,
                            jnp.zeros((r, 1), jnp.float32))
    out_ref[:, 0:1] = occ
    out_ref[:, 1:4] = jnp.zeros((r, 3), jnp.float32)


def _pad_tris_cm(tri_geo_t: jnp.ndarray) -> jnp.ndarray:
    t = tri_geo_t.shape[1]
    pad = (-t) % TRI_BLOCK
    return jnp.pad(tri_geo_t, ((0, 0), (0, pad)))


def _run(kernel, tri_geo_t, ray_o, ray_d, interpret):
    # triangle ids round-trip through f32 in the packed [R, 4] output:
    # exact only below the 24-bit mantissa (the auto-routed dense path is
    # capped at DENSE_ACCEL_MAX_TRIS=2048, but this is a public entry point)
    assert tri_geo_t.shape[1] < (1 << 24), (
        f"dense Pallas intersector holds triangle ids as f32; "
        f"{tri_geo_t.shape[1]} triangles exceeds the 2^24 exact-int range"
    )
    tri_p = _pad_tris_cm(tri_geo_t)
    r = ray_o.shape[0]
    pad = (-r) % RAY_BLOCK
    ro = jnp.pad(ray_o, ((0, pad), (0, 0)))
    rd = jnp.pad(ray_d, ((0, pad), (0, 0)), constant_values=1.0)
    grid = (ro.shape[0] // RAY_BLOCK,)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ro.shape[0], 4), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((RAY_BLOCK, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full triangle table
        ],
        out_specs=pl.BlockSpec((RAY_BLOCK, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(ro, rd, tri_p)
    return out[:r]


@functools.partial(jax.jit, static_argnames=("interpret",))
def intersect_dense_pallas(
    tri_geo_t: jnp.ndarray,  # [9, T] component-major (v0, e1, e2)
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    interpret: bool = False,
):
    """Closest hit over all triangles: returns (t, tri_id, u, v); tri_id=-1
    on miss."""
    out = _run(_closest_kernel, tri_geo_t, ray_o, ray_d, interpret)
    return out[:, 0], out[:, 1].astype(jnp.int32), out[:, 2], out[:, 3]


@functools.partial(jax.jit, static_argnames=("interpret",))
def occluded_dense_pallas(
    tri_geo_t: jnp.ndarray,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    out = _run(_anyhit_kernel, tri_geo_t, ray_o, ray_d, interpret)
    return out[:, 0] > 0.5


# ---------------------------------------------------------------------------
# SoA wrappers: the product-facing dense path (RenderConfig accel="dense",
# auto-selected for scenes <= DENSE_ACCEL_MAX_TRIS on TPU)
# ---------------------------------------------------------------------------


def _tri_geo(tris) -> jnp.ndarray:
    """Component-major [9, T] triangle table (v0 / e1 / e2 rows)."""
    return jnp.concatenate([tris.v0, tris.e1, tris.e2], axis=1).T


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
