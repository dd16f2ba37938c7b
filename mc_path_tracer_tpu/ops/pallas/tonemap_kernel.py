"""Pallas display kernel: exposure + Reinhard + 8-bit quantize in one pass.

The reference's draw_to_surface kernel (wavefront_kernels.cu:6-40) fuses
Ld/samples, exposure, Reinhard and the uchar4 store; this is its TPU
equivalent — one VMEM-resident fused kernel over image tiles, saving two
HBM round-trips vs. composing the jnp ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 8
TILE_W = 128


def _kernel(ld_ref, samples_ref, exposure_ref, out_ref):
    c = ld_ref[:] / jnp.maximum(samples_ref[:], 1.0)[..., None]
    c = c * exposure_ref[0]
    c = c / (c + 1.0)
    out_ref[:] = jnp.clip(c * 255.0, 0.0, 255.0).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def tonemap_pallas(
    ld: jnp.ndarray, samples: jnp.ndarray, exposure, interpret: bool = False
) -> jnp.ndarray:
    """[H, W, 3] radiance sums + [H, W] counts -> uint8 [H, W, 3]."""
    h, w = ld.shape[0], ld.shape[1]
    ph = (-h) % TILE_H
    pw = (-w) % TILE_W
    ld_p = jnp.pad(ld, ((0, ph), (0, pw), (0, 0)))
    s_p = jnp.pad(samples, ((0, ph), (0, pw)), constant_values=1.0)
    grid = (ld_p.shape[0] // TILE_H, ld_p.shape[1] // TILE_W)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct(ld_p.shape, jnp.uint8),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (TILE_H, TILE_W, 3), lambda i, j: (i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (TILE_H, TILE_W), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE_H, TILE_W, 3), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(ld_p, s_p, jnp.asarray([exposure], jnp.float32))
    return out[:h, :w]
