"""Tone mapping: exposure + Reinhard, matching the reference's display kernel.

draw_to_surface (wavefront_kernels.cu:6-40): color = Ld/samples * exposure;
color = color / (color + 1); 8-bit quantize, no gamma.  The debug luminance
heat-map (commented in the reference, used for its README sampling-density
figures) is kept as a selectable view.
"""

from __future__ import annotations

import jax.numpy as jnp

from mc_path_tracer_tpu.ops.math import luminance, mix


def reinhard(ld: jnp.ndarray, samples: jnp.ndarray, exposure) -> jnp.ndarray:
    """Accumulated radiance [..., 3] + per-pixel sample counts [...] -> display
    RGB in [0, 1]."""
    c = ld / jnp.maximum(samples, 1.0)[..., None] * exposure
    return c / (c + 1.0)


def heatmap(ld: jnp.ndarray, samples: jnp.ndarray, exposure) -> jnp.ndarray:
    """Luminance heat-map debug view (wavefront_kernels.cu:22-36):
    blue -> green (lum .15), green -> yellow (.5), yellow -> red (1)."""
    c = reinhard(ld, samples, exposure)
    lum = luminance(c)

    def remap(lo, hi, x):
        return jnp.clip((x - lo) / (hi - lo), 0.0, 1.0)[..., None]

    blue = jnp.asarray([0.0, 0.0, 1.0])
    green = jnp.asarray([0.0, 1.0, 0.0])
    yellow = jnp.asarray([1.0, 1.0, 0.0])
    red = jnp.asarray([1.0, 0.0, 0.0])
    low = mix(blue, green, remap(0.0, 0.15, lum))
    mid = mix(green, yellow, remap(0.15, 0.5, lum))
    high = mix(yellow, red, remap(0.5, 1.0, lum))
    out = jnp.where(lum[..., None] < 0.15, low, jnp.where(lum[..., None] < 0.5, mid, high))
    return out


def quantize(rgb: jnp.ndarray) -> jnp.ndarray:
    """[0,1] float -> uint8 (255*c truncation as in the reference's uchar4)."""
    return jnp.clip(rgb * 255.0, 0.0, 255.0).astype(jnp.uint8)
