"""Texture atlas: material textures as one padded device array.

The reference carries 7 CUDA texture slots per material (dMaterial.cuh:
11-33) but its path tracer *discards* every fetch and shades with the scalar
factors (dMaterial.cu:26/54/81/114 — SURVEY.md §7 quirk).  We implement the
texture path properly: all material images are packed into a single
[n_tex, Hmax, Wmax, C] array (padded; per-texture true sizes kept), sampled
bilinearly with wrap addressing at shade time — factors multiply the fetch,
matching glTF semantics.  An empty atlas compiles to the pure-factor path
(zero overhead), which is also exactly the reference's effective behavior.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class TextureAtlas(NamedTuple):
    data: jnp.ndarray   # [n, Hmax, Wmax, 3] f32
    sizes: jnp.ndarray  # [n, 2] int32 (h, w)

    @property
    def count(self) -> int:
        return self.data.shape[0]


def empty_atlas() -> TextureAtlas:
    return TextureAtlas(
        data=jnp.zeros((0, 1, 1, 3), jnp.float32),
        sizes=jnp.zeros((0, 2), jnp.int32),
    )


def build_atlas(images: list[np.ndarray]) -> TextureAtlas:
    """Pack images (float [H,W,3], already linearized) into one atlas."""
    if not images:
        return empty_atlas()
    hmax = max(i.shape[0] for i in images)
    wmax = max(i.shape[1] for i in images)
    data = np.zeros((len(images), hmax, wmax, 3), np.float32)
    sizes = np.zeros((len(images), 2), np.int32)
    for k, img in enumerate(images):
        h, w = img.shape[0], img.shape[1]
        data[k, :h, :w] = img[..., :3]
        sizes[k] = (h, w)
    return TextureAtlas(data=jnp.asarray(data), sizes=jnp.asarray(sizes))


def sample_atlas(atlas: TextureAtlas, tex_id: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear wrap-addressed fetch; tex_id [R] int32 (>=0), uv [R, 2].

    Rays with tex_id < 0 return 1.0 (neutral multiplier).
    """
    if atlas.count == 0:
        return jnp.ones(uv.shape[:-1] + (3,), jnp.float32)
    tid = jnp.maximum(tex_id, 0)
    h = atlas.sizes[tid, 0].astype(jnp.float32)
    w = atlas.sizes[tid, 1].astype(jnp.float32)
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    hi = atlas.sizes[tid, 0]
    wi = atlas.sizes[tid, 1]
    x0i = jnp.mod(x0.astype(jnp.int32), wi)
    x1i = jnp.mod(x0i + 1, wi)
    y0i = jnp.mod(y0.astype(jnp.int32), hi)
    y1i = jnp.mod(y0i + 1, hi)
    t00 = atlas.data[tid, y0i, x0i]
    t01 = atlas.data[tid, y0i, x1i]
    t10 = atlas.data[tid, y1i, x0i]
    t11 = atlas.data[tid, y1i, x1i]
    out = (
        t00 * (1 - fx) * (1 - fy)
        + t01 * fx * (1 - fy)
        + t10 * (1 - fx) * fy
        + t11 * fx * fy
    )
    return jnp.where((tex_id >= 0)[..., None], out, 1.0)
