"""Film: progressive accumulation buffers + tiling, mirroring Film.{h,cu}.

The reference film holds Ld[np] (radiance sums), samples[np] (per-pixel
counts), processes one 256x256 tile per frame round-robin (Film.cu:17,
94-103), exposes exposure (Film.cu:20-24), and clears on observed scene edits
(Film.cu:278-281).  Here the film is an immutable pytree snapshot —
accumulation returns a new Film — which is what makes progressive rendering
jit/pmap-friendly; the tile scheduler is a host-side iterator.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from mc_path_tracer_tpu.ops import tonemap
from mc_path_tracer_tpu.utils.image import write_png

DEFAULT_TILE = 256  # Film.cu:17


class Film(NamedTuple):
    ld: jnp.ndarray       # [H, W, 3] accumulated radiance
    samples: jnp.ndarray  # [H, W] per-pixel sample counts

    @property
    def height(self) -> int:
        return self.ld.shape[0]

    @property
    def width(self) -> int:
        return self.ld.shape[1]

    def accumulate(self, ld_add: jnp.ndarray, samples_add) -> "Film":
        return Film(self.ld + ld_add, self.samples + samples_add)

    def clear(self) -> "Film":
        """Progressive restart (g_clear_dfilm, wavefront_kernels.cu:55-66)."""
        return Film(jnp.zeros_like(self.ld), jnp.zeros_like(self.samples))

    def to_display(self, exposure: float = 1.0, view: str = "color") -> jnp.ndarray:
        if view == "heatmap":
            return tonemap.heatmap(self.ld, self.samples, exposure)
        return tonemap.reinhard(self.ld, self.samples, exposure)

    def to_uint8(self, exposure: float = 1.0, view: str = "color") -> np.ndarray:
        return np.asarray(tonemap.quantize(self.to_display(exposure, view)))

    def save_png(self, path: str, exposure: float = 1.0, view: str = "color") -> None:
        write_png(path, self.to_uint8(exposure, view))

    def radiance_mean(self) -> jnp.ndarray:
        """Linear HDR image (Ld / samples)."""
        return self.ld / jnp.maximum(self.samples, 1.0)[..., None]


def make_film(width: int, height: int) -> Film:
    return Film(
        ld=jnp.zeros((height, width, 3), jnp.float32),
        samples=jnp.zeros((height, width), jnp.float32),
    )


def tile_grid(width: int, height: int, tile: int = DEFAULT_TILE):
    """Round-robin tile schedule (Film::update_tile_position, Film.cu:94-103).

    Yields (x0, y0, w, h) covering the film; the reference advances one tile
    per frame call — render_progressive does the same.
    """
    for y0 in range(0, height, tile):
        for x0 in range(0, width, tile):
            yield (x0, y0, min(tile, width - x0), min(tile, height - y0))


# traversal-block tile shape: 32x16 = 512 pixels = exactly one Pallas
# traversal ray block (ops/pallas/traversal_kernel.RAY_BLOCK), so every
# kernel block sees a spatially tight frustum.  Measured on the bench scene:
# 32x16 tiles visit ~5 leaves/block vs ~49 for 512-pixel row strips.
TRAV_TILE_W = 32
TRAV_TILE_H = 16


def tile_order(width: int, height: int, tw: int = TRAV_TILE_W,
               th: int = TRAV_TILE_H):
    """Pixel enumeration in tile-major order (host numpy).

    Returns (px, py) int32 arrays of length width*height enumerating every
    pixel so that consecutive runs of tw*th pixels form one 2-D tile.
    Edge tiles are clipped (blocks there mix two tiles — still coherent).
    """
    ty, tx = np.meshgrid(np.arange(th), np.arange(tw), indexing="ij")
    xs, ys = [], []
    for y0 in range(0, height, th):
        for x0 in range(0, width, tw):
            x = x0 + tx
            y = y0 + ty
            keep = (x < width) & (y < height)
            xs.append(x[keep].ravel())
            ys.append(y[keep].ravel())
    return (
        np.concatenate(xs).astype(np.int32),
        np.concatenate(ys).astype(np.int32),
    )
