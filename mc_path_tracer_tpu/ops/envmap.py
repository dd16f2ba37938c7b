"""Importance-sampled HDR environment light: CDF build, sampling, pdf, lookup.

Parity with the reference's environment light machinery:
  - pdf_denom = sum over texels of luminance * sin(pi * y/H)
    (light_initialization_kernels.cu:3-26).
  - marginal row distribution marginal_p[y] = sin(pi*y/H)/denom * row-sum of
    luminance, with row CDF marginal_y (..cu:27-55).
  - per-row conditional column CDF conds_y[y][x] = cumsum_x(lum * sin/denom /
    marginal_p[y]) (..cu:56-84).
  - pdf texture = lum * sin / denom per texel (..cu:85-112); directional pdf
    pdf(wi) = pdf_texel * (W*H) / (2 * pi^2 * sin(theta))
    (EnvironmentLight.cu:65-85, nearest-texel lookup at
    (int(u*(W-1)), int(v*(H-1)))).
  - sampling: two uniforms -> binary search row CDF then column CDF ->
    uv = (x/W, y/H) -> equirect direction (EnvironmentLight.cu:10-33 with
    upper_bound, Helpers.cu:15-30; searchsorted here).
  - radiance lookup L(wi): bilinear, wrap-addressed equirect fetch
    (EnvironmentLight.cu:34-47; texture objects are bilinear+wrap,
    dTexture.cu:107-113).
  - Color mode: uniform-sphere direction, L = color*ls, pdf = 1/(4 pi)
    (EnvironmentLight.cu:12-17, 36-39, 67-70).

The reference's O(W*H) single-thread build kernels become two vectorized
prefix sums; everything is jnp so gradients flow to the env texels.

Deviation (documented): the reference's build kernels read the HDR via a
half-texel-shifted bilinear fetch (tex2D at u = x/W lands between texels
x-1 and x); we read texel values directly — the resulting distribution
differs by a sub-texel shift, within Monte Carlo noise at 250 spp.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from mc_path_tracer_tpu.ops.math import (
    INV_4PI,
    PI,
    equirect_dir,
    equirect_uv,
    luminance,
)
from mc_path_tracer_tpu.ops.sampling import sample_uniform_sphere

COLOR_MODE = 0
HDRI_MODE = 1


class EnvMapDistribution(NamedTuple):
    """CDF tables for environment importance sampling (dEnvironmentLight
    fields, EnvironmentLight.h:17-40)."""

    marginal_cdf: jnp.ndarray  # [H] row CDF P(y)
    cond_cdf: jnp.ndarray      # [H, W] per-row column CDF P(x|y)
    pdf_texture: jnp.ndarray   # [H, W] per-texel pdf (lum * sin / denom)


def build_distribution(tex) -> EnvMapDistribution:
    """Build sampling tables from an equirect HDR texture [H, W, 3].

    Host-side numpy: scene building must not run eager device ops (on the
    axon TPU backend every eager op is a multi-second remote compile), so
    the two prefix sums run on the host and transfer once.  For the
    differentiable path (gradients w.r.t. env texels) use
    `build_distribution_traced` inside a jit.
    """
    import numpy as np

    tex = np.asarray(tex, np.float32)
    h, w = tex.shape[0], tex.shape[1]
    lum = tex @ np.asarray([0.299, 0.587, 0.114], np.float32)
    v = np.arange(h, dtype=np.float32) / h                   # v = y/H (ref convention)
    sin_theta = np.sin(np.pi * v).astype(np.float32)
    weighted = lum * sin_theta[:, None]
    denom = max(float(weighted.sum()), 1e-20)
    pdf_texture = weighted / denom
    marginal_p = pdf_texture.sum(axis=1)
    marginal_cdf = np.cumsum(marginal_p).astype(np.float32)
    cond_p = pdf_texture / np.maximum(marginal_p[:, None], 1e-20)
    cond_cdf = np.cumsum(cond_p, axis=1).astype(np.float32)
    return EnvMapDistribution(
        jnp.asarray(marginal_cdf), jnp.asarray(cond_cdf),
        jnp.asarray(pdf_texture.astype(np.float32)),
    )


def build_distribution_traced(tex: jnp.ndarray) -> EnvMapDistribution:
    """Traced (differentiable) variant of build_distribution for use inside
    jitted optimization loops that update env texels."""
    h, w = tex.shape[0], tex.shape[1]
    lum = luminance(tex)
    v = jnp.arange(h, dtype=jnp.float32) / h
    sin_theta = jnp.sin(PI * v)
    weighted = lum * sin_theta[:, None]
    denom = jnp.maximum(jnp.sum(weighted), 1e-20)
    pdf_texture = weighted / denom
    marginal_p = jnp.sum(pdf_texture, axis=1)
    marginal_cdf = jnp.cumsum(marginal_p)
    cond_p = pdf_texture / jnp.maximum(marginal_p[:, None], 1e-20)
    cond_cdf = jnp.cumsum(cond_p, axis=1)
    return EnvMapDistribution(marginal_cdf, cond_cdf, pdf_texture)


# above this table width/height the flat broadcast-compare search switches
# to the two-level (blocked) form: a 4k x 2k HDRI at a 64k-ray block would
# otherwise gather + compare a [64k, 4096] row matrix (~1 GiB transient)
_SEARCH_BLOCK = 128
_FLAT_SEARCH_MAX = 1024


def _search_rows_2level(cdf_rows: jnp.ndarray, row_idx, e) -> jnp.ndarray:
    """Per-lane searchsorted(side=right) of e within cdf_rows[row_idx]
    in two levels: block maxima first ([R, W/B] compare), then one [R, B]
    window gather — peak memory W/B + B wide per lane instead of W."""
    h, w = cdf_rows.shape
    b = _SEARCH_BLOCK
    nb = -(-w // b)
    pad = nb * b - w
    if pad:
        # padding value 2.0 > any CDF entry: never counted by <= e
        cdf_rows = jnp.pad(cdf_rows, ((0, 0), (0, pad)), constant_values=2.0)
    coarse = cdf_rows[:, b - 1 :: b]                        # [H, nb]
    crow = coarse[row_idx]                                  # [R, nb]
    blk = jnp.clip(
        jnp.sum((crow <= e[..., None]).astype(jnp.int32), axis=-1), 0, nb - 1
    )
    flat = cdf_rows.reshape(h * nb, b)
    win = flat[row_idx * nb + blk]                          # [R, b]
    off = jnp.sum((win <= e[..., None]).astype(jnp.int32), axis=-1)
    return jnp.clip(blk * b + off, 0, w - 1)


def sample_direction(
    dist: EnvMapDistribution, u: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Draw directions from the env distribution; u is [..., 2] uniforms.

    Returns (wi [..., 3], uv [..., 2]) with uv = (x/W, y/H) exactly as the
    reference quantizes (EnvironmentLight.cu:26-29).
    """
    h, w = dist.cond_cdf.shape
    ey, ex = u[..., 1], u[..., 0]
    # broadcast compare-and-count == searchsorted(side="right") without the
    # log(H) sequential row gathers XLA lowers binary search to (row gathers
    # cost ~20ns/lane on TPU; one [R, H] compare is pure VPU work).  Large
    # tables switch to the blocked two-level search (bounded peak memory).
    if h <= _FLAT_SEARCH_MAX:
        y = jnp.clip(
            jnp.sum(
                (dist.marginal_cdf[None, :] <= ey[..., None]).astype(jnp.int32),
                axis=-1,
            ),
            0, h - 1,
        )
    else:
        y = _search_rows_2level(
            dist.marginal_cdf[None, :], jnp.zeros_like(ey, jnp.int32), ey
        )
    if w <= _FLAT_SEARCH_MAX:
        row_cdf = dist.cond_cdf[y]                 # gather rows [..., W]
        x = jnp.clip(
            jnp.sum((row_cdf <= ex[..., None]).astype(jnp.int32), axis=-1),
            0, w - 1,
        )
    else:
        x = _search_rows_2level(dist.cond_cdf, y, ex)
    uv = jnp.stack([x.astype(jnp.float32) / w, y.astype(jnp.float32) / h], axis=-1)
    return equirect_dir(uv), uv


def pdf(dist: EnvMapDistribution, wi: jnp.ndarray) -> jnp.ndarray:
    """Solid-angle pdf of wi (EnvironmentLight.cu:65-85).

    Deviation (documented, SURVEY.md §7 quirk class): the reference reads the
    pdf texel at (int(u*(W-1)), int(v*(H-1))) while its sampler quantizes
    uv = (x/W, y/H) — an off-by-one that returns the *neighboring* texel's
    pdf for its own samples, which breaks the f/pdf Monte Carlo identity
    around hot texels (e.g. a sun).  Samples land exactly on texel corners
    (uv = x/W), so we bin by *rounding* u*W — the sampled texel and its pdf
    then always agree, robust to the equirect round-trip's float error.
    """
    h, w = dist.pdf_texture.shape
    uv = equirect_uv(wi)
    ix = jnp.mod(jnp.round(uv[..., 0] * w).astype(jnp.int32), w)
    iy = jnp.clip(jnp.round(uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
    p = dist.pdf_texture[iy, ix]
    sin_theta = jnp.sin(PI * uv[..., 1])
    return jnp.where(
        sin_theta > 0.0,
        p * (w * h) / (2.0 * PI * PI * jnp.maximum(sin_theta, 1e-20)),
        0.0,
    )


def bilinear_wrap(tex: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear, wrap-addressed texture fetch matching CUDA texture sampling
    (normalized coords; texel centers at (i+0.5)/N; dTexture.cu:107-113)."""
    h, w = tex.shape[0], tex.shape[1]
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = jnp.mod(x0.astype(jnp.int32), w)
    x1i = jnp.mod(x0i + 1, w)
    y0i = jnp.mod(y0.astype(jnp.int32), h)
    y1i = jnp.mod(y0i + 1, h)
    t00 = tex[y0i, x0i]
    t01 = tex[y0i, x1i]
    t10 = tex[y1i, x0i]
    t11 = tex[y1i, x1i]
    return (
        t00 * (1 - fx) * (1 - fy)
        + t01 * fx * (1 - fy)
        + t10 * (1 - fx) * fy
        + t11 * fx * fy
    )


def radiance(tex: jnp.ndarray, wi: jnp.ndarray) -> jnp.ndarray:
    """L(wi): equirect bilinear lookup (EnvironmentLight.cu:34-47)."""
    return bilinear_wrap(tex, equirect_uv(wi))


def pack_bilinear(tex: jnp.ndarray) -> jnp.ndarray:
    """Quad-packed texture [H, W, 12]: each texel row carries itself and its
    +x / +y / +x+y wrap neighbors, so a bilinear fetch is ONE row gather
    instead of four (TPU row gathers are row-count-bound, width-free).

    Traced from `tex` (rolls + concat), so env-texel gradients flow through
    packed fetches unchanged."""
    tx = jnp.roll(tex, -1, axis=1)
    ty = jnp.roll(tex, -1, axis=0)
    txy = jnp.roll(tx, -1, axis=0)
    return jnp.concatenate([tex, tx, ty, txy], axis=-1)


def radiance_packed(packed: jnp.ndarray, wi: jnp.ndarray) -> jnp.ndarray:
    """Bilinear equirect fetch from a pack_bilinear table — numerically
    identical to radiance() (same wrap addressing)."""
    h, w = packed.shape[0], packed.shape[1]
    uv = equirect_uv(wi)
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = jnp.mod(x0.astype(jnp.int32), w)
    y0i = jnp.mod(y0.astype(jnp.int32), h)
    q = packed[y0i, x0i]                        # one [.., 12] row gather
    t00, t01, t10, t11 = q[..., 0:3], q[..., 3:6], q[..., 6:9], q[..., 9:12]
    return (
        t00 * (1 - fx) * (1 - fy)
        + t01 * fx * (1 - fy)
        + t10 * (1 - fx) * fy
        + t11 * fx * fy
    )


def sample_color_mode(u: jnp.ndarray) -> jnp.ndarray:
    """Uniform-sphere direction for Color-mode env lights."""
    return sample_uniform_sphere(u)


def pdf_color_mode(wi: jnp.ndarray) -> jnp.ndarray:
    return jnp.full(wi.shape[:-1], INV_4PI, dtype=wi.dtype)
