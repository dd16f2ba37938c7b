"""Monte Carlo samplers and MIS heuristics (reference: cuda_math/Sample.{h,cu},
dMaterial.cu:134-139).

All samplers take uniform variates in [0,1) with shape [..., 2] (or [...]) and
return directions/points broadcast over the batch axes.  RNG itself lives in
ops.rng (counter-based threefry streams replacing the reference's clock-seeded
non-reproducible generator, cuda_math/Random.cu:5-29 — documented deviation).
"""

from __future__ import annotations

import jax.numpy as jnp

from mc_path_tracer_tpu.ops.math import PI, TWO_PI


def sample_uniform_hemisphere(u: jnp.ndarray) -> jnp.ndarray:
    """Uniform hemisphere around +y, matching the reference's diffuse
    direction sampler (dMaterial.cu:232-254): cos(theta) = e0 uniformly.

    Returns local-frame (x, y=cos_theta, z) directions; pdf = 1/(2*pi).
    """
    e0, e1 = u[..., 0], u[..., 1]
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - e0 * e0, 0.0))
    phi = TWO_PI * e1
    return jnp.stack(
        [sin_theta * jnp.cos(phi), e0, sin_theta * jnp.sin(phi)], axis=-1
    )


def sample_cosine_hemisphere(u: jnp.ndarray) -> jnp.ndarray:
    """Cosine-weighted hemisphere around +y (PBRT form, cuda_math/Sample.cu);
    pdf = cos(theta)/pi.  Provided for API parity — the reference's path
    tracer itself uses the uniform sampler above."""
    e0, e1 = u[..., 0], u[..., 1]
    cos_theta = jnp.sqrt(jnp.maximum(1.0 - e0, 0.0))
    sin_theta = jnp.sqrt(e0)
    phi = TWO_PI * e1
    return jnp.stack(
        [sin_theta * jnp.cos(phi), cos_theta, sin_theta * jnp.sin(phi)], axis=-1
    )


def sample_uniform_sphere(u: jnp.ndarray) -> jnp.ndarray:
    """Uniform sphere; pdf = 1/(4*pi)."""
    e0, e1 = u[..., 0], u[..., 1]
    y = 1.0 - 2.0 * e0
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - y * y, 0.0))
    phi = TWO_PI * e1
    return jnp.stack(
        [sin_theta * jnp.cos(phi), y, sin_theta * jnp.sin(phi)], axis=-1
    )


def sample_uniform_disk(u: jnp.ndarray) -> jnp.ndarray:
    """Uniform disk via sqrt warp; returns [..., 2]."""
    r = jnp.sqrt(u[..., 0])
    phi = TWO_PI * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def sample_concentric_disk(u: jnp.ndarray) -> jnp.ndarray:
    """Concentric disk mapping (PBRT / jek::concentric_sample_disk), used by
    the thin-lens camera (Camera.cu:34-43)."""
    ox = 2.0 * u[..., 0] - 1.0
    oy = 2.0 * u[..., 1] - 1.0
    zero = (jnp.abs(ox) < 1e-12) & (jnp.abs(oy) < 1e-12)
    use_x = jnp.abs(ox) > jnp.abs(oy)
    r = jnp.where(use_x, ox, oy)
    theta = jnp.where(
        use_x,
        (PI / 4.0) * (oy / jnp.where(use_x, ox, 1.0)),
        (PI / 2.0) - (PI / 4.0) * (ox / jnp.where(use_x, 1.0, oy)),
    )
    pt = r[..., None] * jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)
    return jnp.where(zero[..., None], 0.0, pt)


def power_heuristic(
    nf: float, f_pdf: jnp.ndarray, ng: float, g_pdf: jnp.ndarray
) -> jnp.ndarray:
    """Power heuristic (beta=2), matching dMaterial.cu:134-139."""
    f = nf * f_pdf
    g = ng * g_pdf
    denom = f * f + g * g
    return jnp.where(denom > 0.0, f * f / jnp.maximum(denom, 1e-38), 0.0)
