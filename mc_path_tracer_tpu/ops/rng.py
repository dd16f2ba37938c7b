"""Counter-based random streams for the wavefront integrator.

The reference seeds its device RNG from `clock64()` per call
(cuda_math/Random.cu:5-29), making renders non-reproducible by design.  We
replace it (documented deviation, SURVEY.md §7) with JAX threefry key streams:
every (sample index, bounce, purpose) tuple derives a key, and one vectorized
`uniform` draw produces the variates for all rays in the wavefront at once.
Distributions are identical; determinism and differentiability (path replay
re-derives the same keys in the backward pass) are gained.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bounce_key(base_key: jax.Array, sample_idx, bounce_idx) -> jax.Array:
    """Key for a (sample, bounce) slice of the path-tracing random stream."""
    k = jax.random.fold_in(base_key, sample_idx)
    return jax.random.fold_in(k, bounce_idx)


def uniforms(key: jax.Array, shape, n: int) -> jnp.ndarray:
    """Draw `n` independent uniform [0,1) variates per ray: shape [*shape, n]."""
    return jax.random.uniform(key, tuple(shape) + (n,), dtype=jnp.float32)


def pixel_uniforms(key: jax.Array, pid: jnp.ndarray, n: int) -> jnp.ndarray:
    """Per-pixel uniform streams: `n` variates per lane keyed by the lane's
    *pixel id*, not its array position — the noise a pixel sees is invariant
    to how the frame is chunked into blocks or sharded across devices, so a
    sharded render is bit-identical to the single-device one.  Shape
    [*pid.shape, n]."""
    keys = jax.vmap(jax.random.fold_in, (None, 0))(key, pid)
    return jax.vmap(lambda k: jax.random.uniform(k, (n,), dtype=jnp.float32))(
        keys
    )
