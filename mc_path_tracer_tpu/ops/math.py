"""Vector-math conventions of the reference renderer, as batched jnp ops.

Behavioral parity targets (reference: JakeKurtz/MC-Path-Tracer):
  - luminance: Rec.601 weights (cuda_math/Vector.h:1117-1126).
  - equirectangular mapping: uv = (0.5 + atan2(z,x)/2pi, 0.5 - asin(y)/pi)
    and inverse phi = 2pi(u-0.5), theta = pi*v, d = (cos(phi)sin(theta),
    cos(theta), sin(phi)sin(theta))  (cuda_math/Vector.h:1142-1160).
  - reflect: glm convention i - 2*dot(n,i)*n.
  - constants: K_EPSILON = 1e-6, K_HUGE = 1e32 (cuda_math/dMath.h:8-25).

Deviation (documented): the reference builds shading tangent frames with a
*stochastic* Gram-Schmidt (cuda_math/Vector.h:1128-1140 draws a random vector
per call, making shading frames non-deterministic).  Because every sampler
that consumes the frame is isotropic in phi, a deterministic branchless ONB
(Duff et al. 2017) yields identical sampling distributions; we use that
instead so renders are reproducible and differentiable.

All functions operate on arrays whose last axis is the vector axis and
broadcast over leading batch axes.
"""

from __future__ import annotations

import jax.numpy as jnp

K_EPSILON = 1e-6
K_HUGE = 1e32
PI = float(jnp.pi)
TWO_PI = 2.0 * PI
INV_PI = 1.0 / PI
INV_2PI = 1.0 / TWO_PI
INV_4PI = 1.0 / (4.0 * PI)


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product over the last axis."""
    return jnp.sum(a * b, axis=-1)


def length(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.maximum(dot(v, v), 0.0))


def normalize(v: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    """Normalize over the last axis; safe at ~zero length."""
    return v * jnp.reciprocal(jnp.sqrt(jnp.maximum(dot(v, v), eps)))[..., None]


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def reflect(i: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """glm-style reflect: incident direction i about normal n."""
    return i - 2.0 * dot(n, i)[..., None] * n


def luminance(rgb: jnp.ndarray) -> jnp.ndarray:
    """Rec.601 luminance, matching jek::luminance (Vector.h:1117-1126)."""
    w = jnp.asarray([0.299, 0.587, 0.114], dtype=rgb.dtype)
    return jnp.sum(rgb * w, axis=-1)


def mix(a: jnp.ndarray, b: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    return a * (1.0 - t) + b * t


def build_onb(n: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Deterministic branchless orthonormal basis around unit normal n.

    Returns (tangent, bitangent) such that (t, n, b) is orthonormal, used as
    the sampling frame wherever the reference used its stochastic
    gram_schmidt tangent (see module docstring for the deviation note).
    """
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    t = jnp.stack([1.0 + sign * nx * nx * a, sign * b, -sign * nx], axis=-1)
    bt = jnp.stack([b, sign + ny * ny * a, -ny], axis=-1)
    return t, bt


def frame_to_world(local: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Map a local-frame vector (x=t, y=n, z=b — the reference's y-up frame,
    dMaterial.cu:232-254) to world space around normal n."""
    t, b = build_onb(n)
    return normalize(
        t * local[..., 0:1] + n * local[..., 1:2] + b * local[..., 2:3]
    )


def equirect_uv(d: jnp.ndarray) -> jnp.ndarray:
    """Direction -> equirect uv, matching jek::sample_spherical_map."""
    u = 0.5 + jnp.arctan2(d[..., 2], d[..., 0]) * INV_2PI
    v = 0.5 - jnp.arcsin(jnp.clip(d[..., 1], -1.0, 1.0)) * INV_PI
    return jnp.stack([u, v], axis=-1)


def equirect_dir(uv: jnp.ndarray) -> jnp.ndarray:
    """Equirect uv -> direction, matching jek::sample_spherical_direction."""
    phi = TWO_PI * (uv[..., 0] - 0.5)
    theta = PI * uv[..., 1]
    st = jnp.sin(theta)
    return jnp.stack(
        [jnp.cos(phi) * st, jnp.cos(theta), jnp.sin(phi) * st], axis=-1
    )


# ---------------------------------------------------------------------------
# 4x4 matrix helpers (replacing jek::Matrix4x4 / glm usage in the reference).
# Matrices are row-major [..., 4, 4]; points transform as M @ [p, 1].
# ---------------------------------------------------------------------------


def perspective(fovy_rad: float, aspect: float, z_near: float, z_far: float) -> jnp.ndarray:
    """glm::perspective (right-handed, NDC z in [-1,1]) as used by
    PerspectiveCamera.cpp:47-50."""
    f = 1.0 / jnp.tan(fovy_rad / 2.0)
    m = jnp.zeros((4, 4), dtype=jnp.float32)
    m = m.at[0, 0].set(f / aspect)
    m = m.at[1, 1].set(f)
    m = m.at[2, 2].set((z_far + z_near) / (z_near - z_far))
    m = m.at[2, 3].set(2.0 * z_far * z_near / (z_near - z_far))
    m = m.at[3, 2].set(-1.0)
    return m


def look_at(eye: jnp.ndarray, center: jnp.ndarray, up: jnp.ndarray) -> jnp.ndarray:
    """glm::lookAt equivalent (view matrix, right-handed)."""
    eye = jnp.asarray(eye, dtype=jnp.float32)
    f = normalize(jnp.asarray(center, dtype=jnp.float32) - eye)
    s = normalize(jnp.cross(f, jnp.asarray(up, dtype=jnp.float32)))
    u = jnp.cross(s, f)
    m = jnp.eye(4, dtype=jnp.float32)
    m = m.at[0, :3].set(s)
    m = m.at[1, :3].set(u)
    m = m.at[2, :3].set(-f)
    m = m.at[0, 3].set(-jnp.dot(s, eye))
    m = m.at[1, 3].set(-jnp.dot(u, eye))
    m = m.at[2, 3].set(jnp.dot(f, eye))
    return m


def transform_point(m: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Homogeneous transform of points p [..., 3] by m [4, 4] with w-divide.
    Full-f32 precision: TPU bf16 matmul defaults lose the w cancellation."""
    import jax

    ph = jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)
    out = jnp.einsum(
        "ij,...j->...i", m, ph, precision=jax.lax.Precision.HIGHEST
    )
    return out[..., :3] / out[..., 3:4]


def transform_dir(m: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Transform direction d [..., 3] by the linear part of m [4, 4]."""
    import jax

    return jnp.einsum(
        "ij,...j->...i", m[:3, :3], d, precision=jax.lax.Precision.HIGHEST
    )
