"""Cook-Torrance GGX specular + Lambertian diffuse BRDF, differentiable.

Behavioral parity with the reference's device material layer
(CUDA-RayTracer/dMaterial.cu):
  - fresnel_schlick(f0, v, h) with dot(v, h) clamped at 0 (dMaterial.cu:141-144).
  - GGX Trowbridge-Reitz NDF with alpha = roughness^2 (dMaterial.cu:150-161).
  - Smith G as the product of Schlick-GGX G1 terms with k = alpha/2
    (dMaterial.cu:206-214, 225-230; this is the variant wired into spec_get_f).
  - Diffuse direction sampling is *uniform* hemisphere (cos_theta = e0),
    pdf = 1/(2 pi) (dMaterial.cu:232-258) — NOT cosine-weighted.
  - Diffuse f = kD * albedo * max(n.wi, eps) / pi with
    kD = (1 - F(wh, wo)) * (1 - metallic)  (dMaterial.cu:259-276).
  - Specular half-vector sampling: theta_h = acos(sqrt((1-e0)/(e0*(a2-1)+1)))
    with a2 = roughness^4, wi = reflect(-wo, wh) (dMaterial.cu:278-307).
  - Specular pdf = D * (wh.n) / (4 * (wo.wh))  (dMaterial.cu:308-321).
  - Specular f = D*G*F * (n.wi) / (4 * (n.wo) * (n.wi)) with epsilon clamps
    (dMaterial.cu:322-343).
  - f0 = mix(material.fresnel, albedo, metallic); fresnel defaults to 0.04
    (dMaterial.cuh fresnel factor).
  - All dot products clamped to epsilon = 1e-6 as in the reference.

The path integrator mixes the two lobes 50/50 with mixture pdf
0.5*(pdf_diff + pdf_spec) (wavefront_kernels.cu:332-356).

Every function is a pure jnp function of the material parameters
(albedo [...,3], roughness [...], metallic [...], f0_base [...,3]) so
gradients flow to them; directions are unit vectors in world space.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from mc_path_tracer_tpu.ops.math import (
    INV_PI,
    INV_2PI,
    PI,
    TWO_PI,
    dot,
    frame_to_world,
    normalize,
    reflect,
)

EPS = 1e-6


class MaterialParams(NamedTuple):
    """Per-ray (gathered) material parameters."""

    albedo: jnp.ndarray     # [..., 3] base color factor
    roughness: jnp.ndarray  # [...]
    metallic: jnp.ndarray   # [...]
    fresnel: jnp.ndarray    # [..., 3] F0 for dielectrics (reference: 0.04)

    @property
    def f0(self) -> jnp.ndarray:
        """mix(fresnel, albedo, metallic) as in dMaterial.cu:264/330."""
        m = self.metallic[..., None]
        return self.fresnel * (1.0 - m) + self.albedo * m


def fresnel_schlick(f0: jnp.ndarray, v: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    v_dot_h = jnp.maximum(dot(v, h), 0.0)
    return f0 + (1.0 - f0) * jnp.power(1.0 - v_dot_h, 5.0)[..., None]


def ndf_ggx_tr(n: jnp.ndarray, h: jnp.ndarray, roughness: jnp.ndarray) -> jnp.ndarray:
    a = roughness * roughness
    a2 = a * a
    n_dot_h = jnp.maximum(dot(n, h), EPS)
    denom = jnp.maximum(n_dot_h * n_dot_h * (a2 - 1.0) + 1.0, EPS)
    return a2 / (PI * denom * denom)


def g1_schlick_ggx(v: jnp.ndarray, n: jnp.ndarray, roughness: jnp.ndarray) -> jnp.ndarray:
    a = roughness * roughness
    k = a / 2.0
    n_dot_v = jnp.maximum(dot(n, v), EPS)
    return n_dot_v / jnp.maximum(n_dot_v * (1.0 - k) + k, EPS)


def geo_atten_schlick_ggx(
    wi: jnp.ndarray, wo: jnp.ndarray, n: jnp.ndarray, roughness: jnp.ndarray
) -> jnp.ndarray:
    return g1_schlick_ggx(wi, n, roughness) * g1_schlick_ggx(wo, n, roughness)


# ---------------------------------------------------------------------------
# Diffuse lobe
# ---------------------------------------------------------------------------


def diff_sample_wi(n: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Uniform-hemisphere diffuse direction around shading normal n
    (dMaterial.cu:232-254: local y = e0 = cos_theta)."""
    e0, e1 = u[..., 0], u[..., 1]
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - e0 * e0, 0.0))
    phi = TWO_PI * e1
    local = jnp.stack(
        [sin_theta * jnp.cos(phi), e0, sin_theta * jnp.sin(phi)], axis=-1
    )
    return frame_to_world(local, n)


def diff_pdf(n: jnp.ndarray, wi: jnp.ndarray, wo: jnp.ndarray) -> jnp.ndarray:
    """Constant 1/(2 pi) (dMaterial.cu:255-258)."""
    return jnp.full(wi.shape[:-1], INV_2PI, dtype=wi.dtype)


def diff_f(
    mat: MaterialParams, n: jnp.ndarray, wi: jnp.ndarray, wo: jnp.ndarray
) -> jnp.ndarray:
    n_dot_wi = jnp.maximum(dot(n, wi), EPS)
    wh = normalize(wo + wi)
    f = fresnel_schlick(mat.f0, wh, wo)
    kd = (1.0 - f) * (1.0 - mat.metallic[..., None])
    return kd * mat.albedo * (n_dot_wi * INV_PI)[..., None]


# ---------------------------------------------------------------------------
# Specular lobe
# ---------------------------------------------------------------------------


def spec_sample_wi(
    mat: MaterialParams, n: jnp.ndarray, wo: jnp.ndarray, u: jnp.ndarray
) -> jnp.ndarray:
    """GGX NDF-importance-sampled half vector, reflected (dMaterial.cu:278-307)."""
    r = mat.roughness
    a2 = r * r * r * r
    e0, e1 = u[..., 0], u[..., 1]
    cos_theta = jnp.sqrt(
        jnp.clip((1.0 - e0) / jnp.maximum(e0 * (a2 - 1.0) + 1.0, EPS), 0.0, 1.0)
    )
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    phi = TWO_PI * e1
    local_h = jnp.stack(
        [sin_theta * jnp.cos(phi), cos_theta, sin_theta * jnp.sin(phi)], axis=-1
    )
    wh = frame_to_world(local_h, n)
    return normalize(reflect(-wo, wh))


def spec_pdf(
    mat: MaterialParams, n: jnp.ndarray, wi: jnp.ndarray, wo: jnp.ndarray
) -> jnp.ndarray:
    wh = normalize(wo + wi)
    wh_dot_n = jnp.maximum(dot(wh, n), EPS)
    wo_dot_wh = jnp.maximum(dot(wo, wh), EPS)
    d = ndf_ggx_tr(n, wh, mat.roughness)
    return d * wh_dot_n / jnp.maximum(4.0 * wo_dot_wh, EPS)


def spec_f(
    mat: MaterialParams, n: jnp.ndarray, wi: jnp.ndarray, wo: jnp.ndarray
) -> jnp.ndarray:
    wh = normalize(wo + wi)
    n_dot_wi = jnp.maximum(dot(n, wi), EPS)
    n_dot_wo = jnp.maximum(dot(n, wo), EPS)
    d = ndf_ggx_tr(n, wh, mat.roughness)
    g = geo_atten_schlick_ggx(wi, wo, n, mat.roughness)
    f = fresnel_schlick(mat.f0, wh, wo)
    return f * (d * g * n_dot_wi / jnp.maximum(4.0 * n_dot_wo * n_dot_wi, EPS))[..., None]


# ---------------------------------------------------------------------------
# 50/50 lobe mixture used by the wavefront material stage
# (wavefront_kernels.cu:332-356)
# ---------------------------------------------------------------------------


def mixture_sample_wi(
    mat: MaterialParams,
    n: jnp.ndarray,
    wo: jnp.ndarray,
    u_coin: jnp.ndarray,
    u2: jnp.ndarray,
) -> jnp.ndarray:
    """Pick specular when u_coin < 0.5 else diffuse, like the reference's
    `rand_float() < 0.5 ? spec_get_wi : diff_get_wi`."""
    wi_s = spec_sample_wi(mat, n, wo, u2)
    wi_d = diff_sample_wi(n, u2)
    return jnp.where((u_coin < 0.5)[..., None], wi_s, wi_d)


def mixture_pdf(
    mat: MaterialParams, n: jnp.ndarray, wi: jnp.ndarray, wo: jnp.ndarray
) -> jnp.ndarray:
    return 0.5 * (diff_pdf(n, wi, wo) + spec_pdf(mat, n, wi, wo))


def mixture_f(
    mat: MaterialParams, n: jnp.ndarray, wi: jnp.ndarray, wo: jnp.ndarray
) -> jnp.ndarray:
    """f = spec_f + diff_f, as summed in wf_mat_mix (wavefront_kernels.cu:326, 341, 356)."""
    return spec_f(mat, n, wi, wo) + diff_f(mat, n, wi, wo)
