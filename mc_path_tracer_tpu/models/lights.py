"""Light models: environment + directional (+ host-only point parity stub).

Replaces the reference's device-virtual light hierarchy (Light.{h,cu},
DirectionalLight.cu, EnvironmentLight.cu — device vtables placement-new'd on
the GPU, light_initialization_kernels.cu:163-185) with a flat, traced pytree:
the light array is [environment, directional_0..D-1] matching the reference's
device light table order (Scene.cu:367-388), and per-ray light ids select
behavior with vectorized `where`s instead of virtual dispatch.

Behavior parity:
  - DirectionalLight: delta light; dir(isect) = fixed direction; L = ls*color;
    pdf = 1 (DirectionalLight.cu:8-47).
  - EnvironmentLight Color mode: uniform-sphere dir, L = color*ls,
    pdf = 1/(4 pi) (EnvironmentLight.cu:12-17, 36-39, 67-70).
  - EnvironmentLight HDRI mode: CDF-importance-sampled dir, L = equirect
    texture fetch (note: ls is NOT applied in HDRI mode, matching
    EnvironmentLight.cu:40-46), pdf per ops/envmap.pdf.
  - visibility = no any-hit along the shadow ray (Light.cu:12-16).
  - PointLight: the reference has only a host-side data holder with no device
    implementation (PointLight.*; SURVEY.md §2c) — mirrored here as a data
    class that does not participate in shading.

The environment texture and all radiance parameters are differentiable
(pytree leaves).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from mc_path_tracer_tpu.ops import envmap
from mc_path_tracer_tpu.ops.math import INV_4PI


class EnvLight(NamedTuple):
    """Environment light; mode is static (COLOR_MODE or HDRI_MODE)."""

    color: jnp.ndarray                    # [3]
    ls: jnp.ndarray                       # [] radiance scale (Color mode only)
    tex: jnp.ndarray                      # [H, W, 3] HDR (dummy [1,1,3] in Color mode)
    dist: envmap.EnvMapDistribution
    # quad-packed radiance table [H, W, 12] (envmap.pack_bilinear): one-gather
    # bilinear fetches.  Built inside the trace (with_packed) so gradients
    # reach `tex`; None at scene build.
    packed: jnp.ndarray | None = None


class DirectionalLights(NamedTuple):
    """Stacked delta lights; zero-length arrays when absent."""

    direction: jnp.ndarray  # [D, 3] unit, pointing from surface toward light
    color: jnp.ndarray      # [D, 3]
    ls: jnp.ndarray         # [D]


class AreaLights(NamedTuple):
    """Emissive-mesh area light: all emissive triangles of the scene treated
    as one area-sampled light entity.

    This completes the reference's *abandoned* area-light feature: dAreaLight
    is fully commented out (dAreaLight.cu:1-87) and wf_logic carries a
    radiant-object placeholder (`+ Vec3f(0) * beta`, wavefront_kernels.cu:
    131-133).  Sampling follows the standard solid-angle-converted area
    measure: pick a triangle by area-weighted CDF, uniform barycentric point,
    pdf(wi) = dist^2 / (cos_light * total_area).
    """

    tri_idx: jnp.ndarray    # [E] int32 into the (BVH-reordered) TriangleSoA
    emission: jnp.ndarray   # [E, 3]
    area: jnp.ndarray       # [E]
    cdf: jnp.ndarray        # [E] area-weighted selection CDF (ends at 1)
    total_area: jnp.ndarray  # []

    @property
    def count(self) -> int:
        return self.tri_idx.shape[0]


def empty_area() -> AreaLights:
    return AreaLights(
        tri_idx=jnp.zeros((0,), jnp.int32),
        emission=jnp.zeros((0, 3), jnp.float32),
        area=jnp.zeros((0,), jnp.float32),
        cdf=jnp.zeros((0,), jnp.float32),
        total_area=jnp.zeros((), jnp.float32),
    )


def make_area_lights(tris, emissive_mask, emission_table) -> AreaLights:
    """Collect emissive triangles into an AreaLights table.

    tris: the *reordered* TriangleSoA; emissive_mask [T] bool;
    emission_table [T, 3] per-triangle emission (material emissive factor).
    Host-side (numpy) — runs at scene build.
    """
    import numpy as np

    mask = np.asarray(emissive_mask)
    idx = np.nonzero(mask)[0].astype(np.int32)
    if idx.size == 0:
        return empty_area()
    e1 = np.asarray(tris.e1)[idx]
    e2 = np.asarray(tris.e2)[idx]
    area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)
    total = float(area.sum())
    cdf = np.cumsum(area) / max(total, 1e-20)
    return AreaLights(
        tri_idx=jnp.asarray(idx),
        emission=jnp.asarray(np.asarray(emission_table)[idx], jnp.float32),
        area=jnp.asarray(area, jnp.float32),
        cdf=jnp.asarray(cdf, jnp.float32),
        total_area=jnp.asarray(total, jnp.float32),
    )


def sample_area(
    area: AreaLights, tris, pos: jnp.ndarray, u3: jnp.ndarray
):
    """Sample a point on the area light toward each shading point.

    Returns (wi [R,3], dist [R], li [R,3], pdf_sa [R]): direction, distance
    to the light point (for the bounded shadow ray), emitted radiance, and
    the solid-angle pdf.  One-sided emission: the light emits from its
    front (face-normal) side only.
    """
    e = jnp.clip(
        jnp.searchsorted(area.cdf, u3[..., 0], side="right"), 0, area.count - 1
    )
    tid = area.tri_idx[e]
    # uniform point on triangle: p = v0 + u*e1 + v*e2 with the sqrt warp
    su = jnp.sqrt(jnp.maximum(u3[..., 1], 0.0))
    ub = 1.0 - su
    vb = u3[..., 2] * su
    p = tris.v0[tid] + ub[..., None] * tris.e1[tid] + vb[..., None] * tris.e2[tid]
    delta = p - pos
    dist2 = jnp.maximum(jnp.sum(delta * delta, axis=-1), 1e-12)
    dist = jnp.sqrt(dist2)
    wi = delta / dist[..., None]
    n_l = tris.face_normal[tid]
    cos_l = jnp.maximum(jnp.sum(n_l * (-wi), axis=-1), 0.0)
    li = jnp.where((cos_l > 0.0)[..., None], area.emission[e], 0.0)
    pdf_sa = jnp.where(
        cos_l > 1e-6,
        dist2 / jnp.maximum(cos_l * area.total_area, 1e-12),
        0.0,
    )
    return wi, dist, li, pdf_sa


def area_eval_hit(area: AreaLights, tris, hit, ray_o: jnp.ndarray):
    """Evaluate the area light for a closest-hit record of a BRDF-sampled
    ray: (li [R,3], pdf_sa [R], on_light [R]).  pdf matches sample_area's
    measure so the power heuristic combines them."""
    if area.count == 0:
        z = jnp.zeros(hit.t.shape, jnp.float32)
        return jnp.zeros(hit.t.shape + (3,), jnp.float32), z, jnp.zeros_like(hit.hit)
    is_emissive = jnp.zeros((tris.v0.shape[0] + 1,), bool)
    is_emissive = is_emissive.at[area.tri_idx].set(True)
    emission_of = jnp.zeros((tris.v0.shape[0] + 1, 3), jnp.float32)
    emission_of = emission_of.at[area.tri_idx].set(area.emission)
    tid = jnp.where(hit.hit, hit.tri_id, tris.v0.shape[0])
    on_light = hit.hit & is_emissive[tid]
    n_l = tris.face_normal[jnp.maximum(hit.tri_id, 0)]
    d = hit.position - ray_o
    dist2 = jnp.maximum(jnp.sum(d * d, axis=-1), 1e-12)
    wi = d / jnp.sqrt(dist2)[..., None]
    cos_l = jnp.maximum(jnp.sum(n_l * (-wi), axis=-1), 0.0)
    on_light = on_light & (cos_l > 1e-6)
    li = jnp.where(on_light[..., None], emission_of[tid], 0.0)
    pdf_sa = jnp.where(
        on_light,
        dist2 / jnp.maximum(cos_l * area.total_area, 1e-12),
        0.0,
    )
    return li, pdf_sa, on_light


class LightSet(NamedTuple):
    env: EnvLight
    directional: DirectionalLights
    area: AreaLights


@dataclass
class PointLight:
    """Host-only parity stub (reference PointLight.{h,cpp} has no device
    implementation and cannot illuminate the path-traced image)."""

    position: np.ndarray
    color: np.ndarray
    ls: float = 1.0


def make_env_color(color=(1.0, 1.0, 1.0), ls=1.0) -> EnvLight:
    dummy = jnp.ones((1, 1, 3), jnp.float32)
    return EnvLight(
        color=jnp.asarray(color, jnp.float32),
        ls=jnp.asarray(ls, jnp.float32),
        tex=dummy,
        dist=envmap.build_distribution(dummy),
    )


def make_env_hdri(tex, ls=1.0) -> EnvLight:
    """HDRI env light.  NOTE (reference parity): in HDRI mode `ls` is
    stored but radiance() returns the raw texture sample — exactly the
    reference's dEnvironmentLight::compute_L, which multiplies ls only in
    Color mode (EnvironmentLight.cu:34-47).  Scale the texture itself to
    change HDRI brightness."""
    tex = jnp.asarray(tex, jnp.float32)
    return EnvLight(
        color=jnp.ones(3, jnp.float32),
        ls=jnp.asarray(ls, jnp.float32),
        tex=tex,
        dist=envmap.build_distribution(tex),
    )


def env_is_hdri(env: EnvLight) -> bool:
    """Static mode check (shape-based, so it is not traced)."""
    return env.tex.shape[0] > 1 or env.tex.shape[1] > 1


def make_directional(directions, colors, ls) -> DirectionalLights:
    d = np.atleast_2d(np.asarray(directions, np.float32))
    d = d / np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
    c = np.broadcast_to(np.atleast_2d(np.asarray(colors, np.float32)), d.shape)
    s = np.broadcast_to(np.asarray(ls, np.float32).reshape(-1), (d.shape[0],))
    return DirectionalLights(
        direction=jnp.asarray(d), color=jnp.asarray(c), ls=jnp.asarray(s)
    )


def empty_directional() -> DirectionalLights:
    return DirectionalLights(
        direction=jnp.zeros((0, 3), jnp.float32),
        color=jnp.zeros((0, 3), jnp.float32),
        ls=jnp.zeros((0,), jnp.float32),
    )


def num_lights(lights: LightSet) -> int:
    """Light table size: [env, dir_0, ..., dir_D-1, area?]
    (Scene.cu:367-388 order, with the emissive-mesh area light appended)."""
    return (
        1
        + lights.directional.direction.shape[0]
        + (1 if lights.area.count > 0 else 0)
    )


def area_light_id(lights: LightSet) -> int:
    """Table id of the area-light entity (== num_lights-1), or -1 if none."""
    if lights.area.count == 0:
        return -1
    return 1 + lights.directional.direction.shape[0]


def _dir_field(lights: LightSet, light_id: jnp.ndarray, field: jnp.ndarray, fill):
    """Gather a directional-light field by table id (id 0 = env -> fill)."""
    d = lights.directional.direction.shape[0]
    if d == 0:
        return jnp.broadcast_to(
            jnp.asarray(fill, jnp.float32), light_id.shape + jnp.shape(fill)
        )
    idx = jnp.clip(light_id - 1, 0, d - 1)
    vals = field[idx]
    return vals


def sample_dir(lights: LightSet, light_id: jnp.ndarray, u2: jnp.ndarray,
               env_importance: bool = True) -> jnp.ndarray:
    """Light-sampling direction wi for each ray's chosen light id.

    Matches dLight::dir dispatch: env -> CDF (or uniform sphere) sample,
    directional -> fixed direction.  `env_importance=False` samples the
    HDRI env uniformly over the sphere (pdf 1/4pi) — the reference's
    "importance sampling off" comparison mode (README env-IS figures;
    EnvironmentLight.cu Color-mode sampling, :12-17).
    """
    if env_is_hdri(lights.env) and env_importance:
        wi_env, _ = envmap.sample_direction(lights.env.dist, u2)
    else:
        wi_env = envmap.sample_color_mode(u2)
    d = lights.directional.direction.shape[0]
    if d == 0:
        return wi_env
    wi_dir = _dir_field(lights, light_id, lights.directional.direction, jnp.zeros(3))
    return jnp.where((light_id == 0)[..., None], wi_env, wi_dir)


def with_packed(lights: LightSet) -> LightSet:
    """Attach the one-gather bilinear radiance table to an HDRI env light.
    Call once at the top of a traced render; differentiable w.r.t. env.tex.

    Large HDRIs (> ~2M texels, e.g. 4k x 2k) skip the quad-pack — it would
    4x a texture that is already ~100 MB; radiance() falls back to the
    4-gather bilinear fetch for them."""
    if not env_is_hdri(lights.env) or lights.env.packed is not None:
        return lights
    h, w = lights.env.tex.shape[0], lights.env.tex.shape[1]
    if h * w > 2 * 1024 * 1024:
        return lights
    return lights._replace(
        env=lights.env._replace(packed=envmap.pack_bilinear(lights.env.tex))
    )


def radiance(lights: LightSet, light_id: jnp.ndarray, wi: jnp.ndarray) -> jnp.ndarray:
    """L(wi) for each ray's chosen light."""
    if env_is_hdri(lights.env):
        if lights.env.packed is not None:
            l_env = envmap.radiance_packed(lights.env.packed, wi)
        else:
            l_env = envmap.radiance(lights.env.tex, wi)
    else:
        l_env = jnp.broadcast_to(lights.env.color * lights.env.ls, wi.shape)
    d = lights.directional.direction.shape[0]
    if d == 0:
        return l_env
    c = _dir_field(lights, light_id, lights.directional.color, jnp.zeros(3))
    s = _dir_field(lights, light_id, lights.directional.ls[:, None], jnp.zeros(1))
    l_dir = c * s
    return jnp.where((light_id == 0)[..., None], l_env, l_dir)


def pdf(lights: LightSet, light_id: jnp.ndarray, wi: jnp.ndarray,
        env_importance: bool = True) -> jnp.ndarray:
    """Solid-angle pdf for each ray's chosen light."""
    if env_is_hdri(lights.env) and env_importance:
        p_env = envmap.pdf(lights.env.dist, wi)
    else:
        p_env = jnp.full(wi.shape[:-1], INV_4PI, jnp.float32)
    d = lights.directional.direction.shape[0]
    if d == 0:
        return p_env
    return jnp.where(light_id == 0, p_env, 1.0)


def is_delta(lights: LightSet, light_id: jnp.ndarray) -> jnp.ndarray:
    """Delta flag per chosen light: env/area False, directional True."""
    delta = light_id != 0
    aid = area_light_id(lights)
    if aid >= 0:
        delta = delta & (light_id != aid)
    return delta
