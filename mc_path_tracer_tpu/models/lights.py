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


class DirectionalLights(NamedTuple):
    """Stacked delta lights; zero-length arrays when absent."""

    direction: jnp.ndarray  # [D, 3] unit, pointing from surface toward light
    color: jnp.ndarray      # [D, 3]
    ls: jnp.ndarray         # [D]


class LightSet(NamedTuple):
    env: EnvLight
    directional: DirectionalLights


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
    """Light table size: [env, dir_0, ..., dir_D-1] (Scene.cu:367-388)."""
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


def sample_dir(lights: LightSet, light_id: jnp.ndarray, u2: jnp.ndarray) -> jnp.ndarray:
    """Light-sampling direction wi for each ray's chosen light id.

    Matches dLight::dir dispatch: env -> CDF (or uniform sphere) sample,
    directional -> fixed direction.
    """
    if env_is_hdri(lights.env):
        wi_env, _ = envmap.sample_direction(lights.env.dist, u2)
    else:
        wi_env = envmap.sample_color_mode(u2)
    d = lights.directional.direction.shape[0]
    if d == 0:
        return wi_env
    wi_dir = _dir_field(lights, light_id, lights.directional.direction, jnp.zeros(3))
    return jnp.where((light_id == 0)[..., None], wi_env, wi_dir)


def radiance(lights: LightSet, light_id: jnp.ndarray, wi: jnp.ndarray) -> jnp.ndarray:
    """L(wi) for each ray's chosen light."""
    if env_is_hdri(lights.env):
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


def pdf(lights: LightSet, light_id: jnp.ndarray, wi: jnp.ndarray) -> jnp.ndarray:
    """Solid-angle pdf for each ray's chosen light."""
    if env_is_hdri(lights.env):
        p_env = envmap.pdf(lights.env.dist, wi)
    else:
        p_env = jnp.full(wi.shape[:-1], INV_4PI, jnp.float32)
    d = lights.directional.direction.shape[0]
    if d == 0:
        return p_env
    return jnp.where(light_id == 0, p_env, 1.0)


def is_delta(lights: LightSet, light_id: jnp.ndarray) -> jnp.ndarray:
    """Delta flag per chosen light: env False, directional True."""
    return light_id != 0
