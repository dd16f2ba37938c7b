"""Preview renderer: the rasterizer-equivalent fast path.

The reference pairs its path tracer with an OpenGL deferred-PBR rasterizer
used as an interactive preview (Rasterizer.{h,cpp}: G-buffer geometry pass ->
PBR lighting pass + IBL irradiance/prefilter + shadow maps -> background;
debug views of each G-buffer attachment, Rasterizer.cpp:93-124, 152-341).  A
TPU framework has no GL pipeline — the TPU-native equivalent is a
single-bounce deterministic ray cast over the same scene arrays:

  - IBL ambient: a real cosine (irradiance) convolution of the environment
    map evaluated per shading normal as ONE relu-matmul pair over a
    downsampled env grid (the reference bakes an irradiance cubemap,
    EnvironmentLight.cu:184-264 + irradiance_convolution.fs; here the MXU
    evaluates the same integral directly).
  - shadows: one-tap any-hit shadow ray per directional light (the
    reference's cascaded shadow maps, Rasterizer.cpp:226-341).
  - wireframe + grid overlay (Overlay.cpp:18-120): barycentric edge
    distance on hit pixels, a perspective ground grid on miss pixels.
  - debug visualizer (wavefront_kernels.cu:444-554 debug_raytracer): a true
    single-bounce view — direct light with one shadow tap on hits, the env
    importance-sampling pdf as a heat map on misses.

Output types mirror the G-buffer debug menu (RenderWindow render-mode /
Rasterizer debug views): "shaded", "position", "normal", "albedo",
"metallic_roughness", "emissive", "depth", "wireframe".
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mc_path_tracer_tpu.models import camera as camera_mod
from mc_path_tracer_tpu.models import lights as lights_mod
from mc_path_tracer_tpu.models.film import Film
from mc_path_tracer_tpu.models.scene import SceneData
from mc_path_tracer_tpu.ops import brdf, envmap
from mc_path_tracer_tpu.ops.intersect import winner_uvt
from mc_path_tracer_tpu.ops.math import PI

PREVIEW_MODES = (
    "shaded",
    "position",
    "normal",
    "albedo",
    "metallic_roughness",
    "emissive",
    "depth",
    "wireframe",
)

# irradiance convolution source resolution: 16x32 equirect (512 texels) is
# what the reference's 32x32-per-face irradiance cubemap resolves
_IRR_H, _IRR_W = 16, 32


def _env_basis(h: int, w: int):
    """Directions + solid-angle weights of an h x w equirect texel grid."""
    v = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    u = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    uv = jnp.stack(jnp.meshgrid(u, v, indexing="xy"), axis=-1)  # [h, w, 2]
    dirs = envmap.equirect_dir(uv.reshape(-1, 2))               # [T, 3]
    sin_t = jnp.sin(PI * uv[..., 1]).reshape(-1)
    d_omega = sin_t * (PI / h) * (2.0 * PI / w)                 # [T]
    return dirs, d_omega


# specular prefilter source resolution: finer than the irradiance grid so
# low-roughness lobes keep some sharpness (the reference's prefilter mip
# chain spans 128^2-face mips down to 8^2, EnvironmentLight.cu:219-243)
_SPEC_H, _SPEC_W = 32, 64


def _prefiltered_spec(env: lights_mod.EnvLight, refl: jnp.ndarray,
                      roughness: jnp.ndarray) -> jnp.ndarray:
    """Prefiltered environment radiance along the reflection vector.

    The reference bakes GGX-importance-sampled mips of the env cubemap and
    the lighting pass reads textureLod(prefilterMap, R, r*MAX_LOD)
    (EnvironmentLight.cu:219-243 + prefilter.fs, lightingPass_fs.glsl).
    TPU-native equivalent: evaluate the cone convolution directly on the
    MXU with a per-pixel cosine-power kernel over a downsampled env grid —
    w = max(R.w_t, 0)^s with the standard s = 2/alpha^2 - 2 Phong-lobe
    match (alpha = r^2), normalized by its own grid integral:
        spec(R) = (w @ L dOmega) / (w @ dOmega).
    Near-mirror lobes out-resolve the grid, so below r=0.15 the result
    blends toward the exact equirect lookup (mip-0 behavior)."""
    if not lights_mod.env_is_hdri(env):
        return jnp.broadcast_to(env.color * env.ls, refl.shape)
    tex = jax.image.resize(env.tex, (_SPEC_H, _SPEC_W, 3), "linear")
    dirs, d_omega = _env_basis(_SPEC_H, _SPEC_W)
    alpha2 = jnp.maximum(roughness, 0.04) ** 4
    s = jnp.clip(2.0 / alpha2 - 2.0, 1.0, 2048.0)[:, None]      # [R, 1]
    cos = jnp.maximum(refl @ dirs.T, 1e-6)                       # [R, T]
    w = cos ** s
    num = w @ (tex.reshape(-1, 3) * d_omega[:, None])            # [R, 3]
    den = (w @ d_omega[:, None]) + 1e-20                         # [R, 1]
    filtered = num / den
    exact = envmap.radiance(env.tex, refl)
    mirror = jnp.clip(roughness / 0.15, 0.0, 1.0)[:, None]
    return filtered * mirror + exact * (1.0 - mirror)


def _env_brdf_ab(n_dot_v: jnp.ndarray, roughness: jnp.ndarray):
    """Split-sum BRDF LUT, analytic fit (Karis/Lazarov "Environment BRDF"
    approximation) standing in for the reference's baked brdfLUT.fs texture
    (EnvironmentLight.cu:245-264): returns (A, B) with
    specular = prefiltered * (F0 * A + B)."""
    # vec4 c0 = (-1, -0.0275, -0.572, 0.022); c1 = (1, 0.0425, 1.04, -0.04)
    rx = roughness * -1.0 + 1.0
    ry = roughness * -0.0275 + 0.0425
    rz = roughness * -0.572 + 1.04
    rw = roughness * 0.022 - 0.04
    a004 = jnp.minimum(rx * rx, jnp.exp2(-9.28 * n_dot_v)) * rx + ry
    return a004 * -1.04 + rz, a004 * 1.04 + rw


def _irradiance(env: lights_mod.EnvLight, n: jnp.ndarray) -> jnp.ndarray:
    """Diffuse IBL term E(n)/pi per shading normal.

    E(n) = sum_t L_t max(0, n . w_t) dOmega_t over a downsampled env grid —
    two MXU matmuls: relu(N @ D^T) [R, T] @ (L_t * dOmega_t) [T, 3].  For a
    constant-radiance env this reduces to L * albedo, the flat-ambient
    behavior, but directional env content now shades correctly
    (EnvironmentLight.cu irradiance convolution equivalent)."""
    if not lights_mod.env_is_hdri(env):
        return jnp.broadcast_to(env.color * env.ls, n.shape)
    tex = jax.image.resize(env.tex, (_IRR_H, _IRR_W, 3), "linear")
    dirs, d_omega = _env_basis(_IRR_H, _IRR_W)
    cos = jnp.maximum(n @ dirs.T, 0.0)                      # [R, T]
    e = cos @ (tex.reshape(-1, 3) * d_omega[:, None])       # [R, 3]
    return e / PI


def _ground_grid(ro, rd, hit_mask):
    """Perspective ground-plane grid for miss pixels (Overlay.cpp grid
    overlay): anti-aliased unit grid lines on y=0, faded with distance."""
    t = -ro[..., 1] / jnp.where(jnp.abs(rd[..., 1]) > 1e-6, rd[..., 1], 1e-6)
    ok = (t > 0.0) & ~hit_mask
    p = ro + t[..., None] * rd
    # distance to nearest integer grid line, in grid units, smoothed by the
    # ray-footprint (~t-proportional) for cheap anti-aliasing
    fx = jnp.abs(p[..., 0] - jnp.round(p[..., 0]))
    fz = jnp.abs(p[..., 2] - jnp.round(p[..., 2]))
    width = jnp.clip(0.01 * jnp.maximum(t, 1.0), 0.01, 0.5)
    line = jnp.maximum(
        jnp.clip(1.0 - fx / width, 0.0, 1.0),
        jnp.clip(1.0 - fz / width, 0.0, 1.0),
    )
    fade = jnp.exp(-0.02 * jnp.maximum(t, 0.0))
    return jnp.where(ok, line * fade * 0.6, 0.0)


@partial(jax.jit, static_argnames=("width", "height", "mode"))
def _preview(scene: SceneData, cam, width: int, height: int, mode: str):
    from mc_path_tracer_tpu.models.integrator import (
        RenderConfig,
        _intersect,
        _occluded,
    )

    cfg = RenderConfig()
    ys, xs = jnp.mgrid[0:height, 0:width]
    px = xs.reshape(-1).astype(jnp.float32)
    py = ys.reshape(-1).astype(jnp.float32)
    ro, rd = camera_mod.gen_camera_rays(
        cam, width, height, px, py, jnp.zeros((px.shape[0], 2))
    )
    hit = _intersect(scene, cfg, ro, rd)
    mat = scene.materials.gather(hit.material_id, hit.uv, scene.atlas)
    hmask = hit.hit[..., None]

    if mode == "position":
        out = jnp.where(hmask, hit.position, 0.0)
    elif mode == "normal":
        out = jnp.where(hmask, hit.normal * 0.5 + 0.5, 0.0)
    elif mode == "albedo":
        out = jnp.where(hmask, mat.albedo, 0.0)
    elif mode == "metallic_roughness":
        mra = jnp.stack(
            [mat.metallic, mat.roughness, jnp.ones_like(mat.metallic)], axis=-1
        )
        out = jnp.where(hmask, mra, 0.0)
    elif mode == "emissive":
        out = jnp.where(hmask, scene.materials.emission(hit.material_id, hit.uv, scene.atlas), 0.0)
    elif mode == "depth":
        d = jnp.where(hit.hit, hit.t, 0.0)
        dmax = jnp.maximum(jnp.max(d), 1e-6)
        out = jnp.broadcast_to((d / dmax)[..., None], d.shape + (3,))
    elif mode == "wireframe":
        # barycentric edge distance (Overlay.cpp wireframe pass): recover
        # (u, v) of the winner, line where min(u, v, 1-u-v) ~ 0
        u, v, _ = winner_uvt(scene.tris, hit.tri_id, ro, rd)
        u = jnp.where(hit.hit, u, 0.0)
        v = jnp.where(hit.hit, v, 0.0)
        edge = jnp.minimum(jnp.minimum(u, v), 1.0 - u - v)
        aa = 0.03
        line = jnp.clip(1.0 - edge / aa, 0.0, 1.0)
        base = jnp.where(hmask, 0.12 + 0.25 * jnp.abs(hit.normal), 0.0)
        wire = jnp.array([0.9, 0.9, 0.95], jnp.float32)
        out = jnp.where(hmask, base + line[..., None] * wire, 0.0)
        grid = _ground_grid(ro, rd, hit.hit)
        out = out + grid[..., None] * jnp.array([0.5, 0.5, 0.55], jnp.float32)
    else:  # shaded
        wo = -rd
        n = scene.materials.perturb_normal(
            hit.material_id, hit.uv, scene.atlas,
            hit.normal, hit.tangent, hit.bitangent,
        )
        lights = scene.lights
        direct = jnp.zeros_like(ro)
        nd = lights.directional.direction.shape[0]
        shadow_o = hit.position + n * 0.01
        for i in range(nd):  # lightingPass 32-light loop equivalent
            wl = jnp.broadcast_to(lights.directional.direction[i], n.shape)
            li = lights.directional.color[i] * lights.directional.ls[i]
            f = brdf.mixture_f(mat, n, wl, wo)
            # one-tap shadow (the rasterizer's shadow-map lookup,
            # Rasterizer.cpp:226-341)
            vis = ~_occluded(scene, cfg, shadow_o, wl, mask=hit.hit)
            direct = direct + jnp.where(vis[..., None], f * li, 0.0)
        ao = scene.materials.ambient_occlusion(hit.material_id, hit.uv,
                                               scene.atlas)
        # IBL ambient = kD * irradiance * albedo + specular split-sum, as
        # the reference's lighting pass (lightingPass_fs.glsl: F via
        # fresnelSchlickRoughness, kD = (1-F)(1-metallic), specular =
        # prefiltered(R, r) * (F0 * brdfLUT.A + brdfLUT.B), all * ao)
        n_dot_v = jnp.maximum(jnp.sum(n * wo, axis=-1), 0.0)
        f0 = mat.f0
        f_rough = f0 + (
            jnp.maximum(1.0 - mat.roughness[..., None], f0) - f0
        ) * (1.0 - n_dot_v[..., None]) ** 5
        k_d = (1.0 - f_rough) * (1.0 - mat.metallic[..., None])
        refl = 2.0 * n_dot_v[..., None] * n - wo
        refl = refl / jnp.maximum(
            jnp.linalg.norm(refl, axis=-1, keepdims=True), 1e-8
        )
        pre = _prefiltered_spec(lights.env, refl, mat.roughness)
        ab_a, ab_b = _env_brdf_ab(n_dot_v, mat.roughness)
        spec = pre * (f0 * ab_a[..., None] + ab_b[..., None])
        ambient = (
            k_d * _irradiance(lights.env, n) * mat.albedo + spec
        ) * ao[..., None]
        bg = (
            envmap.radiance(lights.env.tex, rd)
            if lights_mod.env_is_hdri(lights.env)
            else jnp.broadcast_to(lights.env.color * lights.env.ls, rd.shape)
        )
        emissive = scene.materials.emission(hit.material_id, hit.uv, scene.atlas)
        out = jnp.where(hmask, direct + ambient + emissive, bg)

    return out.reshape(height, width, 3)


@partial(jax.jit, static_argnames=("width", "height"))
def _debug(scene: SceneData, cam, width: int, height: int):
    """Single-bounce debug visualizer (debug_raytracer,
    wavefront_kernels.cu:444-554): hits show one-sample direct lighting with
    a shadow tap; misses show the env importance-sampling pdf as a heat map
    (the reference's env-pdf validation experiments)."""
    from mc_path_tracer_tpu.models.integrator import (
        RenderConfig,
        _intersect,
        _occluded,
    )

    cfg = RenderConfig()
    ys, xs = jnp.mgrid[0:height, 0:width]
    px = xs.reshape(-1).astype(jnp.float32)
    py = ys.reshape(-1).astype(jnp.float32)
    ro, rd = camera_mod.gen_camera_rays(
        cam, width, height, px, py, jnp.zeros((px.shape[0], 2))
    )
    hit = _intersect(scene, cfg, ro, rd)
    mat = scene.materials.gather(hit.material_id, hit.uv, scene.atlas)
    lights = lights_mod.with_packed(scene.lights)
    n_l = lights_mod.num_lights(lights)

    # deterministic light sample per pixel (pixel-keyed stream, sample 0)
    from mc_path_tracer_tpu.ops import rng as rng_mod

    pid = (py * width + px).astype(jnp.int32)
    u = rng_mod.pixel_uniforms(jax.random.PRNGKey(0), pid, 3)
    l_id = jnp.minimum((u[:, 0] * n_l).astype(jnp.int32), n_l - 1)
    wl = lights_mod.sample_dir(lights, l_id, u[:, 1:3])
    li = lights_mod.radiance(lights, l_id, wl)
    pdf_l = lights_mod.pdf(lights, l_id, wl)
    f = brdf.mixture_f(mat, hit.normal, wl, -rd)
    vis = ~_occluded(scene, cfg, hit.position + hit.normal * 0.01, wl,
                     mask=hit.hit)
    ld = jnp.where(
        (vis & (pdf_l > 0))[..., None],
        f * li * float(n_l) / jnp.maximum(pdf_l, 1e-20)[..., None],
        0.0,
    )

    # miss pixels: env pdf heat map (blue -> red), normalized to the
    # uniform-sphere pdf so 1/4pi reads as mid-scale
    env_pdf = lights_mod.pdf(lights, jnp.zeros_like(l_id), rd)
    rel = jnp.log1p(env_pdf * 4.0 * PI) / jnp.log(jnp.float32(16.0))
    h01 = jnp.clip(rel, 0.0, 1.0)
    heat = jnp.stack(
        [h01, 0.25 * jnp.sin(PI * h01) + 0.1 * h01, 1.0 - h01], axis=-1
    )
    out = jnp.where(hit.hit[..., None], ld, heat)
    return out.reshape(height, width, 3)


def render_preview(
    scene, camera, width: int, height: int, mode: str = "shaded"
) -> Film:
    """Rasterizer::draw_scene equivalent: deterministic single-pass preview."""
    if mode not in PREVIEW_MODES:
        raise ValueError(f"mode {mode!r} not in {PREVIEW_MODES}")
    scene_data = scene.build() if hasattr(scene, "build") else scene
    from mc_path_tracer_tpu.models.integrator import _camera_params

    cam = _camera_params(camera, width, height)
    img = _preview(scene_data, cam, width, height, mode)
    return Film(ld=img, samples=jnp.ones((height, width), jnp.float32))


def render_debug(scene, camera, width: int, height: int) -> Film:
    """Debug PT mode (RenderWindow menu "Debug PT"): the cheap single-bounce
    visualizer, NOT the full path tracer."""
    scene_data = scene.build() if hasattr(scene, "build") else scene
    from mc_path_tracer_tpu.models.integrator import _camera_params

    cam = _camera_params(camera, width, height)
    img = _debug(scene_data, cam, width, height)
    return Film(ld=img, samples=jnp.ones((height, width), jnp.float32))
