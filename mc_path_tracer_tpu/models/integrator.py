"""Wavefront path-tracing integrator: the five reference stages fused into one
jitted, differentiable bounce program.

The reference advances paths with five barriered CUDA kernels per wavefront
iteration — logic, generate, mat_mix, extend, shadow
(wavefront_kernels.cu:90-441, host-synced between every stage).  On TPU the
whole wavefront is one fully-vectorized XLA program: each bounce is straight-
line masked code over the ray SoA (dead lanes are predicated off, the
vector-unit equivalent of queue compaction), and there is *no* host round
trip anywhere in a sample — this is the TPU-native answer to the reference's
per-stage cudaStreamSynchronize (SURVEY.md §2h).

Estimator parity (wavefront_kernels.cu wf_logic:90-223 / wf_mat_mix:295-375):
  - background environment radiance only on primary-ray miss (logic:128-140).
  - per-hit MIS direct lighting with the power heuristic combining a
    light-sample estimator (pdf_light vs mixture-brdf pdf; delta lights use
    pdf 1) and a brdf-sample estimator (50/50 spec/diff direction with an
    immediate visibility test) (logic:169-180, mat_mix:320-356).
  - path continuation: 50/50 spec/diff direction, mixture pdf
    0.5*(pdf_diff+pdf_spec), beta *= f_sample/pdf_sample (logic:187).
  - termination: path length > max_depth or extension miss (logic:142-148);
    zero f_sample or pdf_sample terminates (logic:183-186).
  - Russian roulette after bounce 3: q = max(0.05, 1 - beta.y)
    (logic:189-196).
  - ray offsets: shadow ray pos + 0.01*n (logic:214), brdf-visibility ray
    pos + 0.001*wi (mat_mix:333), extension ray pos + 0.001*n (mat_mix:358).
  - uniform light selection from the [env, directionals...] table
    (logic:209-212).
  - NOTE (matching a subtle reference behavior): with max_depth D the last
    hit's direct lighting is computed but never accumulated (logic jumps to
    TERMINATE before the len>1 block when len > D), so only hits 1..D-1
    receive next-event estimation.  We skip that wasted work entirely.

Fixed reference bugs (reproduce with `reference_quirks=True`; SURVEY.md §7):
  - background adds env radiance once, not nmb_lights times
    (logic:135-138 loop bug).
  - uniform light selection divides by the selection probability
    (multiplies by nmb_lights); the reference omits it.
  - Russian-roulette survivors' throughput is divided by (1-q); the
    reference computes the division into a discarded local (logic:195).

Differentiability: detached-sampling path-replay gradients — sampled
directions, pdfs, MIS weights, RR decisions and all intersections are
stop-gradient'd; f terms, light radiance and env texels carry gradients.
Each sample is wrapped in jax.checkpoint, so the backward pass re-traces the
path with the same threefry keys instead of storing per-bounce state
(path-replay backpropagation, SURVEY.md §7 step 8).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import numpy as np
import jax.numpy as jnp

from mc_path_tracer_tpu.models import camera as camera_mod
from mc_path_tracer_tpu.models import lights as lights_mod
from mc_path_tracer_tpu.models.film import Film, make_film, tile_grid
from mc_path_tracer_tpu.models.scene import SceneData
from mc_path_tracer_tpu.ops import brdf, rng
from mc_path_tracer_tpu.ops.intersect import (
    intersect_brute,
    intersect_bvh,
    occluded_brute,
    occluded_bvh,
)
from mc_path_tracer_tpu.ops.sampling import power_heuristic

sg = jax.lax.stop_gradient

# reference constants (wavefront_kernels.cu)
SHADOW_OFFSET = 0.01      # logic:214
VIS_OFFSET = 0.001        # mat_mix:333
EXT_OFFSET = 0.001        # mat_mix:358
RR_START = 3              # logic:189
RR_MIN_Q = 0.05           # logic:191
DEFAULT_SPP = 250         # logic:124 hardcoded sample gate
DEFAULT_MAX_DEPTH = 5     # logic:142-148


@dataclass(frozen=True)
class RenderConfig:
    """Static integrator configuration (hashable; jit-static)."""

    spp: int = DEFAULT_SPP
    max_depth: int = DEFAULT_MAX_DEPTH
    accel: str = "auto"            # "auto"|"pallas"|"dense"|"wide"|"bvh"|"brute"
    max_leaf: int = 4
    jitter: bool = False           # reference shoots pixel centers only
    reference_quirks: bool = False
    rr_start: int = RR_START
    # octant-sort + dead-lane-compact Pallas traversal dispatches (measured
    # 81 -> 56 ms on a 64k incoherent closest-hit; ~0.5 ms overhead).  The
    # estimator is unaffected: sorting permutes kernel lanes only.
    sort_rays: bool = True
    # Share one mixture sample between the brdf-sample MIS estimator and the
    # path-continuation ray: the extension intersect then doubles as the
    # brdf ray's visibility/emitter query, deleting one traversal dispatch
    # and one sample_wi + f + pdf evaluation per bounce (the standard
    # hit-emitter MIS formulation; still unbiased — the reference instead
    # draws an independent wb and traces it separately, mat_mix:331-345).
    # Default OFF since r5: the shared sample correlates the brdf-side MIS
    # term with the continued path's radiance and measured ~1.45x
    # per-sample variance on glossy surfaces (parity on diffuse) — see
    # tests/test_integrator.py::test_reuse_estimator_variance_pinned.  The
    # two-sample default matches the reference's estimator shape exactly;
    # enable reuse for diffuse-dominant interactive workloads where the
    # ~25% ray saving wins.  Ignored under reference_quirks.
    reuse_brdf_ray: bool = False
    # Estimator-comparison modes mirroring the reference's README figures:
    # "mis" (default) combines both strategies with the power heuristic;
    # "light" / "brdf" run a single strategy at full weight
    # (README "Multiple Importance Sampling" light_samp/brdf_samp images).
    mis_mode: str = "mis"
    # False = sample the HDRI env uniformly over the sphere (pdf 1/4pi) —
    # the reference's env-importance-sampling OFF comparison
    # (README env-IS figures).
    env_importance: bool = True


def _on_tpu() -> bool:
    """True when the default device runs compiled Pallas TPU kernels
    (evaluated at trace time; tests pin the platform to cpu)."""
    dev = jax.devices()[0]
    return "tpu" in dev.platform.lower() or "TPU" in getattr(dev, "device_kind", "")


# scenes at or below this triangle count skip the BVH entirely: the dense
# Pallas intersector streams every triangle through VMEM faster than any
# traversal overhead (reference wf_extend at small scale,
# wavefront_kernels.cu:253-293)
DENSE_ACCEL_MAX_TRIS = 2048


def _resolve_accel(scene: SceneData, cfg: RenderConfig) -> str:
    """Pick the traversal backend at trace time (static per compile).

    auto: dense Pallas for tiny scenes on TPU, leaf-table Pallas kernel when
    the scene fits VMEM on TPU, else the XLA wide table, else the threaded
    binary BVH."""
    a = cfg.accel
    if a != "auto":
        return a
    if _on_tpu():
        if scene.tris.num_triangles <= DENSE_ACCEL_MAX_TRIS:
            return "dense"
        if scene.leaf is not None:
            return "pallas"
    if scene.wide is not None:
        return "wide"
    return "bvh"


def _intersect(scene: SceneData, cfg: RenderConfig, ro, rd, mask=None):
    accel = _resolve_accel(scene, cfg)
    if accel == "brute":
        return intersect_brute(scene.tris, ro, rd)
    if accel == "dense":
        from mc_path_tracer_tpu.ops.pallas.intersect_kernel import (
            intersect_dense_soa,
        )

        return intersect_dense_soa(scene.tris, ro, rd, interpret=not _on_tpu())
    if accel == "pallas" and scene.leaf is not None:
        from mc_path_tracer_tpu.ops.pallas.traversal_kernel import intersect_pallas

        return intersect_pallas(
            scene.leaf, scene.tris, ro, rd, mask=mask,
            interpret=not _on_tpu(), sort=cfg.sort_rays,
        )
    if accel in ("wide", "pallas") and scene.wide is not None:
        from mc_path_tracer_tpu.ops.wide_bvh import intersect_wide

        return intersect_wide(scene.wide, scene.tris, ro, rd, mask=mask)
    return intersect_bvh(scene.bvh, scene.tris, ro, rd, cfg.max_leaf, mask=mask)


def _occluded(scene: SceneData, cfg: RenderConfig, ro, rd, mask=None, t_max=None):
    accel = _resolve_accel(scene, cfg)
    if accel == "brute":
        return occluded_brute(scene.tris, ro, rd, t_max=t_max)
    if accel == "dense":
        from mc_path_tracer_tpu.ops.pallas.intersect_kernel import (
            occluded_dense_soa,
        )

        return occluded_dense_soa(
            scene.tris, ro, rd, mask=mask, t_max=t_max, interpret=not _on_tpu()
        )
    if accel == "pallas" and scene.leaf is not None:
        from mc_path_tracer_tpu.ops.pallas.traversal_kernel import occluded_pallas

        return occluded_pallas(
            scene.leaf, ro, rd, mask=mask, t_max=t_max,
            interpret=not _on_tpu(), sort=cfg.sort_rays,
        )
    if accel in ("wide", "pallas") and scene.wide is not None:
        from mc_path_tracer_tpu.ops.wide_bvh import occluded_wide

        return occluded_wide(scene.wide, ro, rd, mask=mask, t_max=t_max)
    return occluded_bvh(
        scene.bvh, scene.tris, ro, rd, cfg.max_leaf, mask=mask, t_max=t_max
    )


def _env_radiance(lights: lights_mod.LightSet, d: jnp.ndarray) -> jnp.ndarray:
    zero = jnp.zeros(d.shape[:-1], jnp.int32)
    return lights_mod.radiance(lights, zero, d)


def trace_radiance(
    scene: SceneData,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    key: jax.Array,
    cfg: RenderConfig,
    pid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Path-trace one sample for each input ray; returns radiance [R, 3].

    This is the fused logic/generate/mat_mix/extend/shadow program; the
    bounce loop is unrolled (max_depth is static and small).

    `pid` keys each lane's random stream (the renderer passes pixel ids, so
    noise is invariant to chunking/sharding); defaults to array position.
    """
    if cfg.mis_mode not in ("mis", "light", "brdf"):
        raise ValueError(f"unknown mis_mode {cfg.mis_mode!r} "
                         "(expected 'mis', 'light' or 'brdf')")
    num_rays = ray_o.shape[0]
    if pid is None:
        pid = jnp.arange(num_rays, dtype=jnp.int32)
    lights = lights_mod.with_packed(scene.lights)
    n_lights = lights_mod.num_lights(lights)
    aid = lights_mod.area_light_id(lights)  # static; -1 when no area light

    l_out = jnp.zeros((num_rays, 3), jnp.float32)
    beta = jnp.ones((num_rays, 3), jnp.float32)

    # primary hit (wf_generate + first wf_extend)
    isect = jax.tree.map(sg, _intersect(scene, cfg, ray_o, ray_d))

    # background on primary miss (logic:128-140).  Quirk mode replicates the
    # reference's loop that adds env radiance once per light in the table.
    bg = _env_radiance(lights, ray_d)
    bg_scale = float(n_lights) if cfg.reference_quirks else 1.0
    l_out = l_out + jnp.where(isect.hit[..., None], 0.0, bg * bg_scale)

    # radiant objects visible to the camera: primary-hit emission (the
    # reference's `+ Vec3f(0) * beta` placeholder at logic:131-133, realized)
    if aid >= 0:
        prim_emit = scene.materials.emission(isect.material_id, isect.uv, scene.atlas)
        l_out = l_out + jnp.where(isect.hit[..., None], prim_emit, 0.0)

    alive = isect.hit
    wo = -ray_d

    # NEE happens at hits 1..max_depth-1 (see module docstring).
    for bounce in range(1, cfg.max_depth):
        u = rng.pixel_uniforms(jax.random.fold_in(key, bounce), pid, 10)
        u = sg(u)
        pos = isect.position
        mat = scene.materials.gather(isect.material_id, isect.uv, scene.atlas)
        # tangent-space normal mapping (dMaterial.cu get_normal:84-115; a
        # no-op compile when the scene has no textures)
        n = scene.materials.perturb_normal(
            isect.material_id, isect.uv, scene.atlas,
            isect.normal, isect.tangent, isect.bitangent,
        )

        # ---- light selection (logic:209-212) ----
        l_id = jnp.minimum((u[:, 0] * n_lights).astype(jnp.int32), n_lights - 1)
        wl = sg(lights_mod.sample_dir(lights, l_id, u[:, 1:3],
                                      env_importance=cfg.env_importance))
        delta = lights_mod.is_delta(lights, l_id)
        li_light = lights_mod.radiance(lights, l_id, wl)
        pdf_light = sg(lights_mod.pdf(lights, l_id, wl,
                                      env_importance=cfg.env_importance))
        shadow_tmax = None
        if aid >= 0:
            is_area = l_id == aid
            wl_a, dist_a, li_a, pdf_a = lights_mod.sample_area(
                lights.area, scene.tris, pos, u[:, 1:3 + 1]
            )
            wl_a, dist_a, pdf_a = sg(wl_a), sg(dist_a), sg(pdf_a)
            wl = jnp.where(is_area[..., None], wl_a, wl)
            li_light = jnp.where(is_area[..., None], li_a, li_light)
            pdf_light = jnp.where(is_area, pdf_a, pdf_light)
            # bounded shadow ray: blockers strictly between surface and
            # light.  The 2*SHADOW_OFFSET margin covers the ray origin's
            # 0.01*n offset so the emissive quad never occludes itself.
            shadow_tmax = jnp.where(
                is_area,
                dist_a * (1.0 - 1e-3) - 2.0 * SHADOW_OFFSET,
                jnp.full_like(dist_a, 1e32),
            )

        # ---- light-sample estimator (mat_mix:320-329) ----
        shadow_o = pos + n * SHADOW_OFFSET
        f_light = brdf.mixture_f(mat, n, wl, wo)
        pdf_brdf_at_wl = sg(
            jnp.where(delta, 1.0, brdf.mixture_pdf(mat, n, wl, wo))
        )
        # lanes whose light sample contributes nothing (f = 0 — e.g. env
        # directions sampled below the surface horizon, ~half of them on
        # diffuse surfaces — or pdf = 0) skip the shadow ray: exact, since
        # the ld term is zero either way, and the sorted dispatch compacts
        # the skipped lanes into kernel-skipped blocks
        sh_mask = (
            alive & (pdf_light > 0.0) & jnp.any(sg(f_light) != 0.0, axis=-1)
        ) if not cfg.reference_quirks else alive

        # ---- brdf-sample estimator (mat_mix:331-345), non-delta lights ----
        # Default (reuse_brdf_ray): ONE mixture sample ws serves both the
        # brdf-sample MIS estimator and the path continuation — the
        # extension intersect answers the estimator's visibility/emitter
        # query, so each bounce dispatches one closest-hit + one R-lane
        # shadow any-hit instead of closest + 2R-lane fused any-hit.  Only
        # the last NEE bounce (no extension follows) pays a dedicated
        # visibility lane set.  Quirk mode draws the reference's
        # independent wb instead.
        reuse = cfg.reuse_brdf_ray and not cfg.reference_quirks
        last = bounce == cfg.max_depth - 1
        isect_next = None
        if reuse:
            ws = sg(brdf.mixture_sample_wi(mat, n, wo, u[:, 6], u[:, 7:9]))
            wb = ws
            ext_o = pos + n * EXT_OFFSET
        else:
            ws = None
            wb = sg(brdf.mixture_sample_wi(mat, n, wo, u[:, 3], u[:, 4:6]))
            ext_o = None
        f_at_wb = brdf.mixture_f(mat, n, wb, wo)
        pdf_at_wb = sg(brdf.mixture_pdf(mat, n, wb, wo))
        if reuse and not last:
            # Continuation throughput + Russian roulette BEFORE the shared
            # trace: RR now gambles the bounce's brdf-estimator term along
            # with the continuation — survivors carry 1/(1-q), killed lanes
            # skip the (expensive, closest-hit) extension entirely, so the
            # trace runs at post-RR occupancy exactly like the reference's
            # wf_extend after wf_logic termination (logic:189-196, 253-272).
            # Unbiased: E[term * survive / (1-q)] = E[term].  Zero-f / zero-
            # pdf lanes terminate (logic:183-186) and trace nothing.
            cont_ok_r = (pdf_at_wb > 0.0) & jnp.any(
                sg(f_at_wb) != 0.0, axis=-1
            )
            beta_next = jnp.where(
                alive[..., None],
                beta * f_at_wb / jnp.maximum(pdf_at_wb, 1e-20)[..., None],
                beta,
            )
            surv = alive & cont_ok_r
            if bounce >= cfg.rr_start:
                q = jnp.maximum(RR_MIN_Q, 1.0 - sg(beta_next[:, 1]))
                surv = surv & ~(u[:, 9] < q)
                beta_next = beta_next / jnp.maximum(
                    1.0 - sg(q), RR_MIN_Q
                )[..., None]
            ext_mask = surv
        else:
            beta_next = None
            surv = alive
            ext_mask = alive
        if aid >= 0:
            # area lights need the closest hit of the brdf ray (did it reach
            # the emissive surface?); env visibility falls out of the same
            # trace (escaped == visible), so no separate occlusion test.
            visible = (
                ~_occluded(scene, cfg, shadow_o, wl, mask=sh_mask,
                           t_max=shadow_tmax)
                & alive
            )
            vis_o = ext_o if reuse else pos + wb * VIS_OFFSET
            hit_b = jax.tree.map(
                sg,
                _intersect(scene, cfg, vis_o, wb,
                           mask=ext_mask if reuse and not last
                           else alive & ~delta),
            )
            if reuse and not last:
                isect_next = hit_b
            li_hit, pdf_sa_hit, on_light = lights_mod.area_eval_hit(
                lights.area, scene.tris, hit_b, vis_o
            )
            is_area = l_id == aid
            vis2 = jnp.where(is_area, on_light, ~hit_b.hit) & ~delta & surv
            li_brdf_raw = jnp.where(
                is_area[..., None], li_hit,
                lights_mod.radiance(lights, l_id, wb),
            )
            pdf_l_at_wb_raw = jnp.where(
                is_area, sg(pdf_sa_hit),
                lights_mod.pdf(lights, l_id, wb,
                               env_importance=cfg.env_importance),
            )
        elif reuse and not last:
            # shadow any-hit only (R lanes); the extension closest-hit below
            # doubles as the brdf-sample visibility query (miss == the env
            # light is visible along ws)
            occ = _occluded(scene, cfg, shadow_o, wl, mask=sh_mask)
            visible = ~occ & alive
            isect_next = jax.tree.map(
                sg, _intersect(scene, cfg, ext_o, wb, mask=ext_mask)
            )
            vis2 = ~isect_next.hit & ~delta & surv
            li_brdf_raw = lights_mod.radiance(lights, l_id, wb)
            pdf_l_at_wb_raw = lights_mod.pdf(
                lights, l_id, wb, env_importance=cfg.env_importance)
        else:
            # one fused any-hit dispatch for BOTH the shadow ray (light
            # sample) and the brdf-sample visibility ray: 2R-lane gathers
            # are ~30% cheaper per row and the per-dispatch fixed cost is
            # paid once (wf_shadow + the mat_mix inline test, fused)
            vis_o = ext_o if reuse else pos + wb * VIS_OFFSET
            occ2 = _occluded(
                scene, cfg,
                jnp.concatenate([shadow_o, vis_o], axis=0),
                jnp.concatenate([wl, wb], axis=0),
                mask=jnp.concatenate([sh_mask, alive & ~delta], axis=0),
            )
            visible = ~occ2[:num_rays] & alive
            vis2 = ~occ2[num_rays:] & ~delta & alive
            li_brdf_raw = lights_mod.radiance(lights, l_id, wb)
            pdf_l_at_wb_raw = lights_mod.pdf(
                lights, l_id, wb, env_importance=cfg.env_importance)
        f_brdf = jnp.where(vis2[..., None], f_at_wb, 0.0)
        li_brdf = jnp.where(vis2[..., None], li_brdf_raw, 0.0)
        pdf_brdf = sg(jnp.where(vis2, pdf_at_wb, 1.0))
        pdf_light_at_wb = sg(jnp.where(vis2, pdf_l_at_wb_raw, 1.0))

        # ---- MIS combine (logic:169-180) ----
        # Delta lights: the reference feeds the power heuristic a placeholder
        # brdf pdf of 1 (mat_mix:329 else-branch), which halves delta-light
        # energy (w = ph(1,1,1,1) = 0.5 and the brdf estimator contributes 0).
        # Fixed default: delta lights take the light-sample estimator at full
        # weight (no brdf strategy can hit a delta light).
        w1 = sg(power_heuristic(1, pdf_light, 1, pdf_brdf_at_wl))
        if not cfg.reference_quirks:
            w1 = jnp.where(delta, 1.0, w1)
        w2 = sg(power_heuristic(1, pdf_brdf, 1, pdf_light_at_wb))
        if cfg.mis_mode == "light":
            # light-sampling only (README light_samp figure): the light
            # estimator at full weight, brdf estimator off
            w1 = jnp.ones_like(w1)
            w2 = jnp.zeros_like(w2)
        elif cfg.mis_mode == "brdf":
            # brdf-sampling only (README brdf_samp figure); delta lights
            # are unreachable by this strategy, as in the reference
            w1 = jnp.zeros_like(w1)
            w2 = jnp.ones_like(w2)
        ld = jnp.where(
            (visible & (pdf_light > 0.0) & (w1 > 0.0))[..., None],
            f_light * li_light * (w1 / jnp.maximum(pdf_light, 1e-20))[..., None],
            0.0,
        )
        if reuse and not last:
            # brdf term folded as beta_next * Li * w2: beta_next already
            # carries f_s/pdf_s and the RR survivor reweight (see above);
            # vis2 implies survival + pdf > 0
            ld_brdf = jnp.where(
                (vis2 & (w2 > 0.0))[..., None],
                beta_next * li_brdf * w2[..., None],
                0.0,
            )
        else:
            ld = ld + jnp.where(
                (vis2 & (pdf_brdf > 0.0) & (w2 > 0.0))[..., None],
                f_brdf * li_brdf
                * (w2 / jnp.maximum(pdf_brdf, 1e-20))[..., None],
                0.0,
            )
            ld_brdf = None
        if not cfg.reference_quirks:
            ld = ld * float(n_lights)  # uniform-selection compensation (fixed bug)
            if ld_brdf is not None:
                ld_brdf = ld_brdf * float(n_lights)
        l_out = l_out + jnp.where(alive[..., None], beta * ld, 0.0)
        if ld_brdf is not None:
            l_out = l_out + ld_brdf

        # ---- path continuation sample (mat_mix:347-371, logic:183-187)
        # (reuse mode already advanced beta/alive before the trace)
        if reuse and not last:
            beta = beta_next
            alive = surv
        else:
            if reuse:
                pdf_s, f_s = pdf_at_wb, f_at_wb   # shared sample (ws == wb)
            else:
                ws = sg(brdf.mixture_sample_wi(mat, n, wo, u[:, 6], u[:, 7:9]))
                pdf_s = sg(brdf.mixture_pdf(mat, n, ws, wo))
                f_s = brdf.mixture_f(mat, n, ws, wo)
            cont_ok = (pdf_s > 0.0) & jnp.any(sg(f_s) != 0.0, axis=-1)
            beta = jnp.where(
                alive[..., None],
                beta * f_s / jnp.maximum(pdf_s, 1e-20)[..., None],
                beta,
            )
            alive = alive & cont_ok

            # ---- Russian roulette (logic:189-196; fixed survivor div) ----
            if bounce >= cfg.rr_start:
                q = jnp.maximum(RR_MIN_Q, 1.0 - sg(beta[:, 1]))
                kill = u[:, 9] < q
                alive = alive & ~kill
                if not cfg.reference_quirks:
                    beta = beta / jnp.maximum(1.0 - sg(q), RR_MIN_Q)[..., None]

        # ---- extension (wf_extend), only if another NEE bounce follows ----
        if bounce < cfg.max_depth - 1:
            ray_d = ws
            wo = -ray_d
            if isect_next is not None:
                isect = isect_next   # reuse: already traced above
            else:
                isect = jax.tree.map(
                    sg,
                    _intersect(scene, cfg, pos + n * EXT_OFFSET, ray_d,
                               mask=alive),
                )
            alive = alive & isect.hit

    return l_out


def _sample_pass(scene, cfg, camera, width, height, px, py, key, sample_idx):
    """One spp pass over all pixels (checkpointed: path-replay backward).

    All randomness is keyed by pixel id (rng.pixel_uniforms), so the frame
    renders identically however it is chunked into blocks or sharded across
    devices."""
    skey = jax.random.fold_in(key, sample_idx)
    pid = (py * width + px).astype(jnp.int32)
    if cfg.jitter:
        uj = rng.pixel_uniforms(jax.random.fold_in(skey, 1_000_003), pid, 2)
        pxj = px + uj[..., 0] - 0.5
        pyj = py + uj[..., 1] - 0.5
    else:
        pxj, pyj = px, py  # pixel centers, as the reference (Camera.cu:21-22)
    lens_u = rng.pixel_uniforms(jax.random.fold_in(skey, 1_000_007), pid, 2)
    ro, rd = camera_mod.gen_camera_rays(camera, width, height, pxj, pyj, lens_u)
    return trace_radiance(scene, ro, rd, skey, cfg, pid=pid)


PIXEL_CHUNK = 65536


def render_tile_radiance(
    scene: SceneData,
    camera: "camera_mod.CameraParams",
    width: int,
    height: int,
    px: jnp.ndarray,
    py: jnp.ndarray,
    key: jax.Array,
    cfg: RenderConfig,
    spp: int | None = None,
) -> jnp.ndarray:
    """Accumulated radiance sum over `spp` samples for pixels (px, py) — the
    device-side core shared by render() and the sharded renderer.

    Large frames are processed in PIXEL_CHUNK-ray blocks via lax.map: each
    block runs the full spp x bounce pipeline before the next starts,
    bounding live state to the block and letting every traversal while_loop
    exit at its own block's convergence instead of the frame's worst ray.
    """
    spp = cfg.spp if spp is None else spp

    def chunk_radiance(px_c, py_c, key_c):
        sample = jax.checkpoint(
            lambda s: _sample_pass(
                scene, cfg, camera, width, height, px_c, py_c, key_c, s
            ),
            policy=jax.checkpoint_policies.nothing_saveable,
        )

        def body(carry, s):
            return carry + sample(s), None

        # unroll a few samples per loop step: drops the scan's carry copies
        # and while-loop overhead (measured 641 -> 622 ms on a mid-frame
        # 64k x 4spp block; bounded unroll keeps spp=250 compiles sane)
        acc, _ = jax.lax.scan(
            body, jnp.zeros(px_c.shape + (3,), jnp.float32), jnp.arange(spp),
            unroll=min(spp, 4),
        )
        return acc

    num_rays = px.shape[0]
    if num_rays <= PIXEL_CHUNK:
        return chunk_radiance(px, py, key)

    pad = (-num_rays) % PIXEL_CHUNK
    n_chunks = (num_rays + pad) // PIXEL_CHUNK

    def blocked(x):
        return jnp.concatenate(
            [x, jnp.zeros((pad,), x.dtype)]
        ).reshape(n_chunks, PIXEL_CHUNK)

    # noise is keyed by pixel id, so every chunk uses the same base key and
    # the result is independent of the chunking
    acc = jax.lax.map(
        lambda args: chunk_radiance(args[0], args[1], key),
        (blocked(px), blocked(py)),
    )
    return acc.reshape(-1, 3)[:num_rays]


@partial(jax.jit, static_argnames=("cfg", "width", "height", "spp"))
def _render_block(scene, camera, px, py, key, cfg, width, height, spp):
    return render_tile_radiance(scene, camera, width, height, px, py, key, cfg, spp)


def _render_full(scene, camera, key, cfg, width, height, spp):
    """Full frame as a host-side loop over PIXEL_CHUNK blocks: every dispatch
    is the same modest program (one compile), avoiding the giant fused
    map-of-pipelines program that device runtimes choke on, while the jitted
    block itself still contains the whole spp x bounce pipeline with no
    per-stage host sync.

    Pixels are enumerated in 32x16 tile-major order (film.tile_order), so
    each 512-ray traversal block covers a spatially tight frustum — the
    Pallas kernel's per-block leaf schedule shrinks ~10x vs row strips."""
    from mc_path_tracer_tpu.models.film import tile_order

    pxi, pyi = tile_order(width, height)
    px = pxi.astype(np.float32)
    py = pyi.astype(np.float32)
    num_rays = px.shape[0]
    block = PIXEL_CHUNK
    if num_rays <= block:
        acc = _render_block(
            scene, camera, jnp.asarray(px), jnp.asarray(py), key, cfg,
            width, height, spp,
        )
    else:
        pad = (-num_rays) % block
        px = np.concatenate([px, np.zeros(pad, np.float32)])
        py = np.concatenate([py, np.zeros(pad, np.float32)])
        chunks = []
        for c in range(len(px) // block):
            chunks.append(
                _render_block(
                    scene, camera,
                    jnp.asarray(px[c * block : (c + 1) * block]),
                    jnp.asarray(py[c * block : (c + 1) * block]),
                    key, cfg, width, height, spp,
                )
            )
        acc = jnp.concatenate(chunks, axis=0)[:num_rays]
    # un-swizzle: scatter tile-major radiance back to image layout
    img = jnp.zeros((height, width, 3), jnp.float32)
    return img.at[pyi, pxi].set(acc)


def render(
    scene,
    camera,
    width: int,
    height: int,
    cfg: RenderConfig = RenderConfig(),
    key: jax.Array | None = None,
) -> Film:
    """Render a full frame (PathTracer::render_image equivalent, batched over
    all tiles and samples).  `scene` is a Scene (built on the fly) or a
    SceneData pytree."""
    scene_data = scene.build() if hasattr(scene, "build") else scene
    if key is None:
        key = jax.random.PRNGKey(0)
    cam_params = _camera_params(camera, width, height)
    acc = _render_full(scene_data, cam_params, key, cfg, width, height, cfg.spp)
    return Film(ld=acc, samples=jnp.full((height, width), cfg.spp, jnp.float32))


@partial(
    jax.jit,
    static_argnames=("tw", "th", "width", "height", "cfg", "spp"),
)
def _tile_pass(scene_d, cam, x0, y0, k, tw, th, width, height, cfg, spp):
    """One progressive tile pass, hoisted to module level so every
    render_progressive generator (and every RenderSession edit-restart)
    reuses the same compiled executable — scene/camera edits change pytree
    *values*, not the trace."""
    ys, xs = jnp.mgrid[0:th, 0:tw]
    px = (xs.reshape(-1) + x0).astype(jnp.float32)
    py = (ys.reshape(-1) + y0).astype(jnp.float32)
    acc = render_tile_radiance(scene_d, cam, width, height, px, py, k, cfg, spp)
    return acc.reshape(th, tw, 3)


def render_progressive(
    scene,
    camera,
    width: int,
    height: int,
    cfg: RenderConfig = RenderConfig(),
    key: jax.Array | None = None,
    tile: int = 256,
    spp_per_pass: int = 1,
):
    """Progressive generator: yields a Film after each (tile, pass) step,
    mirroring the reference's one-tile-per-frame round-robin
    (Film.cu:94-103, PathTracer.cpp:112-131).  Re-invoking after editing the
    scene restarts accumulation (observer semantics) without recompiling."""
    scene_data = scene.build() if hasattr(scene, "build") else scene
    if key is None:
        key = jax.random.PRNGKey(0)
    cam_params = _camera_params(camera, width, height)
    film = make_film(width, height)

    passes = (cfg.spp + spp_per_pass - 1) // spp_per_pass
    for p in range(passes):
        kp = jax.random.fold_in(key, p)
        for i, (x0, y0, tw, th) in enumerate(tile_grid(width, height, tile)):
            # noise is pixel-keyed: tiles need no per-tile fold and the
            # accumulated frame is independent of the tile decomposition
            acc = _tile_pass(
                scene_data, cam_params, x0, y0, kp, tw, th,
                width, height, cfg, spp_per_pass,
            )
            film = Film(
                ld=film.ld.at[y0 : y0 + th, x0 : x0 + tw].add(acc),
                samples=film.samples.at[y0 : y0 + th, x0 : x0 + tw].add(
                    float(spp_per_pass)
                ),
            )
            yield film


def _camera_params(camera, width, height):
    """Accept a host PerspectiveCamera (aspect set from the film size,
    RenderWindow.cpp:23-27) or ready-made CameraParams."""
    if isinstance(camera, camera_mod.CameraParams):
        return camera
    import dataclasses

    camera = dataclasses.replace(camera, aspect=width / height)
    return camera.params()
