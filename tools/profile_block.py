"""Profile the steady-state render block on the real chip (VERDICT r2 #1).

Times each pipeline component IN ISOLATION at the exact shapes the bench
block dispatches them, then the full block, and prints a breakdown table.
The residual (block - sum of components x their per-block multiplicity)
exposes dispatch gaps / fusion effects.

Run: python tools/profile_block.py [--trace /tmp/jaxtrace]
Writes PROFILE_r03.md when --write is passed.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def timeit(fn, *args, reps=5, warmup=2):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true")
    ap.add_argument("--trace", default=None)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--depth", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mc_path_tracer_tpu.utils.compcache import enable_persistent_cache

    enable_persistent_cache()

    sys.path.insert(0, "/root/repo")
    from bench import build_bench_scene
    from mc_path_tracer_tpu.models import lights as lights_mod
    from mc_path_tracer_tpu.models.camera import PerspectiveCamera
    from mc_path_tracer_tpu.models.film import tile_order
    from mc_path_tracer_tpu.models.integrator import (
        PIXEL_CHUNK,
        RenderConfig,
        _intersect,
        _occluded,
        _render_block,
        _resolve_accel,
    )
    from mc_path_tracer_tpu.ops import brdf, rng

    def log(m):
        print(m, flush=True)

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")

    width, height, depth, spp = 1920, 1080, args.depth, args.spp
    cfg = RenderConfig(spp=spp, max_depth=depth)
    scene = build_bench_scene()
    sd = scene.build()
    log(f"scene: {sd.tris.num_triangles} tris, accel={_resolve_accel(sd, cfg)}, "
        f"leaves={sd.leaf.num_leaves if sd.leaf is not None else 0}")

    import dataclasses
    cam = dataclasses.replace(
        PerspectiveCamera(position=np.array([0.3, 4.0, 9.0]),
                          target=np.array([0.0, 0.5, 0.0]), fov_deg=45.0),
        aspect=width / height,
    ).params()

    pxi, pyi = tile_order(width, height)
    R = PIXEL_CHUNK
    px = jnp.asarray(pxi[:R].astype(np.float32))
    py = jnp.asarray(pyi[:R].astype(np.float32))
    key = jax.random.PRNGKey(0)
    pid = (py * width + px).astype(jnp.int32)

    # representative rays: actual primary camera rays for the first block
    from mc_path_tracer_tpu.models import camera as camera_mod

    lens_u = jnp.zeros((R, 2), jnp.float32)
    ro, rd = camera_mod.gen_camera_rays(cam, width, height, px, py, lens_u)
    ro, rd = jax.block_until_ready((ro, rd))

    rows = []

    def add(name, secs, mult):
        rows.append((name, secs * 1e3, mult, secs * 1e3 * mult))
        log(f"{name:34s} {secs*1e3:9.2f} ms x{mult:3d} = {secs*1e3*mult:9.1f} ms")

    n_bounce = depth - 1          # NEE bounces per sample
    n_ext = depth - 2             # extension intersects per sample

    # The axon tunnel costs ~25 ms PER DISPATCH, so single-dispatch timing
    # floors there.  Every component is timed as a lax.scan of SCAN_N
    # iterations inside ONE jit (inputs perturbed per step so XLA cannot
    # CSE), minus the measured dispatch floor, divided by SCAN_N.
    SCAN_N = 25
    f_null = jax.jit(lambda x: x + 1.0)
    t_disp = timeit(f_null, jnp.zeros((8, 128), jnp.float32))
    log(f"dispatch floor: {t_disp*1e3:.2f} ms")

    def scan_time(step_fn, init):
        """Per-iteration time of step_fn inside a scan (dispatch removed)."""
        f = jax.jit(
            lambda c0: jax.lax.scan(
                lambda c, i: (step_fn(c, i), None), c0,
                jnp.arange(SCAN_N, dtype=jnp.int32),
            )[0]
        )
        t = timeit(f, init, reps=3, warmup=1)
        return max(t - t_disp, 0.0) / SCAN_N

    # --- full block first (compile everything once) ---
    t_block = timeit(
        lambda: _render_block(sd, cam, px, py, key, cfg, width, height, spp),
        reps=3, warmup=1,
    )
    add("FULL BLOCK (64k rays, spp x depth)", t_block, 1)
    # marginal spp cost: block at 2*spp minus block at spp = pure pipeline
    t_block2 = timeit(
        lambda: _render_block(sd, cam, px, py, key, cfg, width, height,
                              2 * spp),
        reps=3, warmup=1,
    )
    add(f"marginal +{spp} spp (no dispatch)", t_block2 - t_block, 1)

    # --- components (scan-amortized) ---
    add("rng.pixel_uniforms[64k,10]",
        scan_time(lambda c, i: c + jnp.sum(
            rng.pixel_uniforms(jax.random.fold_in(key, i), pid, 10)),
            jnp.float32(0)),
        spp * n_bounce)

    # primary/extension closest-hit (all lanes live); origin jittered per
    # step to defeat CSE
    add("closest-hit intersect [64k]",
        scan_time(lambda c, i: c + jnp.sum(
            _intersect(sd, cfg,
                       ro + i.astype(jnp.float32) * 1e-5, rd).t
            .clip(0, 1e6)) * 1e-9,
            jnp.float32(0)),
        spp * (1 + n_ext))

    # fused any-hit [128k]
    ro2 = jnp.concatenate([ro, ro], axis=0)
    rd2 = jnp.concatenate([rd, -rd], axis=0)
    m2 = jnp.ones(2 * R, bool)
    add("fused any-hit occluded [128k]",
        scan_time(lambda c, i: c + jnp.sum(
            _occluded(sd, cfg, ro2 + i.astype(jnp.float32) * 1e-5, rd2,
                      mask=m2).astype(jnp.float32)) * 1e-9,
            jnp.float32(0)),
        spp * n_bounce)

    # material gather + full brdf stage math at 64k
    lights = lights_mod.with_packed(sd.lights)
    n_lights = lights_mod.num_lights(lights)
    isect = jax.jit(lambda o, d: _intersect(sd, cfg, o, d))(ro, rd)
    isect = jax.block_until_ready(isect)

    def shading(u):
        mat = sd.materials.gather(isect.material_id, isect.uv, sd.atlas)
        n = isect.normal
        wo = -rd
        l_id = jnp.minimum((u[:, 0] * n_lights).astype(jnp.int32), n_lights - 1)
        wl = lights_mod.sample_dir(lights, l_id, u[:, 1:3])
        li = lights_mod.radiance(lights, l_id, wl)
        pdf_l = lights_mod.pdf(lights, l_id, wl)
        f_l = brdf.mixture_f(mat, n, wl, wo)
        pdf_b = brdf.mixture_pdf(mat, n, wl, wo)
        wb = brdf.mixture_sample_wi(mat, n, wo, u[:, 3], u[:, 4:6])
        f_b = brdf.mixture_f(mat, n, wb, wo)
        ws = brdf.mixture_sample_wi(mat, n, wo, u[:, 6], u[:, 7:9])
        pdf_s = brdf.mixture_pdf(mat, n, ws, wo)
        f_s = brdf.mixture_f(mat, n, ws, wo)
        return (jnp.sum(f_l * li * pdf_l[:, None] + f_b
                        + f_s * pdf_s[:, None] + wb + ws)
                + jnp.sum(pdf_b))

    u_base = jax.block_until_ready(
        jax.jit(lambda k: rng.pixel_uniforms(k, pid, 10))(key))
    add("shading math (mat+lights+brdf)",
        scan_time(lambda c, i: c + shading(
            u_base + i.astype(jnp.float32) * 1e-6) * 1e-9,
            jnp.float32(0)),
        spp * n_bounce)

    # env radiance+pdf alone (the lights calls above include it; this
    # isolates the env gather cost)
    zid = jnp.zeros(R, jnp.int32)
    add("env radiance+pdf [64k]",
        scan_time(lambda c, i: c + jnp.sum(
            lights_mod.radiance(
                lights, zid, rd + i.astype(jnp.float32) * 1e-6)
            + lights_mod.pdf(
                lights, zid, rd + i.astype(jnp.float32) * 1e-6)[:, None])
            * 1e-9,
            jnp.float32(0)),
        spp * n_bounce)

    # camera ray gen
    add("camera gen_rays [64k]",
        scan_time(lambda c, i: c + jnp.sum(
            camera_mod.gen_camera_rays(
                cam, width, height, px + i.astype(jnp.float32) * 1e-3, py,
                lens_u)[1]) * 1e-9,
            jnp.float32(0)),
        spp)

    # --- summary ---
    total_acc = sum(r[3] for r in rows[2:])
    block_ms = rows[0][3]
    log("-" * 70)
    log(f"components sum: {total_acc:.1f} ms vs block {block_ms:.1f} ms "
        f"(residual {block_ms - total_acc:.1f} ms = fusion/other)")
    rays = R * spp * (1 + n_ext + 2 * n_bounce)
    log(f"block throughput: {rays / (block_ms / 1e3) / 1e6:.2f} Mrays/s")

    if args.trace:
        with jax.profiler.trace(args.trace):
            jax.block_until_ready(
                _render_block(sd, cam, px, py, key, cfg, width, height, spp)
            )
        log(f"trace written to {args.trace}")

    if args.write:
        with open("/root/repo/PROFILE_r03.md", "w") as f:
            f.write("# PROFILE r03 — steady 64k-ray block breakdown "
                    f"({dev.platform}, {dev})\n\n")
            f.write(f"Bench scene: {sd.tris.num_triangles} tris, accel="
                    f"{_resolve_accel(sd, cfg)}; block = 64k rays x {spp} spp "
                    f"x depth {depth}.\nEach component timed in isolation "
                    "(jitted, min of 5) at its in-block shape, then scaled by "
                    "its per-block multiplicity.\n\n")
            f.write("| component | ms/dispatch | x | ms/block |\n|---|---|---|---|\n")
            for name, ms, mult, tot in rows:
                f.write(f"| {name} | {ms:.2f} | {mult} | {tot:.1f} |\n")
            f.write(f"\ncomponents sum {total_acc:.1f} ms vs block "
                    f"{block_ms:.1f} ms (residual {block_ms-total_acc:.1f} ms)."
                    f"\nblock throughput: {rays/(block_ms/1e3)/1e6:.2f} Mrays/s\n")
        log("wrote PROFILE_r03.md")


if __name__ == "__main__":
    main()
