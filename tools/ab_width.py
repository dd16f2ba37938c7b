"""A/B the arena kernel's leaf-row WIDTH (128 / 256 / 512 triangle lanes)
on realistic incoherent bounce rays.

PROFILE_r05's sub=32/64/128 timings solve to ~7.6 fixed vs ~2.8 vector
cost units per visit at sub=64 — per-visit FIXED cost (loop machinery,
row slice, break check) dominates the walk ~73/27.  Merging K DFS-adjacent
128-tri leaves into one [10, 128K] row divides the visit count while only
multiplying the cheap vector MT work, so the law predicts wider rows win
until vector work catches up.  The r4 "leaf width is optimal" argument
only ruled out NARROWER leaves.  Measure, don't guess."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def timeit(fn, *args, reps=3, warmup=1):
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
    import jax
    import jax.numpy as jnp

    from mc_path_tracer_tpu.utils.compcache import enable_persistent_cache

    enable_persistent_cache()

    from bench import build_bench_scene
    from mc_path_tracer_tpu.models import camera as camera_mod
    from mc_path_tracer_tpu.models.camera import PerspectiveCamera
    from mc_path_tracer_tpu.models.film import tile_order
    from mc_path_tracer_tpu.models.integrator import (
        PIXEL_CHUNK,
        RenderConfig,
        _intersect,
    )
    from mc_path_tracer_tpu.ops import rng as rng_mod
    from mc_path_tracer_tpu.ops.math import build_onb
    from mc_path_tracer_tpu.ops.pallas.traversal_kernel import (
        _sort_perm,
        _traverse,
        build_leaf_table,
    )

    def log(m):
        print(m, flush=True)

    scene = build_bench_scene()
    sd = scene.build()
    width, height = 1920, 1080
    import dataclasses
    cam = dataclasses.replace(
        PerspectiveCamera(position=np.array([0.3, 4.0, 9.0]),
                          target=np.array([0.0, 0.5, 0.0]), fov_deg=45.0),
        aspect=width / height,
    ).params()
    R = PIXEL_CHUNK
    pxi, pyi = tile_order(width, height)
    mid = pxi.shape[0] // 2
    px = jnp.asarray(pxi[mid:mid + R].astype(np.float32))
    py = jnp.asarray(pyi[mid:mid + R].astype(np.float32))
    pid = (py * width + px).astype(jnp.int32)
    key = jax.random.PRNGKey(0)
    ro, rd = camera_mod.gen_camera_rays(cam, width, height, px, py,
                                        jnp.zeros((R, 2), jnp.float32))
    log("compiling primary...")
    hit = jax.jit(lambda o, d: _intersect(sd, RenderConfig(sort_rays=False),
                                          o, d))(ro, rd)
    hit = jax.block_until_ready(hit)

    u = rng_mod.pixel_uniforms(key, pid, 2)
    st = jnp.sqrt(jnp.maximum(1.0 - u[:, 0] ** 2, 0.0))
    phi = 2.0 * jnp.pi * u[:, 1]
    local = jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), u[:, 0]], -1)
    t_vec, b_vec = build_onb(hit.normal)
    bd = (local[:, 0:1] * t_vec + local[:, 1:2] * b_vec
          + local[:, 2:3] * hit.normal)
    bo = hit.position + hit.normal * 0.001
    live = hit.hit
    bo, bd, live = jax.block_until_ready((bo, bd, live))
    log(f"live {float(jnp.mean(live.astype(jnp.float32))):.3f}")

    SCAN_N = 50
    f_null = jax.jit(lambda x: x + 1.0)
    t_disp = timeit(f_null, jnp.zeros((8, 128), jnp.float32), reps=5, warmup=2)
    log(f"dispatch floor {t_disp*1e3:.1f} ms")

    def scan_time(step):
        f = jax.jit(lambda c0: jax.lax.scan(
            lambda c, i: (step(c, i), None), c0,
            jnp.arange(SCAN_N, dtype=jnp.int32))[0])
        return max(timeit(f, jnp.float32(0)) - t_disp, 0.0) / SCAN_N

    def j(i):
        return i.astype(jnp.float32) * 1e-5

    tables = {w: build_leaf_table(sd.wide, width=w) for w in (128, 256, 512)}
    for w, t in tables.items():
        log(f"width {w}: leaves={t.num_leaves} l_pad={t.l_pad}")

    # (leaf_width, sub, unroll) sweep; correctness spot-check vs w=128
    CONFIGS = ((128, 64, 8), (256, 64, 8), (256, 32, 8),
               (512, 32, 8), (512, 16, 8))
    ref_t = None
    sh = jnp.concatenate([bd, -bd], axis=0)
    so = jnp.concatenate([bo, bo], axis=0)
    sl = jnp.concatenate([live, live], axis=0)
    for w, sb, ur in CONFIGS:
        table = tables[w]

        def once(o, d, m, table=table, sb=sb, ur=ur):
            perm, inv = _sort_perm(d, m, block=2048)
            t, _ = _traverse(table, o[perm], d[perm], False, m[perm],
                             None, False, block=2048, sub=sb,
                             mode="arena", unroll=ur)
            return t[inv]

        t_here = jax.block_until_ready(jax.jit(once)(bo, bd, live))
        if ref_t is None:
            ref_t = t_here
        else:
            agree = float(jnp.mean(
                (jnp.abs(t_here - ref_t)
                 <= 1e-4 * jnp.maximum(1.0, jnp.abs(ref_t))).astype(
                    jnp.float32)
            ))
            log(f"  w={w} sub={sb}: closest t agreement vs 128 = {agree}")

        def closest(c, i, table=table, sb=sb, ur=ur):
            o, d, m = bo + j(i), bd, live
            perm, inv = _sort_perm(d, m, block=2048)
            t, _ = _traverse(table, o[perm], d[perm], False, m[perm],
                             None, False, block=2048, sub=sb,
                             mode="arena", unroll=ur)
            return c + jnp.sum(t[inv].clip(0, 1e6)) * 1e-9

        t = scan_time(closest)
        log(f"closest w={w:3d} sub={sb:3d} u={ur} {t*1e3:8.2f} ms")

    for w, sb, ur in CONFIGS:
        table = tables[w]

        def anyhit(c, i, table=table, sb=sb, ur=ur):
            o, d, m = so + j(i), sh, sl
            perm, inv = _sort_perm(d, m, block=2048)
            occ = _traverse(table, o[perm], d[perm], True, m[perm],
                            None, False, block=2048, sub=sb,
                            mode="arena", unroll=ur)
            return c + jnp.sum(occ[inv].astype(jnp.float32)) * 1e-9

        t = scan_time(anyhit)
        log(f"anyhit  w={w:3d} sub={sb:3d} u={ur} {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
