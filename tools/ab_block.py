"""A/B the Pallas traversal ray-block size (512/256/128) and sorted dispatch
on realistic incoherent bounce rays.  Smaller blocks mean tighter per-block
leaf worklists (the block frustum is the union of its rays) at the price of
more per-block fixed cost — measure, don't guess."""

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
    )
    import functools

    def log(m):
        print(m, flush=True)

    cfg = RenderConfig()
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

    table = sd.leaf
    # (mode, block, sub, unroll, static_row): union = r4 gated union-
    # worklist kernel; arena = r5 per-subgroup worklist kernel;
    # static_row=True is the row-load-cost DIAGNOSTIC (results wrong)
    CONFIGS = (("arena", 2048, 64, 8, False),
               ("arena", 2048, 32, 8, False),
               ("arena", 2048, 128, 8, False),
               ("union", 2048, 128, 4, False))
    for mode, blk, sb, ur, srow in CONFIGS:
            def closest(c, i, mode=mode, blk=blk, sb=sb, ur=ur, srow=srow):
                o, d, m = bo + j(i), bd, live
                perm, inv = _sort_perm(d, m, block=blk)
                t, _ = _traverse(table, o[perm], d[perm], False,
                                 m[perm], None, False, block=blk, sub=sb,
                                 mode=mode, unroll=ur, static_row=srow)
                return c + jnp.sum(t[inv].clip(0, 1e6)) * 1e-9

            t = scan_time(closest)
            log(f"closest {mode:5s} blk={blk:4d} sub={sb:3d} u={ur} "
                f"srow={int(srow)} {t*1e3:8.2f} ms")

    # any-hit on the 128k fused-style mix
    sh = jnp.concatenate([bd, -bd], axis=0)
    so = jnp.concatenate([bo, bo], axis=0)
    sl = jnp.concatenate([live, live], axis=0)
    for mode, blk, sb, ur, srow in CONFIGS:
            def anyhit(c, i, mode=mode, blk=blk, sb=sb, ur=ur, srow=srow):
                o, d, m = so + j(i), sh, sl
                perm, inv = _sort_perm(d, m, block=blk)
                occ = _traverse(table, o[perm], d[perm], True,
                                m[perm], None, False, block=blk, sub=sb,
                                mode=mode, unroll=ur, static_row=srow)
                return c + jnp.sum(occ[inv].astype(jnp.float32)) * 1e-9

            t = scan_time(anyhit)
            log(f"anyhit  {mode:5s} blk={blk:4d} sub={sb:3d} u={ur} "
                f"srow={int(srow)} {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
