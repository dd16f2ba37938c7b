"""Phase-cost breakdown of the arena traversal kernel: how much of a
dispatch is worklist CONSTRUCTION (phases -1..1d: chunk cull, per-leaf
slabs, counting sort, arena placement) vs the phase-2 WALK.

Uses the stages= diagnostic (results are wrong below stages=3; timing
only).  If construction is a material share, its serial SMEM loops
(phase 1 placement ~n entries, phase 1d ~pair count) are the next
target; if the walk dominates, the MT/visit loop remains the wall."""

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
        RAY_BLOCK,
        _pack_rays,
        _sort_perm,
        _traverse,
        _traverse_packed,
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
    sh = jnp.concatenate([bd, -bd], axis=0)
    so = jnp.concatenate([bo, bo], axis=0)
    sl = jnp.concatenate([live, live], axis=0)

    # sort modes: 2 = pack-first + one [R, 8] row gather (shipped path),
    # 1 = component-wise gathers (the r5-early path), 0 = unsorted
    for sort in (2, 1, 0):
        for stages in (0, 1, 2, 3):
            def closest(c, i, stages=stages, sort=sort):
                o, d, m = bo + j(i), bd, live
                if sort == 2:
                    perm, inv = _sort_perm(d, m, block=2048)
                    packed = _pack_rays(o, d, m, None, o.shape[0])
                    t, _ = _traverse_packed(
                        table, packed[perm], o.shape[0], False, False,
                        block=2048, mode="arena", stages=stages)
                    t = t[inv]
                else:
                    if sort:
                        perm, inv = _sort_perm(d, m, block=2048)
                        o, d, m = o[perm], d[perm], m[perm]
                    t, _ = _traverse(table, o, d, False, m,
                                     None, False, block=2048, mode="arena",
                                     stages=stages)
                    if sort:
                        t = t[inv]
                return c + jnp.sum(t.clip(0, 1e6)) * 1e-9

            def anyhit(c, i, stages=stages, sort=sort):
                o, d, m = so + j(i), sh, sl
                if sort == 2:
                    perm, inv = _sort_perm(d, m, block=2048)
                    packed = _pack_rays(o, d, m, None, o.shape[0])
                    occ = _traverse_packed(
                        table, packed[perm], o.shape[0], True, False,
                        block=2048, mode="arena", stages=stages)
                    occ = occ[inv]
                else:
                    if sort:
                        perm, inv = _sort_perm(d, m, block=2048)
                        o, d, m = o[perm], d[perm], m[perm]
                    occ = _traverse(table, o, d, True, m,
                                    None, False, block=2048, mode="arena",
                                    stages=stages)
                    if sort:
                        occ = occ[inv]
                return c + jnp.sum(occ.astype(jnp.float32)) * 1e-9

            tc = scan_time(closest)
            ta = scan_time(anyhit)
            log(f"sort={int(sort)} stages={stages}  "
                f"closest {tc*1e3:8.2f} ms   anyhit {ta*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
