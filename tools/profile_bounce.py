"""Validate the incoherent-ray hypothesis from PROFILE_r03 and prototype
direction-octant sorting.

Times closest-hit/any-hit dispatches with (a) coherent primary rays,
(b) diffuse-bounce rays from real hit points (scattered directions),
(c) the same rays pre-sorted by direction octant, (d) dead-lane-compacted
variants.  All scan-amortized (the axon tunnel costs ~25 ms per dispatch).
"""

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
        _occluded,
    )
    from mc_path_tracer_tpu.ops import rng as rng_mod
    from mc_path_tracer_tpu.ops.math import build_onb

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
    # mid-frame window: the first 64k pixels in tile order are pure sky
    # (zero live lanes after the primary hit — round-3 finding); take a
    # window centred on the geometry rows instead
    mid = pxi.shape[0] // 2
    px = jnp.asarray(pxi[mid:mid + R].astype(np.float32))
    py = jnp.asarray(pyi[mid:mid + R].astype(np.float32))
    pid = (py * width + px).astype(jnp.int32)
    key = jax.random.PRNGKey(0)
    ro, rd = camera_mod.gen_camera_rays(cam, width, height, px, py,
                                        jnp.zeros((R, 2), jnp.float32))
    log("scene built; compiling primary intersect...")
    hit = jax.jit(lambda o, d: _intersect(sd, cfg, o, d))(ro, rd)
    hit = jax.block_until_ready(hit)

    # diffuse bounce rays from the primary hits (uniform hemisphere)
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
    frac = float(jnp.mean(live.astype(jnp.float32)))
    log(f"live fraction after primary: {frac:.3f}")

    SCAN_N = 12
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

    log("timing closest coherent primary...")
    t = scan_time(lambda c, i: c + jnp.sum(
        _intersect(sd, cfg, ro + j(i), rd).t.clip(0, 1e6)) * 1e-9)
    log(f"closest coherent primary      {t*1e3:8.2f} ms")

    t = scan_time(lambda c, i: c + jnp.sum(
        _intersect(sd, cfg, bo + j(i), bd, mask=live).t.clip(0, 1e6)) * 1e-9)
    log(f"closest bounce unsorted       {t*1e3:8.2f} ms")

    # octant + tile sort: key = octant(3b) | pallas-block survives origin
    # tiling implicitly (rays already in 32x16 tile order)
    oct_key = ((bd[:, 0] > 0).astype(jnp.int32) * 4
               + (bd[:, 1] > 0).astype(jnp.int32) * 2
               + (bd[:, 2] > 0).astype(jnp.int32))
    sort_key = jnp.where(live, oct_key, 8)  # dead lanes last

    def sorted_intersect(c, i):
        perm = jnp.argsort(sort_key)
        t = _intersect(sd, cfg, bo[perm] + j(i), bd[perm],
                       mask=live[perm]).t
        inv = jnp.argsort(perm)
        return c + jnp.sum(t[inv].clip(0, 1e6)) * 1e-9

    t = scan_time(sorted_intersect)
    log(f"closest bounce octant-sorted  {t*1e3:8.2f} ms")

    # block-of-512 locality sort: key = (octant, block index) — keeps
    # origins tight AND directions aligned within each Pallas block
    blk = jnp.arange(R, dtype=jnp.int32) // 512
    key2 = jnp.where(live, blk * 16 + oct_key, 1 << 30)

    def sorted2(c, i):
        perm = jnp.argsort(key2)
        t = _intersect(sd, cfg, bo[perm] + j(i), bd[perm],
                       mask=live[perm]).t
        inv = jnp.argsort(perm)
        return c + jnp.sum(t[inv].clip(0, 1e6)) * 1e-9

    t = scan_time(sorted2)
    log(f"closest bounce blk+oct sorted {t*1e3:8.2f} ms")

    # any-hit with env-style scattered directions (the shadow ray mix)
    sh = jnp.concatenate([bd, -bd], axis=0)
    so = jnp.concatenate([bo, bo], axis=0)
    sl = jnp.concatenate([live, live], axis=0)
    t = scan_time(lambda c, i: c + jnp.sum(
        _occluded(sd, cfg, so + j(i), sh, mask=sl).astype(jnp.float32))
        * 1e-9)
    log(f"anyhit scattered [128k]       {t*1e3:8.2f} ms")

    okey = ((sh[:, 0] > 0).astype(jnp.int32) * 4
            + (sh[:, 1] > 0).astype(jnp.int32) * 2
            + (sh[:, 2] > 0).astype(jnp.int32))
    blk2 = jnp.arange(2 * R, dtype=jnp.int32) // 512
    skey2 = jnp.where(sl, blk2 * 16 + okey, 1 << 30)

    def sorted_occ(c, i):
        perm = jnp.argsort(skey2)
        o = _occluded(sd, cfg, so[perm] + j(i), sh[perm], mask=sl[perm])
        inv = jnp.argsort(perm)
        return c + jnp.sum(o[inv].astype(jnp.float32)) * 1e-9

    t = scan_time(sorted_occ)
    log(f"anyhit blk+oct sorted [128k]  {t*1e3:8.2f} ms")

    # pure argsort+gather+scatter cost at this width
    t = scan_time(lambda c, i: c + jnp.sum(
        bo[jnp.argsort(key2 + i)] * 1e-9))
    log(f"argsort+gather only [64k]     {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
