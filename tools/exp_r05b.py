"""r5 follow-up experiments, scan-amortized on the chip:

  1. dispatch batching: time the SAME 128k-pixel x 4spp workload as
     2k-chunk dispatches inside one lax.map'd call vs two 64k dispatches
     (host RTT is ~25 ms/dispatch through the tunnel; 32 block calls per
     frame cost ~0.8 s of the 12 s frame).
  2. sort granularity: closest/any-hit with the block-local secondary
     sort at 128 vs 512 direction bins (tighter subgroup cones -> fewer
     arena visits?).
"""

import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np


def main():
    import jax, jax.numpy as jnp
    from mc_path_tracer_tpu.utils.compcache import enable_persistent_cache
    enable_persistent_cache()
    from bench import build_bench_scene
    from mc_path_tracer_tpu.models import camera as camera_mod
    from mc_path_tracer_tpu.models.camera import PerspectiveCamera
    from mc_path_tracer_tpu.models.film import tile_order
    from mc_path_tracer_tpu.models.integrator import (
        PIXEL_CHUNK, RenderConfig, _render_block, _intersect,
    )
    from mc_path_tracer_tpu.ops import rng as rng_mod
    from mc_path_tracer_tpu.ops.math import build_onb
    from mc_path_tracer_tpu.ops.pallas import traversal_kernel as tk
    import dataclasses

    def log(m):
        print(m, flush=True)

    scene = build_bench_scene(); sd = scene.build()
    width, height = 1920, 1080
    cam = dataclasses.replace(
        PerspectiveCamera(position=np.array([0.3, 4.0, 9.0]),
                          target=np.array([0.0, 0.5, 0.0]), fov_deg=45.0),
        aspect=width / height,
    ).params()
    cfg = RenderConfig(spp=4, max_depth=5)
    pxi, pyi = tile_order(width, height)
    mid = (pxi.shape[0] // (2 * PIXEL_CHUNK)) * PIXEL_CHUNK
    key = jax.random.PRNGKey(0)

    def timeit(fn, reps=3, warmup=1):
        for _ in range(warmup):
            jax.block_until_ready(fn())
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            ts.append(time.perf_counter() - t0)
        return min(ts)

    # ---- experiment 1: one 128k call vs two 64k calls ----
    px2 = jnp.asarray(pxi[mid:mid + 2 * PIXEL_CHUNK].astype(np.float32))
    py2 = jnp.asarray(pyi[mid:mid + 2 * PIXEL_CHUNK].astype(np.float32))

    def two64():
        a = _render_block(sd, cam, px2[:PIXEL_CHUNK], py2[:PIXEL_CHUNK],
                          key, cfg, width, height, 4)
        b = _render_block(sd, cam, px2[PIXEL_CHUNK:], py2[PIXEL_CHUNK:],
                          key, cfg, width, height, 4)
        return a, b

    def one128():
        return _render_block(sd, cam, px2, py2, key, cfg, width, height, 4)

    t2 = timeit(two64)
    t1 = timeit(one128)
    log(f"two 64k dispatches: {t2*1e3:7.1f} ms | one 128k dispatch: "
        f"{t1*1e3:7.1f} ms  ({(t2-t1)*1e3:+.1f} ms saved/128k px)")

    # ---- experiment 2: sort bins 128 vs 512 ----
    R = PIXEL_CHUNK
    px = jnp.asarray(pxi[mid:mid + R].astype(np.float32))
    py = jnp.asarray(pyi[mid:mid + R].astype(np.float32))
    pid = (py * width + px).astype(jnp.int32)
    ro, rd = camera_mod.gen_camera_rays(cam, width, height, px, py,
                                        jnp.zeros((R, 2), jnp.float32))
    hit = jax.jit(lambda o, d: _intersect(sd, RenderConfig(sort_rays=False),
                                          o, d))(ro, rd)
    u = rng_mod.pixel_uniforms(key, pid, 2)
    st = jnp.sqrt(jnp.maximum(1.0 - u[:, 0] ** 2, 0.0))
    phi = 2.0 * jnp.pi * u[:, 1]
    tv, bv = build_onb(hit.normal)
    bd = (st[:, None] * jnp.cos(phi)[:, None] * tv
          + st[:, None] * jnp.sin(phi)[:, None] * bv
          + u[:, 0:1] * hit.normal)
    bo = hit.position + hit.normal * 0.001
    live = hit.hit
    SCAN_N = 50

    def scan_time(step):
        f = jax.jit(lambda c0: jax.lax.scan(
            lambda c, i: (step(c, i), None), c0,
            jnp.arange(SCAN_N, dtype=jnp.int32))[0])
        return timeit(lambda: f(jnp.float32(0))) / SCAN_N

    def jt(i):
        return i.astype(jnp.float32) * 1e-5

    def fine_sort(d, m, nuv):
        octant = ((d[:, 0] > 0).astype(jnp.int32) * 4
                  + (d[:, 1] > 0).astype(jnp.int32) * 2
                  + (d[:, 2] > 0).astype(jnp.int32))
        keyb = jnp.where(m, octant, 8)
        perm = jnp.argsort(keyb, stable=True)
        dp = d[perm]
        a = jnp.abs(dp)
        s = jnp.maximum(a.sum(axis=1), 1e-20)
        uq = jnp.clip((nuv * a[:, 0] / s).astype(jnp.int32), 0, nuv - 1)
        vq = jnp.clip((nuv * a[:, 1] / s).astype(jnp.int32), 0, nuv - 1)
        oct2 = ((dp[:, 0] > 0).astype(jnp.int32) * 4
                + (dp[:, 1] > 0).astype(jnp.int32) * 2
                + (dp[:, 2] > 0).astype(jnp.int32))
        fbins = oct2 * nuv * nuv + uq * nuv + vq
        blk = jnp.arange(perm.shape[0], dtype=jnp.int32) // 2048
        perm2 = jnp.argsort(blk * (8 * nuv * nuv + 1) + fbins, stable=True)
        perm = perm[perm2]
        inv = jnp.zeros_like(perm).at[perm].set(
            jnp.arange(perm.shape[0], dtype=perm.dtype))
        return perm, inv

    for nuv in (4, 8, 16):
        def closest(c, i, nuv=nuv):
            o, d, m = bo + jt(i), bd, live
            perm, inv = fine_sort(d, m, nuv)
            t, _ = tk._traverse(sd.leaf, o[perm], d[perm], False,
                                m[perm], None, False)
            return c + jnp.sum(t[inv].clip(0, 1e6)) * 1e-9

        t = scan_time(closest)
        log(f"closest sort-bins 8x{nuv}x{nuv}: {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
