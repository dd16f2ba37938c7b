"""r4 component profile: decompose one mid-frame bounce at REAL occupancy,
coherence, and mask state (bounce-2 of block 16), scan-amortized.

The depth-marginal measurement (tools/../prof_depth) puts bounce 2 at
~62 ms/spp; this splits that into ext-closest / shadow-anyhit / shading /
env / sort overhead at the exact ray sets the pipeline dispatches."""

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
    from mc_path_tracer_tpu.models import lights as lights_mod
    from mc_path_tracer_tpu.models.integrator import (
        PIXEL_CHUNK, RenderConfig, _intersect, _occluded, SHADOW_OFFSET,
        EXT_OFFSET,
    )
    from mc_path_tracer_tpu.ops import brdf, rng as rng_mod
    import dataclasses

    cfg = RenderConfig()
    scene = build_bench_scene(); sd = scene.build()
    w, h = 1920, 1080
    cam = dataclasses.replace(PerspectiveCamera(position=np.array([0.3,4.0,9.0]),
        target=np.array([0.0,0.5,0.0]), fov_deg=45.0), aspect=w/h).params()
    pxi, pyi = tile_order(w, h)
    B = PIXEL_CHUNK
    px = jnp.asarray(pxi[16*B:17*B].astype(np.float32))
    py = jnp.asarray(pyi[16*B:17*B].astype(np.float32))
    pid = (py * w + px).astype(jnp.int32)
    key = jax.random.PRNGKey(0)
    lights = lights_mod.with_packed(sd.lights)
    n_lights = lights_mod.num_lights(lights)

    # ---- build REAL bounce-2 state: primary hit -> bounce1 continuation ----
    @jax.jit
    def to_bounce2(px, py):
        ro, rd = camera_mod.gen_camera_rays(cam, w, h, px, py,
                                            jnp.zeros((B, 2), jnp.float32))
        i0 = _intersect(sd, cfg, ro, rd)           # primary
        alive = i0.hit
        wo = -rd
        u = rng_mod.pixel_uniforms(jax.random.fold_in(key, 1), pid, 10)
        mat = sd.materials.gather(i0.material_id, i0.uv, sd.atlas)
        n = i0.normal
        ws = brdf.mixture_sample_wi(mat, n, wo, u[:, 6], u[:, 7:9])
        isect = _intersect(sd, cfg, i0.position + n * EXT_OFFSET, ws, mask=alive)
        return isect.position, isect.normal, isect.material_id, isect.uv, \
            -ws, alive & isect.hit
    pos, n, mid_, uv, wo, alive = jax.block_until_ready(to_bounce2(px, py))
    live = float(jnp.mean(alive.astype(jnp.float32)))
    print(f"bounce-2 live fraction: {live:.3f}", flush=True)

    u = rng_mod.pixel_uniforms(jax.random.fold_in(key, 2), pid, 10)
    mat = sd.materials.gather(mid_, uv, sd.atlas)
    l_id = jnp.minimum((u[:, 0] * n_lights).astype(jnp.int32), n_lights - 1)
    wl = lights_mod.sample_dir(lights, l_id, u[:, 1:3])
    ws = brdf.mixture_sample_wi(mat, n, wo, u[:, 6], u[:, 7:9])
    shadow_o = pos + n * SHADOW_OFFSET
    ext_o = pos + n * EXT_OFFSET
    wl, ws, shadow_o, ext_o = jax.block_until_ready((wl, ws, shadow_o, ext_o))

    SCAN_N = 10
    f_null = jax.jit(lambda x: x + 1.0)
    def timeit(fn, *a):
        jax.block_until_ready(fn(*a))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter(); jax.block_until_ready(fn(*a))
            ts.append(time.perf_counter() - t0)
        return min(ts)
    t_disp = timeit(f_null, jnp.zeros((8, 128), jnp.float32))
    print(f"dispatch floor {t_disp*1e3:.1f} ms", flush=True)
    def scan_time(step):
        f = jax.jit(lambda c0: jax.lax.scan(
            lambda c, i: (step(c, i), None), c0,
            jnp.arange(SCAN_N, dtype=jnp.int32))[0])
        return max(timeit(f, jnp.float32(0)) - t_disp, 0.0) / SCAN_N
    j = lambda i: i.astype(jnp.float32) * 1e-6

    t = scan_time(lambda c, i: c + jnp.sum(
        _intersect(sd, cfg, ext_o + j(i), ws, mask=alive).t.clip(0, 1e6)) * 1e-9)
    print(f"ext closest [64k, sorted, live {live:.2f}]: {t*1e3:8.2f} ms", flush=True)

    t = scan_time(lambda c, i: c + jnp.sum(
        _occluded(sd, cfg, shadow_o + j(i), wl, mask=alive)
        .astype(jnp.float32)) * 1e-9)
    print(f"shadow anyhit [64k, live {live:.2f}]:      {t*1e3:8.2f} ms", flush=True)

    def shading(c, i):
        matv = sd.materials.gather(mid_, uv + j(i), sd.atlas)
        nn = sd.materials.perturb_normal(mid_, uv, sd.atlas, n,
                                         jnp.zeros_like(n), jnp.zeros_like(n))
        f_l = brdf.mixture_f(matv, nn, wl, wo)
        p_l = brdf.mixture_pdf(matv, nn, wl, wo)
        wss = brdf.mixture_sample_wi(matv, nn, wo, u[:, 6], u[:, 7:9])
        f_s = brdf.mixture_f(matv, nn, wss, wo)
        p_s = brdf.mixture_pdf(matv, nn, wss, wo)
        return c + jnp.sum(f_l + f_s) * 1e-9 + jnp.sum(p_l + p_s) * 1e-9
    t = scan_time(shading)
    print(f"brdf shading (2f+2pdf+sample):      {t*1e3:8.2f} ms", flush=True)

    def light_env(c, i):
        li = lights_mod.radiance(lights, l_id, wl + j(i))
        pl_ = lights_mod.pdf(lights, l_id, wl)
        li2 = lights_mod.radiance(lights, l_id, ws)
        pl2 = lights_mod.pdf(lights, l_id, ws)
        return c + jnp.sum(li + li2) * 1e-9 + jnp.sum(pl_ + pl2) * 1e-9
    t = scan_time(light_env)
    print(f"light/env radiance+pdf (x2 dirs):   {t*1e3:8.2f} ms", flush=True)

    t = scan_time(lambda c, i: c + jnp.sum(
        rng_mod.pixel_uniforms(jax.random.fold_in(key, 3), pid, 10) + j(i)) * 1e-9)
    print(f"rng 10 uniforms:                    {t*1e3:8.2f} ms", flush=True)

    from mc_path_tracer_tpu.ops.pallas.traversal_kernel import _sort_perm
    def sortov(c, i):
        perm, inv = _sort_perm(ws + j(i)[..., None] * 0, alive, block=1024)
        return c + jnp.sum(perm[inv].astype(jnp.float32)) * 1e-9
    t = scan_time(sortov)
    print(f"argsort+inv overhead:               {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
