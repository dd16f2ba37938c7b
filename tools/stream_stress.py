"""Stress the HBM-streaming traversal on the chip with full-size dispatches
and compare against the resident kernel — fast repro harness for the
config5 worker crash (round 3)."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mc_path_tracer_tpu.utils.compcache import enable_persistent_cache

    enable_persistent_cache()

    from bench import build_bench_scene
    from mc_path_tracer_tpu.models import camera as camera_mod
    from mc_path_tracer_tpu.models.camera import PerspectiveCamera
    from mc_path_tracer_tpu.models.film import tile_order
    from mc_path_tracer_tpu.models.integrator import PIXEL_CHUNK, RenderConfig, _intersect
    from mc_path_tracer_tpu.ops.pallas.traversal_kernel import _sort_perm, _traverse

    def log(m):
        print(m, flush=True)

    import dataclasses

    scene = build_bench_scene()
    sd = scene.build()
    log(f"leaves={sd.leaf.num_leaves}")
    width, height = 1920, 1080
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
    ro, rd = camera_mod.gen_camera_rays(cam, width, height, px, py,
                                        jnp.zeros((R, 2), jnp.float32))
    log("primary (resident)...")
    hit = jax.jit(lambda o, d: _intersect(
        sd, RenderConfig(sort_rays=False), o, d))(ro, rd)
    hit = jax.block_until_ready(hit)
    bd = -rd
    bo = hit.position + hit.normal * 0.001
    live = hit.hit

    for name, anyh in (("closest", False), ("anyhit", True)):
        for stream in (False, True):
            f = jax.jit(lambda o, d, m, s=stream, a=anyh: _traverse(
                sd.leaf, o, d, a, m, None, False, stream=s))
            t0 = time.time()
            out = jax.block_until_ready(f(bo, bd, live))
            log(f"{name} stream={stream}: first call ok "
                f"({time.time()-t0:.1f}s)")
            t0 = time.time()
            out2 = jax.block_until_ready(f(bo + 1e-5, bd, live))
            log(f"{name} stream={stream}: {time.time()-t0:.3f}s steady")
            if stream:
                if anyh:
                    agree = float(np.mean(
                        np.asarray(out2) == np.asarray(prev)))
                else:
                    agree = float(np.mean(
                        np.asarray(out2[1]) == np.asarray(prev[1])))
                log(f"{name}: stream vs resident agreement {agree:.6f}")
            prev = out2
    log("ALL OK")


if __name__ == "__main__":
    main()
