"""Interactive-rate ledger (VERDICT r4 #8): the reference's defining
property is interactivity — one wavefront bounce of one 256x256 tile per UI
frame (PathTracer.cpp:112-131, Film.cu:94-103).  This measures our
equivalents on the chip and prints the RESULTS_r05 table rows:

  - PT progressive step: one 256x256-tile 1-spp full-depth pass
    (RenderSession.step granularity) — steps/s steady-state.
  - Preview mode: rasterizer-equivalent IBL preview of a 256x256 view and
    of the full 1080p frame — frames/s.

Steady-state = min of reps after a warmup (compile excluded); the tunnel
adds +-10% (CLAUDE.md), quoted alongside.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def timed(fn, reps=8, warmup=2):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts), float(np.median(ts))


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from mc_path_tracer_tpu.utils.compcache import enable_persistent_cache

    enable_persistent_cache()

    from bench import build_bench_scene
    from mc_path_tracer_tpu.models.camera import PerspectiveCamera
    from mc_path_tracer_tpu.models.integrator import (
        RenderConfig,
        _tile_pass,
    )
    from mc_path_tracer_tpu.models.preview import render_preview

    scene = build_bench_scene()
    sd = scene.build()
    width, height = 1920, 1080
    cam = dataclasses.replace(
        PerspectiveCamera(position=np.array([0.3, 4.0, 9.0]),
                          target=np.array([0.0, 0.5, 0.0]), fov_deg=45.0),
        aspect=width / height,
    ).params()
    cfg = RenderConfig(spp=250, max_depth=5)
    key = jax.random.PRNGKey(0)

    # one RenderSession.step(): a 256x256 tile x 1 spp x depth 5 (a mid-
    # frame geometry tile, not a cheap sky tile)
    x0, y0 = 768, 512
    t_min, t_med = timed(lambda: _tile_pass(
        sd, cam, x0, y0, key, 256, 256, width, height, cfg, 1))
    print(f"PT progressive step (256x256 tile, 1 spp, depth 5): "
          f"{t_min*1e3:.0f} ms  ->  {1.0/t_min:.1f} steps/s "
          f"(median {t_med*1e3:.0f} ms)")
    n_tiles = ((width + 255) // 256) * ((height + 255) // 256)
    print(f"  full-frame 1-spp sweep = {n_tiles} tiles: "
          f"{n_tiles*t_min:.1f} s/pass")

    # preview mode (the reference's OpenGL rasterizer role): 256x256 editor
    # viewport and the full 1080p frame
    t_min, t_med = timed(lambda: render_preview(sd, cam, 256, 256).ld)
    print(f"preview 256x256: {t_min*1e3:.1f} ms -> {1.0/t_min:.1f} fps "
          f"(median {t_med*1e3:.1f} ms)")
    t_min, t_med = timed(lambda: render_preview(sd, cam, 1920, 1080).ld,
                         reps=5)
    print(f"preview 1920x1080: {t_min*1e3:.1f} ms -> {1.0/t_min:.1f} fps "
          f"(median {t_med*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
