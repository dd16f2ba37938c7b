"""Scaling-efficiency benchmark: rays/s over mesh sizes (BASELINE.md).

Shards the film's pixel rows over jax.sharding meshes of 1, 2, 4, ... N
devices (N = all available) and reports rays/s and efficiency vs linear
scaling from the 1-device run.  On a multi-chip TPU slice this measures real
ICI scaling; on a single-chip or CPU host it validates the sharded program
end-to-end on a virtual device mesh (XLA_FLAGS=
--xla_force_host_platform_device_count=8 JAX_PLATFORMS='' python
bench_scaling.py for the 8-way virtual mesh).

Prints one JSON line per mesh size plus a summary line with the largest
mesh's efficiency.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from bench import build_bench_scene
    from mc_path_tracer_tpu.models.camera import PerspectiveCamera
    from mc_path_tracer_tpu.models.integrator import RenderConfig
    from mc_path_tracer_tpu.parallel.mesh import TILE_AXIS
    from mc_path_tracer_tpu.parallel.render import render_sharded

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    devices = jax.devices()
    n_dev = len(devices)
    on_cpu = devices[0].platform == "cpu"
    # one PIXEL_CHUNK of rays: a single block dispatch, SPMD over the mesh
    width, height = 512, 128
    depth, spp = (3, 1) if on_cpu else (5, 2)
    cfg = RenderConfig(spp=spp, max_depth=depth)
    rays_per_sample = 1 + (depth - 2) + 2 * (depth - 1)

    scene = build_bench_scene()
    scene_data = scene.build()
    cam = dataclasses.replace(
        PerspectiveCamera(
            position=np.array([0.3, 4.0, 9.0]),
            target=np.array([0.0, 0.5, 0.0]), fov_deg=45.0,
        ),
        aspect=width / height,
    ).params()
    key = jax.random.PRNGKey(0)
    total_rays = width * height * spp * rays_per_sample

    sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= n_dev]
    base_rate = None
    results = []
    for s in sizes:
        mesh = Mesh(np.asarray(devices[:s]), (TILE_AXIS,))
        out = render_sharded(scene_data, cam, width, height, cfg, key, mesh)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = render_sharded(
            scene_data, cam, width, height, cfg,
            jax.random.fold_in(key, 1), mesh,
        )
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        rate = total_rays / dt / 1e6
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * s)
        results.append((s, rate, eff))
        log(f"mesh={s}: {dt*1e3:.0f} ms, {rate:.2f} Mrays/s, "
            f"efficiency {eff*100:.0f}%")

    s, rate, eff = results[-1]
    # a virtual (forced host-platform) mesh shares physical cores, so its
    # efficiency number only validates the sharded program, not throughput
    tag = " (virtual mesh: topology validation only)" if on_cpu else ""
    print(
        json.dumps(
            {
                "metric": f"rays/s scaling efficiency @{s} devices{tag}",
                "value": round(eff, 3),
                "unit": "fraction of linear",
                "vs_baseline": round(eff / 0.85, 3),
                "per_mesh": [
                    {"devices": s_, "mrays_s": round(r_, 2)}
                    for s_, r_, _ in results
                ],
            }
        )
    )


if __name__ == "__main__":
    main()
