"""Run the full-size verification rungs end-to-end on the chip and record
RESULTS_r04.md + PNG/npy artifacts (VERDICT r2 #5: config3 and config5 had
never been executed at full size).

  config3: Suzanne.glb under HDR_029_Sky_Cloudy_Env.hdr (importance-sampled
           env), 512x512 — the reference's env-IS showcase.
  config5: the full show-off scene at 1920x1080, 250 spp, depth 5 — the
           reference README's render setting (wavefront_kernels.cu:124,
           142-148).

Usage: python tools/run_results.py [--quick]   (--quick cuts spp for smoke)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

OUT_DIR = "/root/repo/results"


def render_rung(name, scene, cam, cfg, size, log):
    import jax

    from mc_path_tracer_tpu.models.integrator import render
    from mc_path_tracer_tpu.ops import tonemap
    from mc_path_tracer_tpu.utils.image import write_png

    w, h = size
    t0 = time.time()
    film = render(scene, cam, w, h, cfg, key=jax.random.PRNGKey(0))
    mean = jax.block_until_ready(film.radiance_mean())
    dt = time.time() - t0
    arr = np.asarray(mean)
    img = np.asarray(tonemap.quantize(tonemap.reinhard(
        film.ld, film.samples, 1.0)))
    os.makedirs(OUT_DIR, exist_ok=True)
    np.save(os.path.join(OUT_DIR, f"{name}.npy"), arr.astype(np.float16))
    write_png(os.path.join(OUT_DIR, f"{name}.png"), img)
    stats = {
        "name": name, "size": [w, h], "spp": cfg.spp, "depth": cfg.max_depth,
        "wall_s": round(dt, 1),
        "mean": round(float(arr.mean()), 5),
        "max": round(float(arr.max()), 3),
        "nonzero_frac": round(float((arr.sum(-1) > 0).mean()), 4),
    }
    log(f"{name}: {stats}")
    return stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--rung", default="both", choices=["3", "5", "both"])
    args = ap.parse_args()

    import jax

    from mc_path_tracer_tpu.utils.compcache import enable_persistent_cache

    enable_persistent_cache()

    from mc_path_tracer_tpu import configs
    from mc_path_tracer_tpu.models.integrator import RenderConfig

    def log(m):
        print(m, flush=True)

    dev = jax.devices()[0]
    log(f"device: {dev}")
    results = []

    if args.rung in ("3", "both"):
        s3, cam3, cfg3, size3 = configs.ALL_CONFIGS[3]()
        spp = 16 if args.quick else cfg3.spp
        cfg3 = RenderConfig(spp=spp, max_depth=cfg3.max_depth)
        results.append(render_rung("config3_suzanne_512", s3, cam3, cfg3,
                                   size3, log))

    if args.rung in ("5", "both"):
        s5, cam5, cfg5, size5 = configs.ALL_CONFIGS[5]()
        spp = 8 if args.quick else cfg5.spp
        cfg5 = RenderConfig(spp=spp, max_depth=cfg5.max_depth)
        results.append(render_rung("config5_showoff_1080p", s5, cam5, cfg5,
                                   size5, log))

    with open("/root/repo/RESULTS_r04.md", "w") as f:
        f.write("# RESULTS r04 — full-size verification rungs "
                f"({dev.platform}: {dev})\n\n")
        f.write("Full-size rungs rendered end-to-end on the chip (VERDICT r3 "
                "missing #2/#3: artifacts now committed).  Artifacts: results/<name>.png "
                "(Reinhard-tonemapped) + results/<name>.npy (linear mean "
                "radiance, f16).\n\n")
        f.write("| rung | size | spp | depth | wall s | mean | max | "
                "nonzero |\n|---|---|---|---|---|---|---|---|\n")
        for r in results:
            f.write(f"| {r['name']} | {r['size'][0]}x{r['size'][1]} | "
                    f"{r['spp']} | {r['depth']} | {r['wall_s']} | "
                    f"{r['mean']} | {r['max']} | {r['nonzero_frac']} |\n")
        f.write("\n" + json.dumps(results) + "\n")
    log("wrote RESULTS_r04.md")


if __name__ == "__main__":
    main()
