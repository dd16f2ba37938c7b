"""The 250-spp shipped-asset ground truth (VERDICT r4 #6): the reference's
README renders are 250 spp / depth 5 (wavefront_kernels.cu:124,142-148) of a
dragon scene whose .glb is not in the checkout; the closest achievable
analogue with shipped assets is Suzanne.glb + night_free_Env.hdr — the same
scene family as the committed MIS figures (tools/run_mis_figures.py), now at
the reference's full quality setting.

Writes results/suzanne_night_250spp.{png,npy} and appends RESULTS_r05.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

OUT = "/root/repo/results"
REF_MODELS = "/root/reference/models"
REF_HDRI = "/root/reference/hrdi"


def main():
    import jax

    from mc_path_tracer_tpu.utils.compcache import enable_persistent_cache

    enable_persistent_cache()

    from mc_path_tracer_tpu.models.camera import PerspectiveCamera
    from mc_path_tracer_tpu.models.integrator import RenderConfig, render
    from mc_path_tracer_tpu.models.scene import Scene
    from mc_path_tracer_tpu.models.primitives import plane
    from mc_path_tracer_tpu.ops import tonemap
    from mc_path_tracer_tpu.utils.image import load_hdr, write_png

    s = Scene()
    s.load(os.path.join(REF_MODELS, "Suzanne.glb"))
    for i in range(len(s.material_albedo)):
        s.material_albedo[i] = np.asarray([0.9, 0.05, 0.05], np.float32)
        s.material_roughness[i] = 0.35
        s.material_metallic[i] = 0.0
    floor = s.add_material(albedo=(0.6, 0.6, 0.75), roughness=0.25,
                           metallic=0.9)
    p, n, uv, idx = plane(30.0)
    p = p + np.asarray([0.0, -1.0, 0.0], np.float32)
    s.add_mesh(p, idx, normals=n, uvs=uv, material_id=floor)
    env = load_hdr(os.path.join(REF_HDRI, "night_free_Env.hdr"))
    s.set_environment_hdr(env * 8.0)

    cam = PerspectiveCamera(position=np.array([0.0, 0.6, 3.4]),
                            target=np.array([0.0, 0.1, 0.0]), fov_deg=45.0)
    w, h = 512, 288
    cfg = RenderConfig(spp=250, max_depth=5)
    t0 = time.time()
    film = render(s, cam, w, h, cfg, key=jax.random.PRNGKey(0))
    mean = np.asarray(jax.block_until_ready(film.radiance_mean()))
    dt = time.time() - t0
    img = np.asarray(tonemap.quantize(tonemap.reinhard(
        film.ld, film.samples, 3.0)))
    os.makedirs(OUT, exist_ok=True)
    np.save(os.path.join(OUT, "suzanne_night_250spp.npy"),
            mean.astype(np.float16))
    write_png(os.path.join(OUT, "suzanne_night_250spp.png"), img)
    rec = {"name": "suzanne_night_250spp", "size": [w, h], "spp": 250,
           "depth": 5, "wall_s": round(dt, 1),
           "mean": round(float(mean.mean()), 5),
           "max": round(float(mean.max()), 3),
           "nonzero_frac": round(float((mean.sum(-1) > 0).mean()), 4)}
    print(json.dumps(rec), flush=True)
    with open("/root/repo/RESULTS_r05.md", "a") as f:
        f.write("\n## 250-spp shipped-asset ground truth (VERDICT r4 #6)\n\n"
                "Suzanne.glb + night_free_Env.hdr at the reference README's "
                "quality setting (250 spp, depth 5) — the closest achievable "
                "analogue of images/ground_t.png with assets the reference "
                "actually ships.  Artifact: results/suzanne_night_250spp."
                "png/.npy.\n\n")
        f.write("| render | size | spp | depth | wall s | mean | max |\n"
                "|---|---|---|---|---|---|---|\n")
        f.write(f"| {rec['name']} | {w}x{h} | 250 | 5 | {rec['wall_s']} | "
                f"{rec['mean']} | {rec['max']} |\n")


if __name__ == "__main__":
    main()
