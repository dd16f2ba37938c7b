"""On-chip correctness gate: compiled-TPU traversal + render vs oracles.

Round-2 shipped a silent bf16 meta corruption that made every TPU render
return garbage hits while the (CPU/interpret-mode) test suite stayed green
(VERDICT r2, weak #4).  This gate runs ON THE REAL CHIP and leaves an
artifact (TESTS_TPU_r05.json) asserting:

  1. Pallas leaf-table closest-hit agrees with intersect_brute on the bench
     scene for coherent primary AND scattered bounce rays (>= 99.9% tri-id
     agreement; t allclose on agreeing lanes).  Edge-of-triangle lanes can
     legitimately flip: the kernel decides hits in MXU HIGHEST-precision
     arithmetic vs the oracle's exact f32 VPU math (ADVICE r2 low #3), so
     disagreeing lanes are additionally accepted when both sides' t values
     coincide or the winning triangles are distinct but equidistant.
  2. Pallas any-hit (fused shadow dispatch) agrees with occluded_brute.
  3. The XLA wide-table traversal agrees with brute on the same rays.
  4. The dense Pallas intersector (small-scene route) agrees on config1.
  5. A small compiled-TPU render of config1 matches the committed CPU
     golden (tests/golden/config1.npy) within MC-float tolerance.
  6. A synthetic ~500k-triangle scene (beyond the VMEM-resident leaf-table
     budget) traverses on-chip via the HBM-streaming Pallas kernel and
     agrees with the XLA wide-table traversal (itself brute-oracle-tested
     in 1-3) on closest and any-hit.
  7. (r5) config3 at 64x64 and config5 at 96x54 match their committed CPU
     goldens on chip — resident env-CDF path and LBVH + streaming path.
  8. (r5) render_sharded on a 1-device TPU mesh with accel="pallas" matches
     the unsharded render (shard_map x Pallas composition smoke).

Run: python tests_tpu.py          (exits non-zero on failure)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

ARTIFACT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "TESTS_TPU_r05.json")


def brute_chunked(tris, ro, rd, chunk=512):
    """intersect_brute in ray chunks (bounds the [R, T] intermediates)."""
    import jax
    import jax.numpy as jnp

    from mc_path_tracer_tpu.ops.intersect import intersect_brute

    f = jax.jit(lambda o, d: intersect_brute(tris, o, d))
    outs = []
    for c in range(0, ro.shape[0], chunk):
        outs.append(jax.tree.map(
            np.asarray, f(ro[c:c + chunk], rd[c:c + chunk])))
    return jax.tree.map(lambda *xs: np.concatenate(xs), *outs)


def occluded_brute_chunked(tris, ro, rd, t_max=None, chunk=512):
    import jax

    from mc_path_tracer_tpu.ops.intersect import occluded_brute

    f = jax.jit(lambda o, d, tm: occluded_brute(tris, o, d, t_max=tm))
    outs = []
    for c in range(0, ro.shape[0], chunk):
        tm = None if t_max is None else t_max[c:c + chunk]
        outs.append(np.asarray(f(ro[c:c + chunk], rd[c:c + chunk], tm)))
    return np.concatenate(outs)


def closest_agreement(name, got_t, got_id, want_t, want_id, results,
                      need=0.999):
    """tri-id agreement with an equidistant-winner escape hatch."""
    got_hit = got_id >= 0
    want_hit = want_id >= 0
    same_id = got_id == want_id
    # distinct triangles at (float-)equal distance are both correct winners;
    # edge lanes where HIGHEST-precision MXU acceptance differs show up as
    # hit-flips whose t values differ — count them against the budget.
    both = got_hit & want_hit
    t_match = both & np.isclose(got_t, want_t, rtol=1e-3, atol=1e-4)
    agree = same_id | t_match
    frac = float(np.mean(agree))
    t_ok = bool(
        np.allclose(got_t[same_id & both], want_t[same_id & both],
                    rtol=1e-3, atol=1e-4)
    )
    ok = frac >= need and t_ok
    results[name] = {
        "agreement": round(frac, 6), "t_allclose": t_ok,
        "n_rays": int(got_id.shape[0]), "pass": ok,
    }
    print(f"{name}: agreement={frac:.5f} t_allclose={t_ok} -> "
          f"{'PASS' if ok else 'FAIL'}")
    return ok


def main():
    import jax
    import jax.numpy as jnp

    from mc_path_tracer_tpu.utils.compcache import enable_persistent_cache

    enable_persistent_cache()

    dev = jax.devices()[0]
    on_tpu = "tpu" in dev.platform.lower()
    print(f"device: {dev} ({dev.platform})")

    from bench import build_bench_scene
    from mc_path_tracer_tpu import configs
    from mc_path_tracer_tpu.models import camera as camera_mod
    from mc_path_tracer_tpu.models.camera import PerspectiveCamera
    from mc_path_tracer_tpu.models.film import tile_order
    from mc_path_tracer_tpu.models.integrator import (
        RenderConfig,
        _intersect,
        _occluded,
        render,
    )
    from mc_path_tracer_tpu.ops import rng as rng_mod
    from mc_path_tracer_tpu.ops.math import build_onb

    t0 = time.time()

    def mark(msg):
        print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)

    results = {"device": str(dev), "platform": dev.platform,
               "on_tpu": on_tpu, "checks": {}}
    checks = results["checks"]
    all_ok = True
    t_start = time.time()

    # ---- bench scene rays: 2048 coherent primary + 2048 scattered bounce
    import dataclasses

    scene = build_bench_scene()
    sd = scene.build()
    mark("scene built")
    cam = dataclasses.replace(
        PerspectiveCamera(position=np.array([0.3, 4.0, 9.0]),
                          target=np.array([0.0, 0.5, 0.0]), fov_deg=45.0),
        aspect=1920 / 1080,
    ).params()
    pxi, pyi = tile_order(1920, 1080)
    sel = np.linspace(0, pxi.shape[0] - 1, 2048).astype(np.int64)
    px = jnp.asarray(pxi[sel].astype(np.float32))
    py = jnp.asarray(pyi[sel].astype(np.float32))
    ro, rd = camera_mod.gen_camera_rays(
        cam, 1920, 1080, px, py, jnp.zeros((2048, 2), jnp.float32))

    cfg_p = RenderConfig(accel="pallas")
    hitp = jax.jit(lambda o, d: _intersect(sd, cfg_p, o, d))(ro, rd)
    hitp = jax.tree.map(np.asarray, hitp)
    mark("primary pallas intersect done")

    # scattered bounce rays from the primary hits
    key = jax.random.PRNGKey(7)
    u = jax.random.uniform(key, (2048, 2))
    st = jnp.sqrt(jnp.maximum(1.0 - u[:, 0] ** 2, 0.0))
    phi = 2.0 * jnp.pi * u[:, 1]
    n = jnp.asarray(hitp.normal)
    tv, bv = build_onb(n)
    bd = (st[:, None] * jnp.cos(phi)[:, None] * tv
          + st[:, None] * jnp.sin(phi)[:, None] * bv + u[:, 0:1] * n)
    bo = jnp.asarray(hitp.position) + n * 0.001
    live = jnp.asarray(hitp.hit)
    ro_all = jnp.concatenate([ro, jnp.where(live[:, None], bo, ro)])
    rd_all = jnp.concatenate([rd, jnp.where(live[:, None], bd, rd)])

    mark("bounce rays built")
    want = brute_chunked(sd.tris, ro_all, rd_all)
    mark("brute oracle done")
    want_id = np.where(want.hit, want.tri_id, -1)

    got = jax.tree.map(np.asarray, jax.jit(
        lambda o, d: _intersect(sd, cfg_p, o, d))(ro_all, rd_all))
    got_id = np.where(got.hit, got.tri_id, -1)
    all_ok &= closest_agreement(
        "pallas_closest_bench", got.t, got_id, want.t, want_id, checks)

    cfg_w = RenderConfig(accel="wide")
    goww = jax.tree.map(np.asarray, jax.jit(
        lambda o, d: _intersect(sd, cfg_w, o, d))(ro_all, rd_all))
    gow_id = np.where(goww.hit, goww.tri_id, -1)
    all_ok &= closest_agreement(
        "wide_closest_bench", goww.t, gow_id, want.t, want_id, checks)

    # ---- any-hit: shadow-style rays (up toward lights) + bounce dirs,
    # with and without per-ray t_max
    sh_d = jnp.concatenate([rd_all[:, :], -rd_all], axis=0)
    sh_o = jnp.concatenate(
        [jnp.where(want.hit[:, None],
                   jnp.asarray(want.position) + jnp.asarray(want.normal) * 0.01,
                   ro_all), ro_all])
    t_max = jnp.concatenate([
        jnp.full(2048, 1e32, jnp.float32),
        jax.random.uniform(key, (2048,), minval=0.5, maxval=20.0),
        jnp.full(4096, 1e32, jnp.float32),
    ])
    mark("closest checks done")
    occ_want = occluded_brute_chunked(sd.tris, sh_o, sh_d, t_max=t_max)
    mark("brute anyhit oracle done")
    occ_got = np.asarray(jax.jit(
        lambda o, d, tm: _occluded(sd, cfg_p, o, d, t_max=tm))(
            sh_o, sh_d, t_max))
    frac = float(np.mean(occ_got == occ_want))
    ok = frac >= 0.999
    checks["pallas_anyhit_bench"] = {
        "agreement": round(frac, 6), "n_rays": int(occ_got.shape[0]),
        "pass": ok}
    print(f"pallas_anyhit_bench: agreement={frac:.5f} -> "
          f"{'PASS' if ok else 'FAIL'}")
    all_ok &= ok

    occ_gow = np.asarray(jax.jit(
        lambda o, d, tm: _occluded(sd, cfg_w, o, d, t_max=tm))(
            sh_o, sh_d, t_max))
    frac = float(np.mean(occ_gow == occ_want))
    ok = frac >= 0.999
    checks["wide_anyhit_bench"] = {
        "agreement": round(frac, 6), "n_rays": int(occ_gow.shape[0]),
        "pass": ok}
    print(f"wide_anyhit_bench: agreement={frac:.5f} -> "
          f"{'PASS' if ok else 'FAIL'}")
    all_ok &= ok

    # ---- dense Pallas route on the small config1 scene
    mark("anyhit checks done")
    s1, cam1, _, _ = configs.ALL_CONFIGS[1]()
    sd1 = s1.build()
    cam1 = dataclasses.replace(cam1, aspect=1.0).params()
    ys, xs = np.mgrid[0:64, 0:64]
    p1x = jnp.asarray(xs.reshape(-1).astype(np.float32))
    p1y = jnp.asarray(ys.reshape(-1).astype(np.float32))
    r1o, r1d = camera_mod.gen_camera_rays(
        cam1, 64, 64, p1x, p1y, jnp.zeros((64 * 64, 2), jnp.float32))
    cfg_d = RenderConfig(accel="dense")
    got1 = jax.tree.map(np.asarray, jax.jit(
        lambda o, d: _intersect(sd1, cfg_d, o, d))(r1o, r1d))
    want1 = brute_chunked(sd1.tris, r1o, r1d)
    got1_id = np.where(got1.hit, got1.tri_id, -1)
    want1_id = np.where(want1.hit, want1.tri_id, -1)
    all_ok &= closest_agreement(
        "dense_closest_config1", got1.t, got1_id, want1.t, want1_id, checks)

    # ---- compiled-TPU golden render vs committed CPU golden
    golden_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "tests", "golden", "config1.npy")
    mark("dense check done")
    film = render(s1, cam1, 16, 16, RenderConfig(spp=8, max_depth=2),
                  key=jax.random.PRNGKey(42))
    got_img = np.asarray(film.radiance_mean())
    want_img = np.load(golden_path)
    # identical threefry streams + near-identical float math: the images
    # should agree tightly; lanes that flip an edge hit change their whole
    # sample, so gate on the fraction of deviating pixels + mean error.
    per_px = np.abs(got_img - want_img).max(axis=-1)
    dev_frac = float(np.mean(per_px > 0.01))
    mean_err = float(np.mean(per_px))
    ok = dev_frac <= 0.02 and mean_err < 2e-3
    checks["golden_render_config1"] = {
        "deviating_px_frac": round(dev_frac, 6),
        "mean_abs_err": round(mean_err, 8), "pass": ok}
    print(f"golden_render_config1: dev_frac={dev_frac:.4f} "
          f"mean_err={mean_err:.2e} -> {'PASS' if ok else 'FAIL'}")
    all_ok &= ok

    # ---- second compiled-TPU golden: config2 (area-light MIS path)
    s2, cam2, _, _ = configs.ALL_CONFIGS[2]()
    film2 = render(s2, cam2, 16, 16, RenderConfig(spp=8, max_depth=3),
                   key=jax.random.PRNGKey(42))
    got2 = np.asarray(film2.radiance_mean())
    want2 = np.load(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "tests", "golden", "config2.npy"))
    per_px = np.abs(got2 - want2).max(axis=-1)
    dev_frac = float(np.mean(per_px > 0.01))
    mean_err = float(np.mean(per_px))
    ok = dev_frac <= 0.02 and mean_err < 2e-3
    checks["golden_render_config2"] = {
        "deviating_px_frac": round(dev_frac, 6),
        "mean_abs_err": round(mean_err, 8), "pass": ok}
    print(f"golden_render_config2: dev_frac={dev_frac:.4f} "
          f"mean_err={mean_err:.2e} -> {'PASS' if ok else 'FAIL'}")
    all_ok &= ok

    # ---- config3 + downsampled config5 goldens ON CHIP (VERDICT r4 #7):
    # config3 runs the HDRI env-CDF path on the resident Pallas route;
    # config5's ~100k-tri scene runs LBVH + the HBM-streaming route — the
    # big committed renders now trace to a CPU-verified chain.
    s3, cam3, _, _ = configs.ALL_CONFIGS[3]()
    film3 = render(s3, cam3, 64, 64, RenderConfig(spp=4, max_depth=3),
                   key=jax.random.PRNGKey(42))
    got3 = np.asarray(film3.radiance_mean())
    want3 = np.load(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "tests", "golden", "config3_64.npy"))
    per_px = np.abs(got3 - want3).max(axis=-1)
    rel = per_px / (np.abs(want3).max(axis=-1) + 1e-2)
    dev_frac = float(np.mean(rel > 0.02))
    mean_err = float(np.mean(rel))
    ok = dev_frac <= 0.02 and mean_err < 4e-3
    checks["golden_render_config3_64"] = {
        "deviating_px_frac": round(dev_frac, 6),
        "mean_rel_err": round(mean_err, 8), "pass": ok}
    print(f"golden_render_config3_64: dev_frac={dev_frac:.4f} "
          f"mean_err={mean_err:.2e} -> {'PASS' if ok else 'FAIL'}")
    all_ok &= ok
    mark("config3 golden done")

    s5, cam5, _, _ = configs.ALL_CONFIGS[5]()
    film5 = render(s5, cam5, 96, 54, RenderConfig(spp=2, max_depth=3),
                   key=jax.random.PRNGKey(42))
    got5 = np.asarray(film5.radiance_mean())
    want5 = np.load(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "tests", "golden", "config5_96x54.npy"))
    per_px = np.abs(got5 - want5).max(axis=-1)
    rel = per_px / (np.abs(want5).max(axis=-1) + 1e-2)
    dev_frac = float(np.mean(rel > 0.02))
    mean_err = float(np.mean(rel))
    ok = dev_frac <= 0.02 and mean_err < 4e-3
    checks["golden_render_config5_96x54"] = {
        "deviating_px_frac": round(dev_frac, 6),
        "mean_rel_err": round(mean_err, 8), "pass": ok}
    print(f"golden_render_config5_96x54: dev_frac={dev_frac:.4f} "
          f"mean_err={mean_err:.2e} -> {'PASS' if ok else 'FAIL'}")
    all_ok &= ok
    mark("config5 golden done")

    # ---- gradients ON CHIP: path-replay backward vs finite differences
    # (the differentiable path had only ever been validated on the CPU
    # mesh; the driver's BASELINE gradient axis wants it on hardware)
    from mc_path_tracer_tpu.models.integrator import trace_radiance
    from mc_path_tracer_tpu.models import camera as camera_mod2

    sd1 = s1.build()
    cam1p = cam1.params() if hasattr(cam1, "params") else cam1
    ys, xs = np.mgrid[0:8, 0:8]
    pxg = jnp.asarray(xs.reshape(-1), jnp.float32)
    pyg = jnp.asarray(ys.reshape(-1), jnp.float32)
    rog, rdg = camera_mod2.gen_camera_rays(
        cam1p, 8, 8, pxg, pyg, jnp.zeros((64, 2), jnp.float32))
    gkey = jax.random.PRNGKey(3)
    gcfg = RenderConfig(spp=1, max_depth=2)

    @jax.jit
    def loss(albedo, ls):
        mats = sd1.materials._replace(
            albedo=jnp.broadcast_to(albedo, sd1.materials.albedo.shape))
        dl = sd1.lights.directional._replace(
            ls=sd1.lights.directional.ls.at[0].set(ls))
        sd2 = sd1._replace(
            materials=mats, lights=sd1.lights._replace(directional=dl))
        return jnp.sum(trace_radiance(sd2, rog, rdg, gkey, gcfg))

    a0 = jnp.array([0.8, 0.8, 0.8])
    g_albedo, g_ls = jax.jit(jax.grad(loss, argnums=(0, 1)))(a0, 2.0)
    eps = 1e-2
    fd_ls = (float(loss(a0, 2.0 + eps)) - float(loss(a0, 2.0 - eps))) / (2 * eps)
    e = jnp.array([eps, 0.0, 0.0])
    fd_a = (float(loss(a0 + e, 2.0)) - float(loss(a0 - e, 2.0))) / (2 * eps)
    ls_err = abs(float(g_ls) - fd_ls) / max(abs(fd_ls), 1e-8)
    a_err = abs(float(g_albedo[0]) - fd_a) / max(abs(fd_a), 1e-8)
    ok = bool(ls_err < 1e-2 and a_err < 2e-2 and abs(fd_ls) > 1e-3
              and abs(fd_a) > 1e-3
              and np.isfinite(np.asarray(g_albedo)).all())
    checks["gradients_on_chip"] = {
        "g_ls": round(float(g_ls), 5), "fd_ls": round(fd_ls, 5),
        "g_albedo0": round(float(g_albedo[0]), 5),
        "fd_albedo0": round(fd_a, 5),
        "rel_err_ls": round(ls_err, 6), "rel_err_albedo": round(a_err, 6),
        "pass": ok}
    print(f"gradients_on_chip: ls {float(g_ls):.4f} vs fd {fd_ls:.4f}; "
          f"albedo0 {float(g_albedo[0]):.4f} vs fd {fd_a:.4f} -> "
          f"{'PASS' if ok else 'FAIL'}")
    all_ok &= ok

    # ---- big-scene streaming traversal (rows beyond the VMEM budget)
    from mc_path_tracer_tpu.models.primitives import uv_sphere
    from mc_path_tracer_tpu.models.scene import Scene
    from mc_path_tracer_tpu.ops.pallas import traversal_kernel as tk

    sbig = Scene()
    sbig.set_environment_color((0.5, 0.5, 0.5), ls=1.0)
    mb = sbig.add_material(albedo=(0.7, 0.7, 0.7), roughness=0.6)
    rng = np.random.default_rng(3)
    # ~1.0M triangles -> >8192 leaves: exercises BOTH the HBM-streaming DMA
    # ring AND the multi-page SMEM worklist (r4) on real hardware
    for k in range(10):
        c = rng.uniform(-6, 6, 3); c[1] = abs(c[1])
        p, nn, uvs, idx = uv_sphere(
            1.2, center=tuple(c), rings=224, segments=224)
        sbig.add_mesh(p, idx, normals=nn, uvs=uvs, material_id=mb)
    sdb = sbig.build()
    n_tri = sdb.tris.num_triangles
    n_leaf = sdb.leaf.num_leaves if sdb.leaf is not None else 0
    # 128-row equivalents: merged (wide-row) tables never stream
    eq128 = n_leaf * (sdb.leaf.width // 128) if sdb.leaf is not None else 0
    streaming = eq128 > tk.MAX_LEAVES
    n_chunks = -(-n_leaf // 128)
    n_pages = -(-n_chunks // tk.PAGE_CHUNKS)
    mark(f"big scene built: {n_tri} tris, {n_leaf} leaves, "
         f"streaming={streaming}, pages={n_pages}")
    rob = jnp.asarray(rng.uniform(-8, 8, (2048, 3)).astype(np.float32))
    rdb = jnp.asarray(rng.normal(size=(2048, 3)).astype(np.float32))
    rdb = rdb / jnp.linalg.norm(rdb, axis=-1, keepdims=True)
    cfg_pb = RenderConfig(accel="pallas")
    cfg_wb = RenderConfig(accel="wide")
    gp = jax.tree.map(np.asarray, jax.jit(
        lambda o, d: _intersect(sdb, cfg_pb, o, d))(rob, rdb))
    gw = jax.tree.map(np.asarray, jax.jit(
        lambda o, d: _intersect(sdb, cfg_wb, o, d))(rob, rdb))
    gp_id = np.where(gp.hit, gp.tri_id, -1)
    gw_id = np.where(gw.hit, gw.tri_id, -1)
    ok = closest_agreement(
        "stream_closest_500k", gp.t, gp_id, gw.t, gw_id, checks)
    checks["stream_closest_500k"]["n_tris"] = int(n_tri)
    checks["stream_closest_500k"]["n_leaves"] = int(n_leaf)
    checks["stream_closest_500k"]["streaming_engaged"] = bool(streaming)
    all_ok &= ok and streaming
    op = np.asarray(jax.jit(
        lambda o, d: _occluded(sdb, cfg_pb, o, d))(rob, rdb))
    ow = np.asarray(jax.jit(
        lambda o, d: _occluded(sdb, cfg_wb, o, d))(rob, rdb))
    frac = float(np.mean(op == ow))
    ok = frac >= 0.999
    checks["stream_anyhit_500k"] = {
        "agreement": round(frac, 6), "pass": ok}
    print(f"stream_anyhit_500k: agreement={frac:.5f} -> "
          f"{'PASS' if ok else 'FAIL'}")
    all_ok &= ok
    mark("big-scene streaming checks done")

    # ---- 12. shard_map x Pallas on the chip (VERDICT r4 #5): the flagship
    # kernel under the flagship parallelism.  A 1-device TPU mesh is the
    # only multi-chip topology this environment offers, but it exercises
    # exactly the composition that never met before: the leaf-table Pallas
    # traversal compiled *inside* a shard_map body.  Pixel-keyed noise makes
    # the sharded result bit-identical to the unsharded render.
    from mc_path_tracer_tpu.models.integrator import render_tile_radiance
    from mc_path_tracer_tpu.parallel.mesh import make_mesh
    from mc_path_tracer_tpu.parallel.render import render_sharded

    cfg_sm = RenderConfig(spp=2, max_depth=3, accel="pallas")
    w_sm, h_sm = 128, 64
    key_sm = jax.random.PRNGKey(11)
    mesh1 = make_mesh(n_devices=1)
    acc_sharded = np.asarray(render_sharded(
        sd, cam, w_sm, h_sm, cfg_sm, key=key_sm, mesh=mesh1))
    yy, xx = np.mgrid[0:h_sm, 0:w_sm]
    px_sm = jnp.asarray(xx.reshape(-1).astype(np.float32))
    py_sm = jnp.asarray(yy.reshape(-1).astype(np.float32))
    acc_plain = np.asarray(jax.jit(
        lambda: render_tile_radiance(
            sd, cam, w_sm, h_sm, px_sm, py_sm, key_sm, cfg_sm)
    )()).reshape(h_sm, w_sm, 3)
    # the shard_map-wrapped program is a DIFFERENT compilation of the same
    # math: fusion differences flip occasional edge-lane hits, which flip
    # that pixel's whole MC sample (measured: 0.55% of pixels > 1e-3 rel,
    # 0.012% > 2e-2, means equal to 1e-4) — gate like the golden checks
    # on deviating-pixel fraction + mean agreement, not bitwise equality
    per_px = np.abs(acc_sharded - acc_plain).max(axis=-1)
    rel = per_px / (np.abs(acc_plain).max(axis=-1) + 1e-3)
    dev_frac = float(np.mean(rel > 0.02))
    mean_rel = float(abs(acc_sharded.mean() - acc_plain.mean())) / max(
        float(abs(acc_plain.mean())), 1e-6)
    ok = bool(dev_frac <= 0.02 and mean_rel < 1e-3
              and np.isfinite(acc_sharded).all())
    checks["shardmap_pallas_1dev"] = {
        "deviating_px_frac": round(dev_frac, 6),
        "mean_rel_err": round(mean_rel, 8), "pass": ok}
    print(f"shardmap_pallas_1dev: dev_frac={dev_frac:.4f} "
          f"mean_rel={mean_rel:.2e} -> {'PASS' if ok else 'FAIL'}")
    all_ok &= ok
    mark("shard_map x pallas smoke done")

    results["elapsed_s"] = round(time.time() - t_start, 1)
    results["ok"] = bool(all_ok)
    with open(ARTIFACT, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {ARTIFACT}: ok={all_ok}")
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
