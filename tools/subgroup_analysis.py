"""Predict the win of per-subgroup visit pruning in the Pallas kernel,
host-side: for octant-sorted bounce rays, compare per-256-block leaf-AABB
union sizes (current worklist = visits) against per-64/128-ray subgroup
unions (what a subgrouped phase 2 would visit).  Pure numpy on saved rays —
no TPU needed.

Writes nothing; prints the visit-count ledger that decides whether the
subgroup kernel rework is worth it.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import jax.numpy as jnp

    from bench import build_bench_scene
    from mc_path_tracer_tpu.models import camera as camera_mod
    from mc_path_tracer_tpu.models.camera import PerspectiveCamera
    from mc_path_tracer_tpu.models.film import tile_order
    from mc_path_tracer_tpu.models.integrator import RenderConfig, _intersect
    from mc_path_tracer_tpu.ops import rng as rng_mod
    from mc_path_tracer_tpu.ops.math import build_onb
    from mc_path_tracer_tpu.ops.pallas.traversal_kernel import _sort_perm

    scene = build_bench_scene()
    sd = scene.build()
    width, height = 1920, 1080
    cam = dataclasses.replace(
        PerspectiveCamera(position=np.array([0.3, 4.0, 9.0]),
                          target=np.array([0.0, 0.5, 0.0]), fov_deg=45.0),
        aspect=width / height,
    ).params()
    R = 65536
    pxi, pyi = tile_order(width, height)
    mid = pxi.shape[0] // 2
    px = jnp.asarray(pxi[mid:mid + R].astype(np.float32))
    py = jnp.asarray(pyi[mid:mid + R].astype(np.float32))
    pid = (py * width + px).astype(jnp.int32)
    key = jax.random.PRNGKey(0)
    ro, rd = camera_mod.gen_camera_rays(cam, width, height, px, py,
                                        jnp.zeros((R, 2), jnp.float32))
    cfg = RenderConfig(accel="wide")
    print("tracing primaries on cpu...", flush=True)
    hit = jax.jit(lambda o, d: _intersect(sd, cfg, o, d))(ro, rd)
    u = rng_mod.pixel_uniforms(key, pid, 2)
    st = jnp.sqrt(jnp.maximum(1.0 - u[:, 0] ** 2, 0.0))
    phi = 2.0 * jnp.pi * u[:, 1]
    local = jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), u[:, 0]], -1)
    t_vec, b_vec = build_onb(hit.normal)
    bd = (local[:, 0:1] * t_vec + local[:, 1:2] * b_vec
          + local[:, 2:3] * hit.normal)
    bo = hit.position + hit.normal * 0.001
    live = np.asarray(hit.hit)
    # the real dispatch sort: octant-grouped with block-local fine bins
    perm, _ = _sort_perm(bd, jnp.asarray(live), block=2048)
    perm = np.asarray(perm)
    o = np.asarray(bo)[perm]
    d = np.asarray(bd)[perm]
    lv = live[perm]

    boxes = np.asarray(sd.leaf.boxes_t)
    n_leaf = sd.leaf.num_leaves
    bmin = boxes[0:3, :n_leaf].T[None]      # [1, L, 3]
    bmax = boxes[3:6, :n_leaf].T[None]

    eps = 1e-12
    dd = np.where(np.abs(d) > eps, d, np.where(d >= 0, eps, -eps))
    inv = 1.0 / dd

    def leaf_hits(o_, inv_, lv_):
        t0 = (bmin - o_[:, None, :]) * inv_[:, None, :]
        t1 = (bmax - o_[:, None, :]) * inv_[:, None, :]
        tn = np.minimum(t0, t1).max(axis=-1)
        tf = np.maximum(t0, t1).min(axis=-1)
        return ((tn <= tf) & (tf >= 0.0)) & lv_[:, None]   # [r, L]

    # process in chunks to bound memory
    GROUPS = (8, 16, 32, 64, 128, 256, 2048)
    tot = {g: 0 for g in GROUPS}
    per_ray = 0
    n_rays = 0
    for c in range(0, R, 4096):
        h = leaf_hits(o[c:c + 4096], inv[c:c + 4096], lv[c:c + 4096])
        per_ray += h.sum()
        n_rays += lv[c:c + 4096].sum()
        for g in GROUPS:
            hh = h.reshape(-1, g, n_leaf).any(axis=1)   # [blocks, L]
            tot[g] += hh.sum()
    print(f"leaves={n_leaf}  live rays={int(n_rays)}")
    print(f"mean leaf-AABB hits per live ray: {per_ray / max(n_rays,1):.1f}")
    print(f"union worklist per 2048-ray block: {tot[2048] / (R // 2048):.1f}")
    # vector-cost model for a per-subgroup-worklist phase 2 (r5 design):
    # each g-ray subgroup visits only ITS union; a visit costs a [10,128]
    # row load (10 vreg cycles) + ceil(g/8) vregs x ~35 MT ops.
    for g in GROUPS[:-1]:
        visits_per_block = tot[g] / (R // 2048) / (2048 // g) * (2048 // g)
        per_sub = tot[g] / (R // g)
        vcycles = (tot[g] / (R // 2048)) * (10 + max(g // 8, 1) * 35)
        print(f"subgroup {g:4d}: mean union {per_sub:7.1f} leaves; "
              f"visits/2048-block {visits_per_block:7.0f}; "
              f"modeled vector cycles/block {vcycles/1e3:7.1f}k")


if __name__ == "__main__":
    main()
