"""Feasibility measurement for the r6 any-hit idea (PROFILE_r05 "What's
left"): a coarse occupancy grid that PROVES most shadow-ray escapes
without touching leaf rows.  Pure numpy on the bench scene's real shadow
ray set — no chip time.  Reports:

  - fraction of live shadow rays that are actually unoccluded (oracle);
  - fraction provable by marching an NxNxN conservative occupancy grid
    (voxel occupied if any triangle AABB overlaps it), i.e. the rays a
    grid pre-pass could retire before the leaf-table kernel runs;
  - expected any-hit kernel load reduction.
"""

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
    from mc_path_tracer_tpu.models.integrator import RenderConfig, _intersect, _occluded
    from mc_path_tracer_tpu.ops import rng as rng_mod

    scene = build_bench_scene()
    sd = scene.build()
    cam = dataclasses.replace(
        PerspectiveCamera(position=np.array([0.3, 4.0, 9.0]),
                          target=np.array([0.0, 0.5, 0.0]), fov_deg=45.0),
        aspect=1920 / 1080,
    ).params()
    R = 32768
    pxi, pyi = tile_order(1920, 1080)
    mid = pxi.shape[0] // 2
    px = jnp.asarray(pxi[mid:mid + R].astype(np.float32))
    py = jnp.asarray(pyi[mid:mid + R].astype(np.float32))
    pid = (py * 1920 + px).astype(jnp.int32)
    ro, rd = camera_mod.gen_camera_rays(cam, 1920, 1080, px, py,
                                        jnp.zeros((R, 2), jnp.float32))
    cfg = RenderConfig(accel="wide")
    hit = jax.jit(lambda o, d: _intersect(sd, cfg, o, d))(ro, rd)
    # shadow rays: to the directional light and env-CDF samples (the real
    # wl population), from hit surfaces
    from mc_path_tracer_tpu.models import lights as lights_mod
    key = jax.random.PRNGKey(3)
    u = rng_mod.pixel_uniforms(key, pid, 4)
    l_id = (u[:, 0] * 2).astype(jnp.int32)  # 2 lights: env + directional
    wl = lights_mod.sample_dir(sd.lights, l_id, u[:, 1:3])
    so = np.asarray(hit.position + hit.normal * 0.01)
    sdir = np.asarray(wl)
    live = np.asarray(hit.hit)
    occ = np.asarray(jax.jit(
        lambda o, d, m: _occluded(sd, cfg, o, d, mask=m))(
            jnp.asarray(so), jnp.asarray(sdir), jnp.asarray(live)))

    # conservative occupancy grid from triangle AABBs
    tris = sd.tris
    v0 = np.asarray(tris.v0); e1 = np.asarray(tris.e1); e2 = np.asarray(tris.e2)
    p1, p2 = v0 + e1, v0 + e2
    tmin = np.minimum(np.minimum(v0, p1), p2)
    tmax = np.maximum(np.maximum(v0, p1), p2)
    lo = tmin.min(axis=0) - 1e-3
    hi = tmax.max(axis=0) + 1e-3
    for N in (32, 64, 128):
        vs = (hi - lo) / N
        grid = np.zeros((N, N, N), bool)
        c0 = np.clip(((tmin - lo) / vs).astype(np.int64), 0, N - 1)
        c1 = np.clip(((tmax - lo) / vs).astype(np.int64), 0, N - 1)
        # mark voxel ranges per triangle (loop ok host-side, once)
        for a, b in zip(c0, c1):
            grid[a[0]:b[0] + 1, a[1]:b[1] + 1, a[2]:b[2] + 1] = True
        occ_frac = grid.mean()

        # sample-march each live shadow ray through the grid
        # step = half min voxel edge; t range = origin to box exit
        eps = 1e-12
        d = np.where(np.abs(sdir) > eps, sdir, eps)
        t_lo = (lo - so) / d
        t_hi = (hi - so) / d
        t_near = np.minimum(t_lo, t_hi).max(axis=1)
        t_far = np.maximum(t_lo, t_hi).min(axis=1)
        t0 = np.maximum(t_near, 0.0)
        t1 = np.maximum(t_far, 0.0)
        step = vs.min() * 0.5
        n_steps = int(np.ceil((t1 - t0).max() / step)) + 1
        n_steps = min(n_steps, 2000)
        provable = np.zeros(R, bool)
        inside = t1 > t0
        ts = t0[:, None] + (np.arange(n_steps)[None, :] + 0.5) * step
        ok = np.ones(R, bool)
        for c in range(0, R, 4096):
            tc = ts[c:c + 4096]
            valid = tc <= t1[c:c + 4096, None]
            pts = so[c:c + 4096, None, :] + tc[..., None] * sdir[c:c + 4096, None, :]
            cell = np.clip(((pts - lo) / vs).astype(np.int64), 0, N - 1)
            occv = grid[cell[..., 0], cell[..., 1], cell[..., 2]]
            ok[c:c + 4096] = ~(occv & valid).any(axis=1)
        provable = ok | ~inside
        m = live
        frac_unocc = 1.0 - occ[m].mean()
        frac_prov = provable[m].mean()
        print(f"grid {N}^3: occupied voxels {occ_frac:.3f}; "
              f"live shadow rays unoccluded {frac_unocc:.3f}; "
              f"grid-provable escapes {frac_prov:.3f} "
              f"({frac_prov / max(frac_unocc, 1e-9):.0%} of escapes, "
              f"{frac_prov:.0%} of all any-hit work removable)",
              flush=True)


if __name__ == "__main__":
    main()
