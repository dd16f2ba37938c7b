"""Worker process for the 2-process jax.distributed test (DCN path).

Spawned by tests/test_multihost.py: each process owns 4 virtual CPU devices,
jax.distributed stitches them into one 8-device global mesh, and the sharded
renderer runs with pixel rows split across BOTH processes.  Each process
independently renders the full frame single-device and asserts its
addressable shards match bit-exactly (pixel-keyed RNG makes the frame
invariant to the decomposition).

Usage: python multihost_worker.py <proc_id> <nproc> <port> <out.npz>
"""

import os
import sys

proc_id, nproc, port, out_path = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
)

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}",
    num_processes=nproc,
    process_id=proc_id,
)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jax.sharding import Mesh  # noqa: E402

from mc_path_tracer_tpu.models.camera import PerspectiveCamera  # noqa: E402
from mc_path_tracer_tpu.models.integrator import (  # noqa: E402
    RenderConfig,
    render_tile_radiance,
)
from mc_path_tracer_tpu.models.primitives import plane, uv_sphere  # noqa: E402
from mc_path_tracer_tpu.models.scene import Scene  # noqa: E402
from mc_path_tracer_tpu.parallel.mesh import TILE_AXIS  # noqa: E402
from mc_path_tracer_tpu.parallel.render import (  # noqa: E402
    render_sharded_global,
)

assert len(jax.devices()) == 4 * nproc, (
    f"expected {4*nproc} global devices, got {len(jax.devices())}"
)
assert len(jax.local_devices()) == 4

width, height = 64, 32
cfg = RenderConfig(spp=1, max_depth=2, accel="wide")

scene = Scene()
scene.set_environment_color((0.4, 0.5, 0.7), ls=1.0)
scene.add_directional_light((0.3, 1.0, 0.2), ls=2.0)
m0 = scene.add_material(albedo=(0.8, 0.3, 0.2), roughness=0.5)
p, n, uv, idx = uv_sphere(0.8, center=(0, 0.8, 0), rings=6, segments=8)
scene.add_mesh(p, idx, normals=n, uvs=uv, material_id=m0)
p, n, uv, idx = plane(6.0)
scene.add_mesh(p, idx, normals=n, uvs=uv, material_id=m0)
sd = scene.build()

cam = PerspectiveCamera(
    position=np.array([0.0, 1.2, 3.0]),
    target=np.array([0.0, 0.6, 0.0]),
    fov_deg=50.0,
    aspect=width / height,
).params()

mesh = Mesh(np.asarray(jax.devices()), (TILE_AXIS,))
key = jax.random.PRNGKey(0)
acc = render_sharded_global(sd, cam, width, height, cfg, key, mesh)
jax.block_until_ready(acc)
# measured 2-process wall clock (warm; includes the cross-process film
# gather over the distributed backend) — the one empirical DCN datapoint
# this 1-chip environment can produce (SCALING r4)
import time  # noqa: E402

t0 = time.perf_counter()
jax.block_until_ready(
    render_sharded_global(sd, cam, width, height, cfg,
                          jax.random.PRNGKey(1), mesh))
t_sharded = time.perf_counter() - t0

# single-device reference of the full frame, computed locally
ys, xs = np.mgrid[0:height, 0:width]
px = jnp.asarray(xs.reshape(-1), jnp.float32)
py = jnp.asarray(ys.reshape(-1), jnp.float32)
ref = np.asarray(
    render_tile_radiance(sd, cam, width, height, px, py, key, cfg, cfg.spp)
)
f_single = jax.jit(lambda k: render_tile_radiance(
    sd, cam, width, height, px, py, k, cfg, cfg.spp))
jax.block_until_ready(f_single(key))
t0 = time.perf_counter()
jax.block_until_ready(f_single(jax.random.PRNGKey(1)))
t_single = time.perf_counter() - t0

rows_per_dev = width * height // (4 * nproc)
ok = True
checked = 0
for shard in acc.addressable_shards:
    start = shard.index[0].start or 0
    local = np.asarray(shard.data)
    want = ref[start : start + local.shape[0]]
    if not np.array_equal(local, want):
        ok = False
    checked += 1

np.savez(out_path, ok=ok, checked=checked, nproc=nproc, proc=proc_id,
         t_sharded_s=t_sharded, t_single_s=t_single)
print(f"proc {proc_id}: checked {checked} shards, ok={ok} "
      f"sharded={t_sharded*1e3:.0f}ms single={t_single*1e3:.0f}ms",
      flush=True)
sys.exit(0 if ok and checked == 4 else 1)
