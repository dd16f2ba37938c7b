"""Perspective thin-lens camera.

Parity with the reference camera stack (Camera.{h,cu}, PerspectiveCamera.*):
  - ray generation by NDC unprojection: pixel center -> NDC (y flipped) ->
    unproject near (z=-1) and far (z=+1) planes through inv(proj@view),
    origin = near point, direction = normalize(far - near) (Camera.cu:18-32).
  - thin-lens depth of field when lens_radius > 0: focal point at distance f
    along the ray, concentric-disk lens sample mapped to world by
    inv(view) (Camera.cu:34-43).
  - projection = glm::perspective(fov, aspect, near, far)
    (PerspectiveCamera.cpp:47-50).
  - the reference shoots through exact pixel centers (x+0.5, no sub-pixel
    jitter; Camera.cu:21-22) — `jitter=True` optionally enables stratified AA
    as an extension.

The camera is a host-side object (like the reference's fly-cam); `rays()`
returns a jit-friendly pure function of pixel coordinates.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mc_path_tracer_tpu.ops.math import normalize
from mc_path_tracer_tpu.ops.sampling import sample_concentric_disk


class CameraParams(NamedTuple):
    """Traced camera parameters (the dCamera managed mirror, Camera.cu:194-208):
    passing these as a pytree keeps the jitted render cache warm across
    camera edits — moving the camera does not recompile."""

    inv_view_proj: jnp.ndarray  # [4, 4]
    inv_view: jnp.ndarray       # [4, 4]
    lens_radius: jnp.ndarray    # []
    focal_distance: jnp.ndarray  # []


def gen_camera_rays(
    params: CameraParams,
    width: int,
    height: int,
    px: jnp.ndarray,
    py: jnp.ndarray,
    lens_u: jnp.ndarray,
):
    """dCamera::gen_ray (Camera.cu:18-45), vectorized over pixels.

    NDC unprojection of near/far planes; thin-lens refocus blended in by
    lens_radius (select, so the pinhole path costs nothing when radius is a
    traced 0 — XLA folds the where when lens_radius is a constant 0).
    """
    # Precision.HIGHEST is load-bearing: the TPU MXU's default bf16 matmul
    # precision makes the far-plane w-component (a fine cancellation ~1/z_far)
    # round to exactly 0 -> inf/NaN ray directions.  These are 4x4 matmuls;
    # full f32 costs nothing.
    hp = jax.lax.Precision.HIGHEST
    ndc_x = 2.0 * ((px + 0.5) / width) - 1.0
    ndc_y = 1.0 - 2.0 * ((py + 0.5) / height)
    ones = jnp.ones_like(ndc_x)
    near_h = jnp.stack([ndc_x, ndc_y, -ones, ones], axis=-1)
    far_h = jnp.stack([ndc_x, ndc_y, ones, ones], axis=-1)
    near = jnp.einsum("ij,rj->ri", params.inv_view_proj, near_h, precision=hp)
    far = jnp.einsum("ij,rj->ri", params.inv_view_proj, far_h, precision=hp)
    origin = near[:, :3] / near[:, 3:4]
    direction = normalize(far[:, :3] / far[:, 3:4] - origin)

    # thin lens (Camera.cu:34-43)
    p_focal = origin + direction * params.focal_distance
    lens = sample_concentric_disk(lens_u) * params.lens_radius
    lens_h = jnp.concatenate(
        [lens, jnp.zeros_like(lens[..., :1]), jnp.ones_like(lens[..., :1])], axis=-1
    )
    p_lens_h = jnp.einsum("ij,rj->ri", params.inv_view, lens_h, precision=hp)
    p_lens = p_lens_h[:, :3] / p_lens_h[:, 3:4]
    use_lens = params.lens_radius > 0.0
    origin = jnp.where(use_lens, p_lens, origin)
    direction = jnp.where(use_lens, normalize(p_focal - origin), direction)
    return origin, direction


@dataclass
class PerspectiveCamera:
    position: np.ndarray = field(default_factory=lambda: np.array([0.0, 0.0, 5.0]))
    target: np.ndarray = field(default_factory=lambda: np.zeros(3))
    up: np.ndarray = field(default_factory=lambda: np.array([0.0, 1.0, 0.0]))
    fov_deg: float = 60.0
    aspect: float = 1.0
    z_near: float = 0.1
    z_far: float = 1000.0
    lens_radius: float = 0.0
    focal_distance: float = 1.0
    exposure: float = 1.0

    def matrices(self):
        """View/projection matrices, computed host-side in numpy (glm
        lookAt/perspective conventions; see ops.math for the traced forms)."""
        eye = np.asarray(self.position, np.float64)
        f = np.asarray(self.target, np.float64) - eye
        f = f / np.linalg.norm(f)
        up = np.asarray(self.up, np.float64)
        s = np.cross(f, up)
        s = s / np.linalg.norm(s)
        u = np.cross(s, f)
        view = np.eye(4)
        view[0, :3] = s
        view[1, :3] = u
        view[2, :3] = -f
        view[0, 3] = -s @ eye
        view[1, 3] = -u @ eye
        view[2, 3] = f @ eye
        fov = float(np.deg2rad(self.fov_deg))
        t = 1.0 / np.tan(fov / 2.0)
        proj = np.zeros((4, 4))
        proj[0, 0] = t / self.aspect
        proj[1, 1] = t
        proj[2, 2] = (self.z_far + self.z_near) / (self.z_near - self.z_far)
        proj[2, 3] = 2.0 * self.z_far * self.z_near / (self.z_near - self.z_far)
        proj[3, 2] = -1.0
        return view, proj, proj @ view

    def params(self) -> CameraParams:
        """Compile this host camera to traced CameraParams.  Matrix math in
        numpy (f64 inverse, then f32): host-side, no eager device ops."""
        view, _, view_proj = self.matrices()
        inv_vp = np.linalg.inv(np.asarray(view_proj, np.float64)).astype(np.float32)
        inv_v = np.linalg.inv(np.asarray(view, np.float64)).astype(np.float32)
        return CameraParams(
            inv_view_proj=jnp.asarray(inv_vp),
            inv_view=jnp.asarray(inv_v),
            lens_radius=jnp.asarray(self.lens_radius, jnp.float32),
            focal_distance=jnp.asarray(self.focal_distance, jnp.float32),
        )
