"""Material table: flat, indexed SoA replacing the reference's per-triangle
dMaterial pointers (dMaterial.cuh:11-33, Material.cu).

The reference stores per-material: base_color/emissive factors, fresnel
(0.04), roughness (1.0) / metallic (0.0) defaults, plus 7 texture slots.  The
path-traced pipeline only ever consumes the scalar factors (the texture
fetches are discarded — dMaterial.cu:26/54/81/114, a quirk documented in
SURVEY.md §7), so the table here carries the factors; a texture atlas hook is
reserved for the texture-path extension.

Parameters live in a pytree so gradients flow to them directly (the
differentiability north star: d(image)/d(albedo, roughness, metallic, F0)).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from mc_path_tracer_tpu.ops.brdf import MaterialParams


class MaterialTable(NamedTuple):
    """[M]-indexed material factors."""

    albedo: jnp.ndarray     # [M, 3] base color
    roughness: jnp.ndarray  # [M]
    metallic: jnp.ndarray   # [M]
    fresnel: jnp.ndarray    # [M, 3] F0 (reference default 0.04)
    emissive: jnp.ndarray   # [M, 3]

    @property
    def num_materials(self) -> int:
        return self.albedo.shape[0]

    def gather(self, material_id: jnp.ndarray) -> MaterialParams:
        """Per-ray material parameters for shading."""
        return MaterialParams(
            albedo=self.albedo[material_id],
            roughness=self.roughness[material_id],
            metallic=self.metallic[material_id],
            fresnel=self.fresnel[material_id],
        )


def make_material_table(
    albedo, roughness, metallic, fresnel=None, emissive=None
) -> MaterialTable:
    albedo = jnp.asarray(np.atleast_2d(np.asarray(albedo, np.float32)))
    m = albedo.shape[0]
    roughness = jnp.broadcast_to(jnp.asarray(roughness, jnp.float32), (m,))
    metallic = jnp.broadcast_to(jnp.asarray(metallic, jnp.float32), (m,))
    if fresnel is None:
        fresnel = jnp.full((m, 3), 0.04, jnp.float32)
    else:
        fresnel = jnp.broadcast_to(jnp.asarray(fresnel, jnp.float32), (m, 3))
    if emissive is None:
        emissive = jnp.zeros((m, 3), jnp.float32)
    else:
        emissive = jnp.broadcast_to(jnp.asarray(emissive, jnp.float32), (m, 3))
    return MaterialTable(albedo, roughness, metallic, fresnel, emissive)


def default_material() -> MaterialTable:
    """Reference defaults: white albedo, roughness 1, metallic 0, F0 0.04."""
    return make_material_table([[1.0, 1.0, 1.0]], 1.0, 0.0)
