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
    """[M]-indexed material factors + optional texture bindings.

    Texture ids index the scene's TextureAtlas (-1 = untextured slot, factor
    only).  `albedo_tex` modulates base color, `mr_tex` holds glTF
    metallic-roughness (B = metallic, G = roughness), `emissive_tex`
    modulates emission — the reference's texture slot layout
    (dMaterial.cuh:11-33), actually wired up (the reference discards its
    fetches; SURVEY.md §7).
    """

    albedo: jnp.ndarray     # [M, 3] base color
    roughness: jnp.ndarray  # [M]
    metallic: jnp.ndarray   # [M]
    fresnel: jnp.ndarray    # [M, 3] F0 (reference default 0.04)
    emissive: jnp.ndarray   # [M, 3]
    albedo_tex: jnp.ndarray    # [M] int32
    mr_tex: jnp.ndarray        # [M] int32
    emissive_tex: jnp.ndarray  # [M] int32
    normal_tex: jnp.ndarray    # [M] int32 tangent-space normal map
    ao_tex: jnp.ndarray        # [M] int32 ambient occlusion (R channel)

    @property
    def num_materials(self) -> int:
        return self.albedo.shape[0]

    def gather(self, material_id: jnp.ndarray, uv=None, atlas=None) -> MaterialParams:
        """Per-ray material parameters; textures applied when `uv` and a
        non-empty `atlas` are given.

        The factor table is concatenated into one [M, 8] row so the per-ray
        fetch is a single row gather (row gathers cost the same at any width
        on TPU); the concat is traced from the float leaves, so gradients
        still flow to albedo/roughness/metallic/fresnel."""
        packed = jnp.concatenate(
            [
                self.albedo,
                self.roughness[:, None],
                self.metallic[:, None],
                self.fresnel,
            ],
            axis=1,
        )
        row = packed[material_id]
        albedo = row[..., 0:3]
        roughness = row[..., 3]
        metallic = row[..., 4]
        fresnel = row[..., 5:8]
        if uv is not None and atlas is not None and atlas.count > 0:
            from mc_path_tracer_tpu.utils.texture import sample_atlas

            albedo = albedo * sample_atlas(atlas, self.albedo_tex[material_id], uv)
            mr = sample_atlas(atlas, self.mr_tex[material_id], uv)
            roughness = roughness * mr[..., 1]
            metallic = metallic * mr[..., 2]
        return MaterialParams(
            albedo=albedo,
            roughness=roughness,
            metallic=metallic,
            fresnel=fresnel,
        )

    def emission(self, material_id: jnp.ndarray, uv=None, atlas=None) -> jnp.ndarray:
        e = self.emissive[material_id]
        if uv is not None and atlas is not None and atlas.count > 0:
            from mc_path_tracer_tpu.utils.texture import sample_atlas

            e = e * sample_atlas(atlas, self.emissive_tex[material_id], uv)
        return e

    def perturb_normal(
        self, material_id, uv, atlas, n, tangent, bitangent
    ) -> jnp.ndarray:
        """Shading normal with the tangent-space normal map applied
        (dMaterial.cu get_normal:84-115 — present in the reference but
        disabled by the factor-return quirk; wired for real here).

        The fetched texel (linear, [0,1]) maps to a tangent-space vector
        2c-1; output = normalize(T*x + B*y + N*z).  Untextured materials
        (normal_tex < 0) return n unchanged (sample_atlas yields the
        neutral texel)."""
        if atlas is None or atlas.count == 0:
            return n
        from mc_path_tracer_tpu.utils.texture import sample_atlas

        tid = self.normal_tex[material_id]
        c = sample_atlas(atlas, tid, uv)          # [R, 3], 1.0 where tid < 0
        v = 2.0 * c - 1.0
        perturbed = (
            tangent * v[..., 0:1] + bitangent * v[..., 1:2] + n * v[..., 2:3]
        )
        norm = jnp.sqrt(
            jnp.maximum(jnp.sum(perturbed * perturbed, axis=-1, keepdims=True),
                        1e-20)
        )
        return jnp.where((tid >= 0)[..., None], perturbed / norm, n)

    def ambient_occlusion(self, material_id, uv=None, atlas=None) -> jnp.ndarray:
        """AO factor (R channel of the occlusion texture; 1 untextured) —
        consumed by the preview's ambient term, like the rasterizer's
        metallic-rough-AO G-buffer attachment."""
        if uv is None or atlas is None or atlas.count == 0:
            return jnp.ones(jnp.shape(material_id), jnp.float32)
        from mc_path_tracer_tpu.utils.texture import sample_atlas

        return sample_atlas(atlas, self.ao_tex[material_id], uv)[..., 0]


def make_material_table(
    albedo, roughness, metallic, fresnel=None, emissive=None,
    albedo_tex=None, mr_tex=None, emissive_tex=None,
    normal_tex=None, ao_tex=None,
) -> MaterialTable:
    # assembled in numpy (host) — scene building must not run eager device ops
    albedo_np = np.atleast_2d(np.asarray(albedo, np.float32))
    m = albedo_np.shape[0]
    roughness_np = np.broadcast_to(np.asarray(roughness, np.float32), (m,))
    metallic_np = np.broadcast_to(np.asarray(metallic, np.float32), (m,))
    fresnel_np = (
        np.full((m, 3), 0.04, np.float32)
        if fresnel is None
        else np.broadcast_to(np.asarray(fresnel, np.float32), (m, 3))
    )
    emissive_np = (
        np.zeros((m, 3), np.float32)
        if emissive is None
        else np.broadcast_to(np.asarray(emissive, np.float32), (m, 3))
    )
    def tex_ids(t):
        if t is None:
            return np.full(m, -1, np.int32)
        return np.broadcast_to(np.asarray(t, np.int32), (m,))

    return MaterialTable(
        jnp.asarray(albedo_np),
        jnp.asarray(roughness_np),
        jnp.asarray(metallic_np),
        jnp.asarray(fresnel_np),
        jnp.asarray(emissive_np),
        jnp.asarray(tex_ids(albedo_tex)),
        jnp.asarray(tex_ids(mr_tex)),
        jnp.asarray(tex_ids(emissive_tex)),
        jnp.asarray(tex_ids(normal_tex)),
        jnp.asarray(tex_ids(ao_tex)),
    )


def default_material() -> MaterialTable:
    """Reference defaults: white albedo, roughness 1, metallic 0, F0 0.04."""
    return make_material_table([[1.0, 1.0, 1.0]], 1.0, 0.0)
