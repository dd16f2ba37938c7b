"""Scene: host-side assembly of flat device arrays + acceleration structure.

Mirrors the reference's Scene layer (Scene.{h,cu}) with a TPU-native data
model: instead of managed-memory object graphs (dTriangle -> dMaterial* /
dTransform* pointers, device vtable lights), the scene compiles to a single
`SceneData` pytree of indexed SoA arrays (SURVEY.md §7 design stance).

Parity behaviors:
  - Scene::load imports a model file with world-space baking
    (Scene.cu:24-232) -> utils/gltf.load_gltf here.
  - transfer_data_to_device + d_build_bvh (Scene.cu:363-469) -> build():
    triangle gather, BVH build (native SAH by default; LBVH/Middle/Equal
    available), leaf-order triangle reorder.
  - the light table is [environment, directionals...] (Scene.cu:367-388).
  - a default Color-mode environment light always exists (Scene.cu:11-14).
  - Subject/Observer progressive-restart: edits bump `version`; render
    sessions clear accumulation when they observe a version change
    (Subject.cpp / Film.cu:278-281 semantics).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dataclass_field
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from mc_path_tracer_tpu.models import lights as lights_mod
from mc_path_tracer_tpu.models.materials import MaterialTable, make_material_table
from mc_path_tracer_tpu.ops.bvh import build_accel
from mc_path_tracer_tpu.ops.intersect import BVHArrays, TriangleSoA
from mc_path_tracer_tpu.utils import native
from mc_path_tracer_tpu.utils.gltf import load_gltf
from mc_path_tracer_tpu.utils.image import load_hdr


class SceneData(NamedTuple):
    """Device scene: everything the integrator needs, as one pytree
    (the reference's dScene, Scene.h:24-33)."""

    tris: TriangleSoA
    bvh: BVHArrays
    materials: MaterialTable
    lights: lights_mod.LightSet
    atlas: "object" = None  # TextureAtlas (set in build())
    wide: "object" = None   # ops.wide_bvh.WideBVH — the XLA traversal table
    leaf: "object" = None   # ops.pallas.traversal_kernel.LeafTable (TPU kernel)


def _mesh_to_soa(
    positions, normals, uvs, indices, material_id, tangents=None
) -> TriangleSoA:
    """Build a *numpy-backed* TriangleSoA.  Scene assembly stays on the host
    (no eager device ops — on the axon backend each would remote-compile);
    arrays move to the device once, at the end of Scene.build()."""
    from mc_path_tracer_tpu.utils.gltf import compute_tangents

    p = np.asarray(positions, np.float32)
    n = np.asarray(normals, np.float32)
    uv = np.asarray(uvs, np.float32)
    idx = np.asarray(indices, np.int64)
    if tangents is None:
        tangents = compute_tangents(p, n, uv, idx)
    tan = np.asarray(tangents, np.float32)
    v0, v1, v2 = p[idx[:, 0]], p[idx[:, 1]], p[idx[:, 2]]
    e1, e2 = v1 - v0, v2 - v0
    fn = np.cross(e1, e2)
    fn = fn / np.maximum(np.linalg.norm(fn, axis=-1, keepdims=True), 1e-12)
    t = idx.shape[0]
    mat = np.full(t, material_id, np.int32)
    return TriangleSoA(
        v0=v0, e1=e1.astype(np.float32), e2=e2.astype(np.float32),
        n0=n[idx[:, 0]], n1=n[idx[:, 1]], n2=n[idx[:, 2]],
        uv0=uv[idx[:, 0]], uv1=uv[idx[:, 1]], uv2=uv[idx[:, 2]],
        material_id=mat,
        face_normal=fn.astype(np.float32),
        tan0=tan[idx[:, 0]], tan1=tan[idx[:, 1]], tan2=tan[idx[:, 2]],
    )


def concat_soa(parts: list[TriangleSoA]) -> TriangleSoA:
    # attrs (the packed shading rows) is built by the BVH reorder, not here
    fields = [f for f in TriangleSoA._fields if f != "attrs"]
    if any(getattr(p, "tan0", None) is None for p in parts):
        fields = [f for f in fields if not f.startswith("tan")]
    return TriangleSoA(
        **{
            f: np.concatenate([np.asarray(getattr(p, f)) for p in parts], axis=0)
            for f in fields
        }
    )


def _center_of_mass(positions: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """Centroid via signed tetrahedra (Mesh.cu:67-88, 225-228): each face
    forms a tetrahedron with the origin; com = sum(V_f * c_f) / sum(V_f).
    Open/degenerate meshes (|total volume| ~ 0) fall back to the vertex
    mean."""
    v0 = positions[indices[:, 0]]
    v1 = positions[indices[:, 1]]
    v2 = positions[indices[:, 2]]
    vol = np.einsum("ij,ij->i", v0, np.cross(v1, v2)) / 6.0
    total = vol.sum()
    if abs(total) < 1e-9:
        return positions.mean(axis=0).astype(np.float32)
    c = (v0 + v1 + v2) / 4.0
    return ((vol[:, None] * c).sum(axis=0) / total).astype(np.float32)


def _euler_matrix(rotation_deg) -> np.ndarray:
    """XYZ euler (degrees) -> rotation matrix (the editor-slider
    convention)."""
    rx, ry, rz = np.radians(np.asarray(rotation_deg, np.float64))
    cx, sx = np.cos(rx), np.sin(rx)
    cy, sy = np.cos(ry), np.sin(ry)
    cz, sz = np.cos(rz), np.sin(rz)
    mx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    my = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    mz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return (mz @ my @ mx).astype(np.float32)


@dataclass
class ObjectEntry:
    """One render object: source arrays + a TRS about the mesh centroid
    (Transform.{h,cu}: post-load TRS with centroid pivot, the capability the
    world-bake-at-load path lacks)."""

    positions: np.ndarray
    normals: np.ndarray
    uvs: np.ndarray
    indices: np.ndarray
    material_id: int
    tangents: np.ndarray | None = None
    name: str = ""
    translation: np.ndarray = dataclass_field(
        default_factory=lambda: np.zeros(3, np.float32))
    rotation: np.ndarray = dataclass_field(
        default_factory=lambda: np.eye(3, dtype=np.float32))
    scale: np.ndarray = dataclass_field(
        default_factory=lambda: np.ones(3, np.float32))
    _centroid: np.ndarray | None = None
    _baked: TriangleSoA | None = None

    @property
    def centroid(self) -> np.ndarray:
        if self._centroid is None:
            self._centroid = _center_of_mass(
                np.asarray(self.positions, np.float32),
                np.asarray(self.indices, np.int64),
            )
        return self._centroid

    def bake(self) -> TriangleSoA:
        """world = T + C + R S (v - C) (Transform::apply, Transform.cu:48-67
        pivot semantics); normals by inverse-transpose R S^-1, tangents by
        the direct map R S."""
        if self._baked is not None:
            return self._baked
        r = np.asarray(self.rotation, np.float32)
        s = np.asarray(self.scale, np.float32)
        c = self.centroid
        t = np.asarray(self.translation, np.float32)
        p = np.asarray(self.positions, np.float32)
        n = np.asarray(self.normals, np.float32)
        identity = (
            np.allclose(r, np.eye(3)) and np.allclose(s, 1.0)
            and np.allclose(t, 0.0)
        )
        if identity:
            pw, nw, tanw = p, n, self.tangents
        else:
            pw = (p - c) * s @ r.T + c + t
            nw = (n / np.maximum(s, 1e-12)) @ r.T
            nw = nw / np.maximum(
                np.linalg.norm(nw, axis=-1, keepdims=True), 1e-12)
            tanw = self.tangents
            if tanw is not None:
                txyz = (np.asarray(tanw, np.float32)[:, :3] * s) @ r.T
                tl = np.linalg.norm(txyz, axis=-1, keepdims=True)
                txyz = txyz / np.maximum(tl, 1e-12)
                tanw = np.concatenate(
                    [txyz, np.asarray(tanw, np.float32)[:, 3:4]], axis=1)
        self._baked = _mesh_to_soa(
            pw.astype(np.float32), nw.astype(np.float32), self.uvs,
            self.indices, self.material_id, tangents=tanw,
        )
        return self._baked


@dataclass
class Scene:
    """Mutable host scene; `build()` compiles it to a SceneData pytree."""

    objects: list[ObjectEntry] = dataclass_field(default_factory=list)
    material_albedo: list = dataclass_field(default_factory=list)
    material_roughness: list = dataclass_field(default_factory=list)
    material_metallic: list = dataclass_field(default_factory=list)
    material_emissive: list = dataclass_field(default_factory=list)
    material_fresnel: list = dataclass_field(default_factory=list)
    material_albedo_tex: list = dataclass_field(default_factory=list)
    material_mr_tex: list = dataclass_field(default_factory=list)
    material_emissive_tex: list = dataclass_field(default_factory=list)
    material_normal_tex: list = dataclass_field(default_factory=list)
    material_ao_tex: list = dataclass_field(default_factory=list)
    textures: list = dataclass_field(default_factory=list)
    env: lights_mod.EnvLight = dataclass_field(
        default_factory=lights_mod.make_env_color
    )
    directional: list = dataclass_field(default_factory=list)  # (dir, color, ls)
    point_lights: list = dataclass_field(default_factory=list)  # parity stubs
    bvh_method: int = native.SAH
    max_leaf: int = 4
    version: int = 0  # Subject/Observer notify counter
    edit_version: int = 0  # bumped only by content edits (invalidates build)
    _build_cache: object = dataclass_field(default=None, repr=False)

    # -- editing API (each edit bumps version -> progressive restart) -------

    def notify(self, content: bool = True):
        """Bump the observer counter (progressive sessions restart).

        Content edits (the default: geometry/material/light changes) also
        invalidate the built-SceneData cache; camera-only observers pass
        content=False so a fly-cam tick restarts accumulation WITHOUT
        paying a full accel rebuild (the reference's camera Subject
        notifies the Film only, Camera.cu:226-232)."""
        self.version += 1
        if content:
            self.edit_version += 1
            self._build_cache = None

    def add_texture(self, image) -> int:
        """Register a linear float [H, W, 3] texture; returns its atlas id."""
        self.textures.append(np.asarray(image, np.float32)[..., :3])
        self.notify()
        return len(self.textures) - 1

    def add_material(
        self, albedo=(1, 1, 1), roughness=1.0, metallic=0.0,
        emissive=(0, 0, 0), fresnel=(0.04, 0.04, 0.04),
        albedo_tex=-1, mr_tex=-1, emissive_tex=-1, normal_tex=-1, ao_tex=-1,
    ) -> int:
        self.material_albedo.append(np.asarray(albedo, np.float32)[:3])
        self.material_roughness.append(float(roughness))
        self.material_metallic.append(float(metallic))
        self.material_emissive.append(np.asarray(emissive, np.float32)[:3])
        self.material_fresnel.append(np.asarray(fresnel, np.float32)[:3])
        self.material_albedo_tex.append(int(albedo_tex))
        self.material_mr_tex.append(int(mr_tex))
        self.material_emissive_tex.append(int(emissive_tex))
        self.material_normal_tex.append(int(normal_tex))
        self.material_ao_tex.append(int(ao_tex))
        self.notify()
        return len(self.material_albedo) - 1

    def add_mesh(self, positions, indices, normals=None, uvs=None,
                 material_id=0, tangents=None):
        positions = np.asarray(positions, np.float32)
        indices = np.asarray(indices)
        if normals is None:
            from mc_path_tracer_tpu.utils.gltf import _smooth_normals

            normals = _smooth_normals(positions, np.asarray(indices, np.int64))
        if uvs is None:
            uvs = np.zeros((positions.shape[0], 2), np.float32)
        self.objects.append(ObjectEntry(
            positions=positions, normals=np.asarray(normals, np.float32),
            uvs=np.asarray(uvs, np.float32), indices=indices,
            material_id=material_id, tangents=tangents,
        ))
        self.notify()
        return len(self.objects) - 1

    def load(self, path: str, reference_material_quirk: bool = False):
        """Scene::load equivalent (Scene.cu:24): import a .glb with world
        baking; materials are appended to the scene's table."""
        data = load_gltf(path, reference_material_quirk=reference_material_quirk)
        tex_base = len(self.textures)
        for tex in data.textures:
            self.add_texture(tex)

        def shift(t):
            return tex_base + t if t >= 0 else -1

        base = len(self.material_albedo)
        for m in data.materials:
            self.add_material(
                albedo=m.base_color[:3],
                roughness=m.roughness,
                metallic=m.metallic,
                emissive=m.emissive,
                albedo_tex=shift(m.base_color_tex),
                mr_tex=shift(m.metallic_roughness_tex),
                emissive_tex=shift(m.emissive_tex),
                normal_tex=shift(m.normal_tex),
                ao_tex=shift(m.ao_tex),
            )
        for mesh in data.meshes:
            self.objects.append(ObjectEntry(
                positions=mesh.positions, normals=mesh.normals,
                uvs=mesh.uvs, indices=mesh.indices,
                material_id=base + mesh.material, tangents=mesh.tangents,
                name=mesh.name,
            ))
        self.notify()
        return self

    def set_environment_color(self, color=(1, 1, 1), ls=1.0):
        self.env = lights_mod.make_env_color(color, ls)
        self.notify()

    def set_environment_hdr(self, path_or_array, ls=1.0):
        tex = (
            load_hdr(path_or_array)
            if isinstance(path_or_array, str)
            else np.asarray(path_or_array, np.float32)
        )
        self.env = lights_mod.make_env_hdri(tex, ls)
        self.notify()

    def add_directional_light(self, direction, color=(1, 1, 1), ls=1.0):
        self.directional.append(
            (np.asarray(direction, np.float32), np.asarray(color, np.float32), float(ls))
        )
        self.notify()

    def set_transform(self, obj_id: int, translation=None, rotation_deg=None,
                      rotation=None, scale=None):
        """Set an object's absolute TRS about its centroid and re-bake it
        (Transform::apply semantics, Transform.cu:48-67, 113-125): the edit
        bumps `version`, so progressive sessions restart — the
        ObjectEditWindow -> Scene -> Film observer chain."""
        o = self.objects[obj_id]
        if translation is not None:
            o.translation = np.asarray(translation, np.float32)
        if rotation is not None:
            o.rotation = np.asarray(rotation, np.float32).reshape(3, 3)
        elif rotation_deg is not None:
            o.rotation = _euler_matrix(rotation_deg)
        if scale is not None:
            o.scale = np.broadcast_to(
                np.asarray(scale, np.float32).reshape(-1), (3,)).copy()
        o._baked = None  # re-bake this one mesh lazily
        self.notify()

    def apply_transform(self, obj_id: int, translation=(0, 0, 0),
                        rotation_deg=(0, 0, 0), scale=(1, 1, 1)):
        """Compose an incremental TRS onto the object's current transform
        (the reference's incremental Transform::apply)."""
        o = self.objects[obj_id]
        o.translation = o.translation + np.asarray(translation, np.float32)
        o.rotation = (_euler_matrix(rotation_deg) @ o.rotation).astype(
            np.float32)
        o.scale = o.scale * np.broadcast_to(
            np.asarray(scale, np.float32).reshape(-1), (3,))
        o._baked = None
        self.notify()

    def add_point_light(self, position, color=(1, 1, 1), ls=1.0):
        """Parity stub: stored but non-illuminating (reference PointLight has
        no device implementation)."""
        self.point_lights.append(lights_mod.PointLight(
            np.asarray(position, np.float32), np.asarray(color, np.float32), ls
        ))
        self.notify()

    # -- compilation ---------------------------------------------------------

    def build(self) -> SceneData:
        if (
            self._build_cache is not None
            and self._build_cache[0] == self.edit_version
        ):
            return self._build_cache[1]
        if not self.objects:
            raise ValueError("Scene has no geometry")
        if not self.material_albedo:
            self.add_material()
        tris = concat_soa([o.bake() for o in self.objects])
        bvh, wide, tris = build_accel(
            tris, max_leaf=self.max_leaf, method=self.bvh_method
        )
        materials = make_material_table(
            np.stack(self.material_albedo),
            np.asarray(self.material_roughness, np.float32),
            np.asarray(self.material_metallic, np.float32),
            fresnel=np.stack(self.material_fresnel),
            emissive=np.stack(self.material_emissive),
            albedo_tex=np.asarray(self.material_albedo_tex, np.int32),
            mr_tex=np.asarray(self.material_mr_tex, np.int32),
            emissive_tex=np.asarray(self.material_emissive_tex, np.int32),
            normal_tex=np.asarray(self.material_normal_tex, np.int32),
            ao_tex=np.asarray(self.material_ao_tex, np.int32),
        )
        if self.directional:
            dl = lights_mod.make_directional(
                np.stack([d for d, _, _ in self.directional]),
                np.stack([c for _, c, _ in self.directional]),
                np.asarray([s for _, _, s in self.directional], np.float32),
            )
        else:
            dl = lights_mod.empty_directional()
        # emissive triangles -> area light (completing the reference's
        # abandoned dAreaLight; see models/lights.AreaLights)
        emissive = np.asarray(materials.emissive)
        tri_emission = emissive[np.asarray(tris.material_id)]
        emissive_mask = tri_emission.sum(axis=-1) > 0.0
        al = lights_mod.make_area_lights(tris, emissive_mask, tri_emission)
        from mc_path_tracer_tpu.ops.pallas.traversal_kernel import build_leaf_table
        from mc_path_tracer_tpu.utils.texture import build_atlas

        data = SceneData(
            tris=tris, bvh=bvh, materials=materials,
            lights=lights_mod.LightSet(env=self.env, directional=dl, area=al),
            atlas=build_atlas(self.textures),
            wide=wide,
            # None when over the stream budget; width=None auto-merges
            # resident-sized tables to ARENA_LEAF_W-wide rows
            leaf=build_leaf_table(wide, width=None),
        )
        self._build_cache = (self.edit_version, data)
        return data
