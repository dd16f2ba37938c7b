"""GLB loader tests against the reference's shipped assets
(/root/reference/models — data files, read-only)."""

import os

import numpy as np
import pytest

from mc_path_tracer_tpu.utils.gltf import load_gltf

REF_MODELS = "/root/reference/models"


def _asset(name):
    path = os.path.join(REF_MODELS, name)
    if not os.path.exists(path):
        pytest.skip(f"reference asset {name} unavailable")
    return path


def test_load_sphere():
    scene = load_gltf(_asset("sphere.glb"))
    assert len(scene.meshes) >= 1
    m = scene.meshes[0]
    assert m.indices.shape[1] == 3
    assert m.positions.shape[1] == 3
    # vertices lie on a sphere around its centroid
    c = m.positions.mean(axis=0)
    r = np.linalg.norm(m.positions - c, axis=1)
    assert r.std() / r.mean() < 0.05
    # normals unit length and roughly radial
    nl = np.linalg.norm(m.normals, axis=1)
    np.testing.assert_allclose(nl, 1.0, atol=1e-3)
    radial = (m.positions - c) / r[:, None]
    cos = np.abs((radial * m.normals).sum(-1))
    assert np.median(cos) > 0.95


def test_load_cube():
    scene = load_gltf(_asset("Cube.glb"))
    tri_count = sum(m.indices.shape[0] for m in scene.meshes)
    assert tri_count >= 12
    assert len(scene.materials) >= 1


def test_load_suzanne_and_build_scene():
    from mc_path_tracer_tpu.models.scene import Scene

    path = _asset("Suzanne.glb")
    s = Scene().load(path)
    sd = s.build()
    assert sd.tris.num_triangles > 500
    assert sd.bvh.num_nodes > 10
    # BVH bounds enclose the mesh
    v0 = np.asarray(sd.tris.v0)
    root_min = np.asarray(sd.bvh.bmin[0])
    root_max = np.asarray(sd.bvh.bmax[0])
    assert (v0 >= root_min - 1e-4).all() and (v0 <= root_max + 1e-4).all()


def test_material_import_and_quirk():
    path = _asset("mat_preview.glb")
    real = load_gltf(path)
    quirk = load_gltf(path, reference_material_quirk=True)
    assert all(m.roughness == 1.0 and m.metallic == 0.0 for m in quirk.materials)
    assert len(real.materials) == len(quirk.materials)
