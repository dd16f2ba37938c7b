"""Texture pipeline tests: atlas sampling and textured shading (the texture
path the reference wires up but discards — SURVEY.md §7)."""

import jax
import jax.numpy as jnp
import numpy as np

from mc_path_tracer_tpu.models.camera import PerspectiveCamera
from mc_path_tracer_tpu.models.integrator import RenderConfig, render
from mc_path_tracer_tpu.models.preview import render_preview
from mc_path_tracer_tpu.models.primitives import plane
from mc_path_tracer_tpu.models.scene import Scene
from mc_path_tracer_tpu.utils.texture import build_atlas, empty_atlas, sample_atlas


def test_atlas_sampling_bilinear_and_sizes():
    t0 = np.zeros((4, 4, 3), np.float32)
    t0[1, 1] = 1.0
    t1 = np.full((8, 2, 3), 0.25, np.float32)
    atlas = build_atlas([t0, t1])
    assert atlas.count == 2
    # texel center of t0 (1,1): uv = (0.375, 0.375)
    v = sample_atlas(atlas, jnp.asarray([0]), jnp.asarray([[0.375, 0.375]]))
    np.testing.assert_allclose(np.asarray(v), 1.0, atol=1e-6)
    # t1 is constant despite different size
    v = sample_atlas(atlas, jnp.asarray([1]), jnp.asarray([[0.7, 0.3]]))
    np.testing.assert_allclose(np.asarray(v), 0.25, atol=1e-6)
    # negative id -> neutral 1.0
    v = sample_atlas(atlas, jnp.asarray([-1]), jnp.asarray([[0.5, 0.5]]))
    np.testing.assert_allclose(np.asarray(v), 1.0, atol=1e-6)


def test_empty_atlas_neutral():
    v = sample_atlas(empty_atlas(), jnp.asarray([0]), jnp.asarray([[0.5, 0.5]]))
    np.testing.assert_allclose(np.asarray(v), 1.0)


def checkerboard_scene():
    s = Scene()
    s.set_environment_color((0, 0, 0), ls=0.0)
    # 2x2 checker texture: red / green
    tex = np.zeros((2, 2, 3), np.float32)
    tex[0, 0] = tex[1, 1] = [1.0, 0.0, 0.0]
    tex[0, 1] = tex[1, 0] = [0.0, 1.0, 0.0]
    tid = s.add_texture(tex)
    m = s.add_material(albedo=(1, 1, 1), roughness=1.0, albedo_tex=tid)
    p, n, uv, idx = plane(4.0)
    s.add_mesh(p, idx, normals=n, uvs=uv, material_id=m)
    s.add_directional_light((0, 1, 0), ls=3.0)
    return s


def test_textured_albedo_in_preview():
    s = checkerboard_scene()
    cam = PerspectiveCamera(position=np.array([0.1, 6.0, 0.13]),
                            target=np.array([0.0, 0.0, 0.0]),
                            up=np.array([0, 0, 1.0]), fov_deg=40.0)
    film = render_preview(s, cam, 16, 16, "albedo")
    img = np.asarray(film.ld)
    # both checker colors appear; red and green regions distinct
    assert (img[..., 0] > 0.5).any() and (img[..., 1] > 0.5).any()
    assert not np.allclose(img[..., 0], img[..., 1])


def test_textured_albedo_in_path_tracer():
    s = checkerboard_scene()
    cam = PerspectiveCamera(position=np.array([0.1, 6.0, 0.13]),
                            target=np.array([0.0, 0.0, 0.0]),
                            up=np.array([0, 0, 1.0]), fov_deg=40.0)
    film = render(s, cam, 16, 16, RenderConfig(spp=16, max_depth=2),
                  key=jax.random.PRNGKey(0))
    img = np.asarray(film.radiance_mean())
    assert np.isfinite(img).all()
    red = img[..., 0] > img[..., 1]
    # a checker has both orientations visible
    assert red.any() and (~red).any()


def test_untextured_unchanged_by_texture_support():
    """A factor-only scene renders identically whether or not the atlas
    machinery exists (reference-parity default)."""
    s = Scene()
    s.set_environment_color((0, 0, 0), ls=0.0)
    m = s.add_material(albedo=(0.6, 0.4, 0.2), roughness=1.0)
    p, n, uv, idx = plane(4.0)
    s.add_mesh(p, idx, normals=n, uvs=uv, material_id=m)
    s.add_directional_light((0, 1, 0), ls=2.0)
    sd = s.build()
    assert sd.atlas.count == 0
    mat = sd.materials.gather(jnp.asarray([0]), jnp.zeros((1, 2)), sd.atlas)
    np.testing.assert_allclose(np.asarray(mat.albedo), [[0.6, 0.4, 0.2]], atol=1e-6)
