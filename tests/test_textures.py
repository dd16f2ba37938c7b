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


def test_normal_mapping_tilts_shading():
    """A constant normal map tilting normals toward a grazing light must
    brighten the lit plane; a neutral map must not change it
    (dMaterial.cu get_normal:84-115, enabled for real here)."""
    def make(normal_rgb):
        s = Scene()
        s.set_environment_color((0, 0, 0), ls=0.0)
        ntex = np.full((2, 2, 3), np.asarray(normal_rgb, np.float32))
        tid = s.add_texture(ntex)
        m = s.add_material(albedo=(0.8, 0.8, 0.8), roughness=1.0,
                           normal_tex=tid)
        p, n, uv, idx = plane(4.0)
        s.add_mesh(p, idx, normals=n, uvs=uv, material_id=m)
        # grazing sun: mostly horizontal, slightly up
        s.add_directional_light((1.0, 0.15, 0.0), ls=3.0)
        return s

    cam = PerspectiveCamera(position=np.array([0.1, 6.0, 0.13]),
                            target=np.array([0.0, 0.0, 0.0]),
                            up=np.array([0, 0, 1.0]), fov_deg=40.0)
    cfg = RenderConfig(spp=8, max_depth=2, accel="brute")
    key = jax.random.PRNGKey(0)
    # neutral map: tangent-space +Z = geometric normal
    flat = np.asarray(render(make((0.5, 0.5, 1.0)), cam, 12, 12, cfg, key=key).ld)
    # tilt strongly toward tangent-space +X
    tilted = np.asarray(render(make((1.0, 0.5, 0.75)), cam, 12, 12, cfg, key=key).ld)
    assert np.isfinite(flat).all() and np.isfinite(tilted).all()
    # same RNG, same geometry: the only difference is the shading normal
    assert abs(tilted.mean() - flat.mean()) > 0.05 * max(flat.mean(), 1e-6)


def test_normal_map_neutral_texture_matches_untextured():
    """A (0.5, 0.5, 1) normal map decodes to the unperturbed normal: the
    render must match the untextured material bit-for-bit up to float eps."""
    def make(with_tex):
        s = Scene()
        s.set_environment_color((0.2, 0.3, 0.4), ls=1.0)
        kw = {}
        if with_tex:
            ntex = np.full((2, 2, 3), np.asarray([0.5, 0.5, 1.0], np.float32))
            kw["normal_tex"] = s.add_texture(ntex)
        m = s.add_material(albedo=(0.7, 0.5, 0.3), roughness=0.6, **kw)
        p, n, uv, idx = plane(4.0)
        s.add_mesh(p, idx, normals=n, uvs=uv, material_id=m)
        s.add_directional_light((0.3, 1.0, 0.2), ls=2.0)
        return s

    cam = PerspectiveCamera(position=np.array([0.1, 6.0, 0.13]),
                            target=np.array([0.0, 0.0, 0.0]),
                            up=np.array([0, 0, 1.0]), fov_deg=40.0)
    cfg = RenderConfig(spp=4, max_depth=2, accel="brute")
    key = jax.random.PRNGKey(1)
    a = np.asarray(render(make(True), cam, 10, 10, cfg, key=key).ld)
    b = np.asarray(render(make(False), cam, 10, 10, cfg, key=key).ld)
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


def test_tangent_frame_orthonormal_on_gltf():
    """Loaded/computed tangents produce an orthonormal (t, b, n) hit frame."""
    from mc_path_tracer_tpu.ops.intersect import intersect_brute

    s = Scene()
    s.set_environment_color((1, 1, 1), ls=1.0)
    from mc_path_tracer_tpu.models.primitives import uv_sphere
    m = s.add_material(albedo=(0.5, 0.5, 0.5))
    p, n, uv, idx = uv_sphere(1.0, rings=8, segments=12)
    s.add_mesh(p, idx, normals=n, uvs=uv, material_id=m)
    sd = s.build()
    rng = np.random.default_rng(3)
    rd = rng.normal(size=(64, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    ro = -3.0 * rd
    hit = intersect_brute(sd.tris, jnp.asarray(ro), jnp.asarray(rd))
    hmask = np.asarray(hit.hit)
    assert hmask.any()
    t = np.asarray(hit.tangent)[hmask]
    b = np.asarray(hit.bitangent)[hmask]
    nn = np.asarray(hit.normal)[hmask]
    np.testing.assert_allclose((t * nn).sum(-1), 0.0, atol=1e-4)
    np.testing.assert_allclose((t * b).sum(-1), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.linalg.norm(t, axis=-1), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.linalg.norm(b, axis=-1), 1.0, atol=1e-4)
