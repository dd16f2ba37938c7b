"""Auxiliary subsystems: preview renderer, engine facade + observer restart,
film checkpointing, profiling, material preview, tonemap (SURVEY.md §5)."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from mc_path_tracer_tpu.models.camera import PerspectiveCamera
from mc_path_tracer_tpu.models.engine import (
    MODE_PATH_TRACER,
    MODE_RASTERIZER,
    RenderEngine,
    RenderSession,
)
from mc_path_tracer_tpu.models.film import Film, make_film, tile_grid
from mc_path_tracer_tpu.models.integrator import RenderConfig
from mc_path_tracer_tpu.models.preview import PREVIEW_MODES, render_preview
from mc_path_tracer_tpu.models.primitives import plane, uv_sphere
from mc_path_tracer_tpu.models.scene import Scene
from mc_path_tracer_tpu.ops import tonemap
from mc_path_tracer_tpu.utils.checkpoint import load_film, save_film
from mc_path_tracer_tpu.utils.profiling import RenderStats, Timings, rays_per_sample


def scene():
    s = Scene()
    s.set_environment_color((0.2, 0.3, 0.5), ls=1.0)
    floor = s.add_material(albedo=(0.6, 0.6, 0.6), roughness=0.8)
    p, n, uv, idx = plane(30.0)
    s.add_mesh(p, idx, normals=n, uvs=uv, material_id=floor)
    m = s.add_material(albedo=(0.8, 0.2, 0.2), roughness=0.3, metallic=0.5)
    p, n, uv, idx = uv_sphere(0.8, center=(0, 0.8, 0), rings=8, segments=16)
    s.add_mesh(p, idx, normals=n, uvs=uv, material_id=m)
    s.add_directional_light((0.4, 1.0, 0.2), ls=2.0)
    return s


CAM = PerspectiveCamera(position=np.array([0.4, 2.0, 4.0]),
                        target=np.array([0.0, 0.5, 0.0]))


def test_preview_modes_all_render():
    s = scene().build()
    for mode in PREVIEW_MODES:
        film = render_preview(s, CAM, 16, 12, mode)
        img = np.asarray(film.ld)
        assert img.shape == (12, 16, 3), mode
        assert np.isfinite(img).all(), mode
    # shaded preview must see the sphere (center differs from sky corner)
    shaded = np.asarray(render_preview(s, CAM, 32, 24, "shaded").ld)
    assert not np.allclose(shaded[12, 16], shaded[0, 0])


def test_engine_modes():
    e = RenderEngine()
    s = scene()
    f1 = e.render(s, CAM, 16, 12, MODE_RASTERIZER)
    f2 = e.render(s, CAM, 16, 12, MODE_PATH_TRACER,
                  cfg=RenderConfig(spp=2, max_depth=2))
    assert np.asarray(f1.ld).shape == np.asarray(f2.ld).shape


def test_engine_debug_and_wireframe_are_distinct_modes():
    """MODE_DEBUG is the single-bounce visualizer and MODE_WIREFRAME the
    barycentric wireframe — neither aliases another mode (VERDICT r2 #10)."""
    from mc_path_tracer_tpu.models.engine import MODE_DEBUG, MODE_WIREFRAME

    e = RenderEngine()
    s = scene()
    dbg = np.asarray(e.render(s, CAM, 24, 18, MODE_DEBUG).ld)
    wf = np.asarray(e.render(s, CAM, 24, 18, MODE_WIREFRAME).ld)
    nrm = np.asarray(render_preview(s, CAM, 24, 18, "normal").ld)
    shd = np.asarray(render_preview(s, CAM, 24, 18, "shaded").ld)
    assert np.isfinite(dbg).all() and np.isfinite(wf).all()
    assert not np.allclose(wf, nrm)     # wireframe != normal view
    assert not np.allclose(dbg, shd)    # debug != shaded preview
    # debug shows the env-pdf heat map on sky pixels: nonuniform sky
    assert dbg.std() > 0


def test_preview_shadow_darkens_occluded_floor():
    """The one-tap directional shadow darkens floor points under the sphere
    relative to open floor (the rasterizer's shadow maps equivalent)."""
    s = Scene()
    s.set_environment_color((0.0, 0.0, 0.0), ls=0.0)
    floor = s.add_material(albedo=(0.7, 0.7, 0.7), roughness=0.9)
    p, n, uv, idx = plane(30.0)
    s.add_mesh(p, idx, normals=n, uvs=uv, material_id=floor)
    m = s.add_material(albedo=(0.8, 0.2, 0.2), roughness=0.5)
    p, n, uv, idx = uv_sphere(0.8, center=(0, 1.2, 0), rings=10, segments=16)
    s.add_mesh(p, idx, normals=n, uvs=uv, material_id=m)
    s.add_directional_light((0.0, 1.0, 0.0), ls=3.0)  # straight down sun
    cam = PerspectiveCamera(position=np.array([0.0, 4.0, 5.0]),
                            target=np.array([0.0, 0.0, 0.0]))
    img = np.asarray(render_preview(s, cam, 48, 36, "shaded").ld)
    lum = img.sum(-1)
    # darkest floor pixel in the column under the sphere vs open floor
    c = lum[14:24, 22:26].min()
    o = lum[30, 4]
    assert c < 0.25 * o, (c, o)


def test_preview_irradiance_directional_env():
    """A sky bright only at +Y must light up-facing normals more than
    down-facing ones (the flat env *mean* could not; VERDICT r2 gap #4)."""
    from mc_path_tracer_tpu.models import lights as lights_mod
    from mc_path_tracer_tpu.models.preview import _irradiance

    tex = np.zeros((16, 32, 3), np.float32)
    tex[:4, :, :] = 5.0  # bright top rows (+Y in equirect)
    env = lights_mod.make_env_hdri(tex)
    n = jnp.asarray([[0.0, 1.0, 0.0], [0.0, -1.0, 0.0]], jnp.float32)
    e = np.asarray(_irradiance(env, n))
    assert e[0].sum() > 10.0 * max(e[1].sum(), 1e-6)


def test_preview_specular_ibl_metal_reflects_env():
    """A pure metal sphere under an HDRI must preview with visible env
    reflection (specular split-sum IBL; r3 VERDICT gap #1 — previously
    ambient was diffuse-only and metals went near-black)."""
    from mc_path_tracer_tpu.models.scene import Scene
    from mc_path_tracer_tpu.models.primitives import uv_sphere

    rng = np.random.default_rng(3)
    tex = (rng.uniform(0.2, 2.0, size=(16, 32, 3))).astype(np.float32)
    for metallic, rough in ((1.0, 0.1), (1.0, 0.8)):
        s = Scene()
        s.set_environment_hdr(tex, ls=1.0)
        m = s.add_material(albedo=(0.9, 0.9, 0.9), roughness=rough,
                           metallic=metallic)
        p, n, uv, idx = uv_sphere(1.0, rings=12, segments=24)
        s.add_mesh(p, idx, normals=n, uvs=uv, material_id=m)
        img = np.asarray(render_preview(s, CAM, 24, 18, "shaded").ld)
        center = img[6:12, 9:15].mean()
        assert center > 0.1, (metallic, rough, center)


def test_preview_prefilter_roughness_blurs():
    """Prefiltered specular: rougher lobes average the env (less extreme
    values) while near-mirror follows the exact lookup."""
    from mc_path_tracer_tpu.models import lights as lights_mod
    from mc_path_tracer_tpu.models.preview import _prefiltered_spec
    from mc_path_tracer_tpu.ops import envmap

    tex = np.zeros((16, 32, 3), np.float32)
    tex[6:10, :, :] = 8.0  # bright equator band (avoids pole-edge bilinear)
    env = lights_mod.make_env_hdri(tex)
    d = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)  # equirect (0.5, 0.5)
    sharp = np.asarray(
        _prefiltered_spec(env, d, jnp.asarray([0.05], jnp.float32)))
    blurry = np.asarray(
        _prefiltered_spec(env, d, jnp.asarray([1.0], jnp.float32)))
    exact = np.asarray(envmap.radiance(env.tex, d))
    # mirror end matches the exact equirect lookup; r=1 averages way down
    np.testing.assert_allclose(sharp[0], exact[0], rtol=0.05)
    assert blurry[0].mean() < 0.7 * sharp[0].mean()


def test_session_progressive_and_observer_restart():
    s = scene()
    ses = RenderSession(scene=s, camera=CAM, width=16, height=16,
                        cfg=RenderConfig(spp=4, max_depth=2), tile=16,
                        spp_per_pass=2)
    f1 = ses.step()
    assert float(np.asarray(f1.samples).max()) == 2
    f2 = ses.step()
    assert float(np.asarray(f2.samples).max()) == 4
    # editing the scene bumps version -> accumulation restarts
    s.add_directional_light((1, 1, 0), ls=1.0)
    f3 = ses.step()
    assert float(np.asarray(f3.samples).max()) == 2


def test_film_checkpoint_roundtrip():
    film = Film(
        ld=jnp.arange(2 * 3 * 3, dtype=jnp.float32).reshape(2, 3, 3),
        samples=jnp.full((2, 3), 5.0),
    )
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "film.npz")
        save_film(path, film, meta={"spp": 5})
        film2, meta = load_film(path)
    np.testing.assert_array_equal(np.asarray(film2.ld), np.asarray(film.ld))
    assert meta["spp"] == 5


def test_tile_grid_covers_film():
    tiles = list(tile_grid(100, 60, tile=32))
    area = sum(w * h for _, _, w, h in tiles)
    assert area == 100 * 60


def test_tonemap_matches_reference_formula():
    ld = jnp.asarray([[[2.0, 4.0, 0.0]]])
    samples = jnp.asarray([[2.0]])
    out = np.asarray(tonemap.reinhard(ld, samples, exposure=2.0))
    # c = ld/samples * exposure = (2,4,0); reinhard = c/(c+1)
    np.testing.assert_allclose(out, [[[2 / 3, 4 / 5, 0.0]]], rtol=1e-6)
    hm = np.asarray(tonemap.heatmap(ld, samples, 2.0))
    assert hm.shape == (1, 1, 3)
    assert np.isfinite(hm).all()


def test_profiling_utils():
    t = Timings()
    with t.section("build"):
        pass
    assert t.counts["build"] == 1
    assert rays_per_sample(5) == 12
    st = RenderStats(width=100, height=100, spp=10, max_depth=5, seconds=1.0)
    assert abs(st.mrays_per_s - 1.2) < 1e-6


def test_material_preview():
    from mc_path_tracer_tpu.models.matpreview import preview_material

    film = preview_material(size=24, spp=2)
    img = np.asarray(film.ld)
    assert img.shape == (24, 24, 3)
    assert np.isfinite(img).all()


def test_point_light_parity_stub():
    """PointLight is stored but does not illuminate (reference parity:
    PointLight has no device implementation, SURVEY.md §2c)."""
    s = scene()
    before = s.build()
    s.add_point_light((0, 3, 0), color=(1, 1, 1), ls=100.0)
    after = s.build()
    from mc_path_tracer_tpu.models import lights as lm

    assert lm.num_lights(before.lights) == lm.num_lights(after.lights)
    assert len(s.point_lights) == 1


def test_object_trs_transform_moves_sphere_between_renders():
    """set_transform re-bakes one object about its centroid and bumps the
    scene version (Transform.cu:48-67 + observer chain): the moved sphere
    shows up at its new position in the next render."""
    from mc_path_tracer_tpu.models.preview import render_preview

    s = Scene()
    s.set_environment_color((0.1, 0.1, 0.1), ls=1.0)
    m = s.add_material(albedo=(0.9, 0.2, 0.2))
    p, n, uv, idx = uv_sphere(0.6, center=(-1.5, 0.6, 0), rings=8, segments=12)
    obj = s.add_mesh(p, idx, normals=n, uvs=uv, material_id=m)
    cam = PerspectiveCamera(position=np.array([0.0, 1.0, 5.0]),
                            target=np.array([0.0, 0.6, 0.0]))
    v0 = s.version
    d_left = np.asarray(render_preview(s, cam, 32, 24, "depth").ld)[..., 0]
    s.set_transform(obj, translation=(3.0, 0.0, 0.0))  # move to the right
    assert s.version > v0
    d_right = np.asarray(render_preview(s, cam, 32, 24, "depth").ld)[..., 0]
    left_half = slice(None, 16)
    right_half = slice(16, None)
    assert (d_left[:, left_half] > 0).any()
    assert not (d_left[:, right_half] > 0).any()
    assert (d_right[:, right_half] > 0).any()
    assert not (d_right[:, left_half] > 0).any()


def test_object_trs_rotation_scale_about_centroid():
    """Rotation/scale pivot about the centroid: a unit sphere at an offset
    center keeps its center under rotation and doubles its extent under
    scale=2 (pivot invariance, Transform.cu centroid pivot)."""
    s = Scene()
    m = s.add_material()
    p, n, uv, idx = uv_sphere(0.5, center=(2.0, 1.0, 0.0), rings=8, segments=12)
    obj = s.add_mesh(p, idx, normals=n, uvs=uv, material_id=m)
    e = s.objects[obj]
    np.testing.assert_allclose(e.centroid, [2.0, 1.0, 0.0], atol=1e-2)
    base = e.bake()
    s.set_transform(obj, rotation_deg=(0, 0, 90))
    rot = s.objects[obj].bake()
    # rotation about its own centroid: every vertex keeps its distance to
    # the pivot (isometry about C)
    c = e.centroid
    d_base = np.sort(np.linalg.norm(np.asarray(base.v0) - c, axis=-1))
    d_rot = np.sort(np.linalg.norm(np.asarray(rot.v0) - c, axis=-1))
    np.testing.assert_allclose(d_rot, d_base, atol=1e-4)
    s.set_transform(obj, rotation_deg=(0, 0, 0), scale=2.0)
    big = s.objects[obj].bake()
    ext_b = np.asarray(base.v0).max(0) - np.asarray(base.v0).min(0)
    ext_s = np.asarray(big.v0).max(0) - np.asarray(big.v0).min(0)
    np.testing.assert_allclose(ext_s, 2.0 * ext_b, rtol=0.05)
    # normals stay unit under anisotropic scale
    s.set_transform(obj, scale=(3.0, 1.0, 1.0))
    aniso = s.objects[obj].bake()
    nn = np.asarray(aniso.n0)
    np.testing.assert_allclose(np.linalg.norm(nn, axis=-1), 1.0, atol=1e-4)


def test_scene_build_cache_and_camera_notify():
    """Camera-only notify (content=False) restarts accumulation without a
    rebuild; content edits invalidate the cached SceneData (ADVICE r3
    medium: the fly-cam paid a full BVH rebuild per input tick)."""
    s = scene()
    d1 = s.build()
    v0 = s.version
    assert s.build() is d1            # cached
    s.notify(content=False)           # camera move
    assert s.version == v0 + 1
    assert s.build() is d1            # still cached: no geometry change
    s.add_directional_light((0, 1, 0), ls=1.0)  # content edit
    d2 = s.build()
    assert d2 is not d1               # cache invalidated
    assert s.build() is d2
