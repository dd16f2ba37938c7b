"""Area-light (emissive mesh) tests — config 2 of BASELINE.md: MIS of BRDF
vs light sampling with an area light.  Verified against an independent
surface-quadrature evaluation of the direct-lighting integral."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mc_path_tracer_tpu.models import lights as lm
from mc_path_tracer_tpu.models.camera import PerspectiveCamera, gen_camera_rays
from mc_path_tracer_tpu.models.integrator import RenderConfig, render, trace_radiance
from mc_path_tracer_tpu.models.primitives import plane
from mc_path_tracer_tpu.models.scene import Scene
from mc_path_tracer_tpu.ops import brdf

EMIT = np.array([4.0, 3.0, 2.0], np.float32)


def area_scene(rough=1.0, metal=0.0):
    """Lambertian/GGX floor + 1x1 emissive quad at y=2 facing down, black env."""
    s = Scene()
    s.set_environment_color((0, 0, 0), ls=0.0)
    floor = s.add_material(albedo=(0.7, 0.5, 0.3), roughness=rough, metallic=metal)
    p, n, uv, idx = plane(20.0)
    s.add_mesh(p, idx, normals=n, uvs=uv, material_id=floor)
    em = s.add_material(albedo=(0, 0, 0), roughness=1.0, emissive=EMIT)
    # quad at y=2 facing down (-y): swap winding of an up-facing plane
    q = np.array([[-0.5, 2, -0.5], [0.5, 2, -0.5], [0.5, 2, 0.5], [-0.5, 2, 0.5]],
                 np.float32)
    qidx = np.array([[0, 1, 2], [0, 2, 3]])  # CCW seen from below -> normal -y
    s.add_mesh(q, qidx, normals=np.tile([[0, -1, 0]], (4, 1)).astype(np.float32),
               material_id=em)
    return s


def quadrature_direct(x, wo, mat_albedo, rough, metal, n_grid=64):
    """Independent evaluation of L = int_A f(wi) * Le * cos_l / d^2 dA over
    the quad, using the brdf module but none of the sampling machinery."""
    xs = (np.arange(n_grid) + 0.5) / n_grid - 0.5
    zs = (np.arange(n_grid) + 0.5) / n_grid - 0.5
    gx, gz = np.meshgrid(xs, zs)
    pts = np.stack([gx.ravel(), np.full(gx.size, 2.0), gz.ravel()], axis=-1)
    d = pts - x
    dist2 = (d * d).sum(-1)
    wi = d / np.sqrt(dist2)[:, None]
    cos_l = np.maximum(-wi @ np.array([0, -1.0, 0]) * -1.0, 0.0)  # n_l=-y: cos = (-wi).(-y)
    cos_l = np.maximum(wi[:, 1], 0.0)  # equivalent: wi points up toward quad
    nrm = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (pts.shape[0], 3))
    m = brdf.MaterialParams(
        albedo=jnp.broadcast_to(jnp.asarray(mat_albedo), (pts.shape[0], 3)),
        roughness=jnp.full((pts.shape[0],), rough),
        metallic=jnp.full((pts.shape[0],), metal),
        fresnel=jnp.full((pts.shape[0], 3), 0.04),
    )
    f = np.asarray(
        brdf.mixture_f(m, nrm, jnp.asarray(wi, jnp.float32),
                       jnp.broadcast_to(jnp.asarray(wo, jnp.float32), (pts.shape[0], 3)))
    )
    da = 1.0 / (n_grid * n_grid)
    contrib = f * (EMIT[None] * (cos_l / dist2)[:, None]) * da
    return contrib.sum(0)


def test_area_tables_built():
    sd = area_scene().build()
    assert sd.lights.area.count == 2
    np.testing.assert_allclose(float(sd.lights.area.total_area), 1.0, rtol=1e-5)
    assert lm.num_lights(sd.lights) == 2  # env + area
    assert lm.area_light_id(sd.lights) == 1


def test_sample_area_pdf_consistency():
    """E[cos_x / pdf] over light samples = geometric solid-angle-weighted
    integral, cross-checked against quadrature."""
    sd = area_scene().build()
    area = sd.lights.area
    x = jnp.asarray([[0.3, 0.0, 0.1]])
    n = 20000
    u = jax.random.uniform(jax.random.PRNGKey(0), (n, 3))
    wi, dist, li, pdf = lm.sample_area(
        area, sd.tris, jnp.broadcast_to(x, (n, 3)), u
    )
    est = np.asarray(jnp.mean(li / jnp.maximum(pdf, 1e-12)[:, None], axis=0))
    # quadrature of Le * cos_l / d^2 dA
    xs = (np.arange(128) + 0.5) / 128 - 0.5
    gx, gz = np.meshgrid(xs, xs)
    pts = np.stack([gx.ravel(), np.full(gx.size, 2.0), gz.ravel()], -1)
    d = pts - np.asarray(x)[0]
    dist2 = (d * d).sum(-1)
    cos_l = np.maximum(d[:, 1] / np.sqrt(dist2), 0)
    truth = EMIT * (cos_l / dist2).sum() / (128 * 128)
    np.testing.assert_allclose(est, truth, rtol=0.02)


def test_area_light_direct_matches_quadrature():
    """Rendered direct lighting under the emissive quad matches the
    independent surface quadrature (MIS combined estimator, depth 2)."""
    s = area_scene()
    cam = PerspectiveCamera(position=np.array([0.6, 3.0, 2.5]),
                            target=np.array([0.0, 0.0, 0.0]), fov_deg=35.0)
    sd = s.build()
    cam1 = dataclasses.replace(cam, aspect=1.0).params()
    # center pixel ray of an 8x8 film
    ro, rd = gen_camera_rays(cam1, 8, 8, jnp.array([3.0]), jnp.array([3.0]),
                             jnp.zeros((1, 2)))
    h = None
    from mc_path_tracer_tpu.ops.intersect import intersect_bvh

    h = intersect_bvh(sd.bvh, sd.tris, ro, rd)
    assert bool(h.hit[0]) and int(h.material_id[0]) == 0  # floor
    x = np.asarray(h.position[0])
    wo = -np.asarray(rd[0])
    truth = quadrature_direct(x, wo, (0.7, 0.5, 0.3), 1.0, 0.0)

    nrep = 4096
    ro_r = jnp.broadcast_to(ro, (nrep, 3))
    rd_r = jnp.broadcast_to(rd, (nrep, 3))
    cfg = RenderConfig(spp=1, max_depth=2)
    vals = np.asarray(
        jax.jit(trace_radiance, static_argnames="cfg")(
            sd, ro_r, rd_r, jax.random.PRNGKey(3), cfg
        )
    )
    est = vals.mean(0)
    np.testing.assert_allclose(est, truth, rtol=0.08)


def test_emissive_visible_to_camera():
    """Radiant objects are visible in the render (primary-hit emission)."""
    s = area_scene()
    cam = PerspectiveCamera(position=np.array([0.05, 0.5, 0.08]),
                            target=np.array([0.0, 2.0, 0.0]), fov_deg=45.0,
                            up=np.array([0.0, 0.0, 1.0]))
    film = render(s, cam, 16, 16, RenderConfig(spp=4, max_depth=2),
                  key=jax.random.PRNGKey(0))
    img = np.asarray(film.radiance_mean())
    # looking straight up at the emissive underside: center pixels see it at
    # full emission
    assert img.max() >= EMIT.max() * 0.9


def test_mis_consistent_across_roughness():
    """MIS estimator remains unbiased for glossy floors: estimate matches
    quadrature for a rough=0.3 GGX floor too."""
    s = area_scene(rough=0.3)
    sd = s.build()
    cam = PerspectiveCamera(position=np.array([0.6, 3.0, 2.5]),
                            target=np.array([0.0, 0.0, 0.0]), fov_deg=35.0)
    cam1 = dataclasses.replace(cam, aspect=1.0).params()
    ro, rd = gen_camera_rays(cam1, 8, 8, jnp.array([3.0]), jnp.array([3.0]),
                             jnp.zeros((1, 2)))
    from mc_path_tracer_tpu.ops.intersect import intersect_bvh

    h = intersect_bvh(sd.bvh, sd.tris, ro, rd)
    x = np.asarray(h.position[0])
    wo = -np.asarray(rd[0])
    truth = quadrature_direct(x, wo, (0.7, 0.5, 0.3), 0.3, 0.0, n_grid=96)
    nrep = 8192
    vals = np.asarray(
        jax.jit(trace_radiance, static_argnames="cfg")(
            sd,
            jnp.broadcast_to(ro, (nrep, 3)),
            jnp.broadcast_to(rd, (nrep, 3)),
            jax.random.PRNGKey(9),
            RenderConfig(spp=1, max_depth=2),
        )
    )
    est = vals.mean(0)
    np.testing.assert_allclose(est, truth, rtol=0.12)
