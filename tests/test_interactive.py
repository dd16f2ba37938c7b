"""Interactive layer: fly-cam, arcball object edit, viewer event loop
(Camera.cu:62-94, SceneViewWindow.cpp:89-104, ObjectEditWindow.cpp:47-205,
RenderWindow.cpp:11-56 capabilities, headless)."""

import numpy as np

from mc_path_tracer_tpu.models.interactive import (
    Arcball,
    FlyCamera,
    InteractiveViewer,
    ObjectEditSession,
    frame_to_ansi,
)


def _scene():
    from mc_path_tracer_tpu.models.primitives import uv_sphere
    from mc_path_tracer_tpu.models.scene import Scene

    s = Scene()
    s.set_environment_color((0.4, 0.5, 0.7), ls=1.0)
    m = s.add_material(albedo=(0.8, 0.5, 0.3), roughness=0.6)
    p, n, uv, idx = uv_sphere(1.0, rings=8, segments=12)
    s.add_mesh(p, idx, normals=n, uvs=uv, material_id=m)
    s.add_directional_light((0.3, 1.0, 0.2), ls=2.0)
    return s


def test_flycam_moves_along_look_frame():
    f = FlyCamera(position=np.array([0.0, 0.0, 5.0]), yaw_deg=-90.0)
    assert np.allclose(f.front, [0, 0, -1], atol=1e-6)
    f.process_keyboard("w", dt=1.0)
    assert f.position[2] < 5.0 - 2.0          # moved forward by velocity*dt
    f.process_keyboard("d", dt=1.0)
    assert f.position[0] > 1.0                # right of -z look is +x
    moved = f.process_mouse(900.0, 0.0)       # yaw 90 deg at 0.1 sens
    assert moved and np.allclose(f.front, [1, 0, 0], atol=1e-5)


def test_flycam_pitch_clamped():
    f = FlyCamera()
    f.process_mouse(0.0, 1e6)
    assert f.pitch_deg == 89.0
    cam = f.camera(aspect=2.0)
    assert cam.aspect == 2.0
    assert np.allclose(cam.target, np.asarray(cam.position) + f.front)


def test_arcball_quarter_turn_and_accumulation():
    a = Arcball()
    r1 = a.drag(0.0, 0.0, 1.0, 0.0).copy()
    assert np.allclose(r1 @ r1.T, np.eye(3), atol=1e-6)      # orthonormal
    assert abs(np.linalg.det(r1) - 1.0) < 1e-6
    # a second opposite drag undoes the first
    a.drag(1.0, 0.0, 0.0, 0.0)
    assert np.allclose(a.rotation, np.eye(3), atol=1e-6)


def test_object_edit_session_bumps_version_and_moves_mesh():
    s = _scene()
    v0 = s.version
    sess = ObjectEditSession(s, obj_id=0)
    sess.rotate_drag(0.0, 0.0, 0.5, 0.0)
    assert s.version > v0
    b0 = np.asarray(s.objects[0].bake().v0).copy()
    sess.pan_drag(1.0, 0.0)
    b1 = np.asarray(s.objects[0].bake().v0)
    assert not np.allclose(b0, b1)            # actually translated


def test_viewer_event_loop_restarts_accumulation():
    from mc_path_tracer_tpu.models.integrator import RenderConfig

    s = _scene()
    v = InteractiveViewer(s, width=16, height=16,
                          cfg=RenderConfig(spp=4, max_depth=2))
    v.step()
    v.step()
    spp_before = float(np.asarray(v.session.film.samples).max())
    assert spp_before >= 2.0
    assert v.handle_events(keys=["w"])        # camera moved
    v.step()                                  # restart -> fresh accumulation
    spp_after = float(np.asarray(v.session.film.samples).max())
    assert spp_after == 1.0
    # no-op events do not restart
    assert not v.handle_events(keys=["z"], mouse=(0.0, 0.0))
    f = v.frame()
    assert f.shape == (16, 16, 3) and f.dtype == np.uint8
    ansi = frame_to_ansi(f)
    assert "\x1b[38;2;" in ansi and ansi.count("\n") == 7
