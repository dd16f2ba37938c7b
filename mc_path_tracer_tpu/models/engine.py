"""RenderEngine facade + interactive render session.

Mirrors the reference's top-level flow (RenderEngine.{h,cpp} +
RenderWindow.cpp): a single `render(scene, camera, film, mode)` entry that
dispatches to the rasterizer-preview, the wavefront path tracer, or the
debug visualizer, plus a `RenderSession` carrying the Subject/Observer
progressive-restart semantics — any scene/camera edit clears the film
accumulation (Subject::notify -> Film::update -> Film::clear,
Film.cu:278-281).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax

from mc_path_tracer_tpu.models.film import Film, make_film
from mc_path_tracer_tpu.models.integrator import RenderConfig, render as pt_render
from mc_path_tracer_tpu.models.preview import render_debug, render_preview

MODE_RASTERIZER = "rasterizer"     # RenderWindow menu: "OpenGL Rasterizer"
MODE_PATH_TRACER = "path_tracer"   # "MC Path Tracer"
MODE_DEBUG = "debug"               # "Debug PT": single-bounce visualizer
MODE_WIREFRAME = "wireframe"       # "Wireframe": barycentric-edge wireframe


class RenderEngine:
    """Stateless dispatch facade (RenderEngine::render, RenderEngine.cpp:13-28)."""

    def render(
        self,
        scene,
        camera,
        width: int,
        height: int,
        mode: str = MODE_PATH_TRACER,
        cfg: RenderConfig = RenderConfig(),
        key=None,
    ) -> Film:
        if mode == MODE_RASTERIZER:
            return render_preview(scene, camera, width, height, "shaded")
        if mode == MODE_WIREFRAME:
            return render_preview(scene, camera, width, height, "wireframe")
        if mode == MODE_DEBUG:
            return render_debug(scene, camera, width, height)
        if mode == MODE_PATH_TRACER:
            return pt_render(scene, camera, width, height, cfg, key=key)
        raise ValueError(f"unknown render mode {mode!r}")


@dataclass
class RenderSession:
    """Progressive interactive session with edit-restart observer semantics.

    step() advances one tile-pass (the reference's one-wavefront-per-frame
    loop); if the scene's version changed since the last step, accumulation
    restarts from a cleared film — exactly the Camera/Scene/Light Subject ->
    Film Observer chain of the reference.
    """

    scene: object
    camera: object
    width: int
    height: int
    cfg: RenderConfig = field(default_factory=RenderConfig)
    tile: int = 256
    spp_per_pass: int = 1
    _film: Film | None = None
    _observed_version: int = -1
    _gen: object = None

    def _restart(self):
        from mc_path_tracer_tpu.models.integrator import render_progressive

        self._film = make_film(self.width, self.height)
        self._observed_version = getattr(self.scene, "version", 0)
        self._gen = render_progressive(
            self.scene,
            self.camera,
            self.width,
            self.height,
            self.cfg,
            key=jax.random.PRNGKey(self._observed_version),
            tile=self.tile,
            spp_per_pass=self.spp_per_pass,
        )

    def step(self) -> Film:
        version = getattr(self.scene, "version", 0)
        if self._gen is None or version != self._observed_version:
            self._restart()  # Film::clear on notify
        try:
            self._film = next(self._gen)
        except StopIteration:
            pass  # fully converged at cfg.spp; keep returning the final film
        return self._film

    @property
    def film(self) -> Film:
        if self._film is None:
            self._film = make_film(self.width, self.height)
        return self._film
