"""Host-side visualization: offscreen/interactive rendering + video capture.

Rendering is explicitly host-side, non-perf-critical tooling (SURVEY.md
§2.2): a CPU MuJoCo ``Renderer`` visualizes states produced by the JAX
engine (the simulator itself never calls MuJoCo). Mirrors the reference's
render stack: sim-time-gated frame pacing, camera follow, debug
arrows/points via mjv_connector/mjv_initGeom, mp4 capture, and a "human"
mode paced to wall-clock (``quadruped.py:184-306``).

OpenCV is optional; without it, video saving is disabled and "human" mode
raises.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import numpy as np

try:
    import cv2

    HAVE_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    HAVE_CV2 = False


class WireframeRenderer:
    """Dependency-free software renderer: pinhole projection + cv2 lines.

    Fallback when no GL backend exists (headless containers without
    EGL/OSMesa): draws the ground grid, the robot's kinematic tree as a
    colored skeleton, foot markers, and the env's debug arrows/points —
    enough to SEE a gait in the recorded mp4, which is the point of the
    reference's eval videos (train_quadruped.py:171-193)."""

    FOVY = 45.0

    def __init__(self, model, width: int, height: int):
        self.model = model
        self.width = width
        self.height = height
        # precompute kinematic-tree edges (parent body -> body); world-rooted
        # edges are skipped here so render() draws only intra-robot links
        self.edges = [
            (int(model.body_parentid[b]), b)
            for b in range(1, model.nbody)
            if model.body_parentid[b] != 0
        ]
        import mujoco

        self._foot_geoms = [
            g for g in range(model.ngeom)
            if model.geom_type[g] == mujoco.mjtGeom.mjGEOM_MESH
            and "foot" in (model.geom(g).name or "")
        ]

    def _camera_frame(self, camera):
        az = np.radians(camera.azimuth)
        el = np.radians(camera.elevation)
        fwd = np.array([
            np.cos(el) * np.cos(az), np.cos(el) * np.sin(az), np.sin(el)
        ])
        lookat = np.asarray(camera.lookat, np.float64)
        pos = lookat - camera.distance * fwd
        z = fwd / np.linalg.norm(fwd)  # camera looks along +z_cam
        up = np.array([0.0, 0.0, 1.0])
        x = np.cross(z, up)  # screen right
        n = np.linalg.norm(x)
        x = x / (n if n > 1e-9 else 1.0)
        y = np.cross(z, x)  # screen DOWN (right-handed with z forward)
        R = np.stack([x, y, z])  # world -> cam rows
        return R, pos

    def _project(self, R, campos, pts):
        pc = (np.atleast_2d(pts) - campos) @ R.T
        f = 0.5 * self.height / np.tan(np.radians(self.FOVY) / 2)
        zs = np.maximum(pc[:, 2], 1e-3)
        u = self.width / 2 + f * pc[:, 0] / zs
        v = self.height / 2 + f * pc[:, 1] / zs  # y_cam already points down
        valid = pc[:, 2] > 0.05
        return np.stack([u, v], 1), valid

    @staticmethod
    def _c(color):
        c = (np.clip(np.asarray(color, np.float64)[:3], 0, 1) * 255)
        return int(c[2]), int(c[1]), int(c[0])  # BGR

    def render(self, data, camera, extra=()):
        img = np.full((self.height, self.width, 3), 250, np.uint8)
        R, campos = self._camera_frame(camera)

        def line(a, b, color, w=1):
            p, ok = self._project(R, campos, np.stack([a, b]))
            if ok.all():
                cv2.line(img, tuple(p[0].astype(int)), tuple(p[1].astype(int)),
                         color, w, cv2.LINE_AA)

        # ground grid (0.1 m cells) around the camera target
        cx, cy = np.round(np.asarray(camera.lookat[:2], np.float64), 1)
        rng = np.arange(-0.5, 0.51, 0.1)
        for g in rng:
            line([cx + g, cy - 0.5, 0], [cx + g, cy + 0.5, 0], (210, 210, 210))
            line([cx - 0.5, cy + g, 0], [cx + 0.5, cy + g, 0], (210, 210, 210))

        # skeleton: one color per leg chain, black base
        xpos = np.asarray(data.xpos)
        leg_colors = [(180, 90, 30), (30, 90, 180), (30, 160, 30), (140, 30, 150)]
        for parent, b in self.edges:
            # color by leg: bodies are laid out base, then 3 per leg
            leg = (b - 2) // 3 if b >= 2 else -1
            color = leg_colors[leg % 4] if leg >= 0 else (40, 40, 40)
            line(xpos[parent], xpos[b], color, 2)

        # base heading triad
        xmat = np.asarray(data.xmat[1]).reshape(3, 3)
        base = xpos[1]
        line(base, base + 0.08 * xmat[:, 0], (0, 0, 220), 2)   # x: red
        line(base, base + 0.08 * xmat[:, 2], (220, 80, 0), 2)  # z: blue

        # feet markers
        for g in self._foot_geoms:
            p, ok = self._project(R, campos, np.asarray(data.geom_xpos[g]))
            if ok[0]:
                cv2.circle(img, tuple(p[0].astype(int)), 4, (30, 30, 30), -1,
                           cv2.LINE_AA)

        # debug geoms queued by render_vector/render_point
        for item in extra:
            if item[0] == "vec":
                _, origin, endpoint, color = item
                line(origin, endpoint, self._c(color), 2)
            else:
                _, pos, color, radius = item
                p, ok = self._project(R, campos, np.asarray(pos, np.float64))
                if ok[0]:
                    cv2.circle(img, tuple(p[0].astype(int)), 5,
                               self._c(color), -1, cv2.LINE_AA)

        cv2.putText(img, f"t={data.time:6.2f}s  z={data.qpos[2]:.3f}",
                    (8, 16), cv2.FONT_HERSHEY_SIMPLEX, 0.45, (60, 60, 60), 1,
                    cv2.LINE_AA)
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


class HostRenderer:
    """Wraps mujoco.Renderer over a host mirror of the JAX state.

    Without a GL backend it degrades to the software ``WireframeRenderer``
    instead of disabling rendering, so eval videos exist on any host."""

    def __init__(
        self,
        xml_path: str,
        width: int = 720,
        height: int = 480,
        render_fps: int = 30,
        save_video: bool = False,
        video_path: str = "videos/simulation.mp4",
    ):
        import mujoco

        self._mujoco = mujoco
        self.model = mujoco.MjModel.from_xml_path(xml_path)
        self.data = mujoco.MjData(self.model)
        self.width = width
        self.height = height
        self.render_fps = render_fps
        self.renderer = None  # lazy (quadruped.py:271-272)
        self.save_video = save_video
        self.video_path = video_path
        self.video_writer = None
        self._frame_count = 0
        self._sim_start_time = None

        self.camera = mujoco.MjvCamera()
        self.camera.distance = 1.0
        self.camera.elevation = -30
        self.camera.azimuth = 120

        self.scene_option = mujoco.MjvOption()
        self.scene_option.flags[mujoco.mjtVisFlag.mjVIS_JOINT] = False
        self.scene_option.flags[mujoco.mjtVisFlag.mjVIS_CONTACTPOINT] = False
        self.scene_option.frame = mujoco.mjtFrame.mjFRAME_SITE
        self.scene_option.geomgroup[:] = 1

    # -- state sync ---------------------------------------------------------

    def sync(self, qpos: np.ndarray, qvel: Optional[np.ndarray] = None, time_: float = 0.0):
        """Mirror a JAX engine state into the host MjData (viz only)."""
        self.data.qpos[:] = np.asarray(qpos)
        if qvel is not None:
            self.data.qvel[:] = np.asarray(qvel)
        self.data.time = float(time_)
        self._mujoco.mj_forward(self.model, self.data)

    def reset_timers(self, human: bool = False):
        self._frame_count = 0
        if human:
            self._sim_start_time = time.time()
        if self.save_video and self.video_writer is None:
            if not HAVE_CV2:
                raise RuntimeError("video capture requires OpenCV")
            fourcc = cv2.VideoWriter_fourcc(*"mp4v")
            self.video_writer = cv2.VideoWriter(
                self.video_path, fourcc, self.render_fps, (self.width, self.height)
            )

    # -- debug geoms (quadruped.py:184-232) ----------------------------------

    def render_vector(self, origin, vector, color, scale=0.2, radius=0.005, offset=0.0):
        mujoco = self._mujoco
        origin = np.asarray(origin, dtype=np.float64).copy() + np.array([0, 0, offset])
        endpoint = origin + np.asarray(vector, dtype=np.float64) * scale
        if getattr(self, "_wire", None) is not None:
            self._extra.append(("vec", origin, endpoint, color))
            return
        scn = self.renderer.scene
        if scn.ngeom >= scn.maxgeom:
            return
        idx = scn.ngeom
        rgba = np.asarray(color, dtype=np.float32)
        mujoco.mjv_initGeom(
            scn.geoms[idx], mujoco.mjtGeom.mjGEOM_ARROW1,
            np.zeros(3), np.zeros(3), np.zeros(9), rgba,
        )
        mujoco.mjv_connector(
            scn.geoms[idx], mujoco.mjtGeom.mjGEOM_ARROW1, radius, origin, endpoint
        )
        scn.ngeom += 1

    def render_point(self, position, color, radius=0.01):
        mujoco = self._mujoco
        if getattr(self, "_wire", None) is not None:
            self._extra.append(("point", position, color, radius))
            return
        scn = self.renderer.scene
        if scn.ngeom >= scn.maxgeom:
            return
        idx = scn.ngeom
        rgba = np.asarray(color, dtype=np.float32)
        size = np.array([radius] * 3)
        mujoco.mjv_initGeom(
            scn.geoms[idx], mujoco.mjtGeom.mjGEOM_SPHERE, size,
            np.asarray(position, dtype=np.float64), np.eye(3).reshape(9), rgba,
        )
        scn.ngeom += 1

    # -- frame production (quadruped.py:250-306) ------------------------------

    def render(
        self,
        mode: Optional[str],
        custom_geoms: Optional[Callable[["HostRenderer"], None]] = None,
    ):
        if mode is None:
            return None
        expected = int(self.data.time * self.render_fps)
        if self._frame_count >= expected:
            return None
        self._frame_count += 1

        if self.renderer is None and getattr(self, "_wire", None) is None:
            try:
                self.renderer = self._mujoco.Renderer(
                    self.model, width=self.width, height=self.height
                )
            except Exception as e:  # headless host without GL/EGL/OSMesa
                import warnings

                warnings.warn(
                    f"no GL backend ({e!r}); falling back to the software "
                    "wireframe renderer",
                    RuntimeWarning,
                    stacklevel=2,
                )
                self._wire = WireframeRenderer(
                    self.model, self.width, self.height
                )

        self.camera.lookat[:] = self.data.qpos[:3]
        if getattr(self, "_wire", None) is not None:
            self._extra = []
            if custom_geoms is not None:
                custom_geoms(self)
            pixels = self._wire.render(self.data, self.camera, self._extra)
        else:
            self.renderer.update_scene(
                self.data, scene_option=self.scene_option, camera=self.camera
            )
            if custom_geoms is not None:
                custom_geoms(self)

            pixels = self.renderer.render()
        if (self.save_video and self.video_writer is not None) or mode == "human":
            if not HAVE_CV2:
                raise RuntimeError("human mode / video requires OpenCV")
            pixels_bgr = cv2.cvtColor(pixels, cv2.COLOR_RGB2BGR)
            if self.save_video and self.video_writer is not None:
                self.video_writer.write(pixels_bgr)

        if mode == "rgb_array":
            return pixels
        if mode == "human":
            if self._sim_start_time is None:
                self._sim_start_time = time.time()
            wait = self._sim_start_time + self.data.time - time.time()
            if wait > 0:
                time.sleep(wait)
            cv2.imshow("Simulation", pixels_bgr)
            cv2.waitKey(1)
            return None
        return None

    def close(self):
        if self.renderer is not None:
            self.renderer.close()
            self.renderer = None
        if self.video_writer is not None:
            self.video_writer.release()
            self.video_writer = None
        if HAVE_CV2:
            cv2.destroyAllWindows()
