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


class HostRenderer:
    """Wraps mujoco.Renderer over a host mirror of the JAX state."""

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

        if self.renderer is None:
            if getattr(self, "_gl_failed", False):
                return None
            try:
                self.renderer = self._mujoco.Renderer(
                    self.model, width=self.width, height=self.height
                )
            except Exception as e:  # headless host without GL/EGL/OSMesa
                import warnings

                warnings.warn(
                    f"offscreen rendering unavailable (no GL backend): {e!r}; "
                    "render() will return None",
                    RuntimeWarning,
                    stacklevel=2,
                )
                self._gl_failed = True
                return None

        self.camera.lookat[:] = self.data.qpos[:3]
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
