"""Shared test utilities: CPU-MuJoCo oracle plumbing.

MuJoCo here is the *oracle only* (the reference delegates all physics to it,
``/root/reference/src/envs/quadruped.py:165``); the framework under test never
calls it at runtime.
"""

from __future__ import annotations

import numpy as np

from .models.spec import ASSETS_DIR, DEFAULT_SCENE, get_model

__all__ = [
    "DEFAULT_SCENE",
    "ASSETS_DIR",
    "get_model",
    "load_mj",
    "random_airborne_state",
    "random_grounded_state",
]


def load_mj(xml_path: str = DEFAULT_SCENE):
    import mujoco

    m = mujoco.MjModel.from_xml_path(xml_path)
    return m, mujoco.MjData(m)


def random_airborne_state(mj, d, rng: np.random.Generator, height=1.5, vel_scale=1.0):
    """Random in-joint-range state with the robot high above the floor
    (no contacts, no active limits for in-range draws)."""
    import mujoco

    d.qpos[:] = mj.qpos0
    d.qpos[0:2] = rng.uniform(-0.5, 0.5, 2)
    d.qpos[2] = height
    q = rng.normal(size=4)
    d.qpos[3:7] = q / np.linalg.norm(q)
    d.qpos[7:] = rng.uniform(mj.jnt_range[1:, 0] * 0.9, mj.jnt_range[1:, 1] * 0.9)
    d.qvel[:] = rng.normal(size=mj.nv) * vel_scale
    d.act[:] = rng.uniform(-1, 1, mj.na)
    d.ctrl[:] = rng.uniform(mj.actuator_ctrlrange[:, 0], mj.actuator_ctrlrange[:, 1])
    mujoco.mj_forward(mj, d)


def random_grounded_state(mj, d, rng: np.random.Generator, settle_steps=150):
    """A physically settled state on the floor, after random actuation."""
    import mujoco

    mujoco.mj_resetData(mj, d)
    d.qpos[:] = mj.qpos0
    d.ctrl[:] = np.array([0.0, 0.0, -0.5] * 4)
    for i in range(settle_steps):
        if i % 25 == 0:
            d.ctrl[:] = rng.uniform(
                mj.actuator_ctrlrange[:, 0], mj.actuator_ctrlrange[:, 1]
            )
        mujoco.mj_step(mj, d)
    mujoco.mj_forward(mj, d)
