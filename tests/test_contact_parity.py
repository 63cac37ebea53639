"""Parity of the full contact pipeline (collision -> constraints -> Newton
solver -> integrate) vs CPU MuJoCo.

The soft-constraint problem is strictly convex, so the solver must reproduce
MuJoCo's qacc to solver tolerance; single-point contact trajectories
(standing, settling) are bit-exact. Multi-contact selection is calibrated
(not bit-identical, see quadruped_gym_tpu/physics/collision.py), so
contact-rich flailing diverges slowly — the test bounds that drift.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from quadruped_gym_tpu.physics import engine
from quadruped_gym_tpu.testing import get_model, load_mj

PM = get_model()


@pytest.fixture(scope="module")
def mjpair():
    return load_mj()


def _state_from(d):
    return engine.State(
        qpos=jnp.array(d.qpos),
        qvel=jnp.array(d.qvel),
        act=jnp.array(d.act),
        time=jnp.array(d.time),
        sensordata=jnp.zeros(PM.nsensordata),
    )


def test_standing_forward_parity(mjpair):
    mj, d = mjpair
    mujoco.mj_resetData(mj, d)
    d.qpos[:] = mj.qpos0
    d.ctrl[:] = np.array([0, 0, -0.5] * 4)
    for _ in range(300):
        mujoco.mj_step(mj, d)
    mujoco.mj_forward(mj, d)
    assert d.ncon == 4  # one support contact per foot

    fwd = engine.forward(PM, _state_from(d), jnp.array(d.ctrl))
    assert int(fwd.ncon_active) == d.nefc
    np.testing.assert_allclose(np.asarray(fwd.qacc), d.qacc, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(fwd.qfrc_constraint), d.qfrc_constraint, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(fwd.sensordata), d.sensordata, atol=1e-9
    )


def test_joint_limit_parity(mjpair):
    mj, d = mjpair
    mujoco.mj_resetData(mj, d)
    d.qpos[:] = mj.qpos0
    d.qpos[2] = 1.0
    d.qpos[7] = mj.jnt_range[1][0] - 0.013  # violate hip_1 lower limit
    d.qvel[:] = 0.3
    d.ctrl[:] = np.array([0.2, -0.3, 0.5] * 4)
    mujoco.mj_forward(mj, d)
    assert d.nefc == 1

    fwd = engine.forward(PM, _state_from(d), jnp.array(d.ctrl))
    assert int(fwd.ncon_active) == 1
    np.testing.assert_allclose(np.asarray(fwd.qacc), d.qacc, atol=1e-9)


@pytest.mark.slow
def test_settle_trajectory_bit_parity(mjpair):
    """Drop from qpos0, land, settle: 300 steps bit-exact (single-point
    contacts follow the oracle exactly)."""
    mj, d = mjpair
    mujoco.mj_resetData(mj, d)
    d.qpos[:] = mj.qpos0
    d.ctrl[:] = np.array([0, 0, -0.5] * 4)

    stepj = jax.jit(lambda s, c: engine.step(PM, s, c))
    st = _state_from(d)
    ctrl = jnp.array(d.ctrl)
    for _ in range(300):
        mujoco.mj_step(mj, d)
        st = stepj(st, ctrl)
    np.testing.assert_allclose(np.asarray(st.qpos), d.qpos, atol=1e-12)
    np.testing.assert_allclose(np.asarray(st.qvel), d.qvel, atol=1e-11)
    np.testing.assert_allclose(
        np.asarray(st.sensordata), d.sensordata, atol=1e-10
    )


def test_random_actuation_bounded_divergence(mjpair):
    """Contact-rich random flailing: multi-contact selection is calibrated,
    not bit-identical, so trajectories may diverge slowly; body position
    drift must stay within millimetres over 400 steps (0.8 s)."""
    mj, d = mjpair
    rng = np.random.default_rng(11)
    mujoco.mj_resetData(mj, d)
    d.qpos[:] = mj.qpos0
    d.ctrl[:] = np.array([0, 0, -0.5] * 4)

    stepj = jax.jit(lambda s, c: engine.step(PM, s, c))
    st = _state_from(d)
    ctrl = jnp.array(d.ctrl)
    for i in range(400):
        if i % 25 == 0:
            c = rng.uniform(mj.actuator_ctrlrange[:, 0], mj.actuator_ctrlrange[:, 1])
            d.ctrl[:] = c
            ctrl = jnp.array(c)
        mujoco.mj_step(mj, d)
        st = stepj(st, ctrl)
    body_err = np.abs(np.asarray(st.qpos[:3]) - d.qpos[:3]).max()
    joint_err = np.abs(np.asarray(st.qpos[7:]) - d.qpos[7:]).max()
    assert body_err < 5e-3, body_err
    assert joint_err < 5e-2, joint_err
