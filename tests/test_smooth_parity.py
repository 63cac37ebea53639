"""Numerical parity of the smooth (contact-free) JAX dynamics vs CPU MuJoCo.

Covers the pipeline re-derived from the reference's mj_step hot loop
(``/root/reference/src/envs/quadruped.py:163-165``): forward kinematics,
CRBA mass matrix, RNE bias forces, position-servo actuation, and the
implicitfast integrator.
"""

import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from quadruped_gym_tpu.physics import integrator, smooth
from quadruped_gym_tpu.testing import get_model, load_mj, random_airborne_state

PM = get_model()


@pytest.fixture(scope="module")
def mjpair():
    return load_mj()


def _smooth_pipeline(qpos, qvel, act):
    kin = smooth.fwd_position(PM, qpos)
    S = smooth.dof_subspace(PM, kin)
    cvel = smooth.body_velocities(PM, S, qvel)
    M = smooth.crba(PM, kin, S)
    bias = smooth.rne_bias(PM, kin, S, cvel, qvel)
    actu = smooth.actuation(PM, qpos, qvel, act)
    return kin, S, cvel, M, bias, actu


def test_forward_kinematics(mjpair):
    mj, d = mjpair
    rng = np.random.default_rng(0)
    for _ in range(5):
        random_airborne_state(mj, d, rng)
        kin = smooth.fwd_position(PM, jnp.array(d.qpos))
        np.testing.assert_allclose(np.asarray(kin.xpos), d.xpos, atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(kin.xmat), d.xmat.reshape(-1, 3, 3), atol=1e-6
        )
        np.testing.assert_allclose(np.asarray(kin.xipos), d.xipos, atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(kin.ximat), d.ximat.reshape(-1, 3, 3), atol=1e-6
        )


def test_mass_matrix_bias_actuation(mjpair):
    mj, d = mjpair
    rng = np.random.default_rng(1)
    for _ in range(5):
        random_airborne_state(mj, d, rng, vel_scale=2.0)
        qpos, qvel, act = jnp.array(d.qpos), jnp.array(d.qvel), jnp.array(d.act)
        _, _, _, M, bias, actu = _smooth_pipeline(qpos, qvel, act)

        Mref = np.zeros((mj.nv, mj.nv))
        mujoco.mj_fullM(mj, d, Mref)
        np.testing.assert_allclose(np.asarray(M), Mref, atol=1e-12)
        np.testing.assert_allclose(np.asarray(bias), d.qfrc_bias, atol=1e-10)
        np.testing.assert_allclose(
            np.asarray(actu.force), d.actuator_force, atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(actu.qfrc), d.qfrc_actuator, atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(smooth.passive_force(PM, qvel)), d.qfrc_passive, atol=1e-12
        )


def test_smooth_qacc(mjpair):
    mj, d = mjpair
    rng = np.random.default_rng(2)
    for _ in range(5):
        random_airborne_state(mj, d, rng)
        assert d.nefc == 0
        qpos, qvel, act = jnp.array(d.qpos), jnp.array(d.qvel), jnp.array(d.act)
        _, _, _, M, bias, actu = _smooth_pipeline(qpos, qvel, act)
        qfrc_smooth = actu.qfrc + smooth.passive_force(PM, qvel) - bias
        np.testing.assert_allclose(
            np.asarray(qfrc_smooth), d.qfrc_smooth, atol=1e-10
        )
        qacc = jnp.linalg.solve(M, qfrc_smooth)
        np.testing.assert_allclose(np.asarray(qacc), d.qacc, atol=1e-8)


@pytest.mark.slow
def test_implicitfast_step_200(mjpair):
    """Bit-level trajectory parity over 200 contact-free steps, including
    actuator force saturation and the exact activation filter."""
    mj, d = mjpair
    h = mj.opt.timestep

    mujoco.mj_resetData(mj, d)
    d.qpos[:] = mj.qpos0
    d.qpos[0:3] = [0, 0, 2.0]
    d.ctrl[:] = np.array([0.3, -0.5, 0.8] * 4)

    q, v, a = jnp.array(d.qpos), jnp.array(d.qvel), jnp.array(d.act)
    c = jnp.array(d.ctrl)
    for _ in range(200):
        mujoco.mj_step(mj, d)
        _, _, _, M, bias, actu = _smooth_pipeline(q, v, a)
        qfrc_smooth = actu.qfrc + smooth.passive_force(PM, v) - bias
        qacc = jnp.linalg.solve(M, qfrc_smooth)
        v = integrator.implicit_velocity_update(PM, M, v, qacc, actu.vel_deriv, h)
        a = smooth.act_filter_exact(PM, a, smooth.clip_ctrl(PM, c), h)
        q = integrator.integrate_pos(PM, q, v, h)
    assert d.ncon == 0, "test requires a contact-free trajectory"
    np.testing.assert_allclose(np.asarray(q), d.qpos, atol=1e-12)
    np.testing.assert_allclose(np.asarray(v), d.qvel, atol=1e-11)
    np.testing.assert_allclose(np.asarray(a), d.act, atol=1e-13)
