"""Behavioral-contract parity of the task layer against the LIVE reference
environment (driven as an oracle when /root/reference is present).

Covers: reward composite + all 11 components, observation, termination,
command abstraction, ideal-position integration, estimator feeding order —
the full step semantics of WalkingQuadrupedEnv.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadruped_gym_tpu.models.spec import DEFAULT_SCENE, get_model
from quadruped_gym_tpu.tasks import commands, estimator, rewards, walking

REFERENCE = "/root/reference"
HAVE_REFERENCE = os.path.isdir(os.path.join(REFERENCE, "src"))

PM = get_model()


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference repo not mounted")
def test_walking_reward_component_parity():
    sys.path.insert(0, REFERENCE)
    from src.envs.walking_quad import WalkingQuadrupedEnv

    cfg = walking.WalkingConfig(max_time=20.0, frame_skip=10, dtype=jnp.float64)
    ref = WalkingQuadrupedEnv(model_path=DEFAULT_SCENE, max_time=20.0, frame_skip=10)
    ref.reset()
    ref.control_inputs.set_orientation(0.3)
    ref.control_inputs.set_velocity_speed_alpha(0.25, 0.1)

    st, _ = walking.reset(PM, cfg, jax.random.PRNGKey(0))
    st = st._replace(
        cmd=commands.from_speed_alpha(
            jnp.float64(0.25), jnp.float64(0.1), jnp.float64(0.3)
        )
    )
    stepj = jax.jit(lambda s, a: walking.step(PM, cfg, s, a))

    for i in range(30):
        a = np.clip(
            np.array([0.0, 0.0, -0.5] * 4) + 0.3 * np.sin(0.3 * i + np.arange(12)),
            -1, 1,
        )
        obs_r, rew_r, term_r, _, info_r = ref.step(a.copy())
        out = stepj(st, jnp.array(a))
        st = out.state

        comps_r = np.array([info_r[k] for k in rewards.REWARD_KEYS])
        comps_m = np.asarray(out.reward_components)
        # unit() of a near-zero velocity amplifies 1e-14 physics noise into
        # ~1e-7 on the direction reward; everything else matches ~1e-12
        np.testing.assert_allclose(comps_m, comps_r, atol=5e-6)
        np.testing.assert_allclose(float(out.reward), rew_r, atol=5e-6)
        np.testing.assert_allclose(np.asarray(out.obs), obs_r, atol=1e-9)
        assert bool(out.terminated) == bool(term_r)


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference repo not mounted")
def test_estimator_parity():
    sys.path.insert(0, REFERENCE)
    from src.envs.math_utils import OnlineFrequencyAmplitudeEstimation

    dt = 0.02
    ref = OnlineFrequencyAmplitudeEstimation(
        n_channels=12, dt=dt, min_freq=1, ema_alpha=0.80
    )
    W = estimator.window_size(1.0, dt)
    assert W == ref.window_size
    st = estimator.init(12, W, dtype=jnp.float64)

    rng = np.random.default_rng(0)
    upd = jax.jit(lambda s, x: estimator.update(s, x, dt, 0.80))
    for i in range(250):  # exceed the window to exercise wraparound
        x = np.sin(0.3 * i + np.arange(12)) + 0.1 * rng.normal(size=12)
        f_r, a_r = ref.update(x)
        st, f_m, a_m = upd(st, jnp.array(x))
        np.testing.assert_allclose(np.asarray(f_m), f_r, atol=1e-12)
        np.testing.assert_allclose(np.asarray(a_m), a_r, atol=1e-12)


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference repo not mounted")
def test_command_sampling_semantics():
    sys.path.insert(0, REFERENCE)
    from src.envs.control_inputs import VelocityHeadingControls

    ref = VelocityHeadingControls()
    ref.set_orientation(0.7)
    ref.set_velocity_speed_alpha(0.4, -1.2)
    mine = commands.from_speed_alpha(
        jnp.float64(0.4), jnp.float64(-1.2), jnp.float64(0.7)
    )
    np.testing.assert_allclose(np.asarray(mine.velocity), ref.velocity, atol=1e-15)
    np.testing.assert_allclose(np.asarray(mine.heading), ref.heading, atol=1e-15)
    np.testing.assert_allclose(
        np.asarray(mine.global_velocity), ref.global_velocity, atol=1e-15
    )
    np.testing.assert_allclose(
        float(commands.heading_theta(mine)), ref.get_heading_theta(), atol=1e-15
    )

    # fixed-value overrides take effect
    opts = commands.SampleOptions(fixed_speed=0.3, fixed_heading_angle=0.5)
    cmd = commands.sample(jax.random.PRNGKey(1), opts, dtype=jnp.float64)
    np.testing.assert_allclose(float(jnp.linalg.norm(cmd.velocity[:2])), 0.3, atol=1e-12)
    np.testing.assert_allclose(float(commands.heading_theta(cmd)), 0.5, atol=1e-12)


@pytest.mark.slow
def test_flip_termination_and_time_limit():
    cfg = walking.WalkingConfig(max_time=0.08, frame_skip=4, dtype=jnp.float64)
    st, _ = walking.reset(PM, cfg, jax.random.PRNGKey(0))
    stepj = jax.jit(lambda s, a: walking.step(PM, cfg, s, a))
    a = jnp.zeros(12, dtype=jnp.float64)
    out = stepj(st, a)
    assert not bool(out.terminated)
    # time limit hits at t >= 0.08 (10 substeps of 0.008)
    for _ in range(9):
        out = stepj(out.state, a)
    assert bool(out.terminated)

    # flipped robot: upside-down base quaternion -> zaxis z < 0
    st2, _ = walking.reset(PM, cfg, jax.random.PRNGKey(0))
    flipped = st2.phys.qpos.at[3:7].set(jnp.array([0.0, 1.0, 0.0, 0.0]))
    flipped = flipped.at[2].set(0.5)
    st2 = st2._replace(phys=st2.phys._replace(qpos=flipped))
    out2 = stepj(st2, a)
    assert bool(out2.terminated)


@pytest.mark.slow
def test_madgwick_gravity_convergence():
    """Filter internal consistency: stationary IMU converges to gravity."""
    from quadruped_gym_tpu.tasks import madgwick

    q = jnp.array([1.0, 0.0, 0.0, 0.0], dtype=jnp.float64)
    # device tilted: gravity reading rotated about x by 20 degrees
    ang = np.deg2rad(20)
    acc = jnp.array([0.0, 9.81 * np.sin(ang), 9.81 * np.cos(ang)])
    gyr = jnp.array([1e-9, 0.0, 0.0])  # nonzero so the update runs
    for _ in range(3000):
        q = madgwick.update_imu(q, gyr, acc, 0.02)
    euler = np.asarray(madgwick.to_euler(q))
    assert abs(euler[0] - (-ang)) < 1e-2 or abs(euler[0] - ang) < 1e-2
