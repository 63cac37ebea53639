"""DomainParams (per-sample randomized friction / gains / payload).

BASELINE configs 3/5 call for domain-randomized scenarios at batch scale.
``PhysicsModel`` stays a static closure constant; ``DomainParams`` lanes
override the randomized quantities as traced data. Friction and gain
overrides are exactly equivalent to rebuilding the model with those
values (neither enters the compile-time invweights), which gives
bit-exact parity tests; the payload (mass) override is checked for
identity at scale 1 and for a physically sensible effect.

All comparisons run the leg engine eagerly (no jit): single-batch eager
steps are fast and avoid minutes of XLA CPU compile per variant model.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadruped_gym_tpu.models import spec
from quadruped_gym_tpu.ops import lane_engine, leg_engine, pallas_engine
from quadruped_gym_tpu.physics import engine

B = 3


@pytest.fixture(scope="module")
def m():
    return spec.get_planning_model()


@pytest.fixture(scope="module")
def state(m):
    st = engine.make_state(m, dtype=jnp.float64)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    qpos = st.qpos[None] + 0.05 * jax.random.normal(k1, (B, m.nq), jnp.float64)
    qvel = st.qvel[None] + 0.1 * jax.random.normal(k2, (B, m.nv), jnp.float64)
    act = jnp.tile(jnp.asarray(np.array([0.0, 0.0, -0.5] * 4)), (B, 1))
    return lane_engine.from_batched(
        qpos, qvel, act, jnp.zeros(B, jnp.float64),
        jnp.zeros((B, m.nsensordata), jnp.float64),
    )


CTRL = None


def _ctrl():
    return jnp.tile(jnp.asarray(np.array([0.1, -0.1, -0.5] * 4)), (B, 1)).T


@pytest.mark.slow
def test_none_dp_is_identity(m, state):
    base = leg_engine.step(m, state, _ctrl(), 8, 12)
    same = leg_engine.step(m, state, _ctrl(), 8, 12, dp=spec.DomainParams())
    np.testing.assert_array_equal(np.asarray(base.qvel), np.asarray(same.qvel))


@pytest.mark.slow
def test_friction_matches_rebuilt_model(m, state):
    fr = 0.35
    m2 = dataclasses.replace(
        m, col_friction=tuple((fr,) + tuple(f[1:]) for f in m.col_friction)
    )
    ref = leg_engine.step(m2, state, _ctrl(), 8, 12)
    got = leg_engine.step(
        m, state, _ctrl(), 8, 12,
        dp=spec.DomainParams(friction=jnp.full((B,), fr, jnp.float64)),
    )
    np.testing.assert_array_equal(np.asarray(ref.qvel), np.asarray(got.qvel))
    np.testing.assert_array_equal(np.asarray(ref.qpos), np.asarray(got.qpos))


def test_gain_scale_matches_rebuilt_model(m, state):
    gs = 1.3
    gp2 = tuple((g[0] * gs,) + tuple(g[1:]) for g in m.actuator_gainprm)
    bp2 = tuple((b[0], b[1] * gs, b[2]) + tuple(b[3:])
                for b in m.actuator_biasprm)
    m3 = dataclasses.replace(m, actuator_gainprm=gp2, actuator_biasprm=bp2)
    ref = leg_engine.step(m3, state, _ctrl(), 8, 12)
    got = leg_engine.step(
        m, state, _ctrl(), 8, 12,
        dp=spec.DomainParams(gain_scale=jnp.full((B,), gs, jnp.float64)),
    )
    np.testing.assert_array_equal(np.asarray(ref.qvel), np.asarray(got.qvel))


def test_per_sample_heterogeneity(m, state):
    """Column b of a heterogeneous-friction batch equals the same column
    of a uniform run at that friction — lanes are truly independent."""
    frs = [0.3, 0.6, 0.9]
    het = leg_engine.step(
        m, state, _ctrl(), 8, 12,
        dp=spec.DomainParams(friction=jnp.asarray(frs, jnp.float64)),
    )
    for b, f in enumerate(frs):
        uni = leg_engine.step(
            m, state, _ctrl(), 8, 12,
            dp=spec.DomainParams(friction=jnp.full((B,), f, jnp.float64)),
        )
        np.testing.assert_array_equal(
            np.asarray(het.qvel[:, b]), np.asarray(uni.qvel[:, b])
        )


@pytest.mark.slow
def test_mass_scale_identity_and_effect(m, state):
    base = leg_engine.step(m, state, _ctrl(), 8, 12)
    one = leg_engine.step(
        m, state, _ctrl(), 8, 12,
        dp=spec.DomainParams(base_mass_scale=jnp.ones((B,), jnp.float64)),
    )
    np.testing.assert_array_equal(np.asarray(base.qvel), np.asarray(one.qvel))
    heavy = leg_engine.step(
        m, state, _ctrl(), 8, 12,
        dp=spec.DomainParams(base_mass_scale=jnp.full((B,), 1.5, jnp.float64)),
    )
    assert np.isfinite(np.asarray(heavy.qvel)).all()
    assert float(jnp.max(jnp.abs(base.qvel - heavy.qvel))) > 1e-4


@pytest.fixture(scope="module")
def grounded(m):
    """Feet pressed into the plane (the reset pose is airborne)."""
    st = engine.make_state(m, dtype=jnp.float64)
    qpos = jnp.tile(st.qpos, (B, 1)).at[:, 2].set(0.02)
    qvel = jnp.tile(st.qvel, (B, 1))
    act = jnp.tile(jnp.asarray(np.array([0.0, 0.0, -0.5] * 4)), (B, 1))
    return lane_engine.from_batched(
        qpos, qvel, act, jnp.zeros(B, jnp.float64),
        jnp.zeros((B, m.nsensordata), jnp.float64),
    )


@pytest.mark.slow
def test_tilt_matches_rebuilt_model(m, grounded):
    """Ground-slope override == rebuilding the model with the tilted
    plane normal (same tangent-frame rule), with contact active."""
    tx, ty = 0.15, -0.1
    n = np.array([-tx, -ty, 1.0])
    n /= np.linalg.norm(n)
    m2 = dataclasses.replace(m, plane_normal=n)
    ref = leg_engine.step(m2, grounded, _ctrl(), 8, 12)
    got = leg_engine.step(
        m, grounded, _ctrl(), 8, 12,
        dp=spec.DomainParams(tilt_x=jnp.full((B,), tx, jnp.float64),
                             tilt_y=jnp.full((B,), ty, jnp.float64)),
    )
    np.testing.assert_allclose(np.asarray(got.qvel), np.asarray(ref.qvel),
                               rtol=1e-12, atol=1e-13)
    # the tilt genuinely changes the contact dynamics
    base = leg_engine.step(m, grounded, _ctrl(), 8, 12)
    assert float(jnp.max(jnp.abs(base.qvel - got.qvel))) > 1e-3


def test_tilt_zero_is_identity(m, grounded):
    base = leg_engine.step(m, grounded, _ctrl(), 8, 12)
    zero = leg_engine.step(
        m, grounded, _ctrl(), 8, 12,
        dp=spec.DomainParams(tilt_x=jnp.zeros(B), tilt_y=jnp.zeros(B)),
    )
    np.testing.assert_allclose(np.asarray(base.qvel), np.asarray(zero.qvel),
                               rtol=1e-13, atol=1e-14)


def test_sample_domain_params_shapes():
    dp = spec.sample_domain_params(jax.random.PRNGKey(1), 7)
    assert dp.friction.shape == (7,)
    assert dp.gain_scale.shape == (7,)
    assert dp.base_mass_scale.shape == (7,)
    assert float(dp.friction.min()) >= 0.4
    assert float(dp.friction.max()) <= 0.8
    dp2 = spec.sample_domain_params(
        jax.random.PRNGKey(1), 7, friction_range=None
    )
    assert dp2.friction is None


@pytest.mark.slow
def test_pallas_step_with_dp_matches_leg(m, state):
    dp = spec.sample_domain_params(jax.random.PRNGKey(2), B)
    dp = spec.DomainParams(*(None if v is None else v.astype(jnp.float64)
                             for v in dp))
    ref = leg_engine.step(m, state, _ctrl(), 4, 8, dp=dp)
    # interpret-mode kernel needs a sublane-divisible block; pad to 8
    pad = 8 - B
    padded = lane_engine.LaneState(
        *(jnp.concatenate([x, jnp.repeat(x[..., -1:], pad, axis=-1)], axis=-1)
          for x in state)
    )
    dp_p = spec.DomainParams(
        *(None if v is None
          else jnp.concatenate([v, jnp.repeat(v[-1:], pad)])
          for v in dp)
    )
    ctrl_p = jnp.concatenate(
        [_ctrl(), jnp.repeat(_ctrl()[:, -1:], pad, axis=1)], axis=1
    )
    out = pallas_engine.step(m, padded, ctrl_p, 4, 8, block=8,
                             interpret=True, dp=dp_p)
    np.testing.assert_allclose(
        np.asarray(out.qvel[:, :B]), np.asarray(ref.qvel),
        rtol=1e-10, atol=1e-11,
    )
