"""Leg-batched engine vs the lane-batched and per-env engines.

``ops/leg_engine.py`` folds the four structurally identical legs into a
(4, B) lane dimension. The math is identical to ``ops/lane_engine.py``
(which is itself oracle-parity validated against CPU MuJoCo via the
per-env engine), so agreement here is transitive oracle parity for the
leg-batched throughput path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadruped_gym_tpu.models import spec
from quadruped_gym_tpu.ops import lane_engine, leg_engine
from quadruped_gym_tpu.physics import engine

pytestmark = pytest.mark.slow  # multi-minute XLA compile; `make test` skips


@pytest.fixture(scope="module")
def m():
    return spec.get_model(collision_geom_prefixes=spec.FEET_COLLISION_PREFIXES)


def _batch_states(m, B, key, airborne=False):
    st = engine.make_state(m, dtype=jnp.float64)
    k1, k2 = jax.random.split(key)
    dq = 0.05 * jax.random.normal(k1, (B, m.nq), jnp.float64)
    dv = 0.1 * jax.random.normal(k2, (B, m.nv), jnp.float64)
    qpos = st.qpos[None] + dq
    if airborne:
        qpos = qpos.at[:, 2].add(0.5)
    qvel = st.qvel[None] + dv
    act = jnp.tile(jnp.asarray(np.array([0.0, 0.0, -0.5] * 4)), (B, 1))
    time = jnp.zeros(B, jnp.float64)
    sens = jnp.zeros((B, m.nsensordata), jnp.float64)
    return qpos, qvel, act, time, sens


_STEP_CACHE = {}


def _jitted(mod, m):
    key = (id(mod), id(m))
    if key not in _STEP_CACHE:
        _STEP_CACHE[key] = jax.jit(
            lambda s, c: mod.step(m, s, c, solver_iterations=8,
                                  ls_iterations=12)
        )
    return _STEP_CACHE[key]


@pytest.mark.parametrize("airborne", [True, False])
def test_leg_step_matches_engine(m, airborne):
    """Single step vs the per-env oracle-parity engine."""
    B = 4
    qpos, qvel, act, time, sens = _batch_states(
        m, B, jax.random.PRNGKey(0 if airborne else 1), airborne
    )
    ctrl = jnp.tile(jnp.asarray(np.array([0.1, -0.1, -0.5] * 4)), (B, 1))

    def ref_one(q, v, a, t, s):
        st = engine.State(qpos=q, qvel=v, act=a, time=t, sensordata=s)
        return engine.step(m, st, ctrl[0], max_contacts=36,
                           solver_iterations=8)

    ref = jax.jit(jax.vmap(ref_one))(qpos, qvel, act, time, sens)

    ls = lane_engine.from_batched(qpos, qvel, act, time, sens)
    out = _jitted(leg_engine, m)(ls, ctrl.T)
    qpos_l, qvel_l, act_l, time_l, sens_l = lane_engine.to_batched(out)

    np.testing.assert_allclose(np.asarray(qpos_l), np.asarray(ref.qpos),
                               rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(qvel_l), np.asarray(ref.qvel),
                               rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(act_l), np.asarray(ref.act),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(sens_l), np.asarray(ref.sensordata),
                               rtol=1e-7, atol=1e-8)


def test_leg_trajectory_matches_lane(m):
    """Multi-step grounded trajectory stays glued to the lane engine."""
    B = 4
    qpos, qvel, act, time, sens = _batch_states(m, B, jax.random.PRNGKey(2))
    ctrl = jnp.tile(jnp.asarray(np.array([0.0, 0.0, -0.5] * 4)), (B, 1))

    ls_lane = lane_engine.from_batched(qpos, qvel, act, time, sens)
    ls_leg = ls_lane

    step_lane = _jitted(lane_engine, m)
    step_leg = _jitted(leg_engine, m)
    for _ in range(20):
        ls_lane = step_lane(ls_lane, ctrl.T)
        ls_leg = step_leg(ls_leg, ctrl.T)
    q_lane, v_lane, *_ = lane_engine.to_batched(ls_lane)
    q_leg, v_leg, *_ = lane_engine.to_batched(ls_leg)
    np.testing.assert_allclose(np.asarray(q_leg), np.asarray(q_lane),
                               rtol=1e-6, atol=1e-8)


def test_leg_full_plant_matches_lane_eager():
    """The generalized collision grouping (feet + shins + ankle servos =
    3 per-leg-identical groups, incl. two groups on one body and a
    level-1 contact whose ankle-joint Jacobian must be zero) matches the
    arbitrary-geom lane engine. Eager: no multi-minute XLA compiles for
    the one-off full-plant program."""
    from quadruped_gym_tpu.ops import leg_engine

    m = spec.get_model(collision_geom_prefixes=spec.MPC_COLLISION_PREFIXES)
    assert leg_engine.is_compatible(m)
    levels = [lv for lv, _ in leg_engine._leg_static(m).col_groups]
    assert sorted(levels) == [1, 2, 2]

    st = engine.make_state(m, dtype=jnp.float64)
    B = 3
    k1, k2 = jax.random.split(jax.random.PRNGKey(4))
    qpos = st.qpos[None] + 0.05 * jax.random.normal(k1, (B, m.nq), jnp.float64)
    qpos = qpos.at[:, 2].set(0.03)  # press into the ground: contacts active
    qvel = st.qvel[None] + 0.1 * jax.random.normal(k2, (B, m.nv), jnp.float64)
    act = jnp.tile(jnp.asarray(np.array([0.0, 0.0, -0.5] * 4)), (B, 1))
    ls = lane_engine.from_batched(
        qpos, qvel, act, jnp.zeros(B, jnp.float64),
        jnp.zeros((B, m.nsensordata), jnp.float64),
    )
    ctrl = jnp.tile(jnp.asarray(np.array([0.1, -0.1, -0.5] * 4)), (B, 1)).T

    ref = lane_engine.step(m, ls, ctrl, solver_iterations=8, ls_iterations=12)
    got = leg_engine.step(m, ls, ctrl, solver_iterations=8, ls_iterations=12)
    smooth = leg_engine.step(m, ls, ctrl, solver_iterations=0)
    assert float(jnp.max(jnp.abs(ref.qvel - smooth.qvel))) > 1e-3  # contact on
    np.testing.assert_allclose(np.asarray(got.qpos), np.asarray(ref.qpos),
                               rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(np.asarray(got.qvel), np.asarray(ref.qvel),
                               rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(got.sensordata),
                               np.asarray(ref.sensordata),
                               rtol=1e-8, atol=1e-9)


def test_leg_rollout_cost_consistent_with_lane():
    """Leg-engine rollout scoring tracks the lane engine on the planning
    model (identical math, different op grouping)."""
    from quadruped_gym_tpu.solvers import rollout
    from quadruped_gym_tpu.tasks import commands

    pm = spec.get_planning_model()
    cfg = rollout.RolloutConfig(horizon=3, frame_skip=2, max_contacts=12,
                                solver_iterations=8)
    cost_fn = rollout.make_cost_fn(pm)
    state = engine.make_state(pm, dtype=jnp.float64)
    cmd = commands.make(jnp.array([0.2, 0.0]), jnp.array(0.0))
    prev = jnp.asarray(np.array([0.0, 0.0, -0.5] * 4), jnp.float64)
    seqs = jnp.clip(
        prev[None, None]
        + 0.2 * jax.random.normal(jax.random.PRNGKey(0), (4, 3, pm.nu),
                                  jnp.float64),
        -1.0, 1.0,
    )
    lane = jax.jit(
        lambda s: rollout.lane_batched_rollout_cost(
            pm, cfg, cost_fn, state, s, cmd, prev,
            newton_iterations=8, ls_iterations=12)
    )(seqs)
    leg = jax.jit(
        lambda s: rollout.lane_batched_rollout_cost(
            pm, cfg, cost_fn, state, s, cmd, prev,
            newton_iterations=8, ls_iterations=12, engine_impl="leg")
    )(seqs)
    np.testing.assert_allclose(np.asarray(leg), np.asarray(lane),
                               rtol=1e-6, atol=1e-6)
