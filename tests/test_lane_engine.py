"""Lane-batched engine vs the per-env oracle-parity engine.

The per-env engine is itself validated at machine precision against CPU
MuJoCo (test_smooth_parity / test_contact_parity), so agreement here gives
transitive oracle parity for the TPU throughput path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadruped_gym_tpu.models import spec
from quadruped_gym_tpu.ops import lane_engine
from quadruped_gym_tpu.physics import engine

pytestmark = pytest.mark.slow  # multi-minute XLA compile; `make test` skips


@pytest.fixture(scope="module")
def m():
    return spec.get_model(collision_geom_prefixes=spec.MPC_COLLISION_PREFIXES)


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


@pytest.mark.parametrize("airborne", [True, False])
def test_lane_step_matches_engine(m, airborne):
    B = 4
    qpos, qvel, act, time, sens = _batch_states(
        m, B, jax.random.PRNGKey(0 if airborne else 1), airborne
    )
    ctrl = jnp.tile(jnp.asarray(np.array([0.1, -0.1, -0.5] * 4)), (B, 1))

    # reference: per-env engine, full Newton budget, no early exit concerns
    # (the objective is strictly convex -> unique optimum)
    def ref_one(q, v, a, t, s):
        st = engine.State(qpos=q, qvel=v, act=a, time=t, sensordata=s)
        out = engine.step(m, st, ctrl[0], max_contacts=36, solver_iterations=8)
        return out

    ref = jax.jit(jax.vmap(ref_one))(qpos, qvel, act, time, sens)

    ls = lane_engine.from_batched(qpos, qvel, act, time, sens)
    out = _lane_step(m)(ls, ctrl.T)
    qpos_l, qvel_l, act_l, time_l, sens_l = lane_engine.to_batched(out)

    np.testing.assert_allclose(np.asarray(qpos_l), np.asarray(ref.qpos),
                               rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(qvel_l), np.asarray(ref.qvel),
                               rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(act_l), np.asarray(ref.act),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(sens_l), np.asarray(ref.sensordata),
                               rtol=1e-7, atol=1e-8)


_LANE_STEP_CACHE = {}


def _lane_step(m):
    # one shared jitted program (ctrl as an argument, fixed batch=4): the
    # lane step costs many minutes of XLA CPU compile, so every test in this
    # module must reuse the same compilation
    if id(m) not in _LANE_STEP_CACHE:
        _LANE_STEP_CACHE[id(m)] = jax.jit(
            lambda s, c: lane_engine.step(m, s, c, solver_iterations=8,
                                          ls_iterations=12)
        )
    return _LANE_STEP_CACHE[id(m)]


def test_lane_trajectory_grounded(m):
    """Multi-step grounded trajectory stays glued to the per-env engine."""
    B = 4
    qpos, qvel, act, time, sens = _batch_states(m, B, jax.random.PRNGKey(2))
    ctrl = jnp.tile(jnp.asarray(np.array([0.0, 0.0, -0.5] * 4)), (B, 1))

    ls = lane_engine.from_batched(qpos, qvel, act, time, sens)
    st = jax.vmap(
        lambda q, v, a, t, s: engine.State(q, v, a, t, s)
    )(qpos, qvel, act, time, sens)

    step_ref = jax.jit(
        jax.vmap(
            lambda ss, c: engine.step(m, ss, c, max_contacts=36,
                                      solver_iterations=8)
        )
    )
    step_lane = _lane_step(m)
    for i in range(20):
        st = step_ref(st, ctrl)
        ls = step_lane(ls, ctrl.T)
    qpos_l, qvel_l, *_ = lane_engine.to_batched(ls)
    # fp-chaos through contact grows differences slowly; 20 steps stays tight
    np.testing.assert_allclose(np.asarray(qpos_l), np.asarray(st.qpos),
                               rtol=1e-5, atol=1e-7)


def test_lane_rollout_cost_consistent_with_aos():
    """Lane-engine rollout scoring tracks the AoS engine on the planning
    model (same trajectories up to solver-iteration-budget differences)."""
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
    aos = jax.jit(
        lambda s: rollout.batched_rollout_cost(pm, cfg, cost_fn, state, s,
                                               cmd, prev)
    )(seqs)
    lane = jax.jit(
        lambda s: rollout.lane_batched_rollout_cost(
            pm, cfg, cost_fn, state, s, cmd, prev,
            newton_iterations=8, ls_iterations=12)
    )(seqs)
    # same optimum (strictly convex contact problem) -> tight agreement
    np.testing.assert_allclose(np.asarray(lane), np.asarray(aos),
                               rtol=5e-3, atol=1e-3)
