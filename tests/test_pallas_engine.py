"""Pallas substep kernel vs the leg-batched engine (interpret mode).

The kernel body is ``leg_engine._step_impl`` itself with Mosaic-safe
substitutions (loop-select collision, full-shape leg constants), so
interpret-mode agreement at f64 machine precision plus the leg engine's
own oracle parity chain (tests/test_leg_engine.py -> per-env engine ->
CPU MuJoCo) validates the fused TPU path. On-device agreement at f32
rounding level is exercised by the TPU verify drive and bench.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadruped_gym_tpu.models import spec
from quadruped_gym_tpu.ops import lane_engine, leg_engine, pallas_engine
from quadruped_gym_tpu.physics import engine

pytestmark = pytest.mark.slow  # multi-minute XLA compile; `make test` skips


@pytest.fixture(scope="module")
def m():
    return spec.get_planning_model()


def _states(m, B, key, airborne=False):
    st = engine.make_state(m, dtype=jnp.float64)
    k1, k2 = jax.random.split(key)
    qpos = st.qpos[None] + 0.05 * jax.random.normal(k1, (B, m.nq), jnp.float64)
    if airborne:
        qpos = qpos.at[:, 2].add(0.5)
    qvel = st.qvel[None] + 0.1 * jax.random.normal(k2, (B, m.nv), jnp.float64)
    act = jnp.tile(jnp.asarray(np.array([0.0, 0.0, -0.5] * 4)), (B, 1))
    time = jnp.zeros(B, jnp.float64)
    sens = jnp.zeros((B, m.nsensordata), jnp.float64)
    return lane_engine.from_batched(qpos, qvel, act, time, sens)


@pytest.mark.parametrize("airborne", [True, False])
def test_pallas_step_matches_leg_engine(m, airborne):
    B = 16
    ls = _states(m, B, jax.random.PRNGKey(2 if airborne else 3), airborne)
    ctrl = jnp.tile(
        jnp.asarray(np.array([0.1, -0.1, -0.5] * 4)), (B, 1)
    ).T

    out = pallas_engine.step(m, ls, ctrl, 4, 8, block=B, interpret=True)
    ref = leg_engine.step(m, ls, ctrl, 4, 8)

    np.testing.assert_allclose(np.asarray(out.qpos), np.asarray(ref.qpos),
                               rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(np.asarray(out.qvel), np.asarray(ref.qvel),
                               rtol=1e-10, atol=1e-11)
    np.testing.assert_allclose(np.asarray(out.act), np.asarray(ref.act),
                               rtol=1e-14, atol=1e-15)
    np.testing.assert_allclose(
        np.asarray(out.sensordata), np.asarray(ref.sensordata),
        rtol=1e-10, atol=1e-11,
    )
    np.testing.assert_allclose(np.asarray(out.time), np.asarray(ref.time),
                               rtol=0, atol=0)


@pytest.mark.parametrize("grounded", [True, False])
def test_fused_rollout_cost_matches_leg_path(m, grounded):
    """The whole-rollout kernel (substeps + hard-wired walking stage cost)
    vs the scan-of-control-steps leg-engine path with the same cost fn.

    Grounded covers the contact path but only over ONE control step —
    through-contact fp chaos makes bit-different-but-equivalent programs
    diverge over longer grounded horizons (see tests/test_lane_engine.py).
    The airborne multi-step case covers the fused kernel's per-step
    control indexing, prev-ctrl chaining and cost accumulation."""
    from quadruped_gym_tpu.solvers import rollout
    from quadruped_gym_tpu.tasks import commands

    B = 16
    H = 1 if grounded else 3
    cfg = rollout.RolloutConfig(horizon=H, frame_skip=2)
    cost_fn = rollout.make_cost_fn(m)
    state = engine.make_state(m, dtype=jnp.float64)
    if not grounded:
        state = state._replace(qpos=state.qpos.at[2].add(0.5))
    cmd = commands.make(jnp.array([0.2, 0.1]), jnp.array(0.3))
    prev = jnp.asarray(np.array([0.0, 0.0, -0.5] * 4), jnp.float64)
    seqs = jnp.clip(
        prev[None, None]
        + 0.2 * jax.random.normal(jax.random.PRNGKey(7), (B, H, m.nu),
                                  jnp.float64),
        -1.0, 1.0,
    )
    ref = rollout.lane_batched_rollout_cost(
        m, cfg, cost_fn, state, seqs, cmd, prev,
        newton_iterations=4, ls_iterations=8, engine_impl="leg",
    )
    fused = pallas_engine.fused_rollout_cost(
        m, state, seqs, cmd, prev, cfg.frame_skip,
        solver_iterations=4, ls_iterations=8, block=B, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=1e-8, atol=1e-8)


def test_pallas_full_plant_matches_leg_engine():
    """The kernel on the fast-plant model (3 collision groups, decimated
    hulls) matches the leg engine, contacts active (interpret mode)."""
    fp = spec.get_fast_plant_model()
    B = 16
    st = engine.make_state(fp, dtype=jnp.float64)
    k1, k2 = jax.random.split(jax.random.PRNGKey(6))
    qpos = st.qpos[None] + 0.02 * jax.random.normal(k1, (B, fp.nq), jnp.float64)
    qpos = qpos.at[:, 2].set(0.03)
    qvel = st.qvel[None] + 0.05 * jax.random.normal(k2, (B, fp.nv), jnp.float64)
    act = jnp.tile(jnp.asarray(np.array([0.0, 0.0, -0.5] * 4)), (B, 1))
    ls = lane_engine.from_batched(
        qpos, qvel, act, jnp.zeros(B, jnp.float64),
        jnp.zeros((B, fp.nsensordata), jnp.float64),
    )
    ctrl = jnp.tile(jnp.asarray(np.array([0.1, -0.1, -0.5] * 4)), (B, 1)).T

    out = pallas_engine.step(fp, ls, ctrl, 4, 8, block=B, interpret=True)
    ref = leg_engine.step(fp, ls, ctrl, 4, 8)
    np.testing.assert_allclose(np.asarray(out.qvel), np.asarray(ref.qvel),
                               rtol=1e-10, atol=1e-11)
    np.testing.assert_allclose(np.asarray(out.qpos), np.asarray(ref.qpos),
                               rtol=1e-12, atol=1e-13)


def test_pallas_control_step_matches_leg_engine(m):
    B = 16
    ls = _states(m, B, jax.random.PRNGKey(4))
    ctrl = jnp.tile(
        jnp.asarray(np.array([0.0, 0.0, -0.5] * 4)), (B, 1)
    ).T

    out = pallas_engine.control_step(m, ls, ctrl, 3, 4, 8, block=B,
                                     interpret=True)
    ref = leg_engine.control_step(m, ls, ctrl, 3, 4, 8)

    np.testing.assert_allclose(np.asarray(out.qpos), np.asarray(ref.qpos),
                               rtol=1e-10, atol=1e-11)
    np.testing.assert_allclose(np.asarray(out.qvel), np.asarray(ref.qvel),
                               rtol=1e-8, atol=1e-9)
