"""Sampling-MPC solver tests (tiny sizes, CPU) — functional correctness:
solvers improve the tracking objective and their outputs are finite/bounded.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadruped_gym_tpu.models.spec import MPC_COLLISION_PREFIXES, get_model
from quadruped_gym_tpu.physics import engine
from quadruped_gym_tpu.runtime import mpc_runtime
from quadruped_gym_tpu.solvers import cem, mppi, rollout
from quadruped_gym_tpu.tasks import commands

PM = get_model(collision_geom_prefixes=MPC_COLLISION_PREFIXES)
RCFG = rollout.RolloutConfig(horizon=5, frame_skip=2, max_contacts=8, solver_iterations=3)
COST = rollout.make_cost_fn(PM)
CMD = commands.from_speed_alpha(jnp.float32(0.2), jnp.float32(0.0), jnp.float32(0.0))
CENTERS = jnp.array([0.0, 0.0, -0.5] * 4, dtype=jnp.float32)


def _standing_state():
    st = engine.make_state(PM, jnp.float32)
    for _ in range(3):
        st = engine.control_step(PM, st, CENTERS, 2, max_contacts=8, solver_iterations=3)
    return st


@pytest.mark.slow
def test_batched_rollout_costs_finite():
    st = _standing_state()
    seqs = jnp.tile(CENTERS, (4, 5, 1))
    costs = rollout.batched_rollout_cost(PM, RCFG, COST, st, seqs, CMD, CENTERS)
    assert costs.shape == (4,)
    assert bool(jnp.isfinite(costs).all())
    # identical sequences -> identical costs
    np.testing.assert_allclose(np.asarray(costs), np.asarray(costs)[0], rtol=1e-6)


@pytest.mark.slow
def test_mppi_improves_over_mean():
    st = _standing_state()
    cfg = mppi.MPPIConfig(num_samples=16, sigma=0.2, temperature=1.0, rollout=RCFG)
    mean0 = jnp.tile(CENTERS, (5, 1))
    res = jax.jit(
        lambda s, m, k: mppi.plan(PM, cfg, COST, s, m, CMD, CENTERS, k)
    )(st, mean0, jax.random.PRNGKey(0))
    base = rollout.rollout_cost(PM, RCFG, COST, st, mean0, CMD, CENTERS)
    updated = rollout.rollout_cost(PM, RCFG, COST, st, res.mean, CMD, CENTERS)
    assert bool(jnp.isfinite(res.mean).all())
    assert float(res.best_cost) <= float(res.mean_cost) + 1e-3
    # the MPPI-weighted mean should not be (much) worse than the prior mean
    # (best sampled cost can exceed the noiseless mean's cost at tiny S)
    assert float(updated) <= float(base) + 25.0


@pytest.mark.slow
def test_cem_reduces_cost_across_iterations():
    st = _standing_state()
    cfg = cem.CEMConfig(num_samples=16, num_elites=4, iterations=2, rollout=RCFG)
    mean0 = jnp.tile(CENTERS, (5, 1))
    res = jax.jit(
        lambda s, m, k: cem.plan(PM, cfg, COST, s, m, CMD, CENTERS, k)
    )(st, mean0, jax.random.PRNGKey(0))
    assert res.mean.shape == (5, 12)
    assert bool(jnp.isfinite(res.mean).all())
    assert bool(jnp.all(res.sigma >= cfg.min_sigma - 1e-6))


@pytest.mark.slow
def test_closed_loop_runtime():
    st = _standing_state()
    cfg = mpc_runtime.MPCConfig(
        solver="mppi",
        mppi=mppi.MPPIConfig(num_samples=8, rollout=RCFG),
        plant_frame_skip=2,
        plant_max_contacts=8,
        plant_solver_iterations=3,
    )
    carry = mpc_runtime.init_carry(PM, cfg, horizon=5, key=jax.random.PRNGKey(0))
    cost_fn = rollout.make_cost_fn(PM)
    carry, phys, (ctrls, sens, costs) = jax.jit(
        lambda c, p: mpc_runtime.closed_loop(PM, cfg, cost_fn, c, p, CMD, 3)
    )(carry, st)
    assert ctrls.shape == (3, 12)
    assert bool(jnp.isfinite(ctrls).all())
    assert bool(phys.qpos[2] > 0.03)  # robot has not fallen through the floor


@pytest.mark.slow
def test_delayed_closed_loop_runtime():
    """The one-period-computation-delay (pipelined) loop runs, stays
    finite, and keeps the robot above the floor."""
    st = _standing_state()
    cfg = mpc_runtime.MPCConfig(
        solver="mppi",
        mppi=mppi.MPPIConfig(num_samples=8, rollout=RCFG),
        plant_frame_skip=2,
        plant_max_contacts=8,
        plant_solver_iterations=3,
    )
    carry = mpc_runtime.init_carry(PM, cfg, horizon=5, key=jax.random.PRNGKey(2))
    cost_fn = rollout.make_cost_fn(PM)
    carry, phys, (ctrls, sens, costs) = jax.jit(
        lambda c, p: mpc_runtime.delayed_closed_loop(
            PM, cfg, cost_fn, c, p, CMD, 3
        )
    )(carry, st)
    assert ctrls.shape == (3, 12)
    # step 0 applies the held previous control (the solve is in flight)
    np.testing.assert_allclose(
        np.asarray(ctrls[0]), np.asarray(np.array([0.0, 0.0, -0.5] * 4)),
        atol=1e-6,
    )
    assert bool(jnp.isfinite(ctrls).all())
    assert bool(jnp.isfinite(costs).all())
    assert bool(phys.qpos[2] > 0.03)


@pytest.mark.slow
def test_lane_control_step_matches_aos():
    """The lane-engine predictor step (controller-side work inside the
    10 ms real-time budget) integrates the same physics as the AoS
    engine to f32 precision."""
    st = _standing_state()
    ctrl = jnp.asarray(np.array([0.1, 0.05, -0.45] * 4), jnp.float32)
    a = engine.control_step(PM, st, ctrl, 3, max_contacts=8,
                            solver_iterations=4)
    b = mpc_runtime.lane_control_step(PM, st, ctrl, 3,
                                      solver_iterations=4, ls_iterations=8)
    np.testing.assert_allclose(np.asarray(a.qpos), np.asarray(b.qpos),
                               atol=5e-6)
    np.testing.assert_allclose(np.asarray(a.qvel), np.asarray(b.qvel),
                               atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(a.sensordata), np.asarray(b.sensordata), atol=5e-5)


@pytest.mark.slow
@pytest.mark.nocache
def test_delayed_closed_loop_lane_predictor():
    """predictor='lane' runs the pipelined loop through the batch-minor
    predictor and stays consistent with the AoS predictor."""
    st = _standing_state()
    cfg = mpc_runtime.MPCConfig(
        solver="mppi",
        mppi=mppi.MPPIConfig(
            num_samples=8, rollout=RCFG, lane=True, lane_engine_impl="leg",
            lane_newton_iterations=3, lane_ls_iterations=8,
        ),
        plant_frame_skip=2,
        plant_max_contacts=8,
        plant_solver_iterations=3,
    )
    cost_fn = rollout.make_cost_fn(PM)

    def run(predictor):
        carry = mpc_runtime.init_carry(
            PM, cfg, horizon=5, key=jax.random.PRNGKey(3))
        return jax.jit(
            lambda c, p: mpc_runtime.delayed_closed_loop(
                PM, cfg, cost_fn, c, p, CMD, 3, predictor=predictor)
        )(carry, st)

    _, phys_l, (ctrls_l, _, _) = run("lane")
    _, phys_a, (ctrls_a, _, _) = run("aos")
    assert bool(jnp.isfinite(ctrls_l).all())
    assert bool(phys_l.qpos[2] > 0.03)
    # same solve from (nearly) the same predicted state -> same controls
    np.testing.assert_allclose(np.asarray(ctrls_l), np.asarray(ctrls_a),
                               atol=1e-3)
    # 'auto' resolves to the lane predictor for a lane-scoring planner
    _, _, (ctrls_auto, _, _) = run("auto")
    np.testing.assert_allclose(np.asarray(ctrls_auto),
                               np.asarray(ctrls_l), atol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    from quadruped_gym_tpu.runtime import checkpoint

    carry = mpc_runtime.init_carry(
        PM, mpc_runtime.MPCConfig(), horizon=5, key=jax.random.PRNGKey(1)
    )
    path = str(tmp_path / "ck")
    checkpoint.save(path, carry, step=7)
    restored, step = checkpoint.restore(path, carry)
    assert step == 7
    np.testing.assert_allclose(np.asarray(restored.mean), np.asarray(carry.mean))
