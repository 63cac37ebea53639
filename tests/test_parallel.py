"""Multi-device sharding tests on the 8-device virtual CPU mesh.

SURVEY.md §4: collectives must be testable without a pod — this exercises
shard_map + psum/pmin over ``--xla_force_host_platform_device_count=8``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadruped_gym_tpu import parallel
from quadruped_gym_tpu.models import spec
from quadruped_gym_tpu.physics import engine
from quadruped_gym_tpu.solvers import mppi, rollout
from quadruped_gym_tpu.tasks import commands


@pytest.fixture(scope="module")
def m():
    return spec.get_model(collision_geom_prefixes=spec.MPC_COLLISION_PREFIXES)


@pytest.fixture(scope="module")
def small_rollout_cfg():
    return rollout.RolloutConfig(horizon=4, frame_skip=2, max_contacts=8,
                                 solver_iterations=4)


def _setup(m, airborne=False):
    state = engine.make_state(m)
    if airborne:
        # equivalence tests need well-conditioned dynamics+cost: the stiff
        # contact solve is fp-chaotic and unit(v_xy) in the direction reward
        # is discontinuous at v=0, so different XLA programs (jit vs eager,
        # different batch tilings) legitimately diverge through ground
        # impact or from a zero-velocity start. Lift the robot (contact-free)
        # and give it a forward velocity (unit() well-conditioned).
        state = state._replace(
            qpos=state.qpos.at[2].set(0.6),
            qvel=state.qvel.at[0].set(0.2),
        )
    cmd = commands.make(jnp.array([0.2, 0.0]), jnp.array(0.0))
    prev = jnp.asarray(np.array([0.0, 0.0, -0.5] * 4), jnp.float32)
    cost_fn = rollout.make_cost_fn(m)
    return state, cmd, prev, cost_fn


@pytest.mark.slow
def test_sharded_rollout_costs_match_local(m, small_rollout_cfg, cpu_devices):
    assert len(cpu_devices) >= 8
    mesh = parallel.make_mesh(cpu_devices[:8])
    state, cmd, prev, cost_fn = _setup(m, airborne=True)
    key = jax.random.PRNGKey(0)
    seqs = 0.3 * jax.random.normal(key, (16, small_rollout_cfg.horizon, m.nu),
                                   jnp.float32)

    local = rollout.batched_rollout_cost(
        m, small_rollout_cfg, cost_fn, state, seqs, cmd, prev)
    sharded = parallel.sharded_rollout_costs(
        m, small_rollout_cfg, cost_fn, state, seqs, cmd, prev, mesh)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(local),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_sharded_mppi_plan_runs_and_is_finite(m, small_rollout_cfg, cpu_devices):
    mesh = parallel.make_mesh(cpu_devices[:8])
    state, cmd, prev, cost_fn = _setup(m)
    cfg = mppi.MPPIConfig(num_samples=32, sigma=0.2, temperature=1.0,
                          iterations=2, rollout=small_rollout_cfg)
    mean = jnp.tile(prev, (small_rollout_cfg.horizon, 1))
    res = parallel.sharded_mppi_plan(
        m, cfg, cost_fn, state, mean, cmd, prev, jax.random.PRNGKey(3), mesh)
    assert res.mean.shape == (small_rollout_cfg.horizon, m.nu)
    assert np.isfinite(np.asarray(res.mean)).all()
    assert np.isfinite(float(res.best_cost))
    assert float(res.best_cost) <= float(res.mean_cost) + 1e-6
    # plan respects actuator ctrlrange
    lo = np.asarray(m.actuator_ctrlrange[:, 0])
    hi = np.asarray(m.actuator_ctrlrange[:, 1])
    assert (np.asarray(res.mean) >= lo - 1e-6).all()
    assert (np.asarray(res.mean) <= hi + 1e-6).all()


@pytest.mark.slow
def test_sharded_mppi_fused_engine_runs(cpu_devices):
    """Multi-chip MPPI with the fused whole-rollout kernel per shard
    (interpret mode on the virtual CPU mesh): the config-driven
    lane_engine_impl="fused" path compiles under shard_map and returns a
    finite, in-bounds plan."""
    pm = spec.get_planning_model()
    mesh = parallel.make_mesh(cpu_devices[:2])
    state, cmd, prev, cost_fn = _setup(pm)
    cfg = mppi.MPPIConfig(
        num_samples=16, sigma=0.2, iterations=1,
        lane=True, lane_engine_impl="fused",
        rollout=rollout.RolloutConfig(horizon=2, frame_skip=1),
    )
    mean = jnp.tile(prev, (2, 1))
    res = parallel.sharded_mppi_plan(
        pm, cfg, cost_fn, state, mean, cmd, prev, jax.random.PRNGKey(5), mesh)
    assert np.isfinite(np.asarray(res.mean)).all()
    assert np.isfinite(float(res.best_cost))


@pytest.mark.slow
def test_sharded_mppi_matches_single_shard_semantics(m, small_rollout_cfg,
                                                     cpu_devices):
    """On a 1-device mesh the collective reductions are identities, so the
    sharded solve must equal the single-chip solver run with the same
    folded-in key stream."""
    mesh = parallel.make_mesh(cpu_devices[:1])
    state, cmd, prev, cost_fn = _setup(m, airborne=True)
    cfg = mppi.MPPIConfig(num_samples=8, sigma=0.2, temperature=1.0,
                          iterations=1, rollout=small_rollout_cfg)
    mean = jnp.tile(prev, (small_rollout_cfg.horizon, 1))
    key = jax.random.PRNGKey(7)
    res_sh = parallel.sharded_mppi_plan(
        m, cfg, cost_fn, state, mean, cmd, prev, key, mesh)
    res_lo = mppi.plan(m, cfg, cost_fn, state, mean, cmd, prev,
                       jax.random.fold_in(key, 0))
    np.testing.assert_allclose(np.asarray(res_sh.mean), np.asarray(res_lo.mean),
                               rtol=1e-5, atol=1e-6)
