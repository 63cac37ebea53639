"""Horizon-stage pipeline parallelism (the PP analog, SURVEY §2.5).

GPipe schedule over the MPC horizon on a virtual 4-device stage mesh:
boundary states hop stages via lax.ppermute, microbatched scenarios fill
the pipe. Equivalence oracle: the sequential vmapped rollout."""

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
def stage_mesh(cpu_devices):
    return parallel.make_mesh(
        cpu_devices[:4], axis_names=(parallel.STAGE_AXIS,), shape=(4,)
    )


def _setup(m, S, H):
    cfg = rollout.RolloutConfig(horizon=H, frame_skip=1,
                                max_contacts=8, solver_iterations=2)
    cost_fn = rollout.make_cost_fn(m)
    # airborne + nonzero velocity: at the zero-velocity reset state the
    # cost's unit(v_xy) is chaotic under compilation-level reordering
    # (SPMD partitioning fuses differently), which amplifies to ~1e-8
    # over a few steps; away from that singularity the pipeline matches
    # the sequential scan at reduction-rounding level
    state0 = engine.make_state(m, dtype=jnp.float64)
    state0 = state0._replace(
        qvel=state0.qvel.at[0].set(0.12).at[1].set(0.03)
    )
    cmd = commands.make(jnp.array([0.2, 0.0]), jnp.array(0.0))
    prev = jnp.asarray(np.array([0.0, 0.0, -0.5] * 4), jnp.float64)
    seqs = jnp.clip(
        prev[None, None]
        + 0.2 * jax.random.normal(jax.random.PRNGKey(0), (S, H, m.nu),
                                  jnp.float64),
        -1.0, 1.0,
    )
    return cfg, cost_fn, state0, cmd, prev, seqs


@pytest.mark.slow
def test_pipelined_costs_match_sequential(m, stage_mesh):
    """4 stages x 2-step segments, 2 microbatches == the vmapped scan
    (same physics steps in the same order; only the cost reduction
    regroups, so agreement is at reduction-rounding level in f64)."""
    cfg, cost_fn, state0, cmd, prev, seqs = _setup(m, S=8, H=8)

    ref = np.asarray(jax.jit(
        lambda s: rollout.batched_rollout_cost(
            m, cfg, cost_fn, state0, s, cmd, prev)
    )(seqs))
    piped = np.asarray(jax.jit(
        lambda s: parallel.pipelined_rollout_cost(
            m, cfg, cost_fn, state0, s, cmd, prev, stage_mesh,
            num_microbatches=2)
    )(seqs))
    np.testing.assert_allclose(piped, ref, rtol=1e-12, atol=1e-10)


@pytest.mark.slow
def test_pipelined_microbatch_counts(m, stage_mesh):
    """The schedule is microbatch-count invariant (bubble changes, math
    doesn't): M=1 (pure staging) and M=4 agree with M=2."""
    cfg, cost_fn, state0, cmd, prev, seqs = _setup(m, S=4, H=4)

    outs = [
        np.asarray(jax.jit(
            lambda s, mm=mm: parallel.pipelined_rollout_cost(
                m, cfg, cost_fn, state0, s, cmd, prev, stage_mesh,
                num_microbatches=mm)
        )(seqs))
        for mm in (1, 2, 4)
    ]
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-12, atol=1e-10)
    np.testing.assert_allclose(outs[1], outs[2], rtol=1e-12, atol=1e-10)


@pytest.mark.slow
def test_pipelined_mppi_plan_runs(m, stage_mesh):
    """End-to-end MPPI update scored through the pipe: finite, box-kept,
    and equal to a replicated MPPI update with the same perturbations."""
    cfg = mppi.MPPIConfig(
        num_samples=8, sigma=0.2, temperature=1.0, iterations=1,
        rollout=rollout.RolloutConfig(horizon=4, frame_skip=1,
                                      max_contacts=8, solver_iterations=2),
    )
    cost_fn = rollout.make_cost_fn(m)
    state0 = engine.make_state(m, dtype=jnp.float64)
    state0 = state0._replace(
        qvel=state0.qvel.at[0].set(0.12).at[1].set(0.03)
    )  # off the unit(v~0) chaos point (see _setup)
    cmd = commands.make(jnp.array([0.2, 0.0]), jnp.array(0.0))
    prev = jnp.asarray(np.array([0.0, 0.0, -0.5] * 4), jnp.float64)
    mean = jnp.tile(prev, (4, 1))

    ctrl, new_mean, best = jax.jit(
        lambda st, mn, k: parallel.pipelined_mppi_plan(
            m, cfg, cost_fn, st, mn, cmd, prev, k, stage_mesh)
    )(state0, mean, jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(best))
    assert new_mean.shape == (4, m.nu)
    assert (np.abs(np.asarray(ctrl)) <= 1.0 + 1e-9).all()

    # oracle: same perturbations scored sequentially
    eps = cfg.sigma * jax.random.normal(
        jax.random.PRNGKey(1), (8, 4, m.nu), mean.dtype)
    seqs = jnp.clip(mean[None] + eps, -1.0, 1.0)
    costs = jax.jit(lambda s: rollout.batched_rollout_cost(
        m, cfg.rollout, cost_fn, state0, s, cmd, prev))(seqs)
    w = jax.nn.softmax(-(costs - costs.min()) / cfg.temperature)
    ref_mean = np.asarray(jnp.einsum("s,shu->hu", w, seqs))
    np.testing.assert_allclose(np.asarray(new_mean), ref_mean,
                               rtol=1e-9, atol=1e-9)
