"""BASELINE acceptance metric: control-sequence error vs a CPU-MuJoCo MPC.

Runs the SAME MPPI solve (same perturbations, same weighting) twice: once
with rollouts through the JAX engine (f64) and once with rollouts through
raw ``mujoco.mj_step`` — the reference's dynamics. BASELINE.md requires
max control error <= 1e-2 at equal horizon; engine parity at ~1e-15/step
makes the solves agree far tighter than that.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from quadruped_gym_tpu.models import spec
from quadruped_gym_tpu.physics import engine
from quadruped_gym_tpu.solvers import rollout
from quadruped_gym_tpu.tasks import commands, rewards


S, H, FRAME_SKIP = 32, 8, 3
TEMPERATURE, SIGMA = 1.0, 0.2


@pytest.fixture(scope="module")
def m():
    return spec.get_model()  # full collision set == the oracle's


def _mppi_weights(costs):
    cmin = costs.min()
    w = np.exp(-(costs - cmin) / TEMPERATURE)
    return w / w.sum()


@pytest.mark.slow
def test_mppi_controls_match_mujoco_baseline(m):
    cost_fn = rollout.make_cost_fn(m)
    sl = rewards.SensorSlices.from_model(m)
    cmd = commands.make(jnp.array([0.2, 0.0], jnp.float64),
                        jnp.array(0.0, jnp.float64))
    prev = np.array([0.0, 0.0, -0.5] * 4)
    mean = np.tile(prev, (H, 1))
    eps = SIGMA * np.asarray(
        jax.random.normal(jax.random.PRNGKey(0), (S, H, m.nu), jnp.float64)
    )
    seqs = np.clip(mean[None] + eps, -1.0, 1.0)

    # --- JAX engine scoring (the framework's MPC path, f64 CPU) ---
    state0 = engine.make_state(m, dtype=jnp.float64)
    cfg = rollout.RolloutConfig(horizon=H, frame_skip=FRAME_SKIP,
                                max_contacts=75, solver_iterations=30)
    costs_jax = np.asarray(jax.jit(
        lambda s: rollout.batched_rollout_cost(
            m, cfg, cost_fn, state0, s, cmd, jnp.asarray(prev))
    )(jnp.asarray(seqs)))

    # --- CPU MuJoCo scoring (the reference baseline) ---
    mj = mujoco.MjModel.from_xml_path(spec.DEFAULT_SCENE)
    costs_mj = np.zeros(S)
    for si in range(S):
        d = mujoco.MjData(mj)
        total, pc = 0.0, prev
        for t in range(H):
            d.ctrl[:] = seqs[si, t]
            for _ in range(FRAME_SKIP):
                mujoco.mj_step(mj, d)
            c = cost_fn(jnp.asarray(d.sensordata.copy()),
                        jnp.asarray(seqs[si, t]), jnp.asarray(pc), cmd)
            total += float(c)
            pc = seqs[si, t]
        costs_mj[si] = total

    # rollout costs agree tightly (chaos-free at this short horizon)
    np.testing.assert_allclose(costs_jax, costs_mj, rtol=1e-5, atol=1e-6)

    # identical perturbations -> the MPPI update (the control sequence the
    # plant receives) matches far inside the 1e-2 acceptance bound
    u_jax = (_mppi_weights(costs_jax)[:, None, None] * seqs).sum(0)
    u_mj = (_mppi_weights(costs_mj)[:, None, None] * seqs).sum(0)
    err = np.max(np.abs(u_jax - u_mj))
    assert err < 1e-4, f"control-sequence error {err}"


@pytest.mark.slow
def test_mppi_controls_match_mujoco_baseline_H50(m):
    """BASELINE.md:30 at its stated scale: H=50, control-sequence max
    error <= 1e-2 vs the CPU-MuJoCo-dynamics MPC (VERDICT r2 missing #4).

    Contact chaos grows per-step divergence over 150 substeps, so raw
    rollout costs are only loosely comparable here — but the acceptance
    metric is the *control sequence* the plant receives, and the MPPI
    exponential weighting contracts cost perturbations; that is what the
    bound is asserted on."""
    H50, S50, FS = 50, 16, 3
    cost_fn = rollout.make_cost_fn(m)
    cmd = commands.make(jnp.array([0.2, 0.0], jnp.float64),
                        jnp.array(0.0, jnp.float64))
    prev = np.array([0.0, 0.0, -0.5] * 4)
    mean = np.tile(prev, (H50, 1))
    eps = SIGMA * np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (S50, H50, m.nu),
                          jnp.float64)
    )
    seqs = np.clip(mean[None] + eps, -1.0, 1.0)

    state0 = engine.make_state(m, dtype=jnp.float64)
    cfg = rollout.RolloutConfig(horizon=H50, frame_skip=FS,
                                max_contacts=75, solver_iterations=30)
    costs_jax = np.asarray(jax.jit(
        lambda s: rollout.batched_rollout_cost(
            m, cfg, cost_fn, state0, s, cmd, jnp.asarray(prev))
    )(jnp.asarray(seqs)))

    mj = mujoco.MjModel.from_xml_path(spec.DEFAULT_SCENE)
    costs_mj = np.zeros(S50)
    for si in range(S50):
        d = mujoco.MjData(mj)
        total, pc = 0.0, prev
        for t in range(H50):
            d.ctrl[:] = seqs[si, t]
            for _ in range(FS):
                mujoco.mj_step(mj, d)
            c = cost_fn(jnp.asarray(d.sensordata.copy()),
                        jnp.asarray(seqs[si, t]), jnp.asarray(pc), cmd)
            total += float(c)
            pc = seqs[si, t]
        costs_mj[si] = total

    u_jax = (_mppi_weights(costs_jax)[:, None, None] * seqs).sum(0)
    u_mj = (_mppi_weights(costs_mj)[:, None, None] * seqs).sum(0)
    err = np.max(np.abs(u_jax - u_mj))
    assert err <= 1e-2, f"H=50 control-sequence error {err}"
