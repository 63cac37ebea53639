"""Time the pieces of the real-time MPC step on-device (K-step scans):
(a) one AoS engine.control_step (predictor/plant twin), (b) one MPPI
plan_and_act solve, (c) the combined delayed-loop body. Separates which
part of the 100 Hz budget each consumes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from quadruped_gym_tpu.models import spec
from quadruped_gym_tpu.physics import engine
from quadruped_gym_tpu.runtime import mpc_runtime
from quadruped_gym_tpu.solvers import mppi, rollout
from quadruped_gym_tpu.tasks import commands

HOLD = np.array([0.0, 0.0, -0.5] * 4)
K = 20


def timed_scan(make_body, init, rng):
    @jax.jit
    def run(c0):
        c, _ = jax.lax.scan(make_body(), c0, None, length=K)
        return c

    jax.block_until_ready(run(init))
    ts = []
    for _ in range(3):
        init2 = jax.tree.map(
            lambda x: x + jnp.asarray(
                1e-5 * rng.standard_normal(np.shape(x)), x.dtype)
            if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
            init)
        jax.block_until_ready(init2)
        t0 = time.perf_counter()
        jax.block_until_ready(run(init2))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / K * 1e3  # ms per step


def main():
    rng = np.random.default_rng(time.time_ns())
    m = spec.get_planning_model()
    cost_fn = rollout.make_cost_fn(m)
    cfg = mpc_runtime.MPCConfig(
        solver="mppi",
        mppi=mppi.MPPIConfig(
            num_samples=1024, sigma=0.2, iterations=1,
            rollout=rollout.RolloutConfig(horizon=50, frame_skip=5),
            lane=True, lane_engine_impl="fused",
            lane_newton_iterations=2, lane_ls_iterations=4,
        ),
        plant_frame_skip=5,
    )
    cmd = commands.make(jnp.asarray([0.2, 0.0]), jnp.asarray(0.0))
    st = engine.make_state(m)
    ctrl = jnp.asarray(HOLD, jnp.float32)
    rcfg = cfg.rollout

    # (a) AoS control_step at the planner budget (the predictor)
    def body_aos():
        def body(phys, _):
            phys = engine.control_step(
                m, phys, ctrl, cfg.plant_frame_skip,
                max_contacts=rcfg.max_contacts,
                solver_iterations=rcfg.solver_iterations)
            return phys, None
        return body
    ms_aos = timed_scan(body_aos, st, rng)
    print(json.dumps({"part": "aos_control_step_planner_budget",
                      "ms": round(ms_aos, 3)}), flush=True)

    # (a2) AoS control_step at the plant budget
    def body_aos_plant():
        def body(phys, _):
            phys = engine.control_step(
                m, phys, ctrl, cfg.plant_frame_skip,
                max_contacts=cfg.plant_max_contacts,
                solver_iterations=cfg.plant_solver_iterations)
            return phys, None
        return body
    ms_aosp = timed_scan(body_aos_plant, st, rng)
    print(json.dumps({"part": "aos_control_step_plant_budget",
                      "ms": round(ms_aosp, 3)}), flush=True)

    # (b) the MPPI solve alone
    carry0 = mpc_runtime.init_carry(m, cfg, 50, jax.random.PRNGKey(0))

    def body_solve():
        def body(c, _):
            ctrl_next, c2, _ = mpc_runtime.plan_and_act(
                m, cfg, cost_fn, c, st, cmd)
            return c2, ctrl_next
        return body
    ms_solve = timed_scan(body_solve, carry0, rng)
    print(json.dumps({"part": "mppi_solve_1024xH50",
                      "ms": round(ms_solve, 3)}), flush=True)

    print(json.dumps({
        "sum_ms": round(ms_aos + ms_aosp + ms_solve, 3),
        "note": "delayed_closed_loop body = predictor AoS step + solve "
                "+ plant AoS step",
    }))


if __name__ == "__main__":
    main()
