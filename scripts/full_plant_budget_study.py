"""Closed-loop quality frontier for the FULL-plant fused planner budget.

VERDICT r4 #8: the full-fidelity plant bench (feet + shin + ankle-servo
colliders, ``bench.py --plant full``) runs the conservative 4/8
newton/linesearch contact budget and lands at ~110k rollouts/s — 1.11x
the 100k target, vs 296k for the feet-only planning model at its
quality-validated 2/4 budget (DOCS.md §5 frontier study). This script
applies the SAME validation methodology to the full-plant model: a
closed-loop velocity-tracking walk (fused full-plant planner vs the
richer undecimated plant, planner/plant mismatch included) at each
candidate budget, all as one jitted scan on the chip. If a tighter
budget tracks the command within the frontier tolerance (mean velocity
error spread < 0.01 m/s across budgets, never flipped — the DOCS §5
acceptance), it is quality-equivalent and the bench default can adopt
it honestly.

Also sweeps the secondary-hull decimation (shin/servo support
directions), the other throughput lever VERDICT r4 named.

Writes artifacts/full_plant_budget_study.json. Run on the TPU:
    python scripts/full_plant_budget_study.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def run_case(newton, ls, n_secondary, n_steps, speed, key):
    from quadruped_gym_tpu.models import spec
    from quadruped_gym_tpu.physics import engine
    from quadruped_gym_tpu.runtime import mpc_runtime
    from quadruped_gym_tpu.solvers import mppi, rollout
    from quadruped_gym_tpu.tasks import commands
    from quadruped_gym_tpu.tasks.rewards import SensorSlices

    pm = spec.get_fast_plant_model(n_secondary=n_secondary)
    # the plant is the RICHER undecimated full-collision model: the
    # planner must track reality it did not perfectly model
    plant = spec.get_model(collision_geom_prefixes=spec.MPC_COLLISION_PREFIXES)
    cfg = mpc_runtime.MPCConfig(
        solver="mppi",
        mppi=mppi.MPPIConfig(
            num_samples=1024, sigma=0.25, temperature=0.5, iterations=2,
            lane=True, lane_engine_impl="fused",
            lane_newton_iterations=newton, lane_ls_iterations=ls,
            rollout=rollout.RolloutConfig(horizon=20, frame_skip=5),
        ),
        plant_frame_skip=5, plant_max_contacts=12,
        plant_solver_iterations=4,
    )
    cost_fn = rollout.make_cost_fn(pm)
    cmd = commands.make(jnp.array([speed, 0.0]), jnp.array(0.0))
    phys = engine.make_state(plant)
    carry = mpc_runtime.init_carry(pm, cfg, horizon=20, key=key)

    loop = jax.jit(
        lambda c, p: mpc_runtime.closed_loop(
            pm, cfg, cost_fn, c, p, cmd, n_steps, plant_model=plant
        )
    )
    t0 = time.time()
    carry, phys, (ctrls, sens, costs) = jax.block_until_ready(loop(carry, phys))
    wall = time.time() - t0

    sl = SensorSlices.from_model(pm)
    pos = np.asarray(sens[:, sl.pos:sl.pos + 3])
    vel = np.asarray(sens[:, sl.vel:sl.vel + 2])
    z = np.asarray(sens[:, sl.zaxis + 2])
    warm = n_steps // 4
    return {
        "budget": f"{newton}/{ls}",
        "n_secondary": n_secondary,
        "mean_vx_after_warmup": float(vel[warm:, 0].mean()),
        "mean_vel_error": float(np.abs(vel[warm:, 0] - speed).mean()),
        "mean_abs_vy": float(np.abs(vel[warm:, 1]).mean()),
        "forward_m": float(pos[-1, 0]),
        "lateral_drift_m": float(abs(pos[-1, 1])),
        "min_uprightness": float(z.min()),
        "flipped": bool(z.min() <= 0),
        "wall_s": wall,
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--speed", type=float, default=0.15)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    dev = jax.devices()[0]
    print("device:", dev)
    cases = [
        (4, 8, 64),   # the shipping conservative configuration
        (2, 4, 64),   # candidate: planning-model budget on the full plant
        (2, 4, 32),   # candidate: + harder secondary-hull decimation
    ]
    key = jax.random.PRNGKey(args.seed)
    results = []
    for newton, ls, nsec in cases:
        print(f"case budget={newton}/{ls} n_secondary={nsec} ...", flush=True)
        r = run_case(newton, ls, nsec, args.steps, args.speed, key)
        print(json.dumps(r))
        results.append(r)

    ref = results[0]
    spread = max(abs(r["mean_vel_error"] - ref["mean_vel_error"])
                 for r in results)
    verdict = {
        "tolerance_mps": 0.01,
        "max_vel_error_spread_vs_4_8": spread,
        "all_upright": all(not r["flipped"] for r in results),
        "equivalent": spread < 0.01 and all(not r["flipped"] for r in results),
    }
    report = {
        "device": str(dev),
        "protocol": {
            "what": "closed-loop velocity tracking, fused full-plant "
                    "planner vs richer undecimated plant (model mismatch "
                    "included), one jitted scan",
            "steps": args.steps, "command_mps": args.speed,
            "acceptance": "DOCS.md §5 frontier criterion: mean velocity "
                          "error within 0.01 m/s of the 4/8 reference, "
                          "never flipped",
        },
        "cases": results,
        "verdict": verdict,
    }
    out = os.path.join(_REPO, "artifacts", "full_plant_budget_study.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(verdict, indent=1))
    print("wrote", out)


if __name__ == "__main__":
    main()
