"""Headline benchmark: sampled MPC rollouts/s/chip at H=50.

BASELINE.md north star: >= 100,000 H=50 rollouts/s on one TPU chip
(each rollout = 50 control steps x 5 physics substeps = 250 contact-solved
dynamics steps + stage costs). Scores through the fused whole-rollout
Pallas kernel on the feet-only decimated-hull planning model at the
2/4 newton/linesearch contact budget — the quality-validated planner
configuration: the closed-loop study in DOCS.md §5 measured budgets
2/4, 4/8 and 8/12 to track a commanded walk identically (mean velocity
error 0.049-0.055 m/s, all upright), receding-horizon feedback
absorbing solver truncation. Prints ONE JSON line.
"""

import json
import os
import time

import jax

# persistent compile cache: the lane engine's unrolled step is a big XLA
# program (~minutes first compile); repeated bench runs skip it
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


BASELINE_ROLLOUTS_PER_S = 100_000.0


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--plant", choices=("planning", "full"), default="planning",
        help="planning: feet-only decimated hulls at the quality-validated "
        "2/4 newton/linesearch budget (headline). full: the full lower-leg "
        "collision plant (feet+shins+ankle servos) at the conservative 4/8 "
        "budget.",
    )
    ap.add_argument("--block", type=int, default=None,
                    help="Pallas batch tile (default: engine default)")
    args = ap.parse_args(argv)

    from quadruped_gym_tpu.models import spec
    from quadruped_gym_tpu.physics import engine
    from quadruped_gym_tpu.solvers import rollout

    full_plant = args.plant == "full"
    m = spec.get_fast_plant_model() if full_plant else spec.get_planning_model()
    newton, ls = (4, 8) if full_plant else (2, 4)
    metric = (
        "mpc_rollouts_per_s_per_chip_H50_full_plant" if full_plant
        else "mpc_rollouts_per_s_per_chip_H50"
    )
    cfg = rollout.RolloutConfig(horizon=50, frame_skip=5)
    # rollouts per solve: large enough to amortize the ~30 ms axon-tunnel
    # round trip per dispatch (device-side cost is ~5 ms per 1024 lanes;
    # throughput asymptotes ~205k r/s)
    S = 65536
    cost_fn = rollout.make_cost_fn(m)
    state = engine.make_state(m)
    from quadruped_gym_tpu.tasks import commands

    cmd = commands.make(jnp.array([0.2, 0.0]), jnp.array(0.0))
    prev = jnp.asarray(np.array([0.0, 0.0, -0.5] * 4), jnp.float32)

    kw = {} if args.block is None else {"block": args.block}

    @jax.jit
    def score(seqs):
        return rollout.lane_batched_rollout_cost(
            m, cfg, cost_fn, state, seqs, cmd, prev,
            newton_iterations=newton, ls_iterations=ls, engine_impl="fused",
            **kw,
        )

    # distinct control batches per timed iteration: the axon TPU tunnel
    # memoizes executions on bitwise-identical inputs, which would fake
    # the timing (see tests/conftest.py note / memory)
    iters = 5
    all_seqs = [
        jnp.clip(
            prev[None, None]
            + 0.2 * jax.random.normal(
                jax.random.PRNGKey(i), (S, cfg.horizon, m.nu)
            ),
            -1.0, 1.0,
        ).astype(jnp.float32)
        for i in range(iters + 1)
    ]

    jax.block_until_ready(score(all_seqs[-1]))  # compile + warm up

    # synchronous per-solve timing: blocking each solve keeps dispatch
    # pipelining from overstating throughput (~1.7x observed if the 5
    # dispatches are enqueued back to back and blocked once at the end)
    dt = 0.0
    for seqs in all_seqs[:iters]:
        jax.block_until_ready(seqs)
        t0 = time.perf_counter()
        jax.block_until_ready(score(seqs))
        dt += time.perf_counter() - t0

    rps = S * iters / dt
    print(json.dumps({
        "metric": metric,
        "value": round(rps, 1),
        "unit": "rollouts/s",
        "vs_baseline": round(rps / BASELINE_ROLLOUTS_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
