"""Headline benchmark: sampled MPC rollouts/s/chip at H=50.

BASELINE.md north star: >= 100,000 H=50 rollouts/s on one TPU chip
(each rollout = 50 control steps x 5 physics substeps = 250 contact-solved
dynamics steps + stage costs). Prints ONE JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


BASELINE_ROLLOUTS_PER_S = 100_000.0


def main():
    from quadruped_gym_tpu.models import spec
    from quadruped_gym_tpu.physics import engine
    from quadruped_gym_tpu.solvers import rollout
    from quadruped_gym_tpu.tasks import commands

    m = spec.get_model(collision_geom_prefixes=spec.MPC_COLLISION_PREFIXES)
    cfg = rollout.RolloutConfig(
        horizon=50, frame_skip=5, max_contacts=12, solver_iterations=8
    )
    S = 4096  # rollouts per solve (BASELINE config 2/3 scale)
    cost_fn = rollout.make_cost_fn(m)
    state = engine.make_state(m)
    cmd = commands.make(jnp.array([0.2, 0.0]), jnp.array(0.0))
    prev = jnp.asarray(np.array([0.0, 0.0, -0.5] * 4), jnp.float32)

    @jax.jit
    def score(seqs):
        return rollout.batched_rollout_cost(m, cfg, cost_fn, state, seqs, cmd, prev)

    key = jax.random.PRNGKey(0)
    seqs = jnp.clip(
        prev[None, None] + 0.2 * jax.random.normal(key, (S, cfg.horizon, m.nu)),
        -1.0, 1.0,
    ).astype(jnp.float32)

    jax.block_until_ready(score(seqs))  # compile + warm up
    jax.block_until_ready(score(seqs))

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = score(seqs)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    rps = S * iters / dt
    print(json.dumps({
        "metric": "mpc_rollouts_per_s_per_chip_H50",
        "value": round(rps, 1),
        "unit": "rollouts/s",
        "vs_baseline": round(rps / BASELINE_ROLLOUTS_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
