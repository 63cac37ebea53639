"""Diagnose the per-solve latency of the fused rollout kernel at small
batch (the MPC real-time regime), excluding axon-tunnel dispatch: run K
back-to-back solves inside a single jitted lax.scan and report device
time per solve for a (samples, block) grid.

Usage: python scripts/latency_sweep.py
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
from quadruped_gym_tpu.solvers import rollout
from quadruped_gym_tpu.tasks import commands

HOLD = np.array([0.0, 0.0, -0.5] * 4)
K = 20  # solves per dispatch


def main():
    rng = np.random.default_rng(time.time_ns())
    m = spec.get_planning_model()
    cost_fn = rollout.make_cost_fn(m)
    cfg = rollout.RolloutConfig(horizon=50, frame_skip=5)
    state = engine.make_state(m)
    cmd = commands.make(jnp.asarray([0.2, 0.0]), jnp.asarray(0.0))
    prev = jnp.asarray(HOLD, jnp.float32)

    results = []
    # the lane layout folds batch to (8, S/8); a block tile must keep the
    # last dim a multiple of 128 lanes => block must be a multiple of 1024
    for S in (1024, 2048, 4096, 8192, 16384):
        for block in (1024, 2048):
            if block > S:
                continue

            def score(seqs, block=block):
                return rollout.lane_batched_rollout_cost(
                    m, cfg, cost_fn, state, seqs, cmd, prev,
                    newton_iterations=2, ls_iterations=4,
                    engine_impl="fused", block=block)

            @jax.jit
            def scan_k(seqs0):
                def body(seqs, _):
                    c = score(seqs)
                    # feed costs back into the controls so solves can't be
                    # CSE'd or executed as identical memoized programs
                    seqs = jnp.clip(
                        seqs + 1e-6 * c[:, None, None], -1.0, 1.0)
                    return seqs, jnp.sum(c)
                _, cs = jax.lax.scan(body, seqs0, None, length=K)
                return cs

            seqs0 = jnp.clip(
                jnp.asarray(prev)[None, None] + 0.2 * jnp.asarray(
                    rng.standard_normal((S, 50, m.nu)), np.float32),
                -1.0, 1.0)
            jax.block_until_ready(scan_k(seqs0))  # compile
            ts = []
            for _ in range(3):
                s2 = jnp.clip(seqs0 + jnp.asarray(
                    1e-4 * rng.standard_normal(seqs0.shape), np.float32),
                    -1.0, 1.0)
                jax.block_until_ready(s2)
                t0 = time.perf_counter()
                jax.block_until_ready(scan_k(s2))
                ts.append(time.perf_counter() - t0)
            wall = float(np.median(ts))
            per_solve_ms = (wall / K) * 1e3
            row = {"samples": S, "block": block,
                   "per_solve_ms": round(per_solve_ms, 3),
                   "rollouts_per_s": round(S * K / wall, 1)}
            results.append(row)
            print(json.dumps(row), flush=True)

    best = min(results, key=lambda r: r["per_solve_ms"])
    print("# best:", json.dumps(best))


if __name__ == "__main__":
    main()
