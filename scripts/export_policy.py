"""Export a params-only policy artifact from a training checkpoint.

The trainer persists the full TrainState (params + optimizer moments +
env/rng state) in ``runs/<name>/policy`` — ~30 MB. The committed,
restorable artifact the repo ships (``artifacts/walk_rN/policy_params``,
exercised by ``tests/test_walk_policy.py``) is the policy params tree
alone, the analog of the reference's persisted ``policy.zip``
(``/root/reference/src/train_quadruped.py:137-141``).

Run:  python scripts/export_policy.py --ckpt runs/walk_r5/policy \
          --out artifacts/walk_r5/policy_params
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

# CPU-only: restoring a checkpoint needs no chip, and initializing the
# axon tunnel from a utility script risks wedging concurrent chip jobs.
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True, help="trainer checkpoint dir")
    p.add_argument("--out", required=True, help="artifact dir to write")
    p.add_argument("--obs-window", type=int, default=10)
    args = p.parse_args(argv)

    from quadruped_gym_tpu.models import spec
    from quadruped_gym_tpu.rl import ppo
    from quadruped_gym_tpu.runtime import checkpoint
    from quadruped_gym_tpu.tasks import walking

    m = spec.get_model(collision_geom_prefixes=spec.MPC_COLLISION_PREFIXES)
    env_cfg = walking.WalkingConfig(
        obs_window=args.obs_window, partial_obs=True
    )
    ts = ppo.init_train_state(
        m, env_cfg, ppo.PPOConfig(), jax.random.PRNGKey(0)
    )
    ts, step = checkpoint.restore(args.ckpt, ts)
    params = jax.device_get(ts.params)
    n = sum(np.asarray(l).size for l in jax.tree_util.tree_leaves(params))
    checkpoint.save(args.out, params, step=step)
    print(f"wrote {args.out}: {n:,} params at iteration {step}")


if __name__ == "__main__":
    main()
