"""Walking-policy evaluation report under the REFERENCE's eval protocol.

The reference evaluates with ``deterministic=False``
(``/root/reference/src/eval_quadruped.py:23``) — actions sampled from the
policy's Gaussian, not its mean. VERDICT r3 flagged that the committed
policy only scored positive deterministically; this artifact therefore
reports BOTH modes, stochastic across several seeds, so the claim "passes
the reference's own protocol" is checkable from one JSON.

Writes ``artifacts/<name>/eval_report.json``. Run after ``rl.train``:

    python scripts/eval_report.py --policy runs/walk_r4/policy \
        --out artifacts/walk_r4 [--video]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

from quadruped_gym_tpu.models import spec
from quadruped_gym_tpu.rl import evaluate as eval_mod
from quadruped_gym_tpu.rl import networks, ppo
from quadruped_gym_tpu.runtime import checkpoint
from quadruped_gym_tpu.tasks import walking


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--policy", required=True, help="checkpoint dir")
    p.add_argument("--out", required=True, help="artifact dir to write")
    p.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    p.add_argument("--obs-window", type=int, default=10)
    p.add_argument("--max-time", type=float, default=20.0)
    p.add_argument("--frame-skip", type=int, default=10)
    p.add_argument("--video", action="store_true",
                   help="record one deterministic eval video")
    p.add_argument("--note", default="")
    args = p.parse_args(argv)

    m = spec.get_model(collision_geom_prefixes=spec.MPC_COLLISION_PREFIXES)
    env_cfg = walking.WalkingConfig(
        max_time=args.max_time, frame_skip=args.frame_skip,
        obs_window=args.obs_window, partial_obs=True,
    )
    ts = ppo.init_train_state(
        m, env_cfg, ppo.PPOConfig(), jax.random.PRNGKey(0)
    )
    ts, step = checkpoint.restore(args.policy, ts)
    params = jax.device_get(ts.params)

    os.makedirs(args.out, exist_ok=True)

    def run(deterministic, seed, video_path=None):
        em = eval_mod.eval_rollout(
            params,
            obs_window=args.obs_window, max_time=args.max_time,
            frame_skip=args.frame_skip, deterministic=deterministic,
            seed=seed, save_video=video_path is not None,
            video_path=video_path or "unused.mp4",
        )
        em.pop("rewards")
        em["mode"] = "deterministic" if deterministic else "stochastic"
        em["seed"] = seed
        print(json.dumps(em))
        return em

    rows = []
    for seed in args.seeds:
        rows.append(run(False, seed))
    rows.append(run(
        True, args.seeds[0],
        video_path=os.path.join(args.out, "eval_run_det.mp4")
        if args.video else None,
    ))

    sto = [r for r in rows if r["mode"] == "stochastic"]
    report = {
        "device": str(jax.devices()[0]),
        "policy": args.policy,
        "trained_iterations": int(step or 0),
        "log_std": np.asarray(params["log_std"]).round(3).tolist(),
        "protocol": {
            "stochastic_eval": "deterministic=False, the reference's "
                               "eval protocol (eval_quadruped.py:23)",
            "command": "0.2 m/s forward, fixed heading",
            "episode_s": args.max_time,
        },
        "stochastic_summary": {
            "seeds": args.seeds,
            "episode_returns": [r["episode_return"] for r in sto],
            "all_positive": all(r["episode_return"] > 0 for r in sto),
            "mean_tracking_error": float(np.mean(
                [r["mean_tracking_error"] for r in sto])),
            "all_survived": all(r["survived"] for r in sto),
        },
        "episodes": rows,
        "note": args.note,
    }
    out = os.path.join(args.out, "eval_report.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
