"""PPO training entry point (reference L5: ``src/train_quadruped.py``).

Same workflow contract as the reference: an output folder with
``logs/ plots/ policy checkpoints``, crash-resumable iteration loop
(policy + step counter persisted every iteration,
``train_quadruped.py:114-141``), per-step reward-component CSV rows
(``:86-110``) and per-iteration reward plots (``:160-164``) — but the
inner loop is thousands of on-device envs instead of 10 processes.

Run:  python -m quadruped_gym_tpu.rl.train --output runs/ppo_v1
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import numpy as np

# persistent compile cache: a crash-resumed trainer otherwise pays the
# full ~2-minute train-chunk XLA compile on every relaunch. Same
# repo-local cache the other chip entry points (bench, latency, gait)
# use; JAX_COMPILATION_CACHE_DIR overrides for isolation.
if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from ..models import spec
from ..runtime import checkpoint
from ..tasks import commands, walking
from ..tasks.rewards import REWARD_KEYS
from ..utils import metrics as metrics_mod
from ..utils import plot as plot_mod
from . import ppo


def make_env_config(args) -> walking.WalkingConfig:
    # training env of the reference (train_quadruped.py:15-27, options :40-47).
    # The reference fixes the command speed at 0.3 but evals at 0.2
    # (eval_quadruped.py:14) — out of distribution. Its options dict has
    # commented-out min_speed/max_speed (train_quadruped.py:41-42); pass
    # --min-speed/--max-speed here to train with the speed sampled per
    # reset so the eval command is in-distribution.
    opts = {
        "fixed_heading_angle": 0.0,
        "fixed_velocity_angle": 0.0,
    }
    if args.min_speed is not None or args.max_speed is not None:
        opts["min_speed"] = args.min_speed if args.min_speed is not None else 0.0
        opts["max_speed"] = args.max_speed if args.max_speed is not None else 0.4
    else:
        opts["fixed_speed"] = args.fixed_speed
    return walking.WalkingConfig(
        max_time=args.max_time,
        frame_skip=args.frame_skip,
        obs_window=args.obs_window,
        partial_obs=not args.full_obs,
        random_controls=True,
        reset_options=commands.SampleOptions.from_dict(opts),
        max_contacts=args.max_contacts,
        solver_iterations=args.solver_iterations,
    )


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--output", default="runs/ppo")
    p.add_argument("--iterations", type=int, default=20)
    p.add_argument("--timesteps-per-iteration", type=int, default=500_000)
    p.add_argument("--num-envs", type=int, default=2048)
    p.add_argument("--num-steps", type=int, default=32)
    p.add_argument("--max-time", type=float, default=20.0)
    p.add_argument("--frame-skip", type=int, default=10)
    p.add_argument("--obs-window", type=int, default=10)
    p.add_argument("--full-obs", action="store_true")
    p.add_argument("--max-contacts", type=int, default=12)
    p.add_argument("--solver-iterations", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--fixed-speed", type=float, default=0.3,
                   help="fixed command speed per reset "
                        "(train_quadruped.py:45)")
    p.add_argument("--min-speed", type=float, default=None,
                   help="sample the command speed uniformly in "
                        "[min-speed, max-speed] per reset instead of "
                        "fixing it (the reference's commented-out "
                        "options, train_quadruped.py:41-42)")
    p.add_argument("--max-speed", type=float, default=None)
    p.add_argument("--dashboard", action="store_true",
                   help="serve live metrics on :8050")
    p.add_argument("--lane-physics", action="store_true",
                   help="route env physics through the batch-minor "
                        "lane/leg engine (~4x rollout throughput)")
    p.add_argument("--finetune-iterations", type=int, default=0,
                   help="after the main iterations, continue this many "
                        "more with log_std clamped (same process - no "
                        "checkpoint-resume upload, which the axon "
                        "tunnel cannot survive)")
    p.add_argument("--finetune-log-std-max", type=float, default=-1.2,
                   help="log-std ceiling for the fine-tune phase "
                        "(sigma <= e^x; -1.2 -> 0.30)")
    p.add_argument("--log-std-max", type=float, default=None,
                   help="clamp the policy log-std from above after each "
                        "update (fine-tune phase: bounded exploration "
                        "makes the SAMPLED policy — the reference's "
                        "eval protocol — walk)")
    p.add_argument("--no-eval", action="store_true",
                   help="skip the per-iteration eval rollout")
    p.add_argument("--no-eval-video", action="store_true",
                   help="eval without recording videos/run_{i}.mp4")
    p.add_argument("--video-every", type=int, default=1,
                   help="record the eval video only every Nth iteration "
                        "(plus the last); metrics still log every "
                        "iteration. The software-renderer fallback is "
                        "host-bound — on a 1-core host per-iteration "
                        "videos can dominate wall clock")
    p.add_argument("--distributed", action="store_true",
                   help="shard the env batch over all devices (and hosts "
                        "when launched under jax.distributed)")
    args = p.parse_args(argv)

    out = args.output
    os.makedirs(os.path.join(out, "logs"), exist_ok=True)
    os.makedirs(os.path.join(out, "plots"), exist_ok=True)

    m = spec.get_model(collision_geom_prefixes=spec.MPC_COLLISION_PREFIXES)
    env_cfg = make_env_config(args)
    cfg = ppo.PPOConfig(
        num_envs=args.num_envs, num_steps=args.num_steps,
        lane_physics=args.lane_physics,
        log_std_max=args.log_std_max,
    )

    if args.distributed:
        from ..parallel import DATA_AXIS, make_mesh, multihost
        from . import distributed as dist_mod

        multihost.initialize()
        mesh = make_mesh(jax.devices(), axis_names=(DATA_AXIS,))
        ts = dist_mod.init_distributed_train_state(
            m, env_cfg, cfg, jax.random.PRNGKey(args.seed), mesh
        )
        dist_update = dist_mod.make_distributed_update(m, env_cfg, cfg, mesh)
    else:
        ts = ppo.init_train_state(m, env_cfg, cfg, jax.random.PRNGKey(args.seed))
    ckpt_dir = os.path.join(out, "policy")
    start_iter = 0
    if checkpoint.exists(ckpt_dir):  # crash resume (train_quadruped.py:117-127)
        ts, step = checkpoint.restore(ckpt_dir, ts)
        start_iter = int(step or 0)
        print(f"resumed from {ckpt_dir} at iteration {start_iter}")

    csv_path = os.path.join(out, "rewards_continuous.csv")
    # native C++ ring logger when the toolchain allows; Python CSV fallback
    from ..native import make_reward_logger

    logger = make_reward_logger(csv_path, REWARD_KEYS)
    if args.dashboard:
        from ..utils.server import launch_dash

        launch_dash(csv_path, block=False)
        print("dashboard on :8050")

    updates_per_iter = max(
        1, args.timesteps_per_iteration // cfg.batch_size
    )
    if args.distributed:
        def _chunk(t):
            def body(t, _):
                return dist_update(t)
            return jax.lax.scan(body, t, None, length=updates_per_iter)

        train = jax.jit(_chunk)
    else:
        train = jax.jit(
            lambda t: ppo.train_chunk(m, env_cfg, cfg, t, updates_per_iter)
        )

    # phase list: the SB3-default main run, then (optionally) the
    # log_std-clamped fine-tune IN THE SAME PROCESS. Two-phase training
    # used to require a checkpoint resume, whose ~30 MB host->device
    # re-upload reliably wedges the axon tunnel's transfer path (see
    # checkpoint.py restore note) — one process avoids resume entirely
    # and costs one extra compile.
    plan = [(start_iter + i, train, "") for i in range(args.iterations)]
    if args.finetune_iterations > 0 and not args.distributed:
        import dataclasses as _dc

        cfg_ft = _dc.replace(cfg, log_std_max=args.finetune_log_std_max)
        train_ft = jax.jit(
            lambda t: ppo.train_chunk(m, env_cfg, cfg_ft, t, updates_per_iter)
        )
        base = start_iter + args.iterations
        plan += [
            (base + i, train_ft,
             f" [finetune log_std<={args.finetune_log_std_max}]")
            for i in range(args.finetune_iterations)
        ]

    for it, train, phase_tag in plan:
        t0 = time.perf_counter()
        ts, history = train(ts)
        jax.block_until_ready(ts.params)
        dt = time.perf_counter() - t0
        steps_done = updates_per_iter * cfg.batch_size
        # (updates, num_steps, 11) -> one CSV row per policy step averaged
        # over the env batch — the reference's granularity (:86-110)
        comp = np.asarray(history.reward_components).reshape(
            -1, len(REWARD_KEYS)
        )
        logger.log_many(it * updates_per_iter * cfg.num_steps, comp)
        logger.flush()  # the native writer thread drains asynchronously
        checkpoint.save(ckpt_dir, ts, step=it + 1)

        mean_r = float(np.mean(np.asarray(history.mean_reward)))
        print(
            f"iter {it}: {steps_done} steps in {dt:.1f}s "
            f"({steps_done/dt:,.0f} steps/s), mean step reward {mean_r:.2f}, "
            f"kl {float(history.approx_kl[-1]):.4f}{phase_tag}",
            flush=True,
        )

        # per-iteration artifacts (train_quadruped.py:143-164); process 0
        # only — plots are host-side files on possibly-shared storage
        if jax.process_index() == 0:
            steps, totals, allcomp, keys = metrics_mod.read_reward_csv(csv_path)
            plot_mod.plot_data_line(
                totals, window=50, title="Mean step reward",
                save_path=os.path.join(out, "plots", f"reward_plot_{it}.png"),
            )
            plot_mod.plot_reward_components(
                allcomp, keys,
                os.path.join(out, "plots", f"reward_components_{it}.html"),
            )

        # per-iteration eval rollout + video (train_quadruped.py:171-193):
        # a fresh single env under the fixed 0.2 m/s command, deterministic
        # policy, recorded to videos/run_{it}.mp4; walking-quality metrics
        # (tracking error, uprightness, survival) appended to JSONL
        # host-side artifact: only process 0 of a multi-host run evals and
        # appends (otherwise every host plays a duplicate episode and races
        # on videos/ + eval_metrics.jsonl — ADVICE r2)
        if not args.no_eval and jax.process_index() == 0:
            from . import evaluate as eval_mod

            os.makedirs(os.path.join(out, "videos"), exist_ok=True)
            want_video = not args.no_eval_video and (
                it % args.video_every == 0
                or it == start_iter + args.iterations - 1
            )
            em = eval_mod.eval_rollout(
                jax.device_get(ts.params),
                obs_window=args.obs_window,
                max_time=args.max_time,
                frame_skip=args.frame_skip,
                partial_obs=not args.full_obs,
                save_video=want_video,
                video_path=os.path.join(out, "videos", f"run_{it}.mp4"),
                seed=args.seed + it,
            )
            em.pop("rewards")
            em["iteration"] = it
            with open(os.path.join(out, "logs", "eval_metrics.jsonl"), "a") as f:
                import json

                f.write(json.dumps(em) + "\n")
            print(
                f"  eval: return {em['episode_return']:.1f}, "
                f"{em['steps']} steps, survived={em['survived']}, "
                f"track_err {em['mean_tracking_error']:.3f} m/s, "
                f"upright {em['mean_uprightness']:.3f}"
            )

    logger.close()
    print("done")


if __name__ == "__main__":
    main()
