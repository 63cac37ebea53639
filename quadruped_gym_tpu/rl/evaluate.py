"""Policy evaluation rollout (reference L5: ``src/eval_quadruped.py``).

Loads a checkpointed PPO policy, runs it under the reference's fixed
command (speed 0.2, heading 0 — ``eval_quadruped.py:13-14``) through the
gym-level env, optionally renders/saves video, and plots per-step rewards
(``eval_quadruped.py:30-34``).

Run:  python -m quadruped_gym_tpu.rl.evaluate --policy runs/ppo_v1/policy
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from ..envs import POWalkingQuadrupedEnv, WalkingQuadrupedEnv
from ..models import spec
from ..runtime import checkpoint
from ..tasks import walking
from ..utils import plot as plot_mod
from . import networks, ppo


def evaluate_model(
    policy_dir: str,
    obs_window: int = 10,
    max_time: float = 20.0,
    frame_skip: int = 10,
    render_mode=None,
    save_video: bool = False,
    video_path: str = "videos/eval.mp4",
    deterministic: bool = True,
    seed: int = 0,
    partial_obs: bool = True,
):
    m = spec.get_model(collision_geom_prefixes=spec.MPC_COLLISION_PREFIXES)
    env_cls = POWalkingQuadrupedEnv if partial_obs else WalkingQuadrupedEnv
    kwargs = dict(
        max_time=max_time, frame_skip=frame_skip, render_mode=render_mode,
        save_video=save_video, video_path=video_path,
    )
    if partial_obs:
        kwargs["obs_window"] = obs_window
    env = env_cls(**kwargs)
    # fixed evaluation command (eval_quadruped.py:13-14)
    env.control_inputs.set_orientation(0.0)
    env.control_inputs.set_velocity_speed_alpha(0.2, 0.0)

    env_cfg = walking.WalkingConfig(
        max_time=max_time, frame_skip=frame_skip, obs_window=obs_window,
        partial_obs=partial_obs,
    )
    cfg = ppo.PPOConfig()
    ts = ppo.init_train_state(m, env_cfg, cfg, jax.random.PRNGKey(0))
    ts, _ = checkpoint.restore(policy_dir, ts)
    params = ts.params

    key = jax.random.PRNGKey(seed)
    obs, _ = env.reset(seed=seed)
    rewards_hist, done = [], False
    act_fn = jax.jit(lambda o: networks.actor_mean(params, o))
    while not done:
        if deterministic:
            action = np.asarray(act_fn(np.asarray(obs, np.float32)))
        else:
            key, sub = jax.random.split(key)
            a, _ = networks.sample_action(params, np.asarray(obs, np.float32), sub)
            action = np.asarray(a)
        obs, r, terminated, truncated, info = env.step(
            np.clip(action, -1.0, 1.0)
        )
        rewards_hist.append(float(r))
        if render_mode is not None:
            env.render()
        done = terminated or truncated
    env.close()
    return rewards_hist


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--policy", required=True)
    p.add_argument("--obs-window", type=int, default=10)
    p.add_argument("--render", action="store_true")
    p.add_argument("--save-video", default=None)
    p.add_argument("--stochastic", action="store_true")
    p.add_argument("--plot", default="plots/eval_rewards.png")
    args = p.parse_args(argv)

    hist = evaluate_model(
        args.policy,
        obs_window=args.obs_window,
        render_mode="human" if args.render else (
            "rgb_array" if args.save_video else None
        ),
        save_video=bool(args.save_video),
        video_path=args.save_video or "videos/eval.mp4",
        deterministic=not args.stochastic,
    )
    print(f"episode return {sum(hist):.2f} over {len(hist)} steps")
    if args.plot:
        plot_mod.plot_data_line(hist, window=20, title="Eval reward per step",
                                save_path=args.plot)
        print(f"wrote {args.plot}")


if __name__ == "__main__":
    main()
