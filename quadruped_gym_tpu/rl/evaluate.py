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


def eval_rollout(
    params,
    obs_window: int = 10,
    max_time: float = 20.0,
    frame_skip: int = 10,
    render_mode=None,
    save_video: bool = False,
    video_path: str = "videos/eval.mp4",
    deterministic: bool = True,
    seed: int = 0,
    partial_obs: bool = True,
    speed: float = 0.2,
    heading: float = 0.0,
):
    """One policy episode through the gym-level env under a fixed command.

    Returns a metrics dict: per-step rewards plus the walking-quality
    numbers VERDICT asks a trained policy to be judged by — mean command
    tracking error (|local v_xy - cmd v_xy|), mean uprightness (body z-axis
    z), and survival. Used both by the standalone eval entry point and by
    the per-iteration eval hook in ``rl.train`` (the reference records a
    policy video every iteration, ``train_quadruped.py:171-193``).
    """
    env_cls = POWalkingQuadrupedEnv if partial_obs else WalkingQuadrupedEnv
    kwargs = dict(
        max_time=max_time, frame_skip=frame_skip, render_mode=render_mode,
        save_video=save_video, video_path=video_path,
    )
    if partial_obs:
        kwargs["obs_window"] = obs_window
    env = env_cls(**kwargs)
    # control-step duration from the compiled model (not a hardcoded 0.002,
    # which would silently break if the model timestep changed — ADVICE r2)
    step_dt = float(env.pm.timestep) * frame_skip
    # fixed evaluation command (eval_quadruped.py:13-14)
    env.control_inputs.set_orientation(heading)
    env.control_inputs.set_velocity_speed_alpha(speed, heading)

    key = jax.random.PRNGKey(seed)
    obs, _ = env.reset(seed=seed)
    sl = env._sl()
    rewards_hist, track_err, upright = [], [], []
    done = False
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
        v = env.data.sensordata[sl.vel : sl.vel + 2]
        track_err.append(
            float(np.linalg.norm(v - env.control_inputs.velocity[:2]))
        )
        upright.append(float(env.data.sensordata[sl.zaxis + 2]))
        if render_mode is not None or save_video:
            try:
                env.render()
            except Exception as e:  # headless hosts without GL: keep metrics
                print(f"render unavailable ({e!r}); continuing without video")
                render_mode, save_video = None, False
        done = terminated or truncated
    env.close()
    return {
        "rewards": rewards_hist,
        "episode_return": float(sum(rewards_hist)),
        "steps": len(rewards_hist),
        "survived": len(rewards_hist) * step_dt >= max_time - 1e-6,
        "mean_tracking_error": float(np.mean(track_err)),
        "final_tracking_error": float(np.mean(track_err[-100:])),
        "mean_uprightness": float(np.mean(upright)),
        "command_speed": speed,
    }


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
    env_cfg = walking.WalkingConfig(
        max_time=max_time, frame_skip=frame_skip, obs_window=obs_window,
        partial_obs=partial_obs,
    )
    cfg = ppo.PPOConfig()
    ts = ppo.init_train_state(m, env_cfg, cfg, jax.random.PRNGKey(0))
    ts, _ = checkpoint.restore(policy_dir, ts)
    metrics = eval_rollout(
        ts.params,
        obs_window=obs_window,
        max_time=max_time,
        frame_skip=frame_skip,
        render_mode=render_mode,
        save_video=save_video,
        video_path=video_path,
        deterministic=deterministic,
        seed=seed,
        partial_obs=partial_obs,
    )
    return metrics["rewards"]


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
