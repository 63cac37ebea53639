"""Exploration smoke test (the reference's ``quadruped_model.ipynb``):
10 s rollout with random controls resampled at 10 Hz, joint-angle plot,
optional video.

Run:  python examples/random_rollout.py [--video videos/simulation.mp4]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seconds", type=float, default=10.0)
    p.add_argument("--video", default=None)
    p.add_argument("--plot", default="plots/joint_angles.png")
    args = p.parse_args()

    from quadruped_gym_tpu.models import spec
    from quadruped_gym_tpu.physics import engine

    m = spec.get_model(collision_geom_prefixes=spec.MPC_COLLISION_PREFIXES)
    state = engine.make_state(m)

    # random ctrl resampled at 10 Hz (notebook cell 1), physics at 500 Hz
    resample_every = int(0.1 / m.timestep)
    n_chunks = int(args.seconds / 0.1)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def chunk(state, ctrl):
        def body(s, _):
            s = engine.step(m, s, ctrl, max_contacts=12, solver_iterations=4)
            return s, s.sensordata
        return jax.lax.scan(body, state, None, length=resample_every)

    sens_hist, qpos_hist = [], []
    for i in range(n_chunks):
        key, sub = jax.random.split(key)
        ctrl = jax.random.uniform(sub, (m.nu,), minval=-1.0, maxval=1.0)
        state, sens = chunk(state, ctrl)
        sens_hist.append(np.asarray(sens))
        qpos_hist.append(np.asarray(state.qpos))
    sens_hist = np.concatenate(sens_hist)  # (steps, 33)
    print(f"rolled out {sens_hist.shape[0]} physics steps; "
          f"final base height {qpos_hist[-1][2]:.3f} m")

    # joint-angle traces (notebook cell 2)
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, axes = plt.subplots(4, 3, figsize=(12, 8), sharex=True)
    t = np.arange(sens_hist.shape[0]) * m.timestep
    for j in range(12):
        ax = axes[j // 3][j % 3]
        ax.plot(t, sens_hist[:, j], lw=0.7)
        ax.set_title(m.sensor_names[j] if j < len(m.sensor_names) else f"joint {j}",
                     fontsize=8)
    fig.tight_layout()
    os.makedirs(os.path.dirname(args.plot) or ".", exist_ok=True)
    fig.savefig(args.plot, dpi=120)
    print(f"wrote {args.plot}")

    if args.video:
        from quadruped_gym_tpu.envs.rendering import HostRenderer
        r = HostRenderer(spec.DEFAULT_SCENE, width=640, height=480,
                         save_video=True, video_path=args.video)
        # re-simulate coarsely for frames (render at 30 fps)
        state = engine.make_state(m)
        key = jax.random.PRNGKey(0)
        for i in range(n_chunks):
            key, sub = jax.random.split(key)
            ctrl = jax.random.uniform(sub, (m.nu,), minval=-1.0, maxval=1.0)
            state, _ = chunk(state, ctrl)
            r.sync(np.asarray(state.qpos), time_=float(state.time))
            r.render(mode="rgb_array")
        r.close()
        print(f"wrote {args.video}")


if __name__ == "__main__":
    main()
