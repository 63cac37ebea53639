"""Production-scale gradient-based gait optimization on the TPU.

BASELINE config 4 ("iLQR/SQP contact-implicit gait optimization,
horizon-block QP condensed via ICI all-reduce") at its named scale:
H=50 control steps, f32, full contact dynamics, on the real chip — not the
H=4 f64 CPU toy of the unit tests. The reference has no trajectory
optimizer at all (its only planner is an RL policy,
``/root/reference/src/train_quadruped.py``); this is the north-star
capability built on top of the same robot/task contract.

What it does:
  1. settles the robot to stance (400 physics steps under the hold ctrl);
  2. solves an H-step trajectory optimization for a forward velocity
     command from a standing-hold initial guess, with the solver's FD
     epsilon passed as a *traced* scalar so one compile serves the whole
     epsilon sweep (``--tune-eps``: the f32 FD-epsilon tuning named by
     STATUS.md gap 4);
  3. re-rolls the optimized control sequence through the dynamics and
     reports walking-quality metrics (forward progress, speed tracking,
     uprightness) + the per-iteration cost curve and solve time;
  4. ``--shard`` runs the horizon-block condensation through
     shard_map+psum over a mesh of all available devices — on this sandbox
     that is 1 TPU chip (the psum compiles and runs on-chip); on a pod the
     same code spans the slice (virtual 8-device validation in
     tests/test_sqp.py).

Run:  python examples/gait_sqp.py --solver sqp --horizon 50
      python examples/gait_sqp.py --solver sqp --tune-eps
      python examples/gait_sqp.py --solver ilqr
Writes artifacts/gait_<solver>_report.json.
"""

from __future__ import annotations

import argparse
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
from quadruped_gym_tpu.solvers import ilqr, rollout, sqp
from quadruped_gym_tpu.tasks import commands, rewards

HOLD = np.array([0.0, 0.0, -0.5] * 4)


def sine_warm_start(horizon, ctrl_dt, dtype,
                    freq_hz=2.5, hip_amp=0.2, knee_amp=0.15):
    """Trot-phased sinusoidal leg pattern around the standing hold.

    Gradient gait optimization from the exact standing fixed point stalls:
    rest is a symmetric stationary point (every leg equally loaded, zero
    velocity), so the first QP/Riccati step has nothing to break symmetry
    with. Seeding a small diagonal-pair (trot) oscillation — standard
    practice in trajectory-optimization gait studies — puts the incumbent
    on the basin's slope; the solver then shapes amplitude/phase/posture."""
    t = np.arange(horizon) * ctrl_dt
    w = 2.0 * np.pi * freq_hz
    us = np.tile(HOLD, (horizon, 1))
    phase = [0.0, np.pi, 0.0, np.pi]  # diagonal pairs in phase
    for leg in range(4):
        us[:, 3 * leg + 0] += hip_amp * np.sin(w * t + phase[leg])
        us[:, 3 * leg + 1] += knee_amp * np.sin(w * t + phase[leg] + 0.5 * np.pi)
    return jnp.asarray(np.clip(us, -1.0, 1.0), dtype)


def settle_state(m, dtype, steps=400):
    hold = jnp.asarray(HOLD, dtype)
    st = engine.make_state(m, dtype)

    def body(s, _):
        return engine.step(m, s, hold), None

    st, _ = jax.jit(lambda s: jax.lax.scan(body, s, None, length=steps))(st)
    return st


def trajectory_metrics(m, rcfg, state0, us, prev, sl):
    """Re-rollout the optimized controls; walking-quality numbers."""

    def body(carry, u):
        st = engine.control_step(
            m, carry, u, rcfg.frame_skip,
            max_contacts=rcfg.max_contacts,
            solver_iterations=rcfg.solver_iterations,
        )
        return st, st.sensordata

    _, sens = jax.lax.scan(body, state0, us)
    vx_local = sens[:, sl.vel]  # velocimeter x (local forward speed)
    pos = sens[:, sl.pos : sl.pos + 3]
    upright = sens[:, sl.zaxis + 2]
    return {
        "forward_displacement_m": float(pos[-1, 0] - pos[0, 0]),
        "mean_local_vx": float(jnp.mean(vx_local)),
        "final_height": float(pos[-1, 2]),
        "min_uprightness": float(jnp.min(upright)),
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--solver", choices=("sqp", "ilqr"), default="sqp")
    p.add_argument("--horizon", type=int, default=50)
    p.add_argument("--frame-skip", type=int, default=5)
    p.add_argument("--iterations", type=int, default=10)
    p.add_argument("--linearize", choices=("ad", "fd"), default="ad",
                   help="'ad' (default): jacfwd through the contact "
                        "Newton — exact branch tangents; 'fd': central "
                        "differences, which straddle contact-branch "
                        "discontinuities (O(1/eps) artifacts; kept for "
                        "cross-checks and the epsilon study)")
    p.add_argument("--fd-eps", type=float, default=None,
                   help="FD epsilon (default: tuned per dtype)")
    p.add_argument("--speed", type=float, default=0.2)
    p.add_argument("--tune-eps", action="store_true",
                   help="sweep FD epsilon (one compile, traced scalar)")
    p.add_argument("--init", choices=("sine", "hold", "mppi"), default="sine",
                   help="initial guess: trot-phased sine (default), the "
                        "standing hold (stalls: rest is a symmetric "
                        "stationary point of the smoothed cost), or 'mppi' "
                        "— a few sampling-MPC refinements of the sine seed "
                        "(hybrid global-search + gradient-polish, the "
                        "standard escape from poor local basins)")
    p.add_argument("--mppi-samples", type=int, default=64)
    p.add_argument("--mppi-iters", type=int, default=4)
    p.add_argument("--init-freq", type=float, default=2.5,
                   help="warm-start trot frequency (Hz); selects the "
                        "local basin the gradient solver refines")
    p.add_argument("--init-hip-amp", type=float, default=0.2)
    p.add_argument("--init-knee-amp", type=float, default=0.15)
    p.add_argument("--smooth-eps", type=float, default=0.02,
                   help="velocity-norm smoothing of the progress terms "
                        "(m/s); 0 = the exact task cost, whose gradient "
                        "at rest is degenerate")
    p.add_argument("--shard", action="store_true",
                   help="condense through shard_map+psum over all devices")
    p.add_argument("--f64-cpu", action="store_true",
                   help="run in f64 on the CPU backend (oracle mode)")
    p.add_argument("--cpu", action="store_true",
                   help="run in f32 on the CPU backend (tunnel-independent "
                        "rehearsal of the TPU configuration)")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    on_cpu = args.f64_cpu or args.cpu
    if args.f64_cpu:
        jax.config.update("jax_enable_x64", True)
        dtype = jnp.float64
    else:
        dtype = jnp.float32
    if on_cpu:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
    dev = jax.devices("cpu")[0] if on_cpu else jax.devices()[0]
    print(f"device: {dev}, dtype: {dtype.__name__}")

    # the plant-fidelity model: full lower-leg collision set with
    # support-decimated hulls (full raw hulls would be wasted XLA compile
    # time here — contact behavior matches to sub-mm support error)
    m = spec.get_fast_plant_model()
    sl = rewards.SensorSlices.from_model(m)
    rcfg = rollout.RolloutConfig(
        horizon=args.horizon, frame_skip=args.frame_skip,
        max_contacts=12, solver_iterations=4,
    )
    cost_fn = rollout.make_cost_fn(m, vel_smooth_eps=args.smooth_eps)
    cmd = commands.make(
        jnp.asarray([args.speed, 0.0], dtype), jnp.asarray(0.0, dtype)
    )
    prev = jnp.asarray(HOLD, dtype)
    if args.init in ("sine", "mppi"):
        us0 = sine_warm_start(
            args.horizon, args.frame_skip * 0.002, dtype,
            freq_hz=args.init_freq, hip_amp=args.init_hip_amp,
            knee_amp=args.init_knee_amp,
        )
    else:
        us0 = jnp.tile(prev, (args.horizon, 1))

    state0 = settle_state(m, dtype)
    print(f"settled stance: z={float(state0.qpos[2]):.4f}")

    mppi_seed_cost = None
    if args.init == "mppi":
        # hybrid warm start: a few sampling-MPC refinements of the sine
        # seed find a lower basin globally, then the gradient solver
        # polishes within it (sampling explores, gradients converge)
        from quadruped_gym_tpu.solvers import mppi as mppi_mod

        mcfg = mppi_mod.MPPIConfig(
            num_samples=args.mppi_samples, sigma=0.15, temperature=1.0,
            iterations=args.mppi_iters, rollout=rcfg,
        )
        t0 = time.time()
        res = jax.jit(
            lambda s, u, k: mppi_mod.plan(m, mcfg, cost_fn, s, u, cmd, prev, k)
        )(state0, us0, jax.random.PRNGKey(0))
        jax.block_until_ready(res.mean)
        us0 = jnp.clip(res.mean, -1.0, 1.0)
        mppi_seed_cost = float(res.best_cost)
        print(f"mppi warm start ({args.mppi_samples}x{args.mppi_iters}): "
              f"best cost {mppi_seed_cost:.1f} in {time.time()-t0:.1f}s")

    mesh = None
    if args.shard:
        from quadruped_gym_tpu import parallel

        devs = jax.devices("cpu") if on_cpu else jax.devices()
        mesh = parallel.make_mesh(devs, axis_names=("horizon",))
        print(f"condensation sharded over {mesh.devices.size} device(s)")

    # eps enters FD arithmetic only -> pass it traced: ONE compile covers
    # every epsilon in the sweep
    if args.solver == "sqp":
        def solve(s0, u0, eps):
            cfg = sqp.SQPConfig(
                iterations=args.iterations, rollout=rcfg,
                linearize=args.linearize, fd_eps=eps,
            )
            return sqp.solve(m, cfg, cost_fn, s0, u0, cmd, prev, mesh=mesh)
    else:
        def solve(s0, u0, eps):
            cfg = ilqr.ILQRConfig(
                iterations=args.iterations, rollout=rcfg,
                linearize=args.linearize, fd_eps=eps,
            )
            return ilqr.solve(m, cfg, cost_fn, s0, u0, cmd, prev)

    solve_j = jax.jit(solve)

    # tuned defaults: f32 central differences round at ~1e-7 * state scale,
    # so eps ~ 3e-4 balances rounding vs truncation (see --tune-eps output,
    # artifacts/gait_*_report.json); f64 keeps the 1e-5 of the unit tests
    default_eps = 1e-5 if dtype == jnp.float64 else 3e-4
    eps_list = (
        [1e-4, 3e-4, 1e-3, 3e-3] if (args.tune_eps and args.linearize == "fd")
        else [args.fd_eps or default_eps]
    )

    # reference point: the cost of just holding the stance for H steps
    # (the do-nothing policy a gait must beat)
    hold_cost = float(jax.jit(
        lambda s: rollout.rollout_cost(
            m, rcfg, cost_fn, s, jnp.tile(prev, (args.horizon, 1)), cmd, prev
        )
    )(state0))
    print(f"standing-hold trajectory cost: {hold_cost:.1f}")

    print("compiling solve graph (first call)...")
    t0 = time.time()
    res = solve_j(state0, us0, jnp.asarray(eps_list[0], dtype))
    jax.block_until_ready(res.cost)
    print(f"compile + first solve: {time.time() - t0:.1f}s")

    report = {
        "solver": args.solver,
        "horizon": args.horizon,
        "frame_skip": args.frame_skip,
        "dtype": dtype.__name__,
        "iterations": args.iterations,
        "device": str(dev),
        "linearize": args.linearize,
        "sharded_condensation": bool(args.shard),
        "command_speed": args.speed,
        "init": args.init,
        "mppi_seed_cost": mppi_seed_cost,
        "vel_smooth_eps": args.smooth_eps,
        "standing_hold_cost": hold_cost,
        "runs": [],
    }
    for eps in eps_list:
        t0 = time.time()
        res = solve_j(state0, us0, jnp.asarray(eps, dtype))
        jax.block_until_ready(res.cost)
        dt = time.time() - t0
        metrics = trajectory_metrics(m, rcfg, state0, res.ctrl_seq, prev, sl)
        hist = [float(c) for c in np.asarray(res.cost_history)]
        run = {
            "fd_eps": eps,
            "initial_cost": float(res.initial_cost),
            "final_cost": float(res.cost),
            "cost_history": hist,
            "solve_time_s": dt,
            "per_iteration_s": dt / args.iterations,
            **metrics,
        }
        report["runs"].append(run)
        print(
            f"eps={eps:.0e}: cost {run['initial_cost']:.1f} -> "
            f"{run['final_cost']:.1f} in {dt:.2f}s "
            f"({run['per_iteration_s']*1e3:.0f} ms/iter); "
            f"fwd {run['forward_displacement_m']*100:.1f} cm, "
            f"mean vx {run['mean_local_vx']:.3f} m/s, "
            f"upright>={run['min_uprightness']:.2f}"
        )

    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", f"gait_{args.solver}_report.json",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out}")
    return report


if __name__ == "__main__":
    main()
