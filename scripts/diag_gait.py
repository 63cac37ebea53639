"""Instrumented dissection of one SQP iteration of the gait solve.

Diagnoses the H=50 f32 stall reported in artifacts/gait_sqp_report.json
(VERDICT r2 missing #1): runs each stage of solvers/sqp.py's iteration
separately — linearize, sensitivities, condensation, QP, line search —
and prints magnitudes / NaN counts / candidate costs, so the failing
stage is identified instead of guessed.

Run (CPU, tunnel-independent):
    PYTHONPATH= JAX_PLATFORMS=cpu python scripts/diag_gait.py --horizon 12
"""

from __future__ import annotations

import argparse
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--horizon", type=int, default=12)
    p.add_argument("--frame-skip", type=int, default=5)
    p.add_argument("--linearize", choices=("ad", "fd"), default="ad")
    p.add_argument("--f64", action="store_true")
    p.add_argument("--smooth-eps", type=float, default=0.02)
    p.add_argument("--init", choices=("sine", "hold"), default="sine")
    args = p.parse_args()

    if args.f64:
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float64 if args.f64 else jnp.float32

    from examples.gait_sqp import HOLD, settle_state, sine_warm_start
    from quadruped_gym_tpu.models import spec
    from quadruped_gym_tpu.physics import engine
    from quadruped_gym_tpu.solvers import ilqr as ilqr_mod
    from quadruped_gym_tpu.solvers import rollout, sqp
    from quadruped_gym_tpu.tasks import commands

    m = spec.get_fast_plant_model()
    H = args.horizon
    rcfg = rollout.RolloutConfig(horizon=H, frame_skip=args.frame_skip,
                                 max_contacts=12, solver_iterations=4)
    cost_fn = rollout.make_cost_fn(m, vel_smooth_eps=args.smooth_eps)
    cmd = commands.make(jnp.asarray([0.2, 0.0], dtype), jnp.asarray(0.0, dtype))
    prev = jnp.asarray(HOLD, dtype)
    us0 = (sine_warm_start(H, args.frame_skip * 0.002, dtype)
           if args.init == "sine" else jnp.tile(prev, (H, 1)))
    state0 = settle_state(m, dtype)
    print(f"dtype={dtype.__name__} H={H} settled z={float(state0.qpos[2]):.4f}")

    def step_fn(st, u):
        return engine.control_step(
            m, st, u, rcfg.frame_skip,
            max_contacts=rcfg.max_contacts,
            solver_iterations=rcfg.solver_iterations)

    def traj_rollout(us):
        def body(carry, u):
            st, pv = carry
            st2 = step_fn(st, u)
            c = cost_fn(st2.sensordata, u, pv, cmd)
            return (st2, u), (st2, c)
        (_, _), (states, costs) = jax.lax.scan(body, (state0, prev), us)
        return states, jnp.sum(costs)

    t0 = time.time()
    states, cost0 = jax.jit(traj_rollout)(us0)
    print(f"rollout compile+run {time.time()-t0:.1f}s  cost0={float(cost0):.3f}")

    def stat(name, x):
        x = np.asarray(x)
        print(f"  {name}: shape={x.shape} |max|={np.abs(x).max():.3e} "
              f"nan={np.isnan(x).sum()} inf={np.isinf(x).sum()}")

    t0 = time.time()
    lin = ilqr_mod.make_linearizer(args.linearize)
    A, B = jax.jit(lambda s, u: lin(m, step_fn, state0, s, u, 1e-3 if not args.f64 else 1e-5))(states, us0)
    print(f"linearize ({args.linearize}) {time.time()-t0:.1f}s")
    stat("A", A); stat("B", B)
    # spectral growth of the A-products (the sensitivity propagation)
    Pn = np.eye(A.shape[1])
    norms = []
    for t in range(H):
        Pn = np.asarray(A[t], np.float64) @ Pn
        norms.append(np.linalg.norm(Pn, 2))
    print(f"  ||A_t...A_0||_2 per t: {['%.1e' % n for n in norms]}")

    t0 = time.time()
    lx, lxx, lu, luu = jax.jit(
        lambda s, u: ilqr_mod.quadratize_cost(m, cost_fn, cmd, s, u, prev)
    )(states, us0)
    print(f"quadratize {time.time()-t0:.1f}s")
    stat("lx", lx); stat("lxx", lxx); stat("lu", lu); stat("luu", luu)

    t0 = time.time()
    F = jax.jit(sqp.sensitivities)(A, B)
    stat("F", F)
    Hqp, g = jax.jit(sqp.condense)(F, lx, lxx)
    Hqp, g = jax.jit(sqp._add_control_blocks)(Hqp, g, lu, luu)
    print(f"condense {time.time()-t0:.1f}s")
    stat("Hqp", Hqp); stat("g", g)
    Hs = 0.5 * (np.asarray(Hqp, np.float64) + np.asarray(Hqp, np.float64).T)
    ev = np.linalg.eigvalsh(Hs)
    print(f"  eig(Hqp): min={ev.min():.3e} max={ev.max():.3e} "
          f"cond={ev.max()/max(ev.min(),1e-30):.2e}")

    nu = us0.shape[1]
    lo_u = jnp.asarray(np.asarray(m.actuator_ctrlrange[:, 0]), dtype)
    hi_u = jnp.asarray(np.asarray(m.actuator_ctrlrange[:, 1]), dtype)
    reg = 1e-3
    Hreg = jnp.asarray(Hs, dtype) + reg * jnp.eye(H * nu, dtype=dtype)
    lo = jnp.tile(lo_u, H) - us0.reshape(-1)
    hi = jnp.tile(hi_u, H) - us0.reshape(-1)
    du = jax.jit(sqp.admm_box_qp)(Hreg, g, lo, hi)
    stat("du", du)
    du_z = jnp.where(jnp.isfinite(du), du, 0.0).reshape(H, nu)
    print(f"  ||du|| = {float(jnp.linalg.norm(du_z)):.3e}  "
          f"pred decrease g'du = {float(g @ du_z.reshape(-1)):.3e}")

    alphas = [1.0, 0.5, 0.25, 0.1, 0.03, 0.01]
    print(f"  line search (cost0 = {float(cost0):.4f}):")
    roll_j = jax.jit(lambda u: traj_rollout(u)[1])
    for a in alphas:
        cand = jnp.clip(us0 + a * du_z, lo_u, hi_u)
        c = float(roll_j(cand))
        print(f"    alpha={a:5.2f}: cost={c:.4f}  "
              f"{'ACCEPT' if c < float(cost0) else 'reject'}")


if __name__ == "__main__":
    main()
