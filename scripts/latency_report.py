"""Real-time MPC latency + roofline artifact (VERDICT r2 next-round #6).

Quantifies the BASELINE "<10 ms MPC solve / 100 Hz inner loop" budget on
the real chip, separating DEVICE time from the axon tunnel's fixed
dispatch overhead (~30 ms per call on this sandbox, absent on a
directly-attached chip):

1. N-step on-device closed loop: ``runtime.delayed_closed_loop`` (the
   one-period-delay real-time pipeline) jitted as a single scan. Timing
   it at two different N isolates the slope — device time per 100 Hz
   control step — from the per-dispatch intercept.
2. Tunnel overhead: a trivial dispatch, timed the same way.
3. Roofline/MFU of the fused whole-rollout kernel: analytic FLOPs from
   XLA cost analysis of the mathematically-identical unfused engine
   (cost analysis cannot see inside a Mosaic custom call), divided by
   the fused kernel's measured wall time and the v5e peak.

Writes artifacts/latency_report.json. Run on the TPU:
    python scripts/latency_report.py
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
from quadruped_gym_tpu.runtime import mpc_runtime
from quadruped_gym_tpu.solvers import mppi, rollout
from quadruped_gym_tpu.tasks import commands
from quadruped_gym_tpu.utils import profiling

HOLD = np.array([0.0, 0.0, -0.5] * 4)


def _timed(fn, *args, reps=3):
    """Median of reps synchronous timings (block per call)."""
    ts = []
    for _ in range(reps):
        jax.block_until_ready(args)
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _timed_scan_ms(make_body, init, rng, k=20, reps=3):
    """Device time per step of a K-step on-device scan (tunnel-free)."""

    @jax.jit
    def run(c0):
        c, _ = jax.lax.scan(make_body(), c0, None, length=k)
        return c

    jax.block_until_ready(run(init))  # compile
    ts = []
    for _ in range(reps):
        init2 = jax.tree.map(
            lambda x: x + jnp.asarray(
                1e-5 * rng.standard_normal(np.shape(x)), x.dtype)
            if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
            init)
        jax.block_until_ready(init2)
        t0 = time.perf_counter()
        jax.block_until_ready(run(init2))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / k * 1e3


def main():
    rng = np.random.default_rng(time.time_ns())  # axon memoization dodge
    dev = jax.devices()[0]
    print(f"device: {dev}")

    m = spec.get_planning_model()
    cost_fn = rollout.make_cost_fn(m)
    cfg = mpc_runtime.MPCConfig(
        solver="mppi",
        mppi=mppi.MPPIConfig(
            num_samples=1024, sigma=0.2, iterations=1,
            rollout=rollout.RolloutConfig(horizon=50, frame_skip=5),
            lane=True, lane_engine_impl="fused",
            lane_newton_iterations=2, lane_ls_iterations=4,
        ),
        plant_frame_skip=5,
    )
    cmd = commands.make(jnp.asarray([0.2, 0.0]), jnp.asarray(0.0))

    def run_loop(n_steps):
        f = jax.jit(lambda carry, phys: mpc_runtime.delayed_closed_loop(
            m, cfg, cost_fn, carry, phys, cmd, n_steps,
            plant_engine="lane",
        )[2][0])

        def fresh_inputs():
            carry = mpc_runtime.init_carry(
                m, cfg, 50, jax.random.PRNGKey(int(rng.integers(2**31)))
            )
            st = engine.make_state(m)
            st = st._replace(
                qvel=st.qvel + jnp.asarray(
                    1e-4 * rng.standard_normal(st.qvel.shape), jnp.float32)
            )
            return carry, st

        # compile + one discarded warm run before _timed's medians so the
        # fit never sees first-dispatch contamination (the r3 artifact's
        # negative intercept came from exactly that)
        jax.block_until_ready(f(*fresh_inputs()))
        jax.block_until_ready(f(*fresh_inputs()))
        return _timed(lambda: f(*fresh_inputs()), reps=5), f

    ns = (25, 50, 100)
    print(f"compiling closed loops (N={ns})...")
    loop_s = {n: run_loop(n)[0] for n in ns}
    # least-squares T(N) = a*N + b over >= 3 points; a per-dispatch
    # overhead cannot be negative, so clamp and refit the slope through
    # the clamped intercept if the unconstrained fit goes below zero
    A = np.array(ns, dtype=np.float64)
    T = np.array([loop_s[n] for n in ns])
    a, b = np.polyfit(A, T, 1)
    if b < 0:
        b = 0.0
        a = float(np.sum(A * T) / np.sum(A * A))
    per_step_s, intercept_s = float(a), float(b)

    # controller-side real-time work per 100 Hz period: the one-step
    # state prediction (lane engine) + the MPPI solve — what an onboard
    # TPU must finish inside 10 ms. The plant step of the sim loop is
    # physical reality on a robot and is excluded.
    print("timing controller work (predict + solve) in a K-scan...")
    carry_rt = mpc_runtime.init_carry(m, cfg, 50, jax.random.PRNGKey(1))
    st_rt = engine.make_state(m)

    def body_controller():
        def body(c, _):
            carry, phys, pending = c
            pred = mpc_runtime.lane_control_step(
                m, phys, pending, cfg.plant_frame_skip,
                solver_iterations=cfg.mppi.lane_newton_iterations,
                ls_iterations=cfg.mppi.lane_ls_iterations)
            ctrl_next, carry, _ = mpc_runtime.plan_and_act(
                m, cfg, cost_fn, carry, pred, cmd)
            # keep the loop honest: the plant is frozen (reality), only
            # controller work is timed; feed ctrl back so nothing is DCE'd
            return (carry, phys, ctrl_next), None
        return body

    controller_ms = _timed_scan_ms(
        body_controller, (carry_rt, st_rt, jnp.asarray(HOLD, jnp.float32)),
        rng)
    solve_ms = _timed_scan_ms(
        lambda: (lambda c, _: (mpc_runtime.plan_and_act(
            m, cfg, cost_fn, c, st_rt, cmd)[1], None)),
        carry_rt, rng)
    predict_ms = max(controller_ms - solve_ms, 0.0)

    # tunnel/dispatch overhead on a trivial program
    x = jnp.asarray(rng.standard_normal(8), jnp.float32)
    triv = jax.jit(lambda v: v + 1.0)
    jax.block_until_ready(triv(x))
    t_triv = _timed(triv, x, reps=5)

    # single blocking solve (what a naive host loop would pay per step)
    carry0 = mpc_runtime.init_carry(m, cfg, 50, jax.random.PRNGKey(0))
    st0 = engine.make_state(m)
    solve1 = jax.jit(lambda c, s: mpc_runtime.plan_and_act(
        m, cfg, cost_fn, c, s, cmd)[0])
    jax.block_until_ready(solve1(carry0, st0))
    t_solve1 = _timed(lambda: jax.block_until_ready(solve1(*(
        mpc_runtime.init_carry(
            m, cfg, 50, jax.random.PRNGKey(int(rng.integers(2**31)))),
        st0._replace(qvel=st0.qvel + jnp.asarray(
            1e-4 * rng.standard_normal(st0.qvel.shape), jnp.float32)),
    ))))

    # --- roofline / MFU of the fused rollout kernel -----------------------
    S = 4096
    state = engine.make_state(m)
    prev = jnp.asarray(HOLD, jnp.float32)
    rcfg = cfg.mppi.rollout
    seqs = jnp.clip(
        jnp.asarray(prev)[None, None]
        + 0.2 * jnp.asarray(
            rng.standard_normal((S, 50, m.nu)), jnp.float32),
        -1.0, 1.0,
    )

    def score_fused(s):
        return rollout.lane_batched_rollout_cost(
            m, rcfg, cost_fn, state, s, cmd, prev,
            newton_iterations=2, ls_iterations=4, engine_impl="fused",
        )

    def score_xla(s):
        return rollout.lane_batched_rollout_cost(
            m, rcfg, cost_fn, state, s, cmd, prev,
            newton_iterations=2, ls_iterations=4, engine_impl="lane",
        )

    # scan-based timing: a single blocking dispatch would fold the ~30 ms
    # tunnel overhead into the kernel time (3.5x error at this size)
    def body_fused():
        def body(s, _):
            c = score_fused(s)
            s = jnp.clip(s + 1e-6 * c[:, None, None], -1.0, 1.0)
            return s, None
        return body

    t_fused = _timed_scan_ms(body_fused, seqs, rng) / 1e3
    print("cost analysis of the unfused engine (analytic FLOPs)...")
    cs = profiling.cost_summary(score_xla, seqs)
    mfu = cs.flop_time_s / t_fused
    bw_frac = cs.mem_time_s / t_fused

    report = {
        "device": str(dev),
        "config": {
            "solver": "mppi", "samples": 1024, "horizon": 50,
            "frame_skip": 5, "control_rate_hz": 100,
            "newton_ls_budget": "2/4", "plant": "planning",
        },
        "controller_realtime": {
            "work_per_period_ms": controller_ms,
            "solve_ms": solve_ms,
            "predict_ms": predict_ms,
            "meets_10ms_budget": controller_ms < 10.0,
            "headroom_x": 10.0 / max(controller_ms, 1e-9),
            "note": "one-step lane-engine state prediction + 1024-sample "
                    "H=50 fused MPPI solve, timed as a K-step on-device "
                    "scan — the controller work that must fit a 100 Hz "
                    "period under delayed_closed_loop semantics; the "
                    "plant step is physical reality on hardware and "
                    "excluded",
        },
        "closed_loop_sim": {
            "device_time_per_control_step_ms": per_step_s * 1e3,
            "dispatch_intercept_ms": intercept_s * 1e3,
            "loop_s_by_N": {str(n): loop_s[n] for n in ns},
            "meets_10ms_budget": per_step_s * 1e3 < 10.0,
            "note": "least-squares slope of T(N) over the on-device "
                    "delayed_closed_loop scan (N=25/50/100, warmup "
                    "discarded, intercept clamped >= 0): controller work "
                    "PLUS simulating the plant (leg-engine twin) per "
                    "100 Hz control step; the intercept is per-dispatch "
                    "overhead (axon tunnel), absent on a directly-"
                    "attached chip",
        },
        "tunnel": {
            "trivial_dispatch_ms": t_triv * 1e3,
            "single_blocking_solve_ms": t_solve1 * 1e3,
        },
        "fused_kernel_roofline": {
            "samples": S,
            "wall_s": t_fused,
            "analytic_flops": cs.flops,
            "analytic_bytes": cs.bytes_accessed,
            "mfu_fraction_of_f32_peak": mfu,
            "hbm_fraction_of_peak": bw_frac,
            "rollouts_per_s": S / t_fused,
            "note": "FLOPs from XLA cost analysis of the unfused lane "
                    "engine (identical math); the Mosaic kernel is opaque "
                    "to cost analysis",
        },
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "latency_report.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
