"""Real-time MPC loop latency measurement (BASELINE: <10 ms replan @100 Hz).

Two processes talk over the native shared-memory ``ControlBus``
(``native/control_bus.cc``), reproducing the onboard wiring:

  * PLANT process — live CPU MuJoCo (the behavioral oracle) stepping the
    robot in wall-clock time: every control period it applies the latest
    control read from the bus and publishes qpos/qvel back.
  * CONTROLLER process (this one) — the TPU MPPI planner in the
    delayed-pipeline pattern (``runtime.delayed_closed_loop`` semantics):
    while control u_t actuates, the solve for u_{t+1} runs against the
    one-period state prediction; each period it reads the plant state,
    writes the previously-solved control, and launches the next solve.

Per-solve latency is recorded two ways and reported separately, because
this sandbox reaches its TPU through a tunnel that adds ~30 ms of fixed
host<->device round-trip per blocking dispatch (an environment artifact a
directly-attached chip does not have):

  * ``sync_ms`` — wall-clock around a fully-blocked solve (tunnel
    included): the honest number *in this sandbox*.
  * ``pipelined_ms`` — amortized wall-clock of K solves dispatched
    back-to-back with distinct inputs and blocked once: dispatch/tunnel
    overlaps compute, so this approaches pure device time — the number
    that maps to a directly-attached deployment.

Writes artifacts/latency_report.json with p50/p90/p99 of both, plus the
achieved loop rate of the two-process 100 Hz drive.

Run:  python examples/latency_demo.py [--samples 1024] [--seconds 5]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

BUS = "qg_latency_demo"
CTRL_DT = 0.01  # 100 Hz
HOLD = np.array([0.0, 0.0, -0.5] * 4)

_PLANT = r"""
import os, sys, time
import numpy as np
sys.path.insert(0, os.environ["QG_REPO"])
import mujoco
from quadruped_gym_tpu.models.spec import DEFAULT_SCENE
from quadruped_gym_tpu.native import ControlBus

m = mujoco.MjModel.from_xml_path(DEFAULT_SCENE)
d = mujoco.MjData(m)
mujoco.mj_resetData(m, d)
d.ctrl[:] = [0.0, 0.0, -0.5] * 4
for _ in range(400):  # settle to stance before going live
    mujoco.mj_step(m, d)

bus = ControlBus.open(os.environ["QG_BUS"])
dt = float(os.environ["QG_CTRL_DT"])
t_end = time.perf_counter() + float(os.environ["QG_SECONDS"])
steps = 0
next_t = time.perf_counter()
while time.perf_counter() < t_end:
    ctrl, _t = bus.read_ctrl()
    d.ctrl[:] = np.clip(ctrl, -1.0, 1.0)
    for _ in range(int(round(dt / m.opt.timestep))):
        mujoco.mj_step(m, d)
    bus.write_sensor(np.concatenate([d.qpos, d.qvel]), t=d.time)
    steps += 1
    next_t += dt
    sleep = next_t - time.perf_counter()
    if sleep > 0:
        time.sleep(sleep)
bus.close()
print(f"plant: {steps} periods, sim time {d.time:.2f}s, "
      f"base z {d.qpos[2]:.3f}", flush=True)
"""


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--samples", type=int, default=1024)
    p.add_argument("--horizon", type=int, default=50)
    p.add_argument("--seconds", type=float, default=5.0)
    p.add_argument("--measure-iters", type=int, default=50)
    p.add_argument("--out", default=os.path.join(_REPO, "artifacts",
                                                 "latency_report.json"))
    args = p.parse_args(argv)

    from quadruped_gym_tpu.models import spec
    from quadruped_gym_tpu.native import ControlBus
    from quadruped_gym_tpu.physics import engine
    from quadruped_gym_tpu.runtime import mpc_runtime
    from quadruped_gym_tpu.solvers import mppi, rollout
    from quadruped_gym_tpu.tasks import commands

    m = spec.get_planning_model()
    cfg = mpc_runtime.MPCConfig(
        solver="mppi",
        mppi=mppi.MPPIConfig(
            num_samples=args.samples,
            rollout=rollout.RolloutConfig(
                horizon=args.horizon, frame_skip=5,
                max_contacts=12, solver_iterations=2,
            ),
        ),
    )
    cost_fn = rollout.make_cost_fn(m)
    cmd = commands.make(jnp.array([0.2, 0.0]), jnp.array(0.0))

    @jax.jit
    def solve(carry, qpos, qvel):
        phys = engine.make_state(m)._replace(
            qpos=qpos.astype(jnp.float32), qvel=qvel.astype(jnp.float32)
        )
        # one-period prediction (pipeline pattern) + plan
        pred = engine.control_step(
            m, phys, carry.prev_ctrl, cfg.plant_frame_skip,
            max_contacts=cfg.rollout.max_contacts,
            solver_iterations=cfg.rollout.solver_iterations,
        )
        ctrl, carry, info = mpc_runtime.plan_and_act(
            m, cfg, cost_fn, carry, pred, cmd
        )
        return ctrl, carry, info["best_cost"]

    carry = mpc_runtime.init_carry(
        m, cfg, args.horizon, jax.random.PRNGKey(0)
    )
    st0 = engine.make_state(m)
    qp0, qv0 = np.asarray(st0.qpos), np.asarray(st0.qvel)

    print("compiling solve...")
    t0 = time.time()
    ctrl, carry, _ = solve(carry, jnp.asarray(qp0), jnp.asarray(qv0))
    jax.block_until_ready(ctrl)
    print(f"compiled in {time.time() - t0:.1f}s")

    # --- (1) sync per-solve latency (tunnel included) ---
    rng = np.random.default_rng(time.time_ns() % 2**32)  # defeat memoizer
    sync_ms = []
    for _ in range(args.measure_iters):
        qp = qp0 + np.concatenate([rng.normal(0, 1e-4, 7),
                                   rng.normal(0, 1e-3, 12)])
        qv = qv0 + rng.normal(0, 1e-3, qv0.shape)
        t0 = time.perf_counter()
        ctrl, carry, _ = solve(carry, jnp.asarray(qp), jnp.asarray(qv))
        jax.block_until_ready(ctrl)
        sync_ms.append((time.perf_counter() - t0) * 1e3)

    # --- (2) pipelined/amortized latency (approaches device time) ---
    K = args.measure_iters
    qps = [jnp.asarray(qp0 + np.concatenate([rng.normal(0, 1e-4, 7),
                                             rng.normal(0, 1e-3, 12)]))
           for _ in range(K)]
    qv = jnp.asarray(qv0)
    jax.block_until_ready(qps)
    t0 = time.perf_counter()
    out = None
    for qp in qps:
        out, carry, _ = solve(carry, qp, qv)
    jax.block_until_ready(out)
    pipelined_ms = (time.perf_counter() - t0) * 1e3 / K

    # --- (3) two-process 100 Hz drive over the shm bus ---
    bus = ControlBus.create(BUS, nsensor=m.nq + m.nv, nctrl=m.nu)
    bus.write_ctrl(HOLD)
    bus.write_sensor(np.concatenate([qp0, qv0]))
    env = dict(os.environ, QG_REPO=_REPO, QG_BUS=BUS,
               QG_CTRL_DT=str(CTRL_DT), QG_SECONDS=str(args.seconds))
    plant = subprocess.Popen([sys.executable, "-c", _PLANT], env=env,
                             stdout=subprocess.PIPE, text=True)

    loop_ms, deadline_misses, periods = [], 0, 0
    pending = jnp.asarray(HOLD, jnp.float32)
    t_end = time.perf_counter() + args.seconds
    next_t = time.perf_counter()
    while time.perf_counter() < t_end:
        t0 = time.perf_counter()
        state, _ = bus.read_sensor()
        bus.write_ctrl(np.asarray(pending, np.float64))
        ctrl, carry, _ = solve(
            carry, jnp.asarray(state[: m.nq]), jnp.asarray(state[m.nq:])
        )
        jax.block_until_ready(ctrl)
        pending = ctrl
        dt_ms = (time.perf_counter() - t0) * 1e3
        loop_ms.append(dt_ms)
        if dt_ms > CTRL_DT * 1e3:
            deadline_misses += 1
        periods += 1
        next_t += CTRL_DT
        sleep = next_t - time.perf_counter()
        if sleep > 0:
            time.sleep(sleep)
        else:
            next_t = time.perf_counter()  # fell behind: resync
    plant_out, _ = plant.communicate(timeout=30)
    bus.close()
    bus.unlink()

    def stats(xs):
        xs = np.asarray(xs)
        return {
            "p50_ms": float(np.percentile(xs, 50)),
            "p90_ms": float(np.percentile(xs, 90)),
            "p99_ms": float(np.percentile(xs, 99)),
            "mean_ms": float(xs.mean()),
            "n": int(xs.size),
        }

    report = {
        "config": {
            "solver": "mppi",
            "samples": args.samples,
            "horizon": args.horizon,
            "control_rate_hz": 1.0 / CTRL_DT,
            "device": str(jax.devices()[0]),
        },
        "sync_solve": stats(sync_ms),
        "pipelined_solve": {"amortized_ms": pipelined_ms, "k": K},
        "tunnel_overhead_ms_estimate": float(
            np.percentile(sync_ms, 50) - pipelined_ms
        ),
        "two_process_loop": {
            **stats(loop_ms),
            "periods": periods,
            "deadline_misses": deadline_misses,
            "deadline_ms": CTRL_DT * 1e3,
            "plant_stdout": plant_out.strip(),
        },
        "note": (
            "sync_solve includes the sandbox's experimental TPU tunnel "
            "(~30 ms fixed per blocking dispatch); pipelined_solve "
            "amortizes it and approaches pure device time, the figure "
            "for a directly-attached deployment."
        ),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report["sync_solve"]))
    print(f"pipelined amortized: {pipelined_ms:.2f} ms/solve")
    print(f"two-process loop: p50 {report['two_process_loop']['p50_ms']:.1f} ms, "
          f"misses {deadline_misses}/{periods}")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
