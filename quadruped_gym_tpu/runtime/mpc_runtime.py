"""Receding-horizon MPC runtime: plan -> apply -> shift, under one jit.

The replanning loop of the TPU-native engine (BASELINE north star: <10 ms
replan at a 100 Hz inner loop). The whole closed-loop step — sampling,
batched rollouts, weighting, mean update, and advancing the plant — is a
single compiled function with donated buffers, so steady-state latency is
pure device time, no host round-trips.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.spec import PhysicsModel
from ..physics import engine
from ..tasks.commands import Command
from . import checkpoint as _ckpt  # noqa: F401 (re-export convenience)
from ..solvers import cem as cem_mod
from ..solvers import ilqr as ilqr_mod
from ..solvers import mppi as mppi_mod
from ..solvers import rollout as rollout_mod
from ..solvers import sqp as sqp_mod


@dataclasses.dataclass(frozen=True)
class MPCConfig:
    solver: str = "mppi"  # "mppi" | "cem" | "sqp" | "ilqr"
    mppi: mppi_mod.MPPIConfig = mppi_mod.MPPIConfig()
    cem: cem_mod.CEMConfig = cem_mod.CEMConfig()
    # gradient solvers for receding-horizon use: few iterations per
    # period, warm-started from the shifted incumbent plan. Pair with a
    # smoothed cost (rollout.make_cost_fn(m, vel_smooth_eps>0)) — the
    # exact cost's quadratization is blind at stance (rollout.py:52-60).
    sqp: sqp_mod.SQPConfig = sqp_mod.SQPConfig(iterations=1)
    ilqr: ilqr_mod.ILQRConfig = ilqr_mod.ILQRConfig(iterations=2)
    # plant (the "real" robot) stepping
    plant_frame_skip: int = 5
    plant_max_contacts: int = 24
    plant_solver_iterations: Optional[int] = None

    @property
    def rollout(self) -> rollout_mod.RolloutConfig:
        return {
            "mppi": self.mppi.rollout,
            "cem": self.cem.rollout,
            "sqp": self.sqp.rollout,
            "ilqr": self.ilqr.rollout,
        }[self.solver]


class MPCCarry(NamedTuple):
    mean: jnp.ndarray  # (H, nu) warm-started plan
    sigma: jnp.ndarray  # (H, nu) CEM distribution scale
    prev_ctrl: jnp.ndarray  # (nu,)
    key: jax.Array


def init_carry(
    m: PhysicsModel, cfg: MPCConfig, horizon: int, key: jax.Array, dtype=jnp.float32
) -> MPCCarry:
    centers = jnp.asarray(np.array([0.0, 0.0, -0.5] * 4), dtype)
    return MPCCarry(
        mean=jnp.tile(centers, (horizon, 1)),
        sigma=jnp.full((horizon, m.nu), cfg.cem.init_sigma, dtype),
        prev_ctrl=centers,
        key=key,
    )


def lane_control_step(
    m: PhysicsModel,
    phys: engine.State,
    ctrl: jnp.ndarray,
    frame_skip: int,
    solver_iterations: int = 4,
    ls_iterations: int = 8,
) -> engine.State:
    """Advance ONE ``engine.State`` a control period through the
    batch-minor leg engine, duplicated across an 8-lane sublane.

    At batch 1 the AoS engine compiles to thousands of scalar HLO ops
    (~5 ms/step measured on v5e); the leg engine's wide lane ops do the
    same physics in ~0.2 ms, which matters inside the 10 ms / 100 Hz
    real-time budget (the predictor step of ``delayed_closed_loop`` is
    controller work on a real robot, unlike the plant step)."""
    from ..ops import lane_engine, leg_engine

    B = 8  # one f32 sublane
    ls = lane_engine.LaneState(
        qpos=jnp.broadcast_to(phys.qpos[:, None], (m.nq, B)),
        qvel=jnp.broadcast_to(phys.qvel[:, None], (m.nv, B)),
        act=jnp.broadcast_to(phys.act[:, None], (m.na, B)),
        time=jnp.broadcast_to(phys.time, (B,)),
        sensordata=jnp.broadcast_to(
            phys.sensordata[:, None], (m.nsensordata, B)),
    )
    ls = leg_engine.control_step(
        m, ls, jnp.broadcast_to(ctrl[:, None], (m.nu, B)), frame_skip,
        solver_iterations=solver_iterations, ls_iterations=ls_iterations,
    )
    return engine.State(
        qpos=ls.qpos[:, 0], qvel=ls.qvel[:, 0], act=ls.act[:, 0],
        time=ls.time[0], sensordata=ls.sensordata[:, 0],
    )


def plan_and_act(
    m: PhysicsModel,
    cfg: MPCConfig,
    cost_fn: rollout_mod.CostFn,
    carry: MPCCarry,
    phys: engine.State,
    cmd: Command,
):
    """One MPC solve: returns (ctrl_to_apply, new_carry, info_dict)."""
    key, sub = jax.random.split(carry.key)
    if cfg.solver == "mppi":
        res = mppi_mod.plan(
            m, cfg.mppi, cost_fn, phys, carry.mean, cmd, carry.prev_ctrl, sub
        )
        mean, sigma = res.mean, carry.sigma
        info = {"best_cost": res.best_cost, "mean_cost": res.mean_cost}
    elif cfg.solver == "cem":
        res = cem_mod.plan(
            m, cfg.cem, cost_fn, phys, carry.mean, cmd, carry.prev_ctrl, sub,
            sigma=carry.sigma,
        )
        mean, sigma = res.mean, res.sigma
        info = {"best_cost": res.best_cost, "mean_cost": res.mean_cost}
    elif cfg.solver == "sqp":
        # receding-horizon SQP (BASELINE config 4, closed loop): the
        # shifted incumbent is the warm start; cfg.sqp.iterations
        # condensed-QP steps refine it within the control period
        res = sqp_mod.solve(
            m, cfg.sqp, cost_fn, phys, carry.mean, cmd, carry.prev_ctrl
        )
        mean, sigma = res.ctrl_seq, carry.sigma
        info = {"best_cost": res.cost, "mean_cost": res.initial_cost}
    elif cfg.solver == "ilqr":
        res = ilqr_mod.solve(
            m, cfg.ilqr, cost_fn, phys, carry.mean, cmd, carry.prev_ctrl
        )
        mean, sigma = res.ctrl_seq, carry.sigma
        info = {"best_cost": res.cost, "mean_cost": res.initial_cost}
    else:
        raise ValueError(cfg.solver)

    ctrl = mean[0]
    # receding-horizon shift: roll the plan left, repeat the last step
    mean = jnp.concatenate([mean[1:], mean[-1:]], axis=0)
    new_carry = MPCCarry(mean=mean, sigma=sigma, prev_ctrl=ctrl, key=key)
    return ctrl, new_carry, info


def closed_loop(
    m: PhysicsModel,
    cfg: MPCConfig,
    cost_fn: rollout_mod.CostFn,
    carry: MPCCarry,
    phys: engine.State,
    cmd: Command,
    n_steps: int,
    plant_model: Optional[PhysicsModel] = None,
):
    """Run n_steps of receding-horizon control fully on-device.

    Returns (final_carry, final_phys, stacked per-step (ctrl, sensordata,
    best_cost)). ``plant_model`` lets the plant integrate a different (e.g.
    full-collision or domain-randomized) model than the planner."""
    pm_plant = plant_model if plant_model is not None else m

    def body(c, _):
        carry, phys = c
        ctrl, carry, info = plan_and_act(m, cfg, cost_fn, carry, phys, cmd)
        phys = engine.control_step(
            pm_plant, phys, ctrl, cfg.plant_frame_skip,
            max_contacts=cfg.plant_max_contacts,
            solver_iterations=cfg.plant_solver_iterations,
        )
        return (carry, phys), (ctrl, phys.sensordata, info["best_cost"])

    (carry, phys), traj = jax.lax.scan(body, (carry, phys), None, length=n_steps)
    return carry, phys, traj


def delayed_closed_loop(
    m: PhysicsModel,
    cfg: MPCConfig,
    cost_fn: rollout_mod.CostFn,
    carry: MPCCarry,
    phys: engine.State,
    cmd: Command,
    n_steps: int,
    plant_model: Optional[PhysicsModel] = None,
    predictor: str = "auto",
    plant_engine: str = "aos",
):
    """Closed loop with a one-control-period computation delay — the
    real-time MPC pipeline pattern.

    ``closed_loop`` assumes the solve is instantaneous (plan from x_t,
    apply at t). On hardware the solve takes real time, so the pipelined
    controller plans the control for step t+1 WHILE step t's control is
    being actuated: the solve starts from the one-step PREDICTION
    x̂_{t+1} = f(x_t, u_t) under the planner model, and its result is
    applied one period later. This gives the solver a full control
    period of latency budget (e.g. 10 ms at 100 Hz) instead of zero —
    the semantics under which the <10 ms solve target is sufficient for
    real-time control. This function reproduces those delay semantics
    exactly for on-device evaluation and tuning.

    Returns (final_carry, final_phys, stacked per-step
    (applied_ctrl, sensordata, best_cost)).

    ``predictor`` selects the engine for the one-step state prediction
    (controller-side work, inside the real-time budget): "lane" uses the
    batch-minor leg engine (~25x cheaper at batch 1 on TPU), "aos" the
    scalar AoS engine, "auto" picks lane when the model is leg-compatible
    and the planner itself scores through a lane engine.

    ``plant_engine`` selects the engine simulating the plant ("aos"
    default — mj_step-parity semantics; "lane" routes the plant through
    the leg engine too, which is what an all-on-TPU simulation loop
    should use: at batch 1 the AoS plant step costs ~9 ms of the 100 Hz
    period on v5e vs ~0.2 ms through the leg engine)."""
    pm_plant = plant_model if plant_model is not None else m
    rcfg = cfg.rollout
    if predictor == "auto":
        from ..ops import leg_engine as _leg

        lane_planner = (
            cfg.solver == "mppi" and cfg.mppi.lane
            or cfg.solver == "cem" and getattr(cfg.cem, "lane", False)
        )
        predictor = (
            "lane" if lane_planner and _leg.is_compatible(m) else "aos"
        )
    if predictor == "lane":
        # Newton/linesearch budget for the one-step prediction comes from
        # the matching sampling-solver config; gradient solvers (sqp/ilqr)
        # carry no lane_* fields, so they get the rollout defaults rather
        # than silently inheriting CEM tuning (ADVICE r4).
        if cfg.solver == "mppi":
            newton, lsit = (
                cfg.mppi.lane_newton_iterations, cfg.mppi.lane_ls_iterations
            )
        elif cfg.solver == "cem":
            newton, lsit = (
                cfg.cem.lane_newton_iterations, cfg.cem.lane_ls_iterations
            )
        else:
            newton = rcfg.solver_iterations
            lsit = 2 * rcfg.solver_iterations

        def predict(phys, pending):
            return lane_control_step(
                m, phys, pending, cfg.plant_frame_skip,
                solver_iterations=newton, ls_iterations=lsit,
            )
    elif predictor == "aos":

        def predict(phys, pending):
            return engine.control_step(
                m, phys, pending, cfg.plant_frame_skip,
                max_contacts=rcfg.max_contacts,
                solver_iterations=rcfg.solver_iterations,
            )
    else:
        raise ValueError(f"unknown predictor {predictor!r}")

    if plant_engine == "lane":
        from ..ops import leg_engine as _leg

        if not _leg.is_compatible(pm_plant):
            raise ValueError(
                "plant_engine='lane' needs a leg-compatible plant model"
            )
        p_newton = cfg.plant_solver_iterations or 4
        p_ls = 2 * p_newton

        def plant_step(phys, pending):
            return lane_control_step(
                pm_plant, phys, pending, cfg.plant_frame_skip,
                solver_iterations=p_newton, ls_iterations=p_ls,
            )
    elif plant_engine == "aos":

        def plant_step(phys, pending):
            return engine.control_step(
                pm_plant, phys, pending, cfg.plant_frame_skip,
                max_contacts=cfg.plant_max_contacts,
                solver_iterations=cfg.plant_solver_iterations,
            )
    else:
        raise ValueError(f"unknown plant_engine {plant_engine!r}")

    def body(c, _):
        carry, phys, pending = c
        # predict the state after the currently-actuating control —
        # the planner model plays the role of the onboard predictor
        pred = predict(phys, pending)
        # the solve that (on hardware) overlaps this control period
        ctrl_next, carry, info = plan_and_act(
            m, cfg, cost_fn, carry, pred, cmd
        )
        # meanwhile the real plant advances under the pending control
        phys = plant_step(phys, pending)
        return (carry, phys, ctrl_next), (
            pending, phys.sensordata, info["best_cost"]
        )

    (carry, phys, _), traj = jax.lax.scan(
        body, (carry, phys, carry.prev_ctrl), None, length=n_steps
    )
    return carry, phys, traj
