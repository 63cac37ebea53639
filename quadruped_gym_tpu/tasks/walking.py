"""The velocity/heading-command walking task as pure reset/step functions.

Functional re-derivation of ``WalkingQuadrupedEnv`` /
``POWalkingQuadrupedEnv`` (``walking_quad.py:9-148``,
``po_walking_quad.py:8-91``) with every piece of env-object state made an
explicit carry, so the whole task vmaps over thousands of parallel
environments and scans over horizons on TPU.

Step ordering matches the reference exactly (walking_quad.py:128-148):
ideal-position integration and the frequency/amplitude-estimator update (fed
the *previous* applied ctrl) happen before the physics substeps; the settling
mask overrides early actions; rewards read the post-step sensordata.

Cross-episode persistence quirks preserved: the estimator state and the
frozen control-cost reference survive reset (walking_quad.py:115 is
commented out in the reference; previous_ctrl_cost is never cleared).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.spec import PhysicsModel
from ..physics import engine
from . import commands, estimator, observations, rewards


@dataclasses.dataclass(frozen=True)
class WalkingConfig:
    """Static task configuration (constructor kwargs in the reference)."""

    max_time: float = 10.0
    frame_skip: int = 4
    settling_time: float = 0.0
    random_controls: bool = False
    random_init: bool = False
    reset_options: commands.SampleOptions = commands.SampleOptions()
    obs_window: int = 1  # PO variant frame stacking
    partial_obs: bool = False
    max_contacts: int = 24
    solver_iterations: Optional[int] = None
    min_freq: float = 1.0  # estimator config (walking_quad.py:54-59)
    ema_alpha: float = 0.80
    dtype: type = jnp.float32

    def control_dt(self, m: PhysicsModel) -> float:
        return m.timestep * self.frame_skip


class WalkingState(NamedTuple):
    phys: engine.State
    cmd: commands.Command
    ideal_position: jnp.ndarray  # (3,)
    est: estimator.FreqAmpState
    rew: rewards.RewardCarry
    obs: observations.PoObsCarry  # Madgwick quat + frame stack (PO)
    applied_ctrl: jnp.ndarray  # (12,) data.ctrl equivalent
    key: jax.Array


class StepOutput(NamedTuple):
    state: WalkingState
    obs: jnp.ndarray
    reward: jnp.ndarray
    terminated: jnp.ndarray
    reward_components: jnp.ndarray  # (11,) ordered as rewards.REWARD_KEYS


def obs_size(cfg: WalkingConfig, m: PhysicsModel) -> int:
    if cfg.partial_obs:
        return observations.PO_OBS_DIM * cfg.obs_window
    return m.nsensordata


def _fresh_persistent(cfg: WalkingConfig, m: PhysicsModel):
    W = estimator.window_size(cfg.min_freq, cfg.control_dt(m))
    est = estimator.init(m.nu, W, dtype=cfg.dtype)
    rew = rewards.init_carry(dtype=cfg.dtype)
    return est, rew


def reset(
    m: PhysicsModel,
    cfg: WalkingConfig,
    key: jax.Array,
    persistent: Optional[Tuple[estimator.FreqAmpState, rewards.RewardCarry]] = None,
    options: Optional[commands.SampleOptions] = None,
) -> Tuple[WalkingState, jnp.ndarray]:
    """Episode reset. ``persistent`` carries the estimator/ctrl-cost state
    across episodes (reference behavior); omit for a cold start."""
    dt = cfg.dtype
    sl = rewards.SensorSlices.from_model(m)
    key, k_init, k_cmd = jax.random.split(key, 3)

    phys = engine.make_state(m, dtype=dt)
    # reset control (quadruped.py:124)
    ctrl0 = jnp.asarray(rewards.JOINT_CENTERS, dtype=dt)

    if cfg.random_init:
        # random base yaw (walking_quad.py:68-75): angle ~ U(0, 2pi)
        angle = jax.random.uniform(k_init, (), dt, 0.0, 2.0 * jnp.pi)
        quat = jnp.stack(
            [jnp.cos(angle / 2), jnp.zeros((), dt), jnp.zeros((), dt), jnp.sin(angle / 2)]
        )
        phys = phys._replace(qpos=phys.qpos.at[3:7].set(quat))

    if cfg.random_controls:
        opts = options if options is not None else cfg.reset_options
        cmd = commands.sample(k_cmd, opts, dtype=dt)
    else:
        cmd = commands.zero(dtype=dt)

    est, rew = persistent if persistent is not None else _fresh_persistent(cfg, m)
    rew = rewards.episode_reset_carry(rew, dtype=dt)

    obs_carry = observations.po_init_carry(cfg.obs_window, dtype=dt)
    # PO reset obs computed with the STALE filter quat (po_walking_quad.py:63-68)
    if cfg.partial_obs:
        frame, _ = observations.po_observation(
            sl, phys.sensordata, ctrl0, cmd, obs_carry.mad_quat,
            phys.time, cfg.settling_time, cfg.control_dt(m),
        )
        obs_carry = observations.PoObsCarry(
            mad_quat=phys.qpos[3:7],  # re-seed from the true orientation
            buffer=observations.stack_fill(obs_carry.buffer, frame),
        )
        obs = obs_carry.buffer.reshape(-1)
    else:
        obs = phys.sensordata

    state = WalkingState(
        phys=phys,
        cmd=cmd,
        ideal_position=jnp.zeros(3, dtype=dt),
        est=est,
        rew=rew,
        obs=obs_carry,
        applied_ctrl=ctrl0,
        key=key,
    )
    return state, obs


def step(
    m: PhysicsModel, cfg: WalkingConfig, state: WalkingState, action: jnp.ndarray
) -> StepOutput:
    dt = cfg.dtype
    sl = rewards.SensorSlices.from_model(m)
    cdt = cfg.control_dt(m)

    # 1. ideal-position integration (walking_quad.py:88-94,133)
    ideal = state.ideal_position + state.cmd.global_velocity * cdt

    # 2. estimator update on the PREVIOUS applied ctrl (walking_quad.py:136)
    est, f_est, a_est = estimator.update(
        state.est, state.applied_ctrl, cdt, cfg.ema_alpha
    )

    # 3. settling mask (walking_quad.py:142-143)
    centers = jnp.asarray(rewards.JOINT_CENTERS, dtype=dt)
    action = jnp.where(state.phys.time < cfg.settling_time, centers, action)

    # 4. clip + physics substeps (quadruped.py:160-165)
    from ..physics.smooth import clip_ctrl

    ctrl = clip_ctrl(m, action.astype(dt))
    phys = engine.control_step(
        m, state.phys, ctrl, cfg.frame_skip,
        max_contacts=cfg.max_contacts, solver_iterations=cfg.solver_iterations,
    )

    # 5. reward on post-step sensordata (quadruped.py:167-175)
    out = rewards.input_control_reward(
        phys.sensordata, ctrl, state.cmd, ideal, f_est, a_est, state.rew, sl, cdt
    )

    # 6. termination: flip OR time limit (walking_quad.py:158-162)
    terminated = rewards.flip_termination(phys.sensordata, sl) | rewards.time_termination(
        phys.time, cfg.max_time
    )

    # 7. observation
    if cfg.partial_obs:
        frame, mad_q = observations.po_observation(
            sl, phys.sensordata, ctrl, state.cmd, state.obs.mad_quat,
            phys.time, cfg.settling_time, cdt,
        )
        buffer = observations.stack_push(state.obs.buffer, frame)
        obs_carry = observations.PoObsCarry(mad_quat=mad_q, buffer=buffer)
        obs = buffer.reshape(-1)
    else:
        obs_carry = state.obs
        obs = phys.sensordata

    new_state = WalkingState(
        phys=phys,
        cmd=state.cmd,
        ideal_position=ideal,
        est=est,
        rew=out.carry,
        obs=obs_carry,
        applied_ctrl=ctrl,
        key=state.key,
    )
    return StepOutput(
        state=new_state,
        obs=obs,
        reward=out.total,
        terminated=terminated,
        reward_components=out.components,
    )


def batched_step(
    m: PhysicsModel,
    cfg: WalkingConfig,
    state: WalkingState,  # batched pytree, leading axis B
    action: jnp.ndarray,  # (B, nu)
    engine_impl: str = "auto",
    newton_iterations: Optional[int] = None,
    ls_iterations: int = 8,
) -> StepOutput:
    """``vmap(step)`` semantics with physics through the batch-minor engine.

    The per-env (AoS) engine is the oracle-parity path but the batch-minor
    lane/leg engines are ~5-20x faster per substep at training batch sizes
    (tests/test_lane_engine.py, tests/test_leg_engine.py). The task-layer
    math is negligible next to physics, so it simply stays vmapped; only
    step 4 (the frame-skipped substeps) changes layout. ``engine_impl``:
    "auto" picks the leg-batched engine when the model supports it (feet-
    only collision) else the lane engine. The Newton budget is a fixed
    iteration count (no convergence branching): ``newton_iterations``
    defaults to ``cfg.solver_iterations`` (or 4 when that is None/
    adaptive)."""
    if newton_iterations is None:
        newton_iterations = cfg.solver_iterations or 4
    from ..ops import lane_engine, leg_engine
    from ..physics.smooth import clip_ctrl

    dt = cfg.dtype
    sl = rewards.SensorSlices.from_model(m)
    cdt = cfg.control_dt(m)
    B = action.shape[0]

    # 1. ideal-position integration
    ideal = state.ideal_position + state.cmd.global_velocity * cdt  # (B, 3)

    # 2. estimator update on the PREVIOUS applied ctrl
    est, f_est, a_est = jax.vmap(
        lambda s, x: estimator.update(s, x, cdt, cfg.ema_alpha)
    )(state.est, state.applied_ctrl)

    # 3. settling mask
    centers = jnp.asarray(rewards.JOINT_CENTERS, dtype=dt)
    action = jnp.where(
        (state.phys.time < cfg.settling_time)[:, None], centers[None], action
    )

    # 4. clip + physics substeps through the batch-minor engine
    ctrl = clip_ctrl(m, action.astype(dt))
    if engine_impl == "pallas" and leg_engine.is_compatible(m):
        # TPU-only: the fused Mosaic substep kernel (feet-only models)
        from ..ops import pallas_engine as eng
    elif engine_impl == "leg" or (
        engine_impl == "auto" and leg_engine.is_compatible(m)
    ):
        eng = leg_engine
    else:
        if engine_impl == "pallas":
            import warnings

            warnings.warn(
                "engine_impl='pallas' needs the feet-only collision model "
                "(leg_engine.is_compatible); falling back to the slower "
                "lane engine",
                stacklevel=2,
            )
        eng = lane_engine
    ls = lane_engine.from_batched(
        state.phys.qpos, state.phys.qvel, state.phys.act,
        state.phys.time, state.phys.sensordata,
    )
    ls = eng.control_step(
        m, ls, ctrl.T, cfg.frame_skip,
        solver_iterations=newton_iterations, ls_iterations=ls_iterations,
    )
    qpos, qvel, act, time, sens = lane_engine.to_batched(ls)
    phys = engine.State(qpos=qpos, qvel=qvel, act=act, time=time,
                        sensordata=sens)

    # 5. reward on post-step sensordata
    out = jax.vmap(
        lambda s, c, cm, i, f, a, r: rewards.input_control_reward(
            s, c, cm, i, f, a, r, sl, cdt
        )
    )(phys.sensordata, ctrl, state.cmd, ideal, f_est, a_est, state.rew)

    # 6. termination
    terminated = jax.vmap(
        lambda s: rewards.flip_termination(s, sl)
    )(phys.sensordata) | rewards.time_termination(phys.time, cfg.max_time)

    # 7. observation
    if cfg.partial_obs:
        def po_one(s, c, cm, mq, t, buf):
            frame, mad_q = observations.po_observation(
                sl, s, c, cm, mq, t, cfg.settling_time, cdt
            )
            buffer = observations.stack_push(buf, frame)
            return observations.PoObsCarry(mad_quat=mad_q, buffer=buffer)

        obs_carry = jax.vmap(po_one)(
            phys.sensordata, ctrl, state.cmd, state.obs.mad_quat,
            phys.time, state.obs.buffer,
        )
        obs = obs_carry.buffer.reshape(B, -1)
    else:
        obs_carry = state.obs
        obs = phys.sensordata

    new_state = WalkingState(
        phys=phys,
        cmd=state.cmd,
        ideal_position=ideal,
        est=est,
        rew=out.carry,
        obs=obs_carry,
        applied_ctrl=ctrl,
        key=state.key,
    )
    return StepOutput(
        state=new_state,
        obs=obs,
        reward=out.total,
        terminated=terminated,
        reward_components=out.components,
    )
