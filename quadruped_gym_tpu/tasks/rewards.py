"""Reward & termination primitives — the behavioral contract of SURVEY.md
§2.3, re-derived from ``/root/reference/src/envs/walking_quad.py:152-428``
as pure functions over (sensordata, ctrl, command, carry).

Deliberately preserved reference quirks (they are what the reference
actually computes — see SURVEY.md "quirks" and walking_quad.py lines cited):
  * ``progress_speed_reward_local`` uses the *second* definition
    (local velocimeter, walking_quad.py:204-211; the first def is shadowed);
  * ``control_cost``'s EMA reference value is captured once on the very
    first call and never updated, and it is NOT reset between episodes
    (walking_quad.py:51,266-268 — reset() does not clear it);
  * the derivative reward term is zero on the first step of each episode
    (previous_rewards_to_derive is None after reset, walking_quad.py:388-396).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.spec import PhysicsModel
from .commands import Command

JOINT_CENTERS = np.array([0.0, 0.0, -0.5] * 4, dtype=np.float64)

REWARD_KEYS = (
    "alive_bonus",
    "control_cost",
    "progress_direction_reward_local",
    "progress_speed_cost_local",
    "heading_reward",
    "orientation_reward",
    "body_height_cost",
    "joint_posture_cost",
    "control_amplitude_cost",
    "control_frequency_cost",
    "diff_ideal_position_cost",
)


class SensorSlices(NamedTuple):
    accel: int
    gyro: int
    pos: int
    linvel: int
    xaxis: int
    zaxis: int
    vel: int

    @classmethod
    def from_model(cls, m: PhysicsModel) -> "SensorSlices":
        return cls(
            accel=m.sensor_adr("body_accel"),
            gyro=m.sensor_adr("body_gyro"),
            pos=m.sensor_adr("body_pos"),
            linvel=m.sensor_adr("body_linvel"),
            xaxis=m.sensor_adr("body_xaxis"),
            zaxis=m.sensor_adr("body_zaxis"),
            vel=m.sensor_adr("body_vel"),
        )


class RewardCarry(NamedTuple):
    """State the reference keeps on the env object, made explicit."""

    previous_ctrl: jnp.ndarray  # (12,)
    ctrl_cost_ref: jnp.ndarray  # () frozen first control cost
    ctrl_cost_ref_set: jnp.ndarray  # () bool
    prev_rewards_to_derive: jnp.ndarray  # (1,) [-20 * ideal_position_cost]
    has_prev_derive: jnp.ndarray  # () bool


def init_carry(dtype=jnp.float32) -> RewardCarry:
    return RewardCarry(
        previous_ctrl=jnp.asarray(JOINT_CENTERS, dtype=dtype),
        ctrl_cost_ref=jnp.zeros((), dtype=dtype),
        ctrl_cost_ref_set=jnp.zeros((), jnp.bool_),
        prev_rewards_to_derive=jnp.zeros(1, dtype=dtype),
        has_prev_derive=jnp.zeros((), jnp.bool_),
    )


def episode_reset_carry(carry: RewardCarry, dtype=jnp.float32) -> RewardCarry:
    """What WalkingQuadrupedEnv.reset() actually resets (:106-112):
    previous_ctrl and the derivative memory — NOT the frozen ctrl-cost ref."""
    return RewardCarry(
        previous_ctrl=jnp.asarray(JOINT_CENTERS, dtype=dtype),
        ctrl_cost_ref=carry.ctrl_cost_ref,
        ctrl_cost_ref_set=carry.ctrl_cost_ref_set,
        prev_rewards_to_derive=jnp.zeros(1, dtype=dtype),
        has_prev_derive=jnp.zeros((), jnp.bool_),
    )


def exp_dist(x):
    """math_utils.py:4-5."""
    return jnp.exp(x) - 1.0


# Below this speed the direction of a velocity vector is numerically
# meaningless; the unit() Jacobian is zeroed there instead of blowing up as
# 1/|x| (iLQR/SQP quadratize the stage cost through unit()).
_UNIT_GRAD_EPS = 1e-6


@jax.custom_jvp
def unit(x, eps=0.0):
    """math_utils.py:7-8 (reference divides by the raw norm; a zero vector
    yields NaN there — we guard with a tiny epsilon only to stay finite,
    which matches wherever the reference is well-defined).

    The primal is exactly the round-1 where-guarded form (parity tests rely
    on it bitwise); the JVP is overridden to the true projection Jacobian
    ``(I - u u^T)/|x|`` for |x| > _UNIT_GRAD_EPS and zero below, so cost
    quadratization near x == 0 gets 0 instead of ~1e30 garbage entries."""
    n2 = jnp.sum(x * x)
    nonzero = n2 > 0.0
    n = jnp.where(nonzero, jnp.sqrt(jnp.where(nonzero, n2, 1.0)), 0.0)
    return x / jnp.maximum(n, 1e-30)


@unit.defjvp
def _unit_jvp(primals, tangents):
    x, _eps = primals
    dx, _ = tangents
    n2 = jnp.sum(x * x)
    big = n2 > _UNIT_GRAD_EPS * _UNIT_GRAD_EPS
    n = jnp.sqrt(jnp.where(big, n2, 1.0))
    u = x / n
    jdx = (dx - u * jnp.sum(u * dx)) / n
    jdx = jnp.where(big, jdx, jnp.zeros_like(jdx))
    return unit(x), jdx


# --- primitives (all take the 33-dim sensordata of the *current* obs) ---


def ideal_position_cost(sens, sl: SensorSlices, ideal_position):
    cur = sens[sl.pos : sl.pos + 3]
    return jnp.linalg.norm(cur[:2] - ideal_position[:2])


def progress_direction_reward_global(sens, sl, cmd: Command):
    v = sens[sl.linvel : sl.linvel + 3]
    return unit(v[:2]) @ unit(cmd.velocity[:2])


def progress_speed_cost_global(sens, sl, cmd: Command):
    d = jnp.linalg.norm(sens[sl.linvel : sl.linvel + 2 + 1][:2]) - jnp.linalg.norm(
        cmd.velocity[:2]
    )
    return jnp.square(d)


def progress_direction_reward_local(sens, sl, cmd: Command):
    v = sens[sl.vel : sl.vel + 3]
    return unit(v[:2]) @ unit(cmd.velocity[:2])


def progress_speed_reward_local(sens, sl, cmd: Command):
    """Effective (second) definition, walking_quad.py:204-211."""
    actual = jnp.linalg.norm(sens[sl.vel : sl.vel + 3][:2])
    inp = jnp.linalg.norm(cmd.velocity[:2])
    return actual - jnp.square(inp - actual)


def progress_speed_cost_local(sens, sl, cmd: Command):
    d = jnp.linalg.norm(sens[sl.vel : sl.vel + 3][:2]) - jnp.linalg.norm(
        cmd.velocity[:2]
    )
    return jnp.square(d)


def progress_cost_local(sens, sl, cmd: Command):
    d = sens[sl.vel : sl.vel + 3][:2] - cmd.velocity[:2]
    return jnp.sum(jnp.square(d))


def heading_reward(sens, sl, cmd: Command):
    return sens[sl.xaxis : sl.xaxis + 3][:2] @ cmd.heading[:2]


def orientation_reward(sens, sl):
    return sens[sl.zaxis + 2]


def body_height_cost(sens, sl, height=0.12):
    return jnp.abs(sens[sl.pos + 2] - height)


def joint_posture_cost(ctrl, nu=12):
    centers = jnp.asarray(JOINT_CENTERS, dtype=ctrl.dtype)
    return jnp.linalg.norm((ctrl - centers) / nu)


def control_cost(ctrl, carry: RewardCarry, alpha=0.8):
    """EMA-smoothed squared control delta with the frozen-reference quirk.
    Returns (cost, new_carry_fields)."""
    diff = ctrl - carry.previous_ctrl
    cost = jnp.sum(jnp.square(diff))
    ref = jnp.where(carry.ctrl_cost_ref_set, carry.ctrl_cost_ref, cost)
    out = alpha * ref + (1 - alpha) * cost
    return out, ctrl, ref


def control_frequency_cost(f_est, nu=12, target=(1.0, 1.0, 0.0)):
    t = jnp.asarray(np.array(list(target) * 4), dtype=f_est.dtype)
    return jnp.linalg.norm((f_est - t) / nu)


def control_amplitude_cost(a_est, nu=12, target=(1.5, 0.5, 0.0)):
    t = jnp.asarray(np.array(list(target) * 4), dtype=a_est.dtype)
    return jnp.linalg.norm((a_est - t) / nu)


def alive_bonus(dtype=jnp.float32):
    return jnp.ones((), dtype=dtype)


# --- terminations ---


def flip_termination(sens, sl: SensorSlices):
    """Body z-axis pointing down (walking_quad.py:152-156)."""
    return sens[sl.zaxis + 2] < 0


def time_termination(time, max_time):
    return time >= max_time


# --- the composite (walking_quad.py:352-422) ---


class RewardOutput(NamedTuple):
    total: jnp.ndarray
    components: jnp.ndarray  # (11,) ordered as REWARD_KEYS
    carry: RewardCarry


def input_control_reward(
    sens: jnp.ndarray,
    ctrl: jnp.ndarray,
    cmd: Command,
    ideal_position: jnp.ndarray,
    f_est: jnp.ndarray,
    a_est: jnp.ndarray,
    carry: RewardCarry,
    sl: SensorSlices,
    control_dt: float,
) -> RewardOutput:
    dtype = sens.dtype
    cc, new_prev_ctrl, cc_ref = control_cost(ctrl, carry)

    value_rewards = jnp.stack(
        [
            +10.0 * alive_bonus(dtype),
            -2.0 * cc,
            +10.0 * progress_direction_reward_local(sens, sl, cmd),
            -50.0 * progress_speed_cost_local(sens, sl, cmd),
            +10.0 * exp_dist(heading_reward(sens, sl, cmd)),
            +10.0 * exp_dist(orientation_reward(sens, sl)),
            -50.0 * exp_dist(body_height_cost(sens, sl, 0.13)),
            -1.0 * joint_posture_cost(ctrl),
            -2.5 * control_amplitude_cost(a_est),
            -8.0 * control_frequency_cost(f_est),
        ]
    )

    to_derive = jnp.stack([-20.0 * ideal_position_cost(sens, sl, ideal_position)])
    prev = jnp.where(carry.has_prev_derive, carry.prev_rewards_to_derive, to_derive)
    derived = (to_derive - prev) / control_dt

    components = jnp.concatenate([value_rewards, derived])
    total = jnp.sum(components)

    new_carry = RewardCarry(
        previous_ctrl=new_prev_ctrl,
        ctrl_cost_ref=cc_ref,
        ctrl_cost_ref_set=jnp.ones((), jnp.bool_),
        prev_rewards_to_derive=to_derive,
        has_prev_derive=jnp.ones((), jnp.bool_),
    )
    return RewardOutput(total=total, components=components, carry=new_carry)


# --- dummy task rewards (dummy_walking_quad.py:11-24, dead code in the
# reference due to a broken import, reproduced for capability parity) ---


def dummy_forward_reward(sens, sl):
    return sens[sl.linvel] * sens[sl.pos]


def dummy_no_drift_reward(sens, sl):
    return jnp.abs(sens[sl.linvel + 1] * sens[sl.pos + 1])


def dummy_composite(sens, ctrl, carry, sl):
    cc, new_prev, cc_ref = control_cost(ctrl, carry)
    total = (
        0.1 * alive_bonus(sens.dtype)
        - 0.5 * cc
        + 5.0 * dummy_forward_reward(sens, sl)
        - 3.0 * dummy_no_drift_reward(sens, sl)
    )
    return total, RewardCarry(
        previous_ctrl=new_prev,
        ctrl_cost_ref=cc_ref,
        ctrl_cost_ref_set=jnp.ones((), jnp.bool_),
        prev_rewards_to_derive=carry.prev_rewards_to_derive,
        has_prev_derive=carry.has_prev_derive,
    )
