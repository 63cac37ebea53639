"""Observation models.

Full observability: the raw 33-dim sensordata (reference base env,
``quadruped.py:141-143``).

Partial observability (``po_walking_quad.py:29-57``): a realistic 26-dim
IMU-centric observation — gyro(3) + accel(3) + Madgwick-estimated Euler
angles(3) + local optical-flow velocity xy(2) + applied ctrl(12) + command
velocity xy(2) + heading angle(1) — stacked over ``obs_window`` frames.

Reference semantics preserved: the Madgwick quaternion only integrates when
sim time has passed settling_time/2; at reset the observation is computed
with the *stale* filter state before the filter is re-seeded from the true
base quaternion (po_walking_quad.py:59-70).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..models.spec import PhysicsModel
from . import madgwick
from .commands import Command, heading_theta
from .rewards import SensorSlices

PO_OBS_DIM = 26


class PoObsCarry(NamedTuple):
    mad_quat: jnp.ndarray  # (4,)
    buffer: jnp.ndarray  # (obs_window, 26)


def po_init_carry(obs_window: int, dtype=jnp.float32) -> PoObsCarry:
    q0 = jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype=dtype)
    return PoObsCarry(
        mad_quat=q0, buffer=jnp.zeros((obs_window, PO_OBS_DIM), dtype=dtype)
    )


def po_observation(
    sl: SensorSlices,
    sens: jnp.ndarray,
    ctrl: jnp.ndarray,
    cmd: Command,
    mad_quat: jnp.ndarray,
    time: jnp.ndarray,
    settling_time: float,
    control_dt: float,
):
    """Single-frame PO observation. Returns (obs(26,), new_mad_quat)."""
    gyro = sens[sl.gyro : sl.gyro + 3]
    accel = sens[sl.accel : sl.accel + 3]

    q_updated = madgwick.update_imu(mad_quat, gyro, accel, control_dt)
    new_q = jnp.where(time > settling_time / 2.0, q_updated, mad_quat)

    euler = madgwick.to_euler(new_q)
    obs = jnp.concatenate(
        [
            gyro,
            accel,
            euler,
            sens[sl.vel : sl.vel + 2],
            ctrl,
            cmd.velocity[:2],
            heading_theta(cmd)[None],
        ]
    )
    return obs, new_q


def stack_push(buffer: jnp.ndarray, obs: jnp.ndarray) -> jnp.ndarray:
    """Frame-stacking push (po_walking_quad.py:79-88): drop oldest, append."""
    return jnp.concatenate([buffer[1:], obs[None]], axis=0)


def stack_fill(buffer: jnp.ndarray, obs: jnp.ndarray) -> jnp.ndarray:
    """Reset-time fill: the whole window is copies of the current obs."""
    return jnp.broadcast_to(obs, buffer.shape).astype(buffer.dtype)
