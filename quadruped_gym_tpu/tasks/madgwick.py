"""Madgwick IMU orientation filter (gradient-descent complementary filter).

Functional re-derivation of the algorithm the reference uses through
``ahrs.filters.Madgwick.updateIMU`` (``po_walking_quad.py:2,18,39-43``),
from Madgwick's published update: gyroscope quaternion derivative corrected
by a normalized gradient of the gravity-alignment objective. Default IMU
gain 0.033 (the ahrs default the reference implicitly uses).

Edge cases preserved: zero gyro -> no update; zero accel -> gyro-only
integration.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..physics.maths import quat_mul, quat_normalize

DEFAULT_GAIN = 0.033


def update_imu(
    q: jnp.ndarray, gyr: jnp.ndarray, acc: jnp.ndarray, dt: float,
    gain: float = DEFAULT_GAIN,
) -> jnp.ndarray:
    """One Madgwick IMU update. q: (4,) [w,x,y,z]; gyr rad/s; acc m/s^2."""
    dtype = q.dtype
    gyr_norm = jnp.linalg.norm(gyr)
    zero = jnp.zeros((), dtype)

    q_dot = 0.5 * quat_mul(q, jnp.concatenate([zero[None], gyr]))

    a_norm = jnp.linalg.norm(acc)
    a = acc / jnp.maximum(a_norm, 1e-30)
    qn = quat_normalize(q)
    qw, qx, qy, qz = qn[0], qn[1], qn[2], qn[3]
    f = jnp.stack(
        [
            2.0 * (qx * qz - qw * qy) - a[0],
            2.0 * (qw * qx + qy * qz) - a[1],
            2.0 * (0.5 - qx * qx - qy * qy) - a[2],
        ]
    )
    J = jnp.array(
        [
            [-2.0 * qy, 2.0 * qz, -2.0 * qw, 2.0 * qx],
            [2.0 * qx, 2.0 * qw, 2.0 * qz, 2.0 * qy],
            [0.0, -4.0 * qx, -4.0 * qy, 0.0],
        ],
        dtype=dtype,
    )
    grad = J.T @ f
    grad = grad / jnp.maximum(jnp.linalg.norm(grad), 1e-30)
    use_acc = (a_norm > 0) & (jnp.linalg.norm(f) > 0)
    q_dot = jnp.where(use_acc, q_dot - gain * grad, q_dot)

    q_new = quat_normalize(q + q_dot * dt)
    return jnp.where(gyr_norm > 0, q_new, q)


def to_euler(q: jnp.ndarray) -> jnp.ndarray:
    """ahrs Quaternion.to_angles convention: [roll, pitch, yaw]."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    phi = jnp.arctan2(2.0 * (w * x + y * z), 1.0 - 2.0 * (x * x + y * y))
    theta = jnp.arcsin(jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0))
    psi = jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))
    return jnp.stack([phi, theta, psi])
