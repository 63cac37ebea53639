"""Quaternion / rotation / spatial-algebra primitives.

Conventions match MuJoCo (the behavioral oracle for this framework):
  * quaternions are ``[w, x, y, z]``
  * rotation matrices map body-local vectors to world vectors
  * spatial vectors are ``[angular; linear]`` measured at the world origin

Everything here is dtype-polymorphic, shape-static, jit/vmap friendly, and
free of data-dependent Python control flow so it traces cleanly for XLA.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_normalize(q: jnp.ndarray, eps: float = 1e-15) -> jnp.ndarray:
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, eps)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b with [w,x,y,z] layout."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector v by quaternion q (body-local -> world for body quats)."""
    w = q[..., :1]
    u = q[..., 1:]
    # v' = v + 2 w (u x v) + 2 u x (u x v)
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_rotate_inv(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return quat_rotate(quat_conj(q), v)


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation matrix R with v_world = R @ v_local."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def axis_angle_to_quat(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    half = angle * 0.5
    s = jnp.sin(half)
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * s[..., None]], axis=-1
    )


def quat_integrate(q: jnp.ndarray, omega_local: jnp.ndarray, dt) -> jnp.ndarray:
    """Integrate quaternion by angular velocity expressed in the local frame
    over dt, matching MuJoCo's mju_quatIntegrate (exact exponential map).

    AD-correct at omega == 0: the exponential map is evaluated through a
    Taylor/sinc guard so ``d(dq_vec)/d(omega) == 0.5*dt*I`` there (the true
    Jacobian).  A naive axis/angle where-guard makes that Jacobian identically
    zero, which silently erases orientation/heading/flip cost gradients from
    iLQR's cost expansion and SQP's condensed QP (both quadratize at dx == 0
    through ``state_add`` -> here).  See ``tests/test_maths.py``.

    The guard only activates where ``|omega|*dt/2 < 1e-9``, a region where
    ``sin(x) == x`` and ``cos(x) == 1.0`` bitwise in both f32 and f64 — so
    primal values are unchanged vs. the exact branch (MuJoCo bit-parity in the
    contact-settle tests is preserved); only the AD Jacobian differs."""
    n2 = jnp.sum(omega_local * omega_local, axis=-1)
    small = n2 * (dt * dt) < 4e-18
    # Double-where: the untaken exact branch divides by sqrt(1.0), keeping its
    # (discarded) gradient finite so 0 * grad stays 0, never 0 * nan.
    angle = jnp.sqrt(jnp.where(small, 1.0, n2))
    half = 0.5 * dt * angle
    axis = omega_local / angle[..., None]
    vec = jnp.where(
        small[..., None],
        omega_local * (0.5 * dt),
        axis * jnp.sin(half)[..., None],
    )
    w = jnp.where(small, 1.0, jnp.cos(half))
    dq = jnp.concatenate([w[..., None], vec], axis=-1)
    return quat_normalize(quat_mul(q, dq))


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix such that skew(v) @ u = v x u."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


# --- spatial algebra (Featherstone, [angular; linear] at world origin) ---


def spatial_inertia_world(mass, inertia_diag_world_frame, imat, ipos):
    """6x6 spatial inertia of a body, expressed at the world origin.

    Args:
      mass: scalar body mass
      inertia_diag_world_frame: (3,) principal inertia moments (about com)
      imat: (3,3) rotation from the principal-inertia frame to world
      ipos: (3,) com position in world
    """
    ic = imat @ (inertia_diag_world_frame[..., None] * imat.swapaxes(-1, -2))
    c = skew(ipos)
    top_left = ic + mass * (c @ c.swapaxes(-1, -2))
    top_right = mass * c
    bot_left = mass * c.swapaxes(-1, -2)
    eye = jnp.eye(3, dtype=top_left.dtype)
    bot_right = mass * eye
    top = jnp.concatenate([top_left, top_right], axis=-1)
    bot = jnp.concatenate([bot_left, bot_right], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def motion_cross(v: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Spatial motion cross product v x m for [angular; linear] vectors."""
    w, u = v[..., :3], v[..., 3:]
    mw, mu = m[..., :3], m[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, mw), jnp.cross(w, mu) + jnp.cross(u, mw)], axis=-1
    )


def force_cross(v: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """Spatial force cross product v x* f for [angular(moment); linear] forces."""
    w, u = v[..., :3], v[..., 3:]
    fm, fl = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, fm) + jnp.cross(u, fl), jnp.cross(w, fl)], axis=-1
    )
