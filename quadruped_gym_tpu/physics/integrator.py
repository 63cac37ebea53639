"""Implicit-in-velocity integration (MuJoCo ``implicitfast`` semantics).

The robot model selects ``integrator="implicitfast"``
(``quadruped.xml:4`` in the reference assets). That scheme:

  * computes qacc through the normal forward pipeline (constraint solver
    included),
  * then updates velocity implicitly w.r.t. the velocity-dependent smooth
    forces:  (M - h·D) Δv = h·(M·qacc),  where D = ∂(passive+actuator)/∂qvel
    (the 'fast' variant omits the RNE Coriolis derivative),
  * updates activations with the exact first-order filter, and integrates
    positions with the *new* velocity (semi-implicit Euler in position).

D is diagonal for this robot (joint damping + affine actuator velocity
gain), so the implicit solve is a single extra 18x18 Cholesky.
"""

from __future__ import annotations

import jax.numpy as jnp
import jax.scipy.linalg as jsl
import numpy as np

from ..models.spec import JNT_FREE, JNT_HINGE, PhysicsModel
from . import maths, smooth


def implicit_velocity_update(
    m: PhysicsModel,
    M: jnp.ndarray,
    qvel: jnp.ndarray,
    qacc: jnp.ndarray,
    act_vel_deriv: jnp.ndarray,
    h: float,
) -> jnp.ndarray:
    """qvel_{t+h} from the implicitfast update."""
    dt = qvel.dtype
    damping = jnp.asarray(np.asarray(m.dof_damping), dtype=dt)
    D = -damping + act_vel_deriv  # diag of d(qfrc_smooth)/d(qvel)
    Mhat = M - h * jnp.diag(D)
    # force consistent with the solved qacc: f = M @ qacc
    rhs = h * (M @ qacc)
    chol = jsl.cho_factor(Mhat, lower=True)
    dv = jsl.cho_solve(chol, rhs)
    return qvel + dv


def integrate_pos(
    m: PhysicsModel, qpos: jnp.ndarray, qvel: jnp.ndarray, h: float
) -> jnp.ndarray:
    """mj_integratePos: world-frame linear, body-frame quaternion expmap."""
    out = qpos
    for j in range(m.njnt):
        qadr = m.jnt_qposadr[j]
        dadr = m.jnt_dofadr[j]
        if m.jnt_type[j] == JNT_FREE:
            out = out.at[qadr : qadr + 3].add(h * qvel[dadr : dadr + 3])
            quat = maths.quat_integrate(
                qpos[qadr + 3 : qadr + 7], qvel[dadr + 3 : dadr + 6], h
            )
            out = out.at[qadr + 3 : qadr + 7].set(quat)
        else:
            assert m.jnt_type[j] == JNT_HINGE
            out = out.at[qadr].add(h * qvel[dadr])
    return out
