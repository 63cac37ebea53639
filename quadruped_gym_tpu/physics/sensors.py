"""Sensor evaluation: the exact 33-slot sensordata vector of the reference
robot (``quadruped.xml:174-217``): 12 jointpos, accelerometer, gyro,
framepos, framelinvel, framexaxis, framezaxis, velocimeter.

Matches MuJoCo semantics: position/velocity sensors read the current state;
the accelerometer reads the *proper* acceleration (gravity-offset spatial
acceleration) at the site, in the site frame. The engine does not inject
sensor noise — neither does MuJoCo (the XML ``noise`` attribute is metadata).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.spec import (
    SENSOR_ACCELEROMETER,
    SENSOR_FRAMELINVEL,
    SENSOR_FRAMEPOS,
    SENSOR_FRAMEXAXIS,
    SENSOR_FRAMEZAXIS,
    SENSOR_GYRO,
    SENSOR_JOINTPOS,
    SENSOR_VELOCIMETER,
    PhysicsModel,
)
from .smooth import Kin, site_frame


def evaluate(
    m: PhysicsModel,
    kin: Kin,
    cvel: jnp.ndarray,
    cacc: jnp.ndarray,
    qpos: jnp.ndarray,
) -> jnp.ndarray:
    """Full sensordata vector (nsensordata,)."""
    dt = qpos.dtype
    sf = site_frame(m, kin)
    b = m.site_bodyid

    w = cvel[b, :3]
    v0 = cvel[b, 3:]
    p = sf.pos - kin.origin
    v_site = v0 + jnp.cross(w, p)

    alpha = cacc[b, :3]
    a0 = cacc[b, 3:]
    # material-point acceleration: a(p) = a_O + alpha x p + w x v(p)
    a_site = a0 + jnp.cross(alpha, p) + jnp.cross(w, v_site)

    out = jnp.zeros(m.nsensordata, dtype=dt)
    for s in m.sensors:
        if s.kind == SENSOR_JOINTPOS:
            out = out.at[s.adr].set(qpos[m.jnt_qposadr[s.objid]])
        elif s.kind == SENSOR_ACCELEROMETER:
            out = out.at[s.adr : s.adr + 3].set(sf.mat.T @ a_site)
        elif s.kind == SENSOR_GYRO:
            out = out.at[s.adr : s.adr + 3].set(sf.mat.T @ w)
        elif s.kind == SENSOR_FRAMEPOS:
            out = out.at[s.adr : s.adr + 3].set(sf.pos)
        elif s.kind == SENSOR_FRAMELINVEL:
            out = out.at[s.adr : s.adr + 3].set(v_site)
        elif s.kind == SENSOR_FRAMEXAXIS:
            out = out.at[s.adr : s.adr + 3].set(sf.mat[:, 0])
        elif s.kind == SENSOR_FRAMEZAXIS:
            out = out.at[s.adr : s.adr + 3].set(sf.mat[:, 2])
        elif s.kind == SENSOR_VELOCIMETER:
            out = out.at[s.adr : s.adr + 3].set(sf.mat.T @ v_site)
        else:
            raise NotImplementedError(f"sensor kind {s.kind}")
    return out
