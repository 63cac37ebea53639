"""Plane-convex collision detection, batched and branch-free.

Replaces MuJoCo's mjc_PlaneConvex for the robot's 25 convex mesh geoms vs the
ground plane (the only collision pairs the reference scene produces — in-range
poses never self-collide, verified over 2000 random samples).

TPU-first design: hull vertices live as static per-geom constant arrays, so
each geom's vertex transform is one small matmul and the argmin/argmax
reductions vectorize on the VPU; everything is fixed-shape with activity
masks, never data-dependent shapes.

Behavioral contract (reverse-engineered from CPU MuJoCo 3.10, see
scripts/calibrate_contacts.py):
  * the deepest ("support") hull vertex yields a contact iff its height above
    the plane is < margin; contact pos is the midpoint between the vertex and
    its plane projection, dist = height (exactly reproduces the oracle);
  * additional vertices (height < 2*margin) can yield up to 2 more contacts;
    MuJoCo's exact extra-point choice depends on qhull internals, so we use a
    farthest-point-then-farthest-from-line rule with per-mesh calibrated
    acceptance distances (~95% contact-count agreement on-robot);
  * contacts only become constraints when dist < includemargin.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..models.spec import PhysicsModel
from . import maths
from .smooth import Kin, _const


class Contacts(NamedTuple):
    """Fixed-capacity contact set: ncol*3 slots (3 per collidable geom)."""

    pos: jnp.ndarray  # (n, 3) world contact positions
    dist: jnp.ndarray  # (n,) signed distances (height of the vertex)
    active: jnp.ndarray  # (n,) bool — becomes a constraint row
    body: jnp.ndarray  # (n,) int32 body id of the robot geom
    friction: jnp.ndarray  # (n,) tangential friction
    solref: jnp.ndarray  # (n, 2)
    solimp: jnp.ndarray  # (n, 5)
    margin: jnp.ndarray  # (n,) includemargin
    frame: jnp.ndarray  # (3, 3) shared contact frame rows [n; t1; t2]


def plane_frame(m: PhysicsModel, dtype) -> jnp.ndarray:
    """Contact frame rows [normal; tangent1; tangent2], MuJoCo's
    mju_makeFrame convention (for n=+z: t1=(0,1,0), t2=(-1,0,0))."""
    n = np.asarray(m.plane_normal, dtype=np.float64)
    ref = np.array([1.0, 0, 0]) if abs(n[0]) < 0.9 else np.array([0.0, 1, 0])
    t1 = np.cross(n, ref)
    t1 = t1 / np.linalg.norm(t1)
    t2 = np.cross(n, t1)
    return _const(np.stack([n, t1, t2]), dtype)


def collide(m: PhysicsModel, kin: Kin) -> Contacts:
    """Generate plane contacts for every collidable geom (3 slots each).

    HBM-traffic-aware formulation: every per-vertex quantity is a (V,)
    array built from ``verts @ <3-vector>`` contractions — no (V, 3) world
    intermediates, which on TPU would pad the minor dim 3 to a 128-lane
    tile (42x wasted bandwidth; measured 15 GB/step at batch 4096 for the
    naive form). Key identity: geom rotations are orthonormal, so
    ``|w_i - w_j| == |v_i - v_j|`` and in-plane distances reduce to static
    vertex-space norms plus height corrections.
    """
    dt = kin.xpos.dtype
    n = _const(m.plane_normal, dt)
    plane_off = float(np.dot(m.plane_normal, m.plane_pos))

    pos, dist, active, body = [], [], [], []
    ncol = len(m.col_geom_bodyid)
    for k in range(ncol):
        b = m.col_geom_bodyid[k]
        gpos = kin.xpos[b] + kin.xmat[b] @ _const(m.col_geom_pos[k], dt)
        gmat = kin.xmat[b] @ maths.quat_to_mat(_const(m.col_geom_quat[k], dt))
        verts = _const(m.col_hull_verts[k], dt)  # (V, 3) static constant
        vnorm2 = _const(
            np.sum(np.asarray(m.col_hull_verts[k]) ** 2, axis=1), dt
        )  # (V,) static
        h = verts @ (gmat.T @ n) + (gpos @ n - plane_off)  # (V,) heights

        margin = float(m.col_margin[k])
        theta2 = float(m.col_theta2[k])
        theta3 = float(m.col_theta3[k])

        i0 = jnp.argmin(h)
        h0 = h[i0]
        v0 = verts[i0]  # (3,) local support vertex
        p0 = gpos + gmat @ v0
        a0 = h0 < margin

        # candidates for extra points: height < 2*margin (oracle-calibrated)
        cand = h < 2.0 * margin
        # in-plane distance from support: |u_plan|^2 = |w - p0|^2 - (h-h0)^2
        # and |w - p0|^2 = |v - v0|^2 (rotation preserves norms)
        dv2 = vnorm2 - 2.0 * (verts @ v0) + v0 @ v0
        dplan = jnp.sqrt(jnp.maximum(dv2 - (h - h0) ** 2, 0.0))
        neg = jnp.asarray(-1.0, dt)
        d_masked = jnp.where(cand, dplan, neg)
        i1 = jnp.argmax(d_masked)
        d1 = d_masked[i1]
        a1 = a0 & (d1 >= theta2)
        v1 = verts[i1]
        p1 = gpos + gmat @ v1
        h1 = h[i1]

        # third point: farthest from the support->second line (in plane)
        u1 = gmat @ (v1 - v0)  # = w1 - p0
        t = (u1 - (h1 - h0) * n) / jnp.maximum(d1, 1e-12)
        perp = jnp.cross(n, t)
        # u_plan @ perp == (w - p0) @ perp   (n @ perp == 0)
        #              == (v - v0) @ (gmat.T @ perp)
        g = gmat.T @ perp
        c_masked = jnp.where(cand, jnp.abs(verts @ g - v0 @ g), neg)
        i2 = jnp.argmax(c_masked)
        a2 = a1 & (c_masked[i2] >= theta3)
        v2 = verts[i2]
        p2 = gpos + gmat @ v2
        h2 = h[i2]

        for (pi, hi, ai) in ((p0, h0, a0), (p1, h1, a1), (p2, h2, a2)):
            # constraints require dist < includemargin (margin - gap)
            inc = float(m.col_margin[k] - m.col_gap[k])
            pos.append(pi - 0.5 * hi * n)  # midpoint convention
            dist.append(hi)
            active.append(ai & (hi < inc))
            body.append(b)

    rep3 = lambda arr: np.repeat(np.asarray(arr), 3, axis=0)
    return Contacts(
        pos=jnp.stack(pos),
        dist=jnp.stack(dist),
        active=jnp.stack(active),
        body=_const(np.asarray(body, dtype=np.int32), jnp.int32),
        friction=_const(rep3(m.col_friction[:, 0]), dt),
        solref=_const(rep3(m.col_solref), dt),
        solimp=_const(rep3(m.col_solimp), dt),
        margin=_const(rep3(m.col_margin - m.col_gap), dt),
        frame=plane_frame(m, dt),
    )
