"""Constraint-row assembly: joint limits + pyramidal contact friction cones.

Reproduces MuJoCo's soft-constraint model (Todorov's convex formulation) with
formulas verified row-by-row against mjData.efc_* on the oracle:

  impedance: solimp sigmoid  d(r) = d0 + y(|r|/width) * (dmax - d0)
  K = 1 / (dmax^2 tc^2 dr^2),  B = 2 / (dmax tc)      (positive solref)
  aref_i = -B * (J qvel)_i - K * d_i * (pos_i - margin_i)
  diagApprox: limits -> dof_invweight0;  pyramidal contact rows ->
              2 * (invw_t[b1] + invw_t[b2]) * (1 + mu_i^2)
  R_i = max(mjMINVAL, (1 - d_i)/d_i * diagApprox_i),  D_i = 1/R_i

Fixed-capacity layout (TPU-first, no dynamic shapes): 12 limit rows (one per
limited joint; the violated side is selected with a sign) followed by
4 rows per contact slot. Inactive rows get D = 0 so they vanish from the
solver's objective without changing shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.spec import JNT_HINGE, PhysicsModel
from .collision import Contacts
from .smooth import Kin, _const


class ConstraintSet(NamedTuple):
    J: jnp.ndarray  # (nrow, nv)
    aref: jnp.ndarray  # (nrow,)
    D: jnp.ndarray  # (nrow,) inverse-R with activity folded in (0 = off)
    active: jnp.ndarray  # (nrow,) bool
    pos: jnp.ndarray  # (nrow,) violation (dist), for introspection
    margin: jnp.ndarray  # (nrow,)


def impedance(solimp: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """MuJoCo solimp sigmoid. solimp rows: (d0, dmax, width, mid, power)."""
    d0, dmax, width, mid, power = (
        solimp[..., 0], solimp[..., 1], solimp[..., 2], solimp[..., 3], solimp[..., 4]
    )
    x = jnp.clip(jnp.abs(r) / jnp.maximum(width, 1e-15), 0.0, 1.0)
    a = 1.0 / jnp.power(mid, power - 1.0)
    b = 1.0 / jnp.power(1.0 - mid, power - 1.0)
    y = jnp.where(
        x < mid,
        a * jnp.power(x, power),
        1.0 - b * jnp.power(1.0 - x, power),
    )
    return d0 + y * (dmax - d0)


def _limit_rows(m: PhysicsModel, qpos: jnp.ndarray, qvel: jnp.ndarray):
    """One row per limited joint; sign selects the violated side."""
    dt = qpos.dtype
    limited = [j for j in range(m.njnt) if m.jnt_limited[j]]
    Js, poss, margins, solrefs, solimps, diags = [], [], [], [], [], []
    for j in limited:
        assert m.jnt_type[j] == JNT_HINGE
        qadr, dadr = m.jnt_qposadr[j], m.jnt_dofadr[j]
        q = qpos[qadr]
        lo, hi = float(m.jnt_range[j][0]), float(m.jnt_range[j][1])
        d_lo = q - lo
        d_hi = hi - q
        lower_side = d_lo <= d_hi
        dist = jnp.where(lower_side, d_lo, d_hi)
        sign = jnp.where(lower_side, 1.0, -1.0).astype(dt)
        row = jnp.zeros(m.nv, dtype=dt).at[dadr].set(sign)
        Js.append(row)
        poss.append(dist)
        margins.append(_const(m.jnt_margin[j], dt))
        solrefs.append(_const(m.jnt_solref[j], dt))
        solimps.append(_const(m.jnt_solimp[j], dt))
        diags.append(_const(m.dof_invweight0[dadr], dt))
    return (
        jnp.stack(Js),
        jnp.stack(poss),
        jnp.stack(margins),
        jnp.stack(solrefs),
        jnp.stack(solimps),
        jnp.stack(diags),
    )


def _ancestry_mask(m: PhysicsModel) -> np.ndarray:
    """(nbody, nv) static bool: dof i moves body b."""
    mask = np.zeros((m.nbody, m.nv), dtype=bool)
    anc = np.zeros((m.nbody, m.nbody), dtype=bool)
    for b in range(m.nbody):
        x = b
        while x != 0:
            anc[x, b] = True
            x = m.body_parentid[x]
    dof_body = []
    for b in range(1, m.nbody):
        dof_body += [b] * m.body_dofnum[b]
    for b in range(m.nbody):
        for i in range(m.nv):
            mask[b, i] = anc[dof_body[i], b]
    return mask


def make_constraints(
    m: PhysicsModel,
    kin: Kin,
    S: jnp.ndarray,
    con: Contacts,
    qpos: jnp.ndarray,
    qvel: jnp.ndarray,
    max_contacts: int = 24,
) -> ConstraintSet:
    dt = qpos.dtype

    # ---- joint limits ----
    Jl, pos_l, mar_l, solref_l, solimp_l, diag_l = _limit_rows(m, qpos, qvel)
    act_l = pos_l < mar_l

    # ---- select the deepest max_contacts slots (static top-k) ----
    nslots = con.dist.shape[0]
    k = min(max_contacts, nslots)
    score = jnp.where(con.active, -con.dist, -jnp.inf)
    _, idx = jax.lax.top_k(score, k)
    c_pos = con.pos[idx]
    c_dist = con.dist[idx]
    c_act = con.active[idx]
    c_body = con.body[idx]
    c_mu = con.friction[idx]
    c_solref = con.solref[idx]
    c_solimp = con.solimp[idx]
    c_margin = con.margin[idx]

    # ---- contact Jacobians ----
    # Point-Jacobian projection without (k, nv, 6)/(k, nv, 3) minor-dim
    # intermediates (TPU pads dim 3/6 to 128 lanes — measured 80 GB/step at
    # batch 4096 for the materialized form). For a direction d:
    #   Jp . d = J_lin . d + (J_ang x rel) . d = S . [rel x d; d]
    # so each projected row is one (nv, 6) x (6,) contraction masked by
    # kinematic ancestry.
    mask = _const(_ancestry_mask(m), dt)  # (nbody, nv) static
    cmask = mask[c_body]  # (k, nv)
    rel = c_pos - kin.origin  # (k, 3)
    n, t1, t2 = con.frame[0], con.frame[1], con.frame[2]

    def proj(d):
        q = jnp.concatenate(
            [jnp.cross(rel, d[None, :]), jnp.broadcast_to(d, rel.shape)], axis=1
        )  # (k, 6) = [rel x d; d] in S's [ang; lin] column order
        return cmask * jnp.einsum("vx,kx->kv", S, q)

    Jn = proj(n)  # (k, nv)
    Jt1 = proj(t1)
    Jt2 = proj(t2)
    # pyramidal facets: [n + mu t1, n - mu t1, n + mu t2, n - mu t2]
    mu = c_mu[:, None]
    Jc = jnp.stack(
        [Jn + mu * Jt1, Jn - mu * Jt1, Jn + mu * Jt2, Jn - mu * Jt2], axis=1
    )  # (k, 4, nv)
    Jc = Jc.reshape(k * 4, m.nv)

    pos_c = jnp.repeat(c_dist, 4)
    mar_c = jnp.repeat(c_margin, 4)
    act_c = jnp.repeat(c_act, 4)
    solref_c = jnp.repeat(c_solref, 4, axis=0)
    solimp_c = jnp.repeat(c_solimp, 4, axis=0)
    invw = _const(m.body_invweight0[:, 0], dt)
    diag_c = jnp.repeat(
        2.0 * invw[c_body] * (1.0 + c_mu**2), 4
    )  # world body invweight0 is 0

    # ---- assemble ----
    J = jnp.concatenate([Jl, Jc], axis=0)
    pos = jnp.concatenate([pos_l, pos_c])
    margin = jnp.concatenate([mar_l, mar_c])
    active = jnp.concatenate([act_l, act_c])
    solref = jnp.concatenate([solref_l, solref_c], axis=0)
    solimp = jnp.concatenate([solimp_l, solimp_c], axis=0)
    diagA = jnp.concatenate([diag_l, diag_c])

    r = pos - margin
    imp = impedance(solimp, r)
    tc, dr = solref[:, 0], solref[:, 1]
    dmax = solimp[:, 1]
    # positive solref: spring-damper parametrization
    K = 1.0 / jnp.maximum(dmax**2 * tc**2 * dr**2, 1e-15)
    B = 2.0 / jnp.maximum(dmax * tc, 1e-15)
    # negative solref: direct (stiffness, damping) = (-tc, -dr)
    K = jnp.where(tc > 0, K, -tc)
    B = jnp.where(tc > 0, B, -dr)

    vel = J @ qvel
    aref = -B * vel - K * imp * r
    R = jnp.maximum((1.0 - imp) / imp * diagA, 1e-15)
    D = jnp.where(active, 1.0 / R, 0.0)

    return ConstraintSet(J=J, aref=aref, D=D, active=active, pos=pos, margin=margin)
