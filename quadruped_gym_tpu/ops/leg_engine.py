"""Leg-batched lane engine: the four identical legs as a (4, B) lane dim.

The quadruped's kinematic tree is one free base plus four structurally
identical 3-dof chains — only the hip mount pose differs per leg (90°-
rotated copies; knee/ankle constants are bit-identical). The lane engine
unrolls all four legs into separate scalar chains (~30k vector ops per
substep, instruction-issue-bound); here every leg quantity is a single
(4, B) lane array, cutting the dominant FK/CRBA/RNE/Jacobian/Newton op
counts ~3-4x while keeping the exact same math.

Key structural facts exploited (asserted in ``_leg_static``):
  * dof order: free 0-5, then leg-major hinge dofs 6+3l+k (level k in
    {hip, knee, ankle});
  * the mass-matrix sparsity splits into free-free (B,), free-leg (4, B)
    and within-leg (4, B) blocks — no leg-leg coupling — and the
    tree-sparse LDLᵀ factors the four chains in parallel, accumulating
    into the free block with one sum over the leg axis;
  * the contact Hessian M + JᵀWJ has the same block structure (each foot
    touches only its own leg + the base);
  * one foot hull serves all four feet, so plane-convex collision is a
    single (V, 4, B) computation.

Same API and semantics as ``lane_engine`` (``LaneState`` in/out, sensors
on the last substep of ``control_step``); validated against it in
``tests/test_leg_engine.py``.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.spec import JNT_FREE, PhysicsModel
from . import lane as L
from .lane_engine import (
    LaneState,
    _f,
    _imp_lane,
    _impedance_np_params,
    _kb_from_solref,
    _np_quat_mat,
    _quatc,
    _static,
    _v3c,
    from_batched,
    make_lane_state,
    to_batched,
)

NLEG = 4
NLEV = 3  # hip, knee, ankle


@dataclasses.dataclass(frozen=True)
class _LegStatic:
    base: int  # body id of the free base
    leg_bodies: Tuple[Tuple[int, ...], ...]  # [level][leg] body ids
    leg_joints: Tuple[Tuple[int, ...], ...]  # [level][leg] joint ids
    # collision geoms, grouped into per-leg identical quadruples:
    # [(chain level, (geom id per leg))] — feet-only models have one
    # group at the last level; the full plant adds shin/ankle groups
    col_groups: Tuple[Tuple[int, Tuple[int, ...]], ...]


class IncompatibleModelError(ValueError):
    """The model violates a leg-batching structural invariant.

    Raised (not ``assert``, which ``python -O`` strips) so an incompatible
    model can never slip past the gate and silently get leg-0 parameters
    broadcast onto all legs."""


def _require(cond, msg: str) -> None:
    if not cond:
        raise IncompatibleModelError(msg)


def _leg_static(m: PhysicsModel) -> _LegStatic:
    # cached ON the model (object.__setattr__ works on frozen dataclasses):
    # an id()-keyed dict could return stale topology for a new model that
    # reuses a garbage-collected model's address — and thereby skip the
    # compatibility checks below entirely
    cached = getattr(m, "_leg_static_cache", None)
    if cached is not None:
        return cached
    base = next(b for b in range(1, m.nbody) if m.body_parentid[b] == 0)
    _require(m.jnt_type[m.body_jntadr[base]] == JNT_FREE,
             "base joint is not free")
    hips = [b for b in range(1, m.nbody) if m.body_parentid[b] == base]
    _require(len(hips) == NLEG, f"expected 4 legs, got {len(hips)}")
    legs = []
    for h in hips:
        chain = [h]
        while True:
            kids = [b for b in range(1, m.nbody) if m.body_parentid[b] == chain[-1]]
            if not kids:
                break
            _require(len(kids) == 1, "leg chain branches")
            chain.append(kids[0])
        _require(len(chain) == NLEV, "leg chain is not hip/knee/ankle")
        legs.append(chain)
    leg_bodies = tuple(tuple(legs[l][k] for l in range(NLEG)) for k in range(NLEV))
    leg_joints = tuple(
        tuple(m.body_jntadr[b] for b in leg_bodies[k]) for k in range(NLEV)
    )
    # structural invariants the vectorization relies on
    for k in range(NLEV):
        for field in ("body_mass", "body_inertia", "body_ipos", "body_iquat"):
            vals = np.asarray(getattr(m, field))[list(leg_bodies[k])]
            _require(np.allclose(vals, vals[0]), f"{field} differs across legs")
        for field in ("jnt_pos", "jnt_axis", "jnt_range", "jnt_solref",
                      "jnt_solimp", "jnt_margin"):
            vals = np.asarray(getattr(m, field))[list(leg_joints[k])]
            _require(np.allclose(vals, vals[0]), f"{field} differs across legs")
        if k > 0:
            for field in ("body_pos", "body_quat"):
                vals = np.asarray(getattr(m, field))[list(leg_bodies[k])]
                _require(np.allclose(vals, vals[0]), f"{field} differs across legs")
        # dof layout: leg-major, consecutive
        for l in range(NLEG):
            _require(m.jnt_dofadr[leg_joints[k][l]] == 6 + 3 * l + k,
                     "dof layout is not leg-major consecutive")
            _require(m.jnt_qposadr[leg_joints[k][l]] == 7 + 3 * l + k,
                     "qpos layout is not leg-major consecutive")
        _require(all(m.jnt_limited[j] for j in leg_joints[k]),
                 "leg joints must all be limited")
    # shared-constant invariants the engine's leg-0-parameter broadcast
    # relies on (it reads each quantity once per level, or once globally)
    for k in range(NLEV):
        q0s = [m.qpos0[m.jnt_qposadr[j]] for j in leg_joints[k]]
        _require(np.allclose(q0s, q0s[0]), "qpos0 differs across legs")
        iw = [m.dof_invweight0[m.jnt_dofadr[j]] for j in leg_joints[k]]
        _require(np.allclose(iw, iw[0]), "dof_invweight0 differs across legs")
    leg_dofs = [m.jnt_dofadr[leg_joints[k][l]]
                for k in range(NLEV) for l in range(NLEG)]
    for field in ("dof_armature", "dof_damping"):
        vals = [np.asarray(getattr(m, field))[d] for d in leg_dofs]
        _require(np.allclose(vals, vals[0]), f"{field} differs across leg dofs")
    # actuator layout: u = 3l+k drives leg l's level-k joint, and all
    # actuators of a level share their parameters (dynprm globally: the
    # activation filter uses one shared tau)
    _require(m.nu == NLEG * NLEV, "expected 12 actuators")
    for k in range(NLEV):
        for l in range(NLEG):
            _require(m.actuator_trnid[3 * l + k] == leg_joints[k][l],
                     "actuator order is not leg-major")
        us = [3 * l + k for l in range(NLEG)]
        for field in ("actuator_gainprm", "actuator_biasprm",
                      "actuator_gear", "actuator_forcerange",
                      "actuator_ctrlrange"):
            vals = np.asarray(getattr(m, field))[us]
            _require(np.allclose(vals, vals[0]), f"{field} differs across legs")
    dyn = np.asarray(m.actuator_dynprm)
    _require(np.allclose(dyn, dyn[0]), "actuator_dynprm differs across actuators")

    # collision: every geom must live on a leg body, and the geoms of
    # each level must form per-leg identical quadruples (one group per
    # geom slot: feet-only -> 1 group; the full plant -> feet + shins +
    # ankle servos -> 3 groups)
    geoms_by_body: dict = {}
    for g, b in enumerate(m.col_geom_bodyid):
        geoms_by_body.setdefault(b, []).append(g)
    col_groups = []
    grouped = 0
    for k in range(NLEV):
        per_leg = [sorted(geoms_by_body.get(b, [])) for b in leg_bodies[k]]
        counts = {len(x) for x in per_leg}
        _require(len(counts) == 1, f"uneven geom counts across legs, level {k}")
        for j in range(counts.pop()):
            group = tuple(per_leg[l][j] for l in range(NLEG))
            col_groups.append((k, group))
            grouped += NLEG
    _require(grouped == len(m.col_geom_bodyid),
             "collision geoms outside the leg chains are not supported")
    for _, group in col_groups:
        for field in ("col_geom_pos", "col_geom_quat", "col_friction",
                      "col_solref", "col_solimp", "col_margin", "col_gap",
                      "col_theta2", "col_theta3"):
            vals = np.asarray(getattr(m, field))[list(group)]
            _require(np.allclose(vals, vals[0]), f"{field} differs across legs")
        for g in group[1:]:
            _require(np.array_equal(m.col_hull_verts[g],
                                    m.col_hull_verts[group[0]]),
                     "collision hulls differ across legs")
    s = _LegStatic(
        base=base,
        leg_bodies=leg_bodies,
        leg_joints=leg_joints,
        col_groups=tuple(col_groups),
    )
    object.__setattr__(m, "_leg_static_cache", s)
    return s


def is_compatible(m: PhysicsModel) -> bool:
    """Whether the model satisfies the leg-batching invariants (4 identical
    3-dof legs, feet-only collision). Callers can fall back to
    ``lane_engine`` when False."""
    try:
        _leg_static(m)
        return True
    except (AssertionError, StopIteration, ValueError):
        return False


def _leg_const_col(col: np.ndarray, dtype, lane_shape=(), full=False):
    """One per-leg constant column -> float if shared, else a per-leg
    array assembled from scalar fills (an op chain XLA folds to the same
    constant, but — unlike a captured data array — legal inside Pallas
    kernels, which reject non-scalar closure constants). Shape is
    (4, 1, ...) broadcast-style, or the full (4, *lane_shape) when
    ``full`` (Mosaic cannot broadcast a (4,1,1) vector in both sublanes
    and lanes, but scalar splats to full shape are fine)."""
    col = np.asarray(col, np.float64)
    if np.all(col == col[0]):
        return float(col[0])
    tail = tuple(lane_shape) if full else (1,) * len(lane_shape)
    return jnp.concatenate(
        [jnp.full((1,) + tail, float(v), dtype) for v in col], axis=0
    )


def _leg_const_vec3(vals: np.ndarray, dtype, lane_shape=(), full=False):
    """(4, 3) per-leg constant -> Vec3 of per-leg arrays (or floats)."""
    vals = np.asarray(vals, np.float64)
    return tuple(
        _leg_const_col(vals[:, c], dtype, lane_shape, full) for c in range(3)
    )


def _leg_const_quat(vals: np.ndarray, dtype, lane_shape=(), full=False):
    vals = np.asarray(vals, np.float64)
    return tuple(
        _leg_const_col(vals[:, c], dtype, lane_shape, full) for c in range(4)
    )


def _bc(x):
    """Broadcast a base (B,) lane scalar against leg (4, B) arrays —
    a no-op: numpy broadcasting handles (B,) vs (4, B)."""
    return x


class _Kin(NamedTuple):
    base_pos: tuple  # Vec3 (B,)
    base_quat: tuple
    base_mat: tuple
    leg_pos: tuple  # [level] Vec3 of (4, B)
    leg_quat: tuple
    leg_mat: tuple
    origin: tuple


def _fk(m: PhysicsModel, q_free, q_leg, const_full=False):
    """q_free: list of 7 (B,); q_leg: [level] (4, B)."""
    ls = _leg_static(m)
    dtype = q_free[0].dtype
    base_pos = (q_free[0], q_free[1], q_free[2])
    base_quat = L.quat_normalize((q_free[3], q_free[4], q_free[5], q_free[6]))

    leg_pos, leg_quat = [], []
    hip0 = ls.leg_bodies[0]
    lane_shape = q_free[0].shape
    pos = L.v3_add(
        base_pos,
        L.quat_rotate(
            base_quat,
            _leg_const_vec3(np.asarray(m.body_pos)[list(hip0)], dtype,
                            lane_shape, const_full),
        ),
    )
    quat = L.quat_mul(
        base_quat,
        _leg_const_quat(np.asarray(m.body_quat)[list(hip0)], dtype,
                        lane_shape, const_full),
    )
    for k in range(NLEV):
        j0 = ls.leg_joints[k][0]
        if k > 0:
            b0 = ls.leg_bodies[k][0]
            pos = L.v3_add(pos, L.quat_rotate(quat, _v3c(m.body_pos[b0])))
            quat = L.quat_mul(quat, _quatc(m.body_quat[b0]))
        angle = q_leg[k] - _f(m.qpos0[m.jnt_qposadr[j0]])
        anchor_l = _v3c(m.jnt_pos[j0])
        anchor_w = L.v3_add(pos, L.quat_rotate(quat, anchor_l))
        quat = L.quat_mul(quat, L.axis_angle_to_quat(_v3c(m.jnt_axis[j0]), angle))
        pos = L.v3_sub(anchor_w, L.quat_rotate(quat, anchor_l))
        leg_pos.append(pos)
        leg_quat.append(quat)

    return _Kin(
        base_pos=base_pos,
        base_quat=base_quat,
        base_mat=L.quat_to_mat(base_quat),
        leg_pos=tuple(leg_pos),
        leg_quat=tuple(leg_quat),
        leg_mat=tuple(L.quat_to_mat(qq) for qq in leg_quat),
        origin=base_pos,
    )


def _subspace(m: PhysicsModel, kin: _Kin):
    """Free rows (6 of mixed static/(B,)) + leg rows ([level] of (4, B))."""
    ls = _leg_static(m)
    S_free = []
    for k in range(3):
        e = [0.0, 0.0, 0.0]
        e[k] = 1.0
        S_free.append((0.0, 0.0, 0.0, e[0], e[1], e[2]))
    p = L.v3_sub(kin.base_pos, kin.origin)  # ~0 but keep general
    for k in range(3):
        a = L.mat_col(kin.base_mat, k)
        S_free.append(L.sv(a, L.v3_cross(p, a)))

    S_leg = []
    for k in range(NLEV):
        j0 = ls.leg_joints[k][0]
        anchor = L.v3_sub(
            L.v3_add(kin.leg_pos[k], L.mat_vec(kin.leg_mat[k], _v3c(m.jnt_pos[j0]))),
            kin.origin,
        )
        axis = L.mat_vec(kin.leg_mat[k], _v3c(m.jnt_axis[j0]))
        S_leg.append(L.sv(axis, L.v3_cross(anchor, axis)))
    return tuple(S_free), tuple(S_leg)


def _body_velocities(m, S_free, S_leg, qv_free, qv_leg):
    v_base = (0.0,) * 6
    for d in range(6):
        v_base = L.sv_add(v_base, L.sv_scale(qv_free[d], S_free[d]))
    v_leg = []
    v = v_base
    for k in range(NLEV):
        v = L.sv_add(v, L.sv_scale(qv_leg[k], S_leg[k]))
        v_leg.append(v)
    return v_base, tuple(v_leg)


def _inertias(m: PhysicsModel, kin: _Kin, mass_scale=None):
    ls = _leg_static(m)
    b = ls.base
    xi_base = L.v3_add(kin.base_pos, L.mat_vec(kin.base_mat, _v3c(m.body_ipos[b])))
    imat_b = L.mat_mul(
        kin.base_mat,
        tuple(tuple(float(v) for v in r) for r in _np_quat_mat(m.body_iquat[b])),
    )
    base_mass = _f(m.body_mass[b])
    base_inertia = _v3c(m.body_inertia[b])
    if mass_scale is not None:
        # payload randomization: scale base mass + rotational inertia
        # together (uniform density; DomainParams.base_mass_scale)
        base_mass = L.mul(mass_scale, base_mass)
        base_inertia = tuple(L.mul(mass_scale, v) for v in base_inertia)
    I_base = L.spatial_inertia_world(
        base_mass, base_inertia, imat_b,
        L.v3_sub(xi_base, kin.origin),
    )
    I_leg = []
    for k in range(NLEV):
        bk = ls.leg_bodies[k][0]
        xi = L.v3_add(kin.leg_pos[k], L.mat_vec(kin.leg_mat[k], _v3c(m.body_ipos[bk])))
        imat = L.mat_mul(
            kin.leg_mat[k],
            tuple(tuple(float(v) for v in r) for r in _np_quat_mat(m.body_iquat[bk])),
        )
        I_leg.append(L.spatial_inertia_world(
            _f(m.body_mass[bk]), _v3c(m.body_inertia[bk]), imat,
            L.v3_sub(xi, kin.origin),
        ))
    return I_base, tuple(I_leg)


def _sum_legs(x):
    """Reduce a (4, B) lane scalar over the leg axis -> (B,).

    Unrolled adds instead of ``jnp.sum(axis=0)`` so the op lowers inside
    Pallas/Mosaic kernels (and XLA folds it identically outside)."""
    if L.is_static(x):
        return 4.0 * x
    return (x[0] + x[1]) + (x[2] + x[3])


def _crba(m: PhysicsModel, S_free, S_leg, I_base, I_leg):
    """Block mass matrix: (Mff {(i,j<=i): (B,)}, Mfl {(i,k): (4,B)},
    Mll {(ki,kj<=ki): (4,B)})."""
    # composite inertias: within-leg leaf -> root
    Ic = [None] * NLEV
    acc = I_leg[NLEV - 1]
    Ic[NLEV - 1] = acc
    for k in range(NLEV - 2, -1, -1):
        acc = tuple(
            tuple(L.add(I_leg[k][a][b], acc[a][b]) for b in range(6))
            for a in range(6)
        )
        Ic[k] = acc
    # base composite: base inertia + sum over legs of the hip composite
    Ic_base = tuple(
        tuple(L.add(I_base[a][b], _sum_legs(Ic[0][a][b])) for b in range(6))
        for a in range(6)
    )

    F_free = [L.inertia_vec(Ic_base, S_free[i]) for i in range(6)]
    F_leg = [L.inertia_vec(Ic[k], S_leg[k]) for k in range(NLEV)]

    Mff, Mfl, Mll = {}, {}, {}
    for i in range(6):
        for j in range(i + 1):
            v = L.sv_dot(S_free[j], F_free[i])
            if i == j:
                v = L.add(v, _f(m.dof_armature[i]))
            Mff[(i, j)] = v
    for i in range(6):
        for k in range(NLEV):
            Mfl[(i, k)] = L.sv_dot(S_free[i], F_leg[k])
    arm = _f(m.dof_armature[6])  # all leg dofs share armature
    for ki in range(NLEV):
        for kj in range(ki + 1):
            v = L.sv_dot(S_leg[kj], F_leg[ki])
            if ki == kj:
                v = L.add(v, arm)
            Mll[(ki, kj)] = v
    return Mff, Mfl, Mll


def _rne_bias(m, kin, S_free, S_leg, v_base, v_leg, qv_free, qv_leg,
              I_base, I_leg):
    g = _v3c(m.gravity)
    base_acc0 = (0.0, 0.0, 0.0, -g[0], -g[1], -g[2])
    # base joint bias velocity: v_base minus world-fixed translational part
    vJ_base = v_base[:3] + (
        L.sub(v_base[3], qv_free[0]),
        L.sub(v_base[4], qv_free[1]),
        L.sub(v_base[5], qv_free[2]),
    )
    acc_base = L.sv_add(base_acc0, L.motion_cross(v_base, vJ_base))
    acc = []
    prev_acc, prev_v = acc_base, v_base
    for k in range(NLEV):
        vJ = L.sv_scale(qv_leg[k], S_leg[k])  # hinge: vJ = S qdot (S-dot term)
        a = L.sv_add(prev_acc, L.motion_cross(v_leg[k], vJ))
        acc.append(a)
        prev_acc, prev_v = a, v_leg[k]

    def body_force(I, v, a):
        return L.sv_add(L.inertia_vec(I, a),
                        L.force_cross(v, L.inertia_vec(I, v)))

    f_base = body_force(I_base, v_base, acc_base)
    f_leg = [body_force(I_leg[k], v_leg[k], acc[k]) for k in range(NLEV)]
    fsub = [None] * NLEV
    accf = f_leg[NLEV - 1]
    fsub[NLEV - 1] = accf
    for k in range(NLEV - 2, -1, -1):
        accf = L.sv_add(f_leg[k], accf)
        fsub[k] = accf
    fsub_base = tuple(
        L.add(f_base[i], _sum_legs(fsub[0][i])) for i in range(6)
    )
    bias_free = [L.sv_dot(S_free[i], fsub_base) for i in range(6)]
    bias_leg = [L.sv_dot(S_leg[k], fsub[k]) for k in range(NLEV)]
    return bias_free, bias_leg


def _actuation(m: PhysicsModel, q_leg, qv_leg, act_leg, gain_scale=None):
    """All actuators drive leg dofs; per level (4, B)."""
    ls = _leg_static(m)
    qfrc, dvel = [], []
    for k in range(NLEV):
        u0 = next(
            u for u in range(m.nu)
            if m.actuator_trnid[u] == ls.leg_joints[k][0]
        )
        gear = _f(m.actuator_gear[u0])
        gp, bp = m.actuator_gainprm[u0], m.actuator_biasprm[u0]
        # DomainParams.gain_scale scales the servo stiffness kp — both
        # the gain (gp[0]) and its position-bias coupling (bp[1] = -kp);
        # the velocity bias bp[2] = -kv stays nominal
        kp_term = L.mul(_f(gp[0]), act_leg[k])
        bias_q = L.mul(_f(bp[1]) * gear, q_leg[k])
        if gain_scale is not None:
            kp_term = L.mul(gain_scale, kp_term)
            bias_q = L.mul(gain_scale, bias_q)
        force = L.add(
            kp_term,
            L.add(_f(bp[0]),
                  L.add(bias_q,
                        L.mul(_f(bp[2]) * gear, qv_leg[k]))),
        )
        lo, hi = _f(m.actuator_forcerange[u0][0]), _f(m.actuator_forcerange[u0][1])
        clamped = jnp.clip(force, lo, hi)
        qfrc.append(L.mul(gear, clamped))
        in_range = (force > lo) & (force < hi)
        dvel.append(jnp.where(in_range, gear * gear * _f(bp[2]), 0.0).astype(
            q_leg[k].dtype))
    return qfrc, dvel


# --------------------------------------------------------------------------
# block tree-sparse LDLᵀ


def _ldl_factor(Mff, Mfl, Mll):
    """Factor the block matrix; legs factor in parallel on the leg axis."""
    Hff, Hfl, Hll = dict(Mff), dict(Mfl), dict(Mll)
    Dinv_l, Lll, Lfl = {}, {}, {}
    for k in range(NLEV - 1, -1, -1):
        dinv = 1.0 / Hll[(k, k)]
        Dinv_l[k] = dinv
        for i in range(k - 1, -1, -1):  # leg-level ancestors
            a = Hll[(k, i)] * dinv  # (4,B)
            for j in range(i, -1, -1):
                Hll[(i, j)] = Hll[(i, j)] - a * Hll[(k, j)]
            for jf in range(6):
                Hfl[(jf, i)] = Hfl[(jf, i)] - a * Hfl[(jf, k)]
            Lll[(k, i)] = a
        for fi in range(5, -1, -1):  # free ancestors
            a = Hfl[(fi, k)] * dinv  # (4,B)
            for j in range(fi, -1, -1):
                # contributions from the four legs accumulate into ff
                Hff[(fi, j)] = Hff[(fi, j)] - jnp.sum(a * Hfl[(j, k)], axis=0)
            Lfl[(k, fi)] = a
    # dense 6x6 free block (parents chain 5 <- 4 <- ... <- 0)
    Dinv_f, Lff = {}, {}
    for k in range(5, -1, -1):
        dinv = 1.0 / Hff[(k, k)]
        Dinv_f[k] = dinv
        for i in range(k - 1, -1, -1):
            a = Hff[(k, i)] * dinv
            for j in range(i, -1, -1):
                Hff[(i, j)] = Hff[(i, j)] - a * Hff[(k, j)]
            Lff[(k, i)] = a
    return (Dinv_f, Dinv_l, Lff, Lfl, Lll)


def _ldl_solve(fac, b_free, b_leg):
    Dinv_f, Dinv_l, Lff, Lfl, Lll = fac
    w_free = list(b_free)
    w_leg = list(b_leg)
    for k in range(NLEV - 1, -1, -1):
        for i in range(k - 1, -1, -1):
            w_leg[i] = w_leg[i] - Lll[(k, i)] * w_leg[k]
        for fi in range(5, -1, -1):
            w_free[fi] = w_free[fi] - jnp.sum(Lfl[(k, fi)] * w_leg[k], axis=0)
    for k in range(5, -1, -1):
        for i in range(k - 1, -1, -1):
            w_free[i] = w_free[i] - Lff[(k, i)] * w_free[k]

    x_free = [w_free[k] * Dinv_f[k] for k in range(6)]
    x_leg = [w_leg[k] * Dinv_l[k] for k in range(NLEV)]
    for k in range(6):
        for i in range(k - 1, -1, -1):
            x_free[k] = x_free[k] - Lff[(k, i)] * x_free[i]
    for k in range(NLEV):
        acc = x_leg[k]
        for i in range(k - 1, -1, -1):
            acc = acc - Lll[(k, i)] * x_leg[i]
        for fi in range(6):
            acc = acc - Lfl[(k, fi)] * x_free[fi]
        x_leg[k] = acc
    return x_free, x_leg


def _sym_matvec(Mff, Mfl, Mll, x_free, x_leg):
    y_free = []
    for i in range(6):
        acc = 0.0
        for j in range(6):
            acc = L.add(acc, L.mul(Mff[(max(i, j), min(i, j))], x_free[j]))
        for k in range(NLEV):
            acc = L.add(acc, _sum_legs(Mfl[(i, k)] * x_leg[k]))
        y_free.append(acc)
    y_leg = []
    for ki in range(NLEV):
        acc = 0.0
        for kj in range(NLEV):
            acc = L.add(acc, L.mul(Mll[(max(ki, kj), min(ki, kj))], x_leg[kj]))
        for i in range(6):
            acc = L.add(acc, Mfl[(i, ki)] * x_free[i])
        y_leg.append(acc)
    return y_free, y_leg


# --------------------------------------------------------------------------
# collision + constraint rows (all leg-batched: slots are (4, B))


def _slot_budget(verts: np.ndarray, theta2: float, theta3: float) -> int:
    """How many of the 3 plane-convex contact slots can EVER activate for
    this hull — its static per-group contact budget.

    The 2nd slot requires an in-plane vertex separation >= theta2 and the
    3rd a perpendicular spread >= theta3; both quantities are bounded by
    the hull diameter, so calibrated thresholds beyond it (e.g. the
    theta3 = 1.0 of the SERVO/SHIN meshes, models/spec.py) make those
    slots statically dead — their ``active`` mask is identically False and
    their constraint-row weight identically 0.0, so skipping them is
    bit-exact while deleting their selection loops and Newton rows.
    On the full lower-leg plant this cuts 12 of 36 contact slots."""
    d2 = 0.0
    for i in range(len(verts)):
        d = np.sum((verts[i + 1 :] - verts[i]) ** 2, axis=1)
        if d.size:
            d2 = max(d2, float(d.max()))
    diam = float(np.sqrt(d2))
    if diam < theta2:
        return 1
    return 2 if diam < theta3 else 3


def _collide(m: PhysicsModel, kin: _Kin, plane_frame=None, plane_off=None,
             dp=None):
    """Plane contacts for every collision group: up to 3 slots of (4, B)
    per group (see ``_slot_budget``), each tagged
    (pos, dist, active, level, g0, frame) — ``frame`` is None for the
    global ground plane, or the terrain's per-geom local tangent frame
    when ``DomainParams.terrain_amp`` is set."""
    ls = _leg_static(m)
    st = _static(m)
    if plane_frame is None:
        plane_frame, plane_off = st.plane_frame, st.plane_off
    terrain = _terrain_active(dp)
    dt = kin.base_pos[0].dtype

    slots = []
    for level, group in ls.col_groups:
        g0 = group[0]
        body_mat = kin.leg_mat[level]
        body_pos = kin.leg_pos[level]
        gpos = L.v3_add(body_pos, L.mat_vec(body_mat, _v3c(m.col_geom_pos[g0])))
        gmat = L.mat_mul(
            body_mat,
            tuple(tuple(float(v) for v in r)
                  for r in _np_quat_mat(m.col_geom_quat[g0])),
        )
        verts = np.asarray(m.col_hull_verts[g0])
        V = verts.shape[0]
        lane_ndim = jnp.ndim(gpos[0])  # == 2 (legs, batch)
        vshape = (V,) + (1,) * lane_ndim
        vx = jnp.asarray(verts[:, 0], dt).reshape(vshape)
        vy = jnp.asarray(verts[:, 1], dt).reshape(vshape)
        vz = jnp.asarray(verts[:, 2], dt).reshape(vshape)
        vn2 = jnp.asarray(np.sum(verts**2, axis=1), dt).reshape(vshape)
        vflat = tuple(jnp.asarray(verts[:, c], dt) for c in range(3))

        if terrain:
            frame, off_g = _local_plane(m, dp, gpos)
            n = frame[0]
        else:
            frame, off_g = None, plane_off
            n = plane_frame[0]

        a = L.mat_tvec(gmat, n)
        base = L.sub(L.v3_dot(gpos, n), off_g)
        h = vx * a[0][None] + vy * a[1][None] + vz * a[2][None] + base[None]

        margin = _f(m.col_margin[g0])
        theta2 = _f(m.col_theta2[g0])
        theta3 = _f(m.col_theta3[g0])
        inc = _f(m.col_margin[g0] - m.col_gap[g0])
        nslot = _slot_budget(verts, theta2, theta3)

        def vert_at(idx):
            return tuple(jnp.take(vf, idx) for vf in vflat)

        i0 = jnp.argmin(h, axis=0)
        h0 = jnp.take_along_axis(h, i0[None], axis=0)[0]
        v0 = vert_at(i0)
        p0 = L.v3_add(gpos, L.mat_vec(gmat, v0))
        a0 = h0 < margin
        emitted = [(p0, h0, a0)]

        if nslot >= 2:
            cand = h < 2.0 * margin
            vdot0 = vx * v0[0][None] + vy * v0[1][None] + vz * v0[2][None]
            dv2 = vn2 - 2.0 * vdot0 + L.v3_dot(v0, v0)[None]
            dplan = jnp.sqrt(jnp.maximum(dv2 - (h - h0[None]) ** 2, 0.0))
            dmask = jnp.where(cand, dplan, -1.0)
            i1 = jnp.argmax(dmask, axis=0)
            d1 = jnp.take_along_axis(dmask, i1[None], axis=0)[0]
            a1 = a0 & (d1 >= theta2)
            v1 = vert_at(i1)
            p1 = L.v3_add(gpos, L.mat_vec(gmat, v1))
            h1 = jnp.take_along_axis(h, i1[None], axis=0)[0]
            emitted.append((p1, h1, a1))

        if nslot >= 3:
            u1 = L.mat_vec(gmat, L.v3_sub(v1, v0))
            inv_d1 = 1.0 / jnp.maximum(d1, 1e-12)
            dh = h1 - h0
            t = tuple(L.mul(L.sub(u1[i], L.mul(n[i], dh)), inv_d1) for i in range(3))
            perp = L.v3_cross(n, t)
            gq = L.mat_tvec(gmat, perp)
            cdot = vx * gq[0][None] + vy * gq[1][None] + vz * gq[2][None]
            cmask = jnp.where(cand, jnp.abs(cdot - L.v3_dot(v0, gq)[None]), -1.0)
            i2 = jnp.argmax(cmask, axis=0)
            c2 = jnp.take_along_axis(cmask, i2[None], axis=0)[0]
            a2 = a1 & (c2 >= theta3)
            v2 = vert_at(i2)
            p2 = L.v3_add(gpos, L.mat_vec(gmat, v2))
            h2 = jnp.take_along_axis(h, i2[None], axis=0)[0]
            emitted.append((p2, h2, a2))

        for (pi, hi, ai) in emitted:
            pos = tuple(L.sub(pi[i], L.mul(0.5 * n[i], hi)) for i in range(3))
            slots.append((pos, hi, ai & (hi < inc), level, g0, frame))
    return slots


def _plane(m: PhysicsModel, dp):
    """((n, t1, t2), off): the ground-plane frame — static floats, or lane
    values when ``DomainParams.tilt_x/tilt_y`` randomize the ground slope
    per scenario (surface z = tilt_x*x + tilt_y*y through ``plane_pos``).
    The tangent construction replicates ``lane_engine._static`` (ref = ex,
    valid while |n_x| < 0.9, i.e. |tilt_x| < ~2), so a tilt override is
    bit-compatible with rebuilding the model at that plane normal."""
    st = _static(m)
    if dp is None or (dp.tilt_x is None and dp.tilt_y is None):
        return st.plane_frame, st.plane_off
    tx = dp.tilt_x if dp.tilt_x is not None else 0.0
    ty = dp.tilt_y if dp.tilt_y is not None else 0.0
    inv = 1.0 / jnp.sqrt(tx * tx + ty * ty + 1.0)
    n = (L.mul(-1.0, L.mul(tx, inv)), L.mul(-1.0, L.mul(ty, inv)), inv)
    s = 1.0 / jnp.sqrt(n[1] * n[1] + n[2] * n[2])
    t1 = (jnp.zeros_like(jnp.asarray(s)), n[2] * s, -n[1] * s)
    t2 = L.v3_cross(n, t1)
    pp = np.asarray(m.plane_pos, np.float64)
    off = L.add(
        L.add(L.mul(n[0], float(pp[0])), L.mul(n[1], float(pp[1]))),
        L.mul(n[2], float(pp[2])),
    )
    return (n, t1, t2), off


def _terrain_surface(m: PhysicsModel, dp, x, y):
    """(z, gx, gy): terrain surface height and gradient at lane (x, y).

    Surface (models/spec.DomainParams): slope + smooth bump field
    ``z = pp_z + tilt_x*(x-pp_x) + tilt_y*(y-pp_y)
         + amp*sin(freq*(x-pp_x))*sin(freq*(y-pp_y))``."""
    pp = np.asarray(m.plane_pos, np.float64)
    tx = dp.tilt_x if dp.tilt_x is not None else 0.0
    ty = dp.tilt_y if dp.tilt_y is not None else 0.0
    xr = x - float(pp[0])
    yr = y - float(pp[1])
    z = tx * xr + ty * yr + float(pp[2])
    gx = tx * jnp.ones_like(x)
    gy = ty * jnp.ones_like(x)
    if dp.terrain_amp is not None:
        A, k = dp.terrain_amp, dp.terrain_freq
        sx, cx = jnp.sin(k * xr), jnp.cos(k * xr)
        sy, cy = jnp.sin(k * yr), jnp.cos(k * yr)
        z = z + A * sx * sy
        gx = gx + A * k * cx * sy
        gy = gy + A * k * sx * cy
    return z, gx, gy


def _local_plane(m: PhysicsModel, dp, gpos):
    """((n, t1, t2), off): the terrain's local tangent plane at the geom
    center's xy — contact resolves the hull against this plane (exact for
    pure slope; first-order in curvature for the bump field, so keep the
    wavelength a few times the hull size). The tangent construction
    matches ``_plane`` (valid while |n_x| < 0.9)."""
    x, y = gpos[0], gpos[1]
    z, gx, gy = _terrain_surface(m, dp, x, y)
    inv = 1.0 / jnp.sqrt(gx * gx + gy * gy + 1.0)
    n = (-gx * inv, -gy * inv, inv)
    s = 1.0 / jnp.sqrt(n[1] * n[1] + n[2] * n[2])
    t1 = (jnp.zeros_like(s), n[2] * s, -n[1] * s)
    t2 = L.v3_cross(n, t1)
    off = n[0] * x + n[1] * y + n[2] * z
    return (n, t1, t2), off


def _terrain_active(dp) -> bool:
    if dp is None or dp.terrain_amp is None:
        return False
    if dp.terrain_freq is None:
        raise ValueError(
            "DomainParams.terrain_amp requires terrain_freq "
            "(see models/spec.py)"
        )
    return True


def _collide_loop(m: PhysicsModel, kin: _Kin, plane_frame=None,
                  plane_off=None, dp=None):
    """Same contact slots as ``_collide`` but with the argmin/gather
    selections rewritten as unrolled select-loops over the hull vertices —
    no dynamic gathers, so it lowers inside Pallas/Mosaic kernels (and the
    decimated planning hulls keep V small)."""
    ls = _leg_static(m)
    st = _static(m)
    if plane_frame is None:
        plane_frame, plane_off = st.plane_frame, st.plane_off
    terrain = _terrain_active(dp)

    slots = []
    for level, group in ls.col_groups:
        g0 = group[0]
        body_mat = kin.leg_mat[level]
        body_pos = kin.leg_pos[level]
        gpos = L.v3_add(body_pos, L.mat_vec(body_mat, _v3c(m.col_geom_pos[g0])))
        gmat = L.mat_mul(
            body_mat,
            tuple(tuple(float(v) for v in r)
                  for r in _np_quat_mat(m.col_geom_quat[g0])),
        )
        verts = np.asarray(m.col_hull_verts[g0])
        V = verts.shape[0]

        if terrain:
            frame, off_g = _local_plane(m, dp, gpos)
            n = frame[0]
        else:
            frame, off_g = None, plane_off
            n = plane_frame[0]

        a = L.mat_tvec(gmat, n)
        base = L.sub(L.v3_dot(gpos, n), off_g)
        # per-vertex heights, as a python list of (4, B) lanes (no V axis)
        hs = [
            L.add(L.add(L.mul(float(verts[i, 0]), a[0]),
                        L.mul(float(verts[i, 1]), a[1])),
                  L.add(L.mul(float(verts[i, 2]), a[2]), base))
            for i in range(V)
        ]

        margin = _f(m.col_margin[g0])
        theta2 = _f(m.col_theta2[g0])
        theta3 = _f(m.col_theta3[g0])
        inc = _f(m.col_margin[g0] - m.col_gap[g0])
        nslot = _slot_budget(verts, theta2, theta3)

        # slot 0: deepest vertex (min height)
        b_h = hs[0]
        b_v = tuple(jnp.full_like(hs[0], float(verts[0, c])) for c in range(3))
        for i in range(1, V):
            take = hs[i] < b_h
            b_v = tuple(jnp.where(take, float(verts[i, c]), b_v[c])
                        for c in range(3))
            b_h = jnp.where(take, hs[i], b_h)
        h0, v0 = b_h, b_v
        p0 = L.v3_add(gpos, L.mat_vec(gmat, v0))
        a0 = h0 < margin
        emitted = [(p0, h0, a0)]

        if nslot >= 2:
            # slot 1: max in-plane distance from v0 among candidates
            vn2 = [float(np.sum(verts[i] ** 2)) for i in range(V)]
            v0n2 = L.v3_dot(v0, v0)
            neg = jnp.full_like(h0, -1.0)
            b_s = neg
            b_v1 = tuple(jnp.zeros_like(h0) for _ in range(3))
            b_h1 = jnp.zeros_like(h0)
            for i in range(V):
                vdot0 = (float(verts[i, 0]) * v0[0] + float(verts[i, 1]) * v0[1]
                         + float(verts[i, 2]) * v0[2])
                dv2 = vn2[i] - 2.0 * vdot0 + v0n2
                dplan = jnp.sqrt(jnp.maximum(dv2 - (hs[i] - h0) ** 2, 0.0))
                s_i = jnp.where(hs[i] < 2.0 * margin, dplan, neg)
                take = s_i > b_s
                b_s = jnp.where(take, s_i, b_s)
                b_v1 = tuple(jnp.where(take, float(verts[i, c]), b_v1[c])
                             for c in range(3))
                b_h1 = jnp.where(take, hs[i], b_h1)
            d1, v1, h1 = b_s, b_v1, b_h1
            a1 = a0 & (d1 >= theta2)
            p1 = L.v3_add(gpos, L.mat_vec(gmat, v1))
            emitted.append((p1, h1, a1))

        if nslot >= 3:
            # slot 2: max perpendicular spread
            u1 = L.mat_vec(gmat, L.v3_sub(v1, v0))
            inv_d1 = 1.0 / jnp.maximum(d1, 1e-12)
            dh = h1 - h0
            t = tuple(L.mul(L.sub(u1[i], L.mul(n[i], dh)), inv_d1)
                      for i in range(3))
            perp = L.v3_cross(n, t)
            gq = L.mat_tvec(gmat, perp)
            v0gq = L.v3_dot(v0, gq)
            b_s = neg
            b_v2 = tuple(jnp.zeros_like(h0) for _ in range(3))
            b_h2 = jnp.zeros_like(h0)
            for i in range(V):
                cdot = (float(verts[i, 0]) * gq[0] + float(verts[i, 1]) * gq[1]
                        + float(verts[i, 2]) * gq[2])
                s_i = jnp.where(hs[i] < 2.0 * margin, jnp.abs(cdot - v0gq), neg)
                take = s_i > b_s
                b_s = jnp.where(take, s_i, b_s)
                b_v2 = tuple(jnp.where(take, float(verts[i, c]), b_v2[c])
                             for c in range(3))
                b_h2 = jnp.where(take, hs[i], b_h2)
            c2, v2, h2 = b_s, b_v2, b_h2
            a2 = a1 & (c2 >= theta3)
            p2 = L.v3_add(gpos, L.mat_vec(gmat, v2))
            emitted.append((p2, h2, a2))

        for (pi, hi, ai) in emitted:
            pos = tuple(L.sub(pi[i], L.mul(0.5 * n[i], hi)) for i in range(3))
            slots.append((pos, hi, ai & (hi < inc), level, g0, frame))
    return slots


class _Rows(NamedTuple):
    lim_sign: tuple  # [level] (4, B)
    slot_J: tuple  # per slot: (Jn_free [6 of (4,B)], Jn_leg [3 of (4,B)],
    #                            Jt1_..., Jt2_...); levels above the
    #                            contact body's level are static 0.0
    slot_mu: tuple  # friction coefficient per contact slot
    aref: jnp.ndarray  # (ngroups, 4, B): 3 limit groups + 4*nslot facets
    D: jnp.ndarray


def _make_rows(m: PhysicsModel, kin: _Kin, S_free, S_leg, q_leg, qv_free,
               qv_leg, slots, friction=None, plane_frame=None):
    ls = _leg_static(m)
    st = _static(m)
    if plane_frame is None:
        plane_frame = st.plane_frame
    n, t1, t2 = plane_frame
    aref_rows, D_rows = [], []
    lim_sign = []

    # ---- joint limits: one group per level, rows (4, B) ----
    for k in range(NLEV):
        j0 = ls.leg_joints[k][0]
        lo, hi = _f(m.jnt_range[j0][0]), _f(m.jnt_range[j0][1])
        d_lo = q_leg[k] - lo
        d_hi = hi - q_leg[k]
        lower = d_lo <= d_hi
        dist = jnp.where(lower, d_lo, d_hi)
        sign = jnp.where(lower, 1.0, -1.0).astype(dist.dtype)
        margin = _f(m.jnt_margin[j0])
        active = dist < margin
        r = dist - margin
        imp = _imp_lane(_impedance_np_params(m.jnt_solimp[j0]), r)
        K, B = _kb_from_solref(m.jnt_solref[j0], m.jnt_solimp[j0])
        vel = sign * qv_leg[k]
        aref_rows.append(-B * vel - K * imp * r)
        da0 = m.jnt_dofadr[j0]
        R = jnp.maximum((1.0 - imp) / imp * _f(m.dof_invweight0[da0]), 1e-15)
        D_rows.append(jnp.where(active, 1.0 / R, 0.0))
        lim_sign.append(sign)

    # ---- contact slots ----
    slot_J, slot_mu = [], []
    for (pos, dist, active, level, g0, frame) in slots:
        body0 = ls.leg_bodies[level][0]
        # terrain slots carry their own local tangent frame; flat/tilted
        # ground shares the single global one
        n_s, t1_s, t2_s = frame if frame is not None else (n, t1, t2)
        # DomainParams.friction: per-sample tangential coefficient applied
        # uniformly to every ground-contact group (the impedance weights
        # below keep the nominal compile-time invweights, matching
        # MuJoCo's compile-time solref/solimp referencing)
        mu = _f(m.col_friction[g0][0]) if friction is None else friction
        rel = L.v3_sub(pos, kin.origin)  # (4, B) Vec3

        def proj_rows(S_rows):
            Jn, Jt1, Jt2 = [], [], []
            for S in S_rows:
                c = L.v3_cross(L.sv_ang(S), rel)
                w = L.v3_add(c, L.sv_lin(S))
                Jn.append(L.v3_dot(w, n_s))
                Jt1.append(L.v3_dot(w, t1_s))
                Jt2.append(L.v3_dot(w, t2_s))
            return Jn, Jt1, Jt2

        Jn_f, Jt1_f, Jt2_f = proj_rows(S_free)
        # joints BELOW the contact body on the chain do not move it:
        # their Jacobian entries are identically zero (static — they fold
        # out of every downstream product)
        Jn_l, Jt1_l, Jt2_l = proj_rows(S_leg[: level + 1])
        pad = [0.0] * (NLEV - 1 - level)
        J = (tuple(Jn_f), tuple(Jn_l + pad), tuple(Jt1_f),
             tuple(Jt1_l + pad), tuple(Jt2_f), tuple(Jt2_l + pad))
        slot_J.append(J)
        slot_mu.append(mu)

        margin = _f(m.col_margin[g0] - m.col_gap[g0])
        r = dist - margin
        imp = _imp_lane(_impedance_np_params(m.col_solimp[g0]), r)
        K, B = _kb_from_solref(m.col_solref[g0], m.col_solimp[g0])
        diagA = 2.0 * _f(m.body_invweight0[body0][0]) * (1.0 + mu * mu)
        R = jnp.maximum((1.0 - imp) / imp * diagA, 1e-15)
        Dslot = jnp.where(active, 1.0 / R, 0.0)
        # facet velocities J_facet . qvel
        vn, v1_, v2_ = 0.0, 0.0, 0.0
        for i in range(6):
            vn = L.add(vn, L.mul(J[0][i], qv_free[i]))
            v1_ = L.add(v1_, L.mul(J[2][i], qv_free[i]))
            v2_ = L.add(v2_, L.mul(J[4][i], qv_free[i]))
        for k in range(NLEV):
            vn = L.add(vn, L.mul(J[1][k], qv_leg[k]))
            v1_ = L.add(v1_, L.mul(J[3][k], qv_leg[k]))
            v2_ = L.add(v2_, L.mul(J[5][k], qv_leg[k]))
        for sgn, vt in ((1.0, v1_), (-1.0, v1_), (1.0, v2_), (-1.0, v2_)):
            vel = L.add(vn, L.mul(sgn * mu, vt))
            aref_rows.append(L.sub(L.mul(-B, vel), K * imp * r))
            D_rows.append(Dslot)

    like = aref_rows[-1]
    return _Rows(
        lim_sign=tuple(lim_sign),
        slot_J=tuple(slot_J),
        slot_mu=tuple(slot_mu),
        aref=jnp.stack([L.as_lane(x, like) for x in aref_rows]),
        D=jnp.stack([L.as_lane(x, like) for x in D_rows]),
    )


def _rows_matvec(rows: _Rows, x_free, x_leg) -> jnp.ndarray:
    """J x -> (ngroups, 4, B)."""
    out = [rows.lim_sign[k] * x_leg[k] for k in range(NLEV)]
    for J, mu in zip(rows.slot_J, rows.slot_mu):
        vn, v1, v2 = 0.0, 0.0, 0.0
        for i in range(6):
            vn = L.add(vn, L.mul(J[0][i], x_free[i]))
            v1 = L.add(v1, L.mul(J[2][i], x_free[i]))
            v2 = L.add(v2, L.mul(J[4][i], x_free[i]))
        for k in range(NLEV):
            vn = L.add(vn, L.mul(J[1][k], x_leg[k]))
            v1 = L.add(v1, L.mul(J[3][k], x_leg[k]))
            v2 = L.add(v2, L.mul(J[5][k], x_leg[k]))
        mv1 = L.mul(mu, v1)
        mv2 = L.mul(mu, v2)
        out += [L.add(vn, mv1), L.sub(vn, mv1), L.add(vn, mv2), L.sub(vn, mv2)]
    return jnp.stack(out)


def _rows_tmatvec(rows: _Rows, y: jnp.ndarray):
    """Jᵀ y -> (list of 6 (B,), list of NLEV (4, B))."""
    y_free = [0.0] * 6
    y_leg = [rows.lim_sign[k] * y[k] for k in range(NLEV)]
    for s, (J, mu) in enumerate(zip(rows.slot_J, rows.slot_mu)):
        r0 = NLEV + 4 * s
        yn = y[r0] + y[r0 + 1] + y[r0 + 2] + y[r0 + 3]
        y1 = mu * (y[r0] - y[r0 + 1])
        y2 = mu * (y[r0 + 2] - y[r0 + 3])
        for i in range(6):
            contrib = L.add(
                L.mul(J[0][i], yn),
                L.add(L.mul(J[2][i], y1), L.mul(J[4][i], y2)),
            )
            y_free[i] = L.add(y_free[i], _sum_legs(contrib))
        for k in range(NLEV):
            y_leg[k] = L.add(
                y_leg[k],
                L.add(L.mul(J[1][k], yn),
                      L.add(L.mul(J[3][k], y1), L.mul(J[5][k], y2))),
            )
    return y_free, y_leg


def _add_jwj(Mff, Mfl, Mll, rows: _Rows, w: jnp.ndarray):
    """H = M + Jᵀ diag(w) J on the block pattern."""
    Hff, Hfl, Hll = dict(Mff), dict(Mfl), dict(Mll)
    for k in range(NLEV):  # limit rows: sign^2 == 1, per-leg diagonal
        Hll[(k, k)] = Hll[(k, k)] + w[k]
    for s, (J, mu) in enumerate(zip(rows.slot_J, rows.slot_mu)):
        r0 = NLEV + 4 * s
        w1, w2, w3, w4 = w[r0], w[r0 + 1], w[r0 + 2], w[r0 + 3]
        cnn = w1 + w2 + w3 + w4
        c11 = mu * mu * (w1 + w2)
        c22 = mu * mu * (w3 + w4)
        cn1 = mu * (w1 - w2)
        cn2 = mu * (w3 - w4)
        Jn_f, Jn_l, Jt1_f, Jt1_l, Jt2_f, Jt2_l = J

        def pairval(ni, t1i, t2i, nj, t1j, t2j):
            return (
                cnn * ni * nj + c11 * t1i * t1j + c22 * t2i * t2j
                + cn1 * (ni * t1j + t1i * nj) + cn2 * (ni * t2j + t2i * nj)
            )

        for i in range(6):
            for j in range(i + 1):
                Hff[(i, j)] = Hff[(i, j)] + jnp.sum(
                    pairval(Jn_f[i], Jt1_f[i], Jt2_f[i],
                            Jn_f[j], Jt1_f[j], Jt2_f[j]),
                    axis=0,
                )
            for k in range(NLEV):
                Hfl[(i, k)] = Hfl[(i, k)] + pairval(
                    Jn_f[i], Jt1_f[i], Jt2_f[i], Jn_l[k], Jt1_l[k], Jt2_l[k]
                )
        for ki in range(NLEV):
            for kj in range(ki + 1):
                Hll[(ki, kj)] = Hll[(ki, kj)] + pairval(
                    Jn_l[ki], Jt1_l[ki], Jt2_l[ki],
                    Jn_l[kj], Jt1_l[kj], Jt2_l[kj],
                )
    return Hff, Hfl, Hll


def _newton_solve(m, Mff, Mfl, Mll, rows: _Rows, qa_free, qa_leg,
                  iterations, ls_iterations):
    def body(carry, _):
        xf_s, xl_s = carry  # (6, B), (NLEV, 4, B)
        x_free = [xf_s[i] for i in range(6)]
        x_leg = [xl_s[k] for k in range(NLEV)]
        jar = _rows_matvec(rows, x_free, x_leg) - rows.aref
        w = jnp.where((jar < 0.0) & (rows.D > 0.0), rows.D, 0.0)
        gs_free, gs_leg = _sym_matvec(
            Mff, Mfl, Mll,
            [x_free[i] - qa_free[i] for i in range(6)],
            [x_leg[k] - qa_leg[k] for k in range(NLEV)],
        )
        jt_free, jt_leg = _rows_tmatvec(rows, w * jar)
        g_free = [L.add(gs_free[i], jt_free[i]) for i in range(6)]
        g_leg = [L.add(gs_leg[k], jt_leg[k]) for k in range(NLEV)]
        H = _add_jwj(Mff, Mfl, Mll, rows, w)
        fac = _ldl_factor(*H)
        dx_free, dx_leg = _ldl_solve(
            fac, [L.neg(g) for g in g_free], [L.neg(g) for g in g_leg]
        )

        Jdx = _rows_matvec(rows, dx_free, dx_leg)
        mdx_free, mdx_leg = _sym_matvec(Mff, Mfl, Mll, dx_free, dx_leg)
        g0 = sum(dx_free[i] * gs_free[i] for i in range(6)) + sum(
            _sum_legs(dx_leg[k] * gs_leg[k]) for k in range(NLEV)
        )
        h0 = sum(dx_free[i] * mdx_free[i] for i in range(6)) + sum(
            _sum_legs(dx_leg[k] * mdx_leg[k]) for k in range(NLEV)
        )

        def ls_body(t, _):
            jar_t = jar + t[None, None] * Jdx
            w_t = jnp.where((jar_t < 0.0) & (rows.D > 0.0), rows.D, 0.0)
            dphi = g0 + t * h0 + jnp.sum(w_t * jar_t * Jdx, axis=(0, 1))
            ddphi = h0 + jnp.sum(w_t * Jdx * Jdx, axis=(0, 1))
            return jnp.clip(t - dphi / jnp.maximum(ddphi, 1e-30), 0.0, 4.0), None

        t0 = jnp.ones_like(xf_s[0])
        t = jax.lax.fori_loop(
            0, ls_iterations, lambda _, tt: ls_body(tt, None)[0], t0
        )
        xf_new = jnp.stack([x_free[i] + t * dx_free[i] for i in range(6)])
        xl_new = jnp.stack(
            [x_leg[k] + t[None] * dx_leg[k] for k in range(NLEV)]
        )
        return (xf_new, xl_new), None

    carry0 = (jnp.stack(qa_free), jnp.stack(qa_leg))
    xf_s, xl_s = jax.lax.fori_loop(
        0, iterations, lambda _, c: body(c, None)[0], carry0
    )
    x_free = [xf_s[i] for i in range(6)]
    x_leg = [xl_s[k] for k in range(NLEV)]
    jar = _rows_matvec(rows, x_free, x_leg) - rows.aref
    force = jnp.where((jar < 0.0) & (rows.D > 0.0), -rows.D * jar, 0.0)
    qfrc_free, qfrc_leg = _rows_tmatvec(rows, force)
    return x_free, x_leg, qfrc_free, qfrc_leg


# --------------------------------------------------------------------------
# sensors (the IMU site lives on the base — no leg accelerations needed)


def _sensors(m: PhysicsModel, kin: _Kin, v_base, cacc_base, q_free, q_leg):
    b = m.site_bodyid
    ls = _leg_static(m)
    _require(b == ls.base, "IMU site must live on the base body")
    spos = L.v3_add(kin.base_pos, L.mat_vec(kin.base_mat, _v3c(m.site_pos)))
    smat = L.mat_mul(
        kin.base_mat,
        tuple(tuple(float(v) for v in r) for r in _np_quat_mat(m.site_quat)),
    )
    w = L.sv_ang(v_base)
    v0 = L.sv_lin(v_base)
    p = L.v3_sub(spos, kin.origin)
    v_site = L.v3_add(v0, L.v3_cross(w, p))
    alpha = L.sv_ang(cacc_base)
    a0 = L.sv_lin(cacc_base)
    a_site = L.v3_add(a0, L.v3_add(L.v3_cross(alpha, p), L.v3_cross(w, v_site)))

    from ..models.spec import (
        SENSOR_ACCELEROMETER, SENSOR_FRAMELINVEL, SENSOR_FRAMEPOS,
        SENSOR_FRAMEXAXIS, SENSOR_FRAMEZAXIS, SENSOR_GYRO, SENSOR_JOINTPOS,
        SENSOR_VELOCIMETER,
    )

    out = [None] * m.nsensordata
    for s in m.sensors:
        if s.kind == SENSOR_JOINTPOS:
            j = s.objid
            qa = m.jnt_qposadr[j]
            lvl = (qa - 7) % 3
            leg = (qa - 7) // 3
            out[s.adr] = q_leg[lvl][leg]
        elif s.kind == SENSOR_ACCELEROMETER:
            r = L.mat_tvec(smat, a_site)
            out[s.adr], out[s.adr + 1], out[s.adr + 2] = r
        elif s.kind == SENSOR_GYRO:
            r = L.mat_tvec(smat, w)
            out[s.adr], out[s.adr + 1], out[s.adr + 2] = r
        elif s.kind == SENSOR_FRAMEPOS:
            out[s.adr], out[s.adr + 1], out[s.adr + 2] = spos
        elif s.kind == SENSOR_FRAMELINVEL:
            out[s.adr], out[s.adr + 1], out[s.adr + 2] = v_site
        elif s.kind == SENSOR_FRAMEXAXIS:
            r = L.mat_col(smat, 0)
            out[s.adr], out[s.adr + 1], out[s.adr + 2] = r
        elif s.kind == SENSOR_FRAMEZAXIS:
            r = L.mat_col(smat, 2)
            out[s.adr], out[s.adr + 1], out[s.adr + 2] = r
        elif s.kind == SENSOR_VELOCIMETER:
            r = L.mat_tvec(smat, v_site)
            out[s.adr], out[s.adr + 1], out[s.adr + 2] = r
        else:
            raise NotImplementedError(f"sensor kind {s.kind}")
    like = out[18]  # framepos x — always a (B,) array
    return L.stack_lanes(out, like)


# --------------------------------------------------------------------------
# the step


# the dof layout is asserted identical for every compatible model
# (_leg_static: leg-major, consecutive), so the level indices are
# module-level constants, not per-model state
_Q_IDX = [[7 + 3 * l + k for l in range(NLEG)] for k in range(NLEV)]
_V_IDX = [[6 + 3 * l + k for l in range(NLEG)] for k in range(NLEV)]
_A_IDX = [[3 * l + k for l in range(NLEG)] for k in range(NLEV)]


def _level_indices(m):
    return _Q_IDX, _V_IDX, _A_IDX


def _rows(arr, idx):
    """Gather-free row selection: stack static row slices (Mosaic-safe)."""
    return jnp.stack([arr[i] for i in idx])


def _step_impl(m, ls, ctrl, solver_iterations, ls_iterations,
               compute_sensors=True, collide_fn=None, const_full=False,
               dp=None):
    if dp is None:
        from ..models.spec import DomainParams
        dp = DomainParams()
    st = _leg_static(m)
    h = m.timestep
    q_idx, v_idx, a_idx = _level_indices(m)

    q_free = [ls.qpos[i] for i in range(7)]
    qv_free = [ls.qvel[i] for i in range(6)]
    q_leg = [_rows(ls.qpos, q_idx[k]) for k in range(NLEV)]  # (4, B)
    qv_leg = [_rows(ls.qvel, v_idx[k]) for k in range(NLEV)]
    act_leg = [_rows(ls.act, a_idx[k]) for k in range(NLEV)]
    j0s = [st.leg_joints[k][0] for k in range(NLEV)]
    u0s = [next(u for u in range(m.nu) if m.actuator_trnid[u] == j0s[k])
           for k in range(NLEV)]
    ctrl_leg = [
        jnp.clip(_rows(ctrl, a_idx[k]),
                 _f(m.actuator_ctrlrange[u0s[k]][0]),
                 _f(m.actuator_ctrlrange[u0s[k]][1]))
        for k in range(NLEV)
    ]

    kin = _fk(m, q_free, q_leg, const_full=const_full)
    S_free, S_leg = _subspace(m, kin)
    v_base, v_leg = _body_velocities(m, S_free, S_leg, qv_free, qv_leg)
    I_base, I_leg = _inertias(m, kin, mass_scale=dp.base_mass_scale)
    Mff, Mfl, Mll = _crba(m, S_free, S_leg, I_base, I_leg)
    bias_free, bias_leg = _rne_bias(
        m, kin, S_free, S_leg, v_base, v_leg, qv_free, qv_leg, I_base, I_leg
    )
    qfrc_act, dvel_leg = _actuation(m, q_leg, qv_leg, act_leg,
                                    gain_scale=dp.gain_scale)
    damp_leg = _f(m.dof_damping[6])
    qf_free = [
        L.sub(L.mul(-_f(m.dof_damping[i]), qv_free[i]), bias_free[i])
        for i in range(6)
    ]
    qf_leg = [
        L.sub(L.sub(qfrc_act[k], L.mul(damp_leg, qv_leg[k])), bias_leg[k])
        for k in range(NLEV)
    ]

    fac = _ldl_factor(Mff, Mfl, Mll)
    qa_free, qa_leg = _ldl_solve(fac, qf_free, qf_leg)

    if solver_iterations > 0:
        plane_frame, plane_off = _plane(m, dp)
        slots = (collide_fn or _collide)(m, kin, plane_frame, plane_off,
                                         dp=dp)
        rows = _make_rows(m, kin, S_free, S_leg, q_leg, qv_free, qv_leg,
                          slots, friction=dp.friction,
                          plane_frame=plane_frame)
        x_free, x_leg, _, _ = _newton_solve(
            m, Mff, Mfl, Mll, rows, qa_free, qa_leg,
            solver_iterations, ls_iterations,
        )
    else:
        x_free, x_leg = qa_free, qa_leg

    # sensors (pre-integration, base site only)
    if compute_sensors:
        g = _v3c(m.gravity)
        vJ_base = v_base[:3] + (
            L.sub(v_base[3], qv_free[0]),
            L.sub(v_base[4], qv_free[1]),
            L.sub(v_base[5], qv_free[2]),
        )
        cacc_base = (0.0, 0.0, 0.0, -g[0], -g[1], -g[2])
        for d in range(6):
            cacc_base = L.sv_add(cacc_base, L.sv_scale(x_free[d], S_free[d]))
        cacc_base = L.sv_add(cacc_base, L.motion_cross(v_base, vJ_base))
        sens = _sensors(m, kin, v_base, cacc_base, q_free, q_leg)
    else:
        sens = ls.sensordata

    # implicitfast: (M - h diag(D)) dv = h M qacc
    Mff_h, Mfl_h, Mll_h = dict(Mff), dict(Mfl), dict(Mll)
    for i in range(6):
        Dv = -_f(m.dof_damping[i])
        if Dv:
            Mff_h[(i, i)] = L.sub(Mff_h[(i, i)], h * Dv)
    for k in range(NLEV):
        Dv = L.add(-damp_leg, dvel_leg[k])
        Mll_h[(k, k)] = Mll_h[(k, k)] - h * Dv
    fac_h = _ldl_factor(Mff_h, Mfl_h, Mll_h)
    Mq_free, Mq_leg = _sym_matvec(Mff, Mfl, Mll, x_free, x_leg)
    dv_free, dv_leg = _ldl_solve(
        fac_h, [h * v for v in Mq_free], [h * v for v in Mq_leg]
    )
    qv_free_new = [qv_free[i] + dv_free[i] for i in range(6)]
    qv_leg_new = [qv_leg[k] + dv_leg[k] for k in range(NLEV)]

    # activation exact filter (shared tau)
    tau = max(_f(m.actuator_dynprm[u0s[0]][0]), 1e-12)
    coef = 1.0 - float(np.exp(-h / tau))
    act_new = [act_leg[k] + (ctrl_leg[k] - act_leg[k]) * coef
               for k in range(NLEV)]

    # integrate positions with the new velocity
    base_pos_new = [q_free[i] + h * qv_free_new[i] for i in range(3)]
    quat_new = L.quat_integrate(
        (q_free[3], q_free[4], q_free[5], q_free[6]),
        (qv_free_new[3], qv_free_new[4], qv_free_new[5]),
        h,
    )
    q_leg_new = [q_leg[k] + h * qv_leg_new[k] for k in range(NLEV)]

    # repack (leg-major row order: 7 + 3l + k)
    def pack_levels(levels):  # NLEV of (4, B) -> (12, B) rows 3l+k
        return jnp.stack(
            [levels[k][l] for l in range(NLEG) for k in range(NLEV)]
        )

    qpos = jnp.concatenate([
        jnp.stack(base_pos_new + list(quat_new)),
        pack_levels(q_leg_new),
    ])
    qvel = jnp.concatenate([
        jnp.stack(qv_free_new), pack_levels(qv_leg_new),
    ])
    act = pack_levels(act_new)
    return LaneState(
        qpos=qpos, qvel=qvel, act=act, time=ls.time + h, sensordata=sens,
    )


def step(m: PhysicsModel, ls: LaneState, ctrl: jnp.ndarray,
         solver_iterations: int = 4, ls_iterations: int = 8,
         dp=None) -> LaneState:
    """One physics step (mj_step semantics), leg-batched. ``dp`` is an
    optional ``models.spec.DomainParams`` of per-sample (B,) overrides."""
    return _step_impl(m, ls, ctrl, solver_iterations, ls_iterations, dp=dp)


def control_step(m: PhysicsModel, ls: LaneState, ctrl: jnp.ndarray,
                 frame_skip: int, solver_iterations: int = 4,
                 ls_iterations: int = 8, dp=None) -> LaneState:
    """frame_skip substeps under constant control (sensors on the last)."""

    def body(s, _):
        return _step_impl(m, s, ctrl, solver_iterations, ls_iterations,
                          compute_sensors=False, dp=dp), None

    if frame_skip > 1:
        ls, _ = jax.lax.scan(body, ls, None, length=frame_skip - 1)
    return _step_impl(m, ls, ctrl, solver_iterations, ls_iterations, dp=dp)
