"""Smooth (constraint-free) rigid-body dynamics in pure JAX.

Re-derivation of what MuJoCo's C engine computes inside ``mj_step``
(reference hot loop: ``/root/reference/src/envs/quadruped.py:163-165``),
built TPU-first:

  * the kinematic tree is *static* topology (host tuples on ``PhysicsModel``),
    so every loop below unrolls at trace time into a fixed XLA graph — no
    data-dependent control flow, fully ``vmap``-able across thousands of
    rollouts;
  * spatial algebra uses world-origin 6-vectors ``[angular; linear]``
    (Featherstone), which keeps everything dense, branch-free and fusable.

Validated numerically against CPU MuJoCo in ``tests/test_smooth_parity.py``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..models.spec import JNT_FREE, JNT_HINGE, PhysicsModel
from . import maths


class Kin(NamedTuple):
    """Forward-kinematics results (world frame)."""

    xpos: jnp.ndarray  # (nbody, 3) body frame origins
    xquat: jnp.ndarray  # (nbody, 4)
    xmat: jnp.ndarray  # (nbody, 3, 3)
    xipos: jnp.ndarray  # (nbody, 3) com positions
    ximat: jnp.ndarray  # (nbody, 3, 3) inertial frames
    origin: jnp.ndarray  # (3,) spatial-algebra origin (robot base position)


def _const(x, dtype):
    return jnp.asarray(np.asarray(x), dtype=dtype)


def fwd_position(m: PhysicsModel, qpos: jnp.ndarray) -> Kin:
    """Forward kinematics (mj_kinematics semantics: a hinge rotates its body
    about the joint anchor by ``qpos - qpos0``; the free joint sets the frame
    directly from qpos)."""
    dt = qpos.dtype
    nb = m.nbody

    xpos = [jnp.zeros(3, dtype=dt)] * nb
    xquat = [_const([1.0, 0, 0, 0], dt)] * nb

    for b in range(1, nb):
        p = m.body_parentid[b]
        jadr = m.body_jntadr[b]
        if jadr >= 0 and m.jnt_type[jadr] == JNT_FREE:
            qadr = m.jnt_qposadr[jadr]
            xpos[b] = qpos[qadr : qadr + 3]
            xquat[b] = maths.quat_normalize(qpos[qadr + 3 : qadr + 7])
            continue
        pos = xpos[p] + maths.quat_rotate(xquat[p], _const(m.body_pos[b], dt))
        quat = maths.quat_mul(xquat[p], _const(m.body_quat[b], dt))
        for k in range(m.body_jntnum[b]):
            j = jadr + k
            assert m.jnt_type[j] == JNT_HINGE, "engine supports free+hinge"
            qadr = m.jnt_qposadr[j]
            angle = qpos[qadr] - _const(m.qpos0[qadr], dt)
            local_anchor = _const(m.jnt_pos[j], dt)
            anchor_w = pos + maths.quat_rotate(quat, local_anchor)
            quat = maths.quat_mul(
                quat, maths.axis_angle_to_quat(_const(m.jnt_axis[j], dt), angle)
            )
            pos = anchor_w - maths.quat_rotate(quat, local_anchor)
        xpos[b] = pos
        xquat[b] = quat

    xpos = jnp.stack(xpos)
    xquat = jnp.stack(xquat)
    xmat = maths.quat_to_mat(xquat)
    xipos = xpos + jnp.einsum("bij,bj->bi", xmat, _const(m.body_ipos, dt))
    ximat = jnp.einsum(
        "bij,bjk->bik", xmat, maths.quat_to_mat(_const(m.body_iquat, dt))
    )
    # Spatial-algebra origin: the floating base position. Measuring spatial
    # vectors at the world origin is exact in f64 but catastrophically
    # cancels in f32/bf16 once |xpos| >> robot size (terms scale like m|p|^2).
    # Re-origining at the base keeps lever arms ~0.3 m — the same trick as
    # MuJoCo's subtree-com frames — and makes the engine f32-safe on TPU.
    origin = xpos[_root_body(m)]
    return Kin(
        xpos=xpos, xquat=xquat, xmat=xmat, xipos=xipos, ximat=ximat,
        origin=origin,
    )


def _root_body(m: PhysicsModel) -> int:
    """First body hanging off the world (the floating base)."""
    for b in range(1, m.nbody):
        if m.body_parentid[b] == 0:
            return b
    return 0


def dof_subspace(m: PhysicsModel, kin: Kin) -> jnp.ndarray:
    """Motion subspace S: (nv, 6) spatial vectors [angular; linear-at-origin].

    MuJoCo free-joint conventions: translational dofs are world-aligned,
    rotational dofs act about the body frame origin with body-local axes.
    Hinge dofs act about the (world) joint anchor/axis.
    """
    dt = kin.xpos.dtype
    rows = []
    for j in range(m.njnt):
        b = m.jnt_bodyid[j]
        if m.jnt_type[j] == JNT_FREE:
            zero = jnp.zeros(3, dtype=dt)
            for k in range(3):
                rows.append(jnp.concatenate([zero, _const(np.eye(3)[k], dt)]))
            p = kin.xpos[b] - kin.origin
            for k in range(3):
                a = kin.xmat[b][:, k]  # body axis k in world
                rows.append(jnp.concatenate([a, jnp.cross(p, a)]))
        else:
            anchor = (
                kin.xpos[b] + kin.xmat[b] @ _const(m.jnt_pos[j], dt) - kin.origin
            )
            axis = kin.xmat[b] @ _const(m.jnt_axis[j], dt)
            rows.append(jnp.concatenate([axis, jnp.cross(anchor, axis)]))
    return jnp.stack(rows)  # (nv, 6)


def _dof_bodies(m: PhysicsModel):
    out = []
    for b in range(1, m.nbody):
        out += [b] * m.body_dofnum[b]
    return out


def body_velocities(m: PhysicsModel, S: jnp.ndarray, qvel: jnp.ndarray) -> jnp.ndarray:
    """Spatial velocity of each body at the world origin: (nbody, 6)."""
    dt = qvel.dtype
    v = [jnp.zeros(6, dtype=dt)] * m.nbody
    for b in range(1, m.nbody):
        p = m.body_parentid[b]
        da, dn = m.body_dofadr[b], m.body_dofnum[b]
        v[b] = v[p] + S[da : da + dn].T @ qvel[da : da + dn]
    return jnp.stack(v)


def _body_spatial_inertia(m: PhysicsModel, kin: Kin, b: int) -> jnp.ndarray:
    dt = kin.xpos.dtype
    return maths.spatial_inertia_world(
        _const(m.body_mass[b], dt),
        _const(m.body_inertia[b], dt),
        kin.ximat[b],
        kin.xipos[b] - kin.origin,
    )


def _subtree_children(m: PhysicsModel):
    ch = {b: [] for b in range(m.nbody)}
    for b in range(1, m.nbody):
        ch[m.body_parentid[b]].append(b)
    return ch


_MASK_CACHE: dict = {}


def _ancestor_dof_mask(m: PhysicsModel) -> np.ndarray:
    """mask[i, j] true iff dof i belongs to an ancestor-or-self body of dof
    j's body (static; computed once per model on the host)."""
    key = id(m)
    if key in _MASK_CACHE:
        return _MASK_CACHE[key]
    dof_body = np.asarray(_dof_bodies(m))
    anc = np.zeros((m.nbody, m.nbody), dtype=bool)
    for b in range(m.nbody):
        x = b
        while x != 0:
            anc[x, b] = True
            x = m.body_parentid[x]
    mask = anc[dof_body[:, None], dof_body[None, :]]
    _MASK_CACHE[key] = mask
    return mask


def crba(m: PhysicsModel, kin: Kin, S: jnp.ndarray) -> jnp.ndarray:
    """Composite-rigid-body mass matrix M (nv, nv), armature included."""
    dt = kin.xpos.dtype
    children = _subtree_children(m)
    Ic = [None] * m.nbody
    for b in range(m.nbody - 1, 0, -1):  # leaf-to-root accumulation
        I = _body_spatial_inertia(m, kin, b)
        for c in children[b]:
            I = I + Ic[c]
        Ic[b] = I

    dof_body = _dof_bodies(m)
    # F_j = Ic[body(j)] @ S_j ; CRBA: M[i, j] = S_i . F_j for i ancestor of j
    F = jnp.stack([Ic[dof_body[j]] @ S[j] for j in range(m.nv)])  # (nv, 6)
    M_full = S @ F.T
    mask = _const(_ancestor_dof_mask(m), jnp.bool_)
    M = jnp.where(mask, M_full, jnp.where(mask.T, M_full.T, 0.0))
    return M + jnp.diag(_const(m.dof_armature, dt))


def _joint_bias_velocity(
    m: PhysicsModel, qvel: jnp.ndarray, cvel: jnp.ndarray, b: int
) -> jnp.ndarray:
    """The part of the joint velocity v_b - v_p whose motion subspace rotates
    with a body (so that S-dot = v_b x S). Free-joint *translational* axes are
    world-fixed (S-dot = 0) and must be excluded from the velocity-product
    term — the classic free-joint convention subtlety."""
    p = m.body_parentid[b]
    vJ = cvel[b] - cvel[p]
    jadr = m.body_jntadr[b]
    if jadr >= 0 and m.jnt_type[jadr] == JNT_FREE:
        da = m.body_dofadr[b]
        lin = jnp.concatenate([jnp.zeros(3, dtype=qvel.dtype), qvel[da : da + 3]])
        vJ = vJ - lin
    return vJ


def rne_bias(
    m: PhysicsModel,
    kin: Kin,
    S: jnp.ndarray,
    cvel: jnp.ndarray,
    qvel: jnp.ndarray,
) -> jnp.ndarray:
    """Bias force C(q, v)·v + gravity term (matches mjData.qfrc_bias)."""
    dt = kin.xpos.dtype
    g = _const(m.gravity, dt)
    children = _subtree_children(m)

    acc = [jnp.concatenate([jnp.zeros(3, dtype=dt), -g])] * m.nbody
    for b in range(1, m.nbody):
        p = m.body_parentid[b]
        # qacc = 0: only the S-dot velocity-product term remains
        acc[b] = acc[p] + maths.motion_cross(
            cvel[b], _joint_bias_velocity(m, qvel, cvel, b)
        )

    f = [None] * m.nbody
    for b in range(1, m.nbody):
        Ib = _body_spatial_inertia(m, kin, b)
        f[b] = Ib @ acc[b] + maths.force_cross(cvel[b], Ib @ cvel[b])
    fsub = [None] * m.nbody
    for b in range(m.nbody - 1, 0, -1):
        fb = f[b]
        for c in children[b]:
            fb = fb + fsub[c]
        fsub[b] = fb

    dof_body = _dof_bodies(m)
    return jnp.stack([S[i] @ fsub[dof_body[i]] for i in range(m.nv)])


def body_accelerations(
    m: PhysicsModel,
    S: jnp.ndarray,
    cvel: jnp.ndarray,
    qvel: jnp.ndarray,
    qacc: jnp.ndarray,
    gravity_offset: bool = True,
) -> jnp.ndarray:
    """Spatial accelerations (nbody, 6) at the world origin given qacc.

    With ``gravity_offset`` the base 'accelerates' at -g, which makes the
    result a *proper* acceleration — exactly what an accelerometer measures
    (MuJoCo's cacc convention in mj_comAcc/mj_sensorAcc).
    """
    dt = cvel.dtype
    g = _const(m.gravity, dt)
    base = jnp.concatenate([jnp.zeros(3, dtype=dt), -g if gravity_offset else 0 * g])
    acc = [base] * m.nbody
    for b in range(1, m.nbody):
        p = m.body_parentid[b]
        da, dn = m.body_dofadr[b], m.body_dofnum[b]
        ab = acc[p] + S[da : da + dn].T @ qacc[da : da + dn]
        ab = ab + maths.motion_cross(
            cvel[b], _joint_bias_velocity(m, qvel, cvel, b)
        )
        acc[b] = ab
    return jnp.stack(acc)


# --- actuation -----------------------------------------------------------


class Actuation(NamedTuple):
    force: jnp.ndarray  # (nu,) clamped scalar actuator forces
    qfrc: jnp.ndarray  # (nv,)
    vel_deriv: jnp.ndarray  # (nv,) diag d(qfrc)/d(qvel) for implicitfast


def _actuator_maps(m: PhysicsModel):
    """Static gather/scatter indices: actuator -> (qposadr, dofadr)."""
    qadr = np.asarray([m.jnt_qposadr[j] for j in m.actuator_trnid])
    dadr = np.asarray([m.jnt_dofadr[j] for j in m.actuator_trnid])
    return qadr, dadr


def actuation(
    m: PhysicsModel, qpos: jnp.ndarray, qvel: jnp.ndarray, act: jnp.ndarray
) -> Actuation:
    """Position-servo forces (gaintype=fixed, biastype=affine, joint
    transmission): force = clamp(kp*act - kp*len - kv*vel), len = gear*q.

    Matches the compiled actuator tables of ``quadruped.xml:10-37``
    (gainprm=[kp,0,0], biasprm=[0,-kp,-kv], gear=0.64, forcerange=±1.71).
    """
    dt = qpos.dtype
    qadr, dadr = _actuator_maps(m)
    gear = _const(m.actuator_gear, dt)
    q = qpos[qadr]
    v = qvel[dadr]
    length = gear * q
    velocity = gear * v
    gainprm = _const(m.actuator_gainprm, dt)
    biasprm = _const(m.actuator_biasprm, dt)
    force = gainprm[:, 0] * act + (
        biasprm[:, 0] + biasprm[:, 1] * length + biasprm[:, 2] * velocity
    )
    lo = _const(m.actuator_forcerange[:, 0], dt)
    hi = _const(m.actuator_forcerange[:, 1], dt)
    clamped_force = jnp.clip(force, lo, hi)
    qfrc = jnp.zeros(m.nv, dtype=dt).at[dadr].add(gear * clamped_force)

    # d(qfrc)/d(qvel): gear^2 * biasprm[2], zeroed where the force saturates
    # (mjd_actuator_vel semantics — verified empirically in tests).
    in_range = (force > lo) & (force < hi)
    dvel = jnp.zeros(m.nv, dtype=dt).at[dadr].add(
        jnp.where(in_range, gear * gear * biasprm[:, 2], 0.0)
    )
    return Actuation(force=clamped_force, qfrc=qfrc, vel_deriv=dvel)


def passive_force(m: PhysicsModel, qvel: jnp.ndarray) -> jnp.ndarray:
    return -_const(m.dof_damping, qvel.dtype) * qvel


def act_filter_exact(
    m: PhysicsModel, act: jnp.ndarray, ctrl: jnp.ndarray, h: float
) -> jnp.ndarray:
    """Exact first-order filter activation update (dyntype=filterexact)."""
    dt = act.dtype
    tau = jnp.maximum(_const(m.actuator_dynprm[:, 0], dt), 1e-12)
    return act + (ctrl - act) * (1.0 - jnp.exp(-h / tau))


def clip_ctrl(m: PhysicsModel, ctrl: jnp.ndarray) -> jnp.ndarray:
    dt = ctrl.dtype
    return jnp.clip(
        ctrl,
        _const(m.actuator_ctrlrange[:, 0], dt),
        _const(m.actuator_ctrlrange[:, 1], dt),
    )


# --- site (IMU) kinematics ----------------------------------------------


class SiteFrame(NamedTuple):
    pos: jnp.ndarray  # (3,)
    mat: jnp.ndarray  # (3, 3)


def site_frame(m: PhysicsModel, kin: Kin) -> SiteFrame:
    dt = kin.xpos.dtype
    b = m.site_bodyid
    pos = kin.xpos[b] + kin.xmat[b] @ _const(m.site_pos, dt)
    mat = kin.xmat[b] @ maths.quat_to_mat(_const(m.site_quat, dt))
    return SiteFrame(pos=pos, mat=mat)
