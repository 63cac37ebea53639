"""The physics engine front-end: ``forward`` / ``step`` / ``rollout``.

Pure functions over a ``State`` pytree — the TPU-native re-derivation of the
reference's MuJoCo hot loop (``mj_step`` with frame-skip at
``/root/reference/src/envs/quadruped.py:163-165``). Everything is jit/vmap
friendly: ``jax.vmap(step)`` batches thousands of robots, ``lax.scan`` rolls
out horizons, and all matmuls run at float32 precision on the MXU
(bf16 default would destroy the small-matrix algebra).

Step semantics mirror mj_step exactly: forward() evaluates dynamics and
sensors at the *current* state, then the integrator advances — so the
sensordata attached to the returned state is the pre-integration reading,
which is what the reference env observes after its frame-skip loop
(``quadruped.py:167``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.spec import PhysicsModel
from . import collision, constraints, integrator, sensors, smooth


class State(NamedTuple):
    qpos: jnp.ndarray  # (nq,)
    qvel: jnp.ndarray  # (nv,)
    act: jnp.ndarray  # (na,)
    time: jnp.ndarray  # ()
    sensordata: jnp.ndarray  # (nsensordata,) reading at the last forward()


class Forward(NamedTuple):
    kin: smooth.Kin
    S: jnp.ndarray
    cvel: jnp.ndarray
    M: jnp.ndarray
    qacc: jnp.ndarray
    qfrc_smooth: jnp.ndarray
    qfrc_constraint: jnp.ndarray
    act_vel_deriv: jnp.ndarray
    sensordata: jnp.ndarray
    ncon_active: jnp.ndarray


def make_state(m: PhysicsModel, dtype=jnp.float32) -> State:
    """Default state: qpos0, zero velocity/activation (mj_resetData)."""
    return State(
        qpos=jnp.asarray(np.asarray(m.qpos0), dtype=dtype),
        qvel=jnp.zeros(m.nv, dtype=dtype),
        act=jnp.zeros(m.na, dtype=dtype),
        time=jnp.zeros((), dtype=dtype),
        sensordata=jnp.zeros(m.nsensordata, dtype=dtype),
    )


def forward(
    m: PhysicsModel,
    state: State,
    ctrl: jnp.ndarray,
    max_contacts: int = 24,
    solver_iterations: Optional[int] = None,
) -> Forward:
    """Full dynamics evaluation at the current state (mj_forward)."""
    with jax.default_matmul_precision("highest"):
        qpos, qvel, act = state.qpos, state.qvel, state.act

        kin = smooth.fwd_position(m, qpos)
        S = smooth.dof_subspace(m, kin)
        cvel = smooth.body_velocities(m, S, qvel)
        M = smooth.crba(m, kin, S)
        bias = smooth.rne_bias(m, kin, S, cvel, qvel)
        actu = smooth.actuation(m, qpos, qvel, act)
        qfrc_smooth = actu.qfrc + smooth.passive_force(m, qvel) - bias

        chol = jax.scipy.linalg.cho_factor(M, lower=True)
        qacc_smooth = jax.scipy.linalg.cho_solve(chol, qfrc_smooth)

        con = collision.collide(m, kin)
        efc = constraints.make_constraints(
            m, kin, S, con, qpos, qvel, max_contacts=max_contacts
        )
        from . import solver as _solver

        res = _solver.solve(m, M, qacc_smooth, efc, iterations=solver_iterations)

        cacc = smooth.body_accelerations(m, S, cvel, qvel, res.qacc)
        sens = sensors.evaluate(m, kin, cvel, cacc, qpos)

        return Forward(
            kin=kin,
            S=S,
            cvel=cvel,
            M=M,
            qacc=res.qacc,
            qfrc_smooth=qfrc_smooth,
            qfrc_constraint=res.qfrc_constraint,
            act_vel_deriv=actu.vel_deriv,
            sensordata=sens,
            ncon_active=jnp.sum(efc.active),
        )


def step(
    m: PhysicsModel,
    state: State,
    ctrl: jnp.ndarray,
    max_contacts: int = 24,
    solver_iterations: Optional[int] = None,
) -> State:
    """One physics step (mj_step semantics, implicitfast integrator)."""
    with jax.default_matmul_precision("highest"):
        h = m.timestep
        ctrl_c = smooth.clip_ctrl(m, ctrl)
        fwd = forward(
            m, state, ctrl_c, max_contacts=max_contacts,
            solver_iterations=solver_iterations,
        )
        qvel_new = integrator.implicit_velocity_update(
            m, fwd.M, state.qvel, fwd.qacc, fwd.act_vel_deriv, h
        )
        act_new = smooth.act_filter_exact(m, state.act, ctrl_c, h)
        qpos_new = integrator.integrate_pos(m, state.qpos, qvel_new, h)
        return State(
            qpos=qpos_new,
            qvel=qvel_new,
            act=act_new,
            time=state.time + h,
            sensordata=fwd.sensordata,
        )


def control_step(
    m: PhysicsModel,
    state: State,
    ctrl: jnp.ndarray,
    frame_skip: int,
    max_contacts: int = 24,
    solver_iterations: Optional[int] = None,
) -> State:
    """One *environment* step: frame_skip physics substeps under a constant
    control (the reference's frame-skipped loop, ``quadruped.py:163-165``)."""

    def body(s, _):
        return step(
            m, s, ctrl, max_contacts=max_contacts,
            solver_iterations=solver_iterations,
        ), None

    out, _ = jax.lax.scan(body, state, None, length=frame_skip)
    return out
