"""SQP trajectory optimization with condensed horizon-block QPs.

The gradient-based large-step companion to iLQR (BASELINE config 4:
"iLQR/SQP contact-implicit gait optimization, horizon-block QP condensed
via ICI all-reduce"). Where iLQR's Riccati recursion is inherently
sequential in the horizon, SQP *condenses* the linearized problem down to
the controls and solves one dense box-constrained QP per iteration:

    min_du  0.5 du' Hqp du + g' du,   lo <= u + du <= hi
    Hqp = sum_t F_t' lxx_t F_t + blkdiag(luu_t) + reg I
    g   = sum_t F_t' lx_t + [lu_t]

with F_t = d x_{t+1} / d(u_0..u_{H-1}) the state-control sensitivities
(dx_{t+1} = A_t dx_t + B_t du_t). The sum over t is the horizon-block
reduction: each device condenses its own time slice and one ``psum``
over the mesh axis assembles the full (H*nu, H*nu) Hessian — this is the
ICI all-reduce of BASELINE config 4, exercised on a virtual device mesh
in tests/test_sqp.py.

TPU mapping: linearization is the same batched central-FD as iLQR
(``H x 2 x (nx + nu)`` physics steps, pure data parallelism); the
sensitivity propagation is a ``lax.scan`` of (nx, H*nu) matmuls on the
MXU; condensation terms are (H*nu, nx) x (nx, nx) x (nx, H*nu) matmuls
(MXU); the box QP solves by ADMM — one Cholesky factorization of
Hqp + rho I per SQP iteration, then fixed-count triangular solves with a
closed-form box projection, all static shapes.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.spec import PhysicsModel
from ..physics import engine
from ..tasks.commands import Command
from . import ilqr as ilqr_mod
from . import rollout as rollout_mod


@dataclasses.dataclass(frozen=True)
class SQPConfig:
    iterations: int = 6
    rollout: rollout_mod.RolloutConfig = rollout_mod.RolloutConfig()
    linearize: str = "ad"  # 'ad' (exact branch tangents) | 'fd' (central FD)
    fd_eps: float = 1e-5
    reg: float = 1e-3  # Levenberg damping on the condensed Hessian
    qp_iterations: int = 25  # ADMM iterations per QP
    alphas: tuple = (1.0, 0.5, 0.25, 0.1, 0.03, 0.01)


class SQPResult(NamedTuple):
    ctrl_seq: jnp.ndarray  # (H, nu) optimized, clamped
    cost: jnp.ndarray
    initial_cost: jnp.ndarray
    cost_history: jnp.ndarray  # (iterations,) cost after each SQP iteration


def sensitivities(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """F (H, nx, H*nu): F[t] = d x_{t+1} / d u_flat.

    dx_0 = 0; dx_{t+1} = A_t dx_t + B_t du_t, so
    F[t] = A_t F[t-1] + e_t (x) B_t."""
    H, nx, nu = B.shape
    eye_H = jnp.eye(H, dtype=B.dtype)

    def body(F_prev, inp):
        A_t, B_t, onehot = inp
        F_t = A_t @ F_prev.reshape(nx, H * nu)
        F_t = F_t.reshape(nx, H, nu) + B_t[:, None, :] * onehot[None, :, None]
        return F_t, F_t

    F0 = jnp.zeros((nx, H, nu), B.dtype)
    _, F = jax.lax.scan(body, F0, (A, B, eye_H))
    return F.reshape(H, nx, H * nu)


def condense(
    F: jnp.ndarray,  # (H, nx, H*nu)
    lx: jnp.ndarray,  # (H, nx)
    lxx: jnp.ndarray,  # (H, nx, nx)
    axis_name: Optional[str] = None,
):
    """(Hqp (H*nu, H*nu), g (H*nu,)) — the horizon-block reduction of the
    state-cost terms (the separable control blocks are added by
    ``_add_control_blocks``).

    With ``axis_name`` set (inside shard_map over the horizon axis), each
    device sums its local time blocks and a single psum assembles the
    full condensed system over ICI."""

    def term(F_t, lx_t, lxx_t):
        return F_t.T @ lx_t, F_t.T @ (lxx_t @ F_t)

    gs, Hs = jax.vmap(term)(F, lx, lxx)
    g = jnp.sum(gs, axis=0)
    Hqp = jnp.sum(Hs, axis=0)
    if axis_name is not None:
        g = jax.lax.psum(g, axis_name)
        Hqp = jax.lax.psum(Hqp, axis_name)
    return Hqp, g


def _add_control_blocks(Hqp, g, lu, luu, t_offset=0):
    """Add the separable control-cost blocks blkdiag(luu), [lu]."""
    H, nu = lu.shape
    HU = Hqp.shape[0]
    g = g.at[t_offset * nu : (t_offset + H) * nu].add(lu.reshape(-1))
    for_idx = (t_offset + jnp.arange(H)) * nu

    def add_block(Hqp, i):
        r = for_idx[i]
        return jax.lax.dynamic_update_slice(
            Hqp,
            jax.lax.dynamic_slice(Hqp, (r, r), (nu, nu)) + luu[i],
            (r, r),
        ), None

    Hqp, _ = jax.lax.scan(add_block, Hqp, jnp.arange(H))
    return Hqp, g


def admm_box_qp(
    Hqp: jnp.ndarray,  # (n, n) PSD
    g: jnp.ndarray,  # (n,)
    lo: jnp.ndarray,  # (n,) box on the decision variable
    hi: jnp.ndarray,
    iterations: int = 25,
    rho: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """min 0.5 x'Hx + g'x  s.t. lo <= x <= hi, by ADMM.

    One Cholesky of (H + rho I), then fixed-count solves; the z-update is
    the closed-form box projection. Static shapes, no branching."""
    n = g.shape[0]
    dt = g.dtype
    if rho is None:
        rho = jnp.maximum(jnp.mean(jnp.diag(Hqp)), 1e-8)
    M = Hqp + rho * jnp.eye(n, dtype=dt)
    L = jnp.linalg.cholesky(M + 1e-9 * jnp.eye(n, dtype=dt))

    def body(carry, _):
        x, z, w = carry
        x = jax.scipy.linalg.cho_solve((L, True), rho * (z - w) - g)
        z = jnp.clip(x + w, lo, hi)
        w = w + x - z
        return (x, z, w), None

    z0 = jnp.clip(-g / jnp.maximum(jnp.diag(Hqp), 1e-8), lo, hi)
    (x, z, w), _ = jax.lax.scan(
        body, (z0, z0, jnp.zeros_like(z0)), None, length=iterations
    )
    return z  # the feasible iterate


def solve(
    m: PhysicsModel,
    cfg: SQPConfig,
    cost_fn: rollout_mod.CostFn,
    state0: engine.State,
    ctrl_seq: jnp.ndarray,  # (H, nu) initial guess
    cmd: Command,
    prev_ctrl0: jnp.ndarray,
    mesh: Optional[jax.sharding.Mesh] = None,
    axis_name: str = "horizon",
) -> SQPResult:
    """SQP solve. With ``mesh`` given, the condensation reduction shards
    the horizon axis across the mesh's ``axis_name`` devices (psum over
    ICI); otherwise it runs single-device."""
    H, nu = ctrl_seq.shape
    nx = ilqr_mod.tangent_dim(m)
    dt = ctrl_seq.dtype
    rcfg = cfg.rollout

    lo_u = jnp.asarray(np.asarray(m.actuator_ctrlrange[:, 0]), dt)
    hi_u = jnp.asarray(np.asarray(m.actuator_ctrlrange[:, 1]), dt)

    def step_fn(st, u):
        return engine.control_step(
            m, st, u, rcfg.frame_skip,
            max_contacts=rcfg.max_contacts,
            solver_iterations=rcfg.solver_iterations,
        )

    def traj_rollout(us):
        def body(carry, u):
            st, prev = carry
            st2 = step_fn(st, u)
            c = cost_fn(st2.sensordata, u, prev, cmd)
            return (st2, u), (st2, c)

        (_, _), (states, costs) = jax.lax.scan(body, (state0, prev_ctrl0), us)
        return states, jnp.sum(costs)

    # linearization (AD default; see ilqr.ad_linearize on why FD is unsound
    # across contact-branch switches) + AD cost expansion shared with iLQR
    def linearize(states, us):
        return ilqr_mod.make_linearizer(cfg.linearize)(
            m, step_fn, state0, states, us, cfg.fd_eps
        )

    def cost_expansion(states, us):
        return ilqr_mod.quadratize_cost(m, cost_fn, cmd, states, us,
                                        prev_ctrl0)

    def condense_full(F, lx, lxx):
        if mesh is None:
            return condense(F, lx, lxx, axis_name=None)
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        n_dev = mesh.devices.size
        pad = (-H) % n_dev
        Fp = jnp.pad(F, ((0, pad), (0, 0), (0, 0)))
        lxp = jnp.pad(lx, ((0, pad), (0, 0)))
        lxxp = jnp.pad(lxx, ((0, pad), (0, 0), (0, 0)))
        fn = shard_map(
            lambda f, a, b: condense(f, a, b, axis_name=axis_name),
            mesh=mesh,
            in_specs=(P(axis_name), P(axis_name), P(axis_name)),
            out_specs=(P(), P()),
        )
        return fn(Fp, lxp, lxxp)

    def iteration(carry, _):
        us, states, cost = carry
        A, B = linearize(states, us)
        lx, lxx, lu, luu = cost_expansion(states, us)
        F = sensitivities(A, B)
        Hqp, g = condense_full(F, lx, lxx)
        Hqp, g = _add_control_blocks(Hqp, g, lu, luu)
        Hqp = Hqp + cfg.reg * jnp.eye(H * nu, dtype=dt)
        # PSD safeguard: symmetric part only
        Hqp = 0.5 * (Hqp + Hqp.T)

        lo = jnp.tile(lo_u, H) - us.reshape(-1)
        hi = jnp.tile(hi_u, H) - us.reshape(-1)
        du = admm_box_qp(Hqp, g, lo, hi, iterations=cfg.qp_iterations)
        # an overflowed condensation (f32 sensitivity products) NaNs the
        # Cholesky; a zero step keeps the incumbent instead of stalling on
        # NaN comparisons forever
        du = jnp.where(jnp.isfinite(du), du, 0.0)
        du = du.reshape(H, nu)

        alphas = jnp.asarray(cfg.alphas, dt)

        def try_alpha(a):
            cand = jnp.clip(us + a * du, lo_u, hi_u)
            sts, c = traj_rollout(cand)
            return cand, sts, c

        cand_us, cand_states, cand_cost = jax.vmap(try_alpha)(alphas)
        cand_cost = jnp.where(jnp.isnan(cand_cost), jnp.inf, cand_cost)
        best = jnp.argmin(cand_cost)
        improved = cand_cost[best] < cost
        us_new = jnp.where(improved, cand_us[best], us)
        cost_new = jnp.where(improved, cand_cost[best], cost)
        # the line search already rolled out every candidate — carry the
        # winner's states instead of re-rolling them out next iteration
        states_new = jax.tree.map(
            lambda cand, old: jnp.where(improved, cand[best], old),
            cand_states, states,
        )
        return (us_new, states_new, cost_new), cost_new

    us0 = jnp.clip(ctrl_seq, lo_u, hi_u)
    states0, cost0 = traj_rollout(us0)
    (us, _, cost), cost_hist = jax.lax.scan(
        iteration, (us0, states0, cost0), None, length=cfg.iterations
    )
    return SQPResult(
        ctrl_seq=us, cost=cost, initial_cost=cost0, cost_history=cost_hist
    )
