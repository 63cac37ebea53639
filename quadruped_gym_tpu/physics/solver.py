"""Primal Newton solver for MuJoCo's convex soft-constraint problem.

Solves  min_x  0.5 (x - a)' M (x - a) + 0.5 sum_i D_i [min(0, (Jx - aref)_i)]^2

over qacc, where every row (joint limits, pyramidal contact facets) is
one-sided. The problem is strictly convex (M is PD), so the minimizer is
unique — any solver converging to tolerance reproduces MuJoCo's Newton
solution bit-for-bit at f64, independent of warmstart.

TPU-first: fixed iteration bounds via lax.while_loop, exact Hessian with an
18x18 Cholesky per iteration, and an inner 1-D Newton line search over the
piecewise-quadratic restriction. All shapes static; inactive rows carry D=0.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from ..models.spec import PhysicsModel
from .constraints import ConstraintSet


class SolveResult(NamedTuple):
    qacc: jnp.ndarray  # (nv,)
    qfrc_constraint: jnp.ndarray  # (nv,)
    efc_force: jnp.ndarray  # (nrow,)
    niter: jnp.ndarray  # ()


def solve(
    m: PhysicsModel,
    M: jnp.ndarray,
    qacc_smooth: jnp.ndarray,
    efc: ConstraintSet,
    iterations: int | None = None,
    tolerance: float | None = None,
    ls_iterations: int = 12,
) -> SolveResult:
    dt = qacc_smooth.dtype
    J, aref, D = efc.J, efc.aref, efc.D
    iterations = m.solver_iterations if iterations is None else iterations
    tolerance = tolerance if tolerance is not None else m.solver_tolerance

    if iterations == 0:  # constraint-free fast path (benchmarks/ablations)
        nrow = J.shape[0]
        return SolveResult(
            qacc=qacc_smooth,
            qfrc_constraint=jnp.zeros_like(qacc_smooth),
            efc_force=jnp.zeros(nrow, dtype=dt),
            niter=jnp.asarray(0),
        )

    # scale for the termination criterion (mirrors MuJoCo's meaninertia-based
    # scaling loosely; exactness of the optimum does not depend on it)
    scale = jnp.maximum(jnp.asarray(1.0, dt), jnp.linalg.norm(M @ qacc_smooth))

    def grad_hess_parts(x):
        jar = J @ x - aref
        act = (jar < 0.0) & (D > 0.0)
        w = jnp.where(act, D, 0.0)
        g = M @ (x - qacc_smooth) + J.T @ (w * jar)
        return jar, w, g

    def cond(carry):
        x, it, done = carry
        return (~done) & (it < iterations)

    def body(carry):
        x, it, _ = carry
        jar, w, g = grad_hess_parts(x)
        H = M + (J.T * w) @ J
        chol = jsl.cho_factor(H, lower=True)
        dx = -jsl.cho_solve(chol, g)

        # exact-ish line search: phi'(t) is piecewise linear; 1-D Newton
        Jdx = J @ dx
        mdx = M @ dx
        g0 = dx @ (M @ (x - qacc_smooth))
        h0 = dx @ mdx

        def ls_body(t, _):
            jar_t = jar + t * Jdx
            act = (jar_t < 0.0) & (D > 0.0)
            w_t = jnp.where(act, D, 0.0)
            dphi = g0 + t * h0 + jnp.sum(w_t * jar_t * Jdx)
            ddphi = h0 + jnp.sum(w_t * Jdx * Jdx)
            t_new = t - dphi / jnp.maximum(ddphi, 1e-30)
            return jnp.clip(t_new, 0.0, 4.0), None

        t = jnp.asarray(1.0, dt)
        t, _ = jax.lax.scan(lambda c, _: ls_body(c, None), t, None, length=ls_iterations)
        x_new = x + t * dx

        _, _, g_new = grad_hess_parts(x_new)
        done = jnp.linalg.norm(g_new) < tolerance * scale
        # safeguard: no progress
        done = done | (jnp.linalg.norm(t * dx) < 1e-14)
        return x_new, it + 1, done

    x0 = qacc_smooth
    jar0, _, g0 = grad_hess_parts(x0)
    done0 = jnp.linalg.norm(g0) < tolerance * scale
    x, niter, _ = jax.lax.while_loop(cond, body, (x0, jnp.asarray(0), done0))

    jar = J @ x - aref
    force = jnp.where((jar < 0.0) & (D > 0.0), -D * jar, 0.0)
    qfrc = J.T @ force
    return SolveResult(qacc=x, qfrc_constraint=qfrc, efc_force=force, niter=niter)
