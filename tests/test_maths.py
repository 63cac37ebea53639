"""AD-correctness regression tests for the math primitives the exact
solvers (iLQR / SQP) differentiate through.

Round-1 advisor finding (high severity): the where-guarded axis/angle form
of ``quat_integrate`` had an identically-zero AD Jacobian w.r.t. omega at
omega == 0 — exactly where ``ilqr.quadratize_cost`` evaluates it (dx == 0
through ``state_add``) — so orientation/heading/flip cost gradients never
reached the backward pass.  These tests pin the fixed Jacobians against
central finite differences.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadruped_gym_tpu.physics import maths
from quadruped_gym_tpu.tasks import rewards

DT = 0.002


def _fd_jac(f, x, eps=1e-6):
    x = np.asarray(x, np.float64)
    cols = []
    for i in range(x.size):
        d = np.zeros_like(x)
        d[i] = eps
        cols.append((np.asarray(f(x + d)) - np.asarray(f(x - d))) / (2 * eps))
    return np.stack(cols, axis=-1)


class TestQuatIntegrateJacobian:
    def test_jacobian_at_zero_omega_is_half_dt(self):
        q = jnp.array([1.0, 0.0, 0.0, 0.0])
        jac = jax.jacobian(lambda w: maths.quat_integrate(q, w, DT))(
            jnp.zeros(3)
        )
        # d(dq_vec)/d(omega) = 0.5*dt*I at omega = 0 (exponential map); the
        # scalar row is zero.  The round-1 bug returned all-zeros here.
        expect = np.zeros((4, 3))
        expect[1:, :] = 0.5 * DT * np.eye(3)
        np.testing.assert_allclose(np.asarray(jac), expect, atol=1e-12)

    def test_jacobian_matches_fd_at_zero(self):
        q = maths.quat_normalize(jnp.array([0.9, 0.1, -0.2, 0.3]))
        f = lambda w: maths.quat_integrate(q, jnp.asarray(w), DT)
        jac = np.asarray(jax.jacobian(f)(jnp.zeros(3)))
        np.testing.assert_allclose(jac, _fd_jac(f, np.zeros(3)), atol=1e-8)

    @pytest.mark.parametrize("omega", [[0.3, -1.2, 0.7], [5.0, 0.0, 0.0]])
    def test_jacobian_matches_fd_away_from_zero(self, omega):
        q = maths.quat_normalize(jnp.array([0.9, 0.1, -0.2, 0.3]))
        f = lambda w: maths.quat_integrate(q, jnp.asarray(w), DT)
        jac = np.asarray(jax.jacobian(f)(jnp.asarray(omega, jnp.float64)))
        np.testing.assert_allclose(
            jac, _fd_jac(f, omega, eps=1e-7), atol=1e-7
        )

    def test_primal_value_unchanged_in_small_angle_region(self):
        # The Taylor guard must not perturb primal values: for
        # |omega|*dt/2 < 1e-9, sin(x) == x and cos(x) == 1 bitwise.
        q = maths.quat_normalize(jnp.array([0.9, 0.1, -0.2, 0.3]))
        w = jnp.array([1e-7, -2e-7, 5e-8])  # inside the guard for dt=0.002
        got = maths.quat_integrate(q, w, DT)
        # exact exponential map in float64, computed independently
        angle = np.linalg.norm(np.asarray(w))
        axis = np.asarray(w) / angle
        half = 0.5 * DT * angle
        dq = np.concatenate([[np.cos(half)], axis * np.sin(half)])
        qn = np.asarray(q, np.float64)
        expect = np.array(
            [
                qn[0] * dq[0] - qn[1] * dq[1] - qn[2] * dq[2] - qn[3] * dq[3],
                qn[0] * dq[1] + qn[1] * dq[0] + qn[2] * dq[3] - qn[3] * dq[2],
                qn[0] * dq[2] - qn[1] * dq[3] + qn[2] * dq[0] + qn[3] * dq[1],
                qn[0] * dq[3] + qn[1] * dq[2] - qn[2] * dq[1] + qn[3] * dq[0],
            ]
        )
        expect /= np.linalg.norm(expect)
        np.testing.assert_allclose(np.asarray(got), expect, atol=1e-15)


class TestUnitJacobian:
    def test_gradient_zero_at_origin(self):
        jac = jax.jacobian(rewards.unit)(jnp.zeros(2))
        np.testing.assert_array_equal(np.asarray(jac), np.zeros((2, 2)))

    def test_gradient_bounded_below_threshold(self):
        # Round-1 bug: ~1e30 entries for tiny-but-nonzero x.
        jac = np.asarray(jax.jacobian(rewards.unit)(jnp.full(2, 1e-9)))
        assert np.all(np.abs(jac) < 1e7)

    def test_gradient_matches_fd_above_threshold(self):
        x = np.array([0.3, -0.1])
        jac = np.asarray(jax.jacobian(rewards.unit)(jnp.asarray(x)))
        fd = _fd_jac(lambda v: rewards.unit(jnp.asarray(v)), x, eps=1e-7)
        np.testing.assert_allclose(jac, fd, atol=1e-6)

    def test_primal_unchanged(self):
        x = jnp.array([0.3, -0.4])
        np.testing.assert_allclose(
            np.asarray(rewards.unit(x)), np.asarray(x) / 0.5, rtol=1e-15
        )
        np.testing.assert_array_equal(
            np.asarray(rewards.unit(jnp.zeros(2))), np.zeros(2)
        )

    def test_hessian_through_dot_is_finite(self):
        # the shape quadratize_cost actually builds: unit(v) @ unit(c)
        c = jnp.array([0.2, 0.0])
        f = lambda v: rewards.unit(v) @ rewards.unit(c)
        for v0 in (jnp.zeros(2), jnp.full(2, 1e-9), jnp.array([0.1, 0.05])):
            h = np.asarray(jax.hessian(f)(v0))
            assert np.all(np.isfinite(h))
            assert np.all(np.abs(h) < 1e7)
