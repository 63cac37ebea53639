"""iLQR solver tests: FD linearization sanity + cost descent."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadruped_gym_tpu.models import spec
from quadruped_gym_tpu.physics import engine
from quadruped_gym_tpu.solvers import ilqr, rollout
from quadruped_gym_tpu.tasks import commands

pytestmark = pytest.mark.slow  # multi-minute XLA compile; `make test` skips


@pytest.fixture(scope="module")
def m():
    return spec.get_model(collision_geom_prefixes=spec.MPC_COLLISION_PREFIXES)


def test_state_add_diff_roundtrip(m):
    st = engine.make_state(m, dtype=jnp.float64)
    dx = 0.01 * jax.random.normal(jax.random.PRNGKey(0), (ilqr.tangent_dim(m),), jnp.float64)
    st2 = ilqr.state_add(m, st, dx)
    rec = ilqr.state_diff(m, st2, st)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(dx), atol=1e-9)


def test_smooth_sensordata_matches_step_sensors(m):
    st = engine.make_state(m, dtype=jnp.float64)
    st = st._replace(qvel=st.qvel.at[0].set(0.1))
    stepped = engine.step(m, st, jnp.zeros(m.nu, jnp.float64),
                          max_contacts=8, solver_iterations=2)
    smooth_sens = ilqr.smooth_sensordata(m, st)
    # step() reads sensors at the PRE-integration state == st
    ref = np.asarray(stepped.sensordata)
    got = np.asarray(smooth_sens)
    # all slots except the accelerometer (12:15) must agree exactly
    mask = np.ones(m.nsensordata, bool)
    mask[12:15] = False
    np.testing.assert_allclose(got[mask], ref[mask], rtol=1e-9, atol=1e-12)


def test_ilqr_reduces_cost(m):
    cfg = ilqr.ILQRConfig(
        iterations=2,
        rollout=rollout.RolloutConfig(horizon=4, frame_skip=1,
                                      max_contacts=8, solver_iterations=2),
        alphas=(1.0, 0.3, 0.1, 0.03, 0.0),
    )
    cost_fn = rollout.make_cost_fn(m)
    state0 = engine.make_state(m, dtype=jnp.float64)
    cmd = commands.make(jnp.array([0.2, 0.0]), jnp.array(0.0))
    prev = jnp.asarray(np.array([0.0, 0.0, -0.5] * 4), jnp.float64)
    # deliberately bad initial guess
    us0 = jnp.tile(jnp.asarray(np.array([0.4, -0.4, 0.3] * 4)), (4, 1))

    res = jax.jit(
        lambda s, u: ilqr.solve(m, cfg, cost_fn, s, u, cmd, prev)
    )(state0, us0)
    assert np.isfinite(float(res.cost))
    assert float(res.cost) <= float(res.initial_cost) + 1e-9
    assert float(res.cost) < float(res.initial_cost) - 1.0, (
        f"no meaningful descent: {float(res.initial_cost)} -> {float(res.cost)}"
    )
    # controls respect the actuator box
    lo = np.asarray(m.actuator_ctrlrange[:, 0])
    hi = np.asarray(m.actuator_ctrlrange[:, 1])
    u = np.asarray(res.ctrl_seq)
    assert (u >= lo - 1e-9).all() and (u <= hi + 1e-9).all()


def test_ad_linearize_matches_fd_smooth_regime(m):
    """jacfwd linearization == central FD in the contact-free (airborne)
    regime, where the dynamics are smooth and FD is trustworthy. At
    contact-rich states FD straddles the solver's branch switches
    (O(1/eps) artifacts), which is exactly why AD is the default — so
    the equivalence check must run where both are well-posed."""
    st = engine.make_state(m, dtype=jnp.float64)  # reset pose is airborne
    rcfg = rollout.RolloutConfig(horizon=2, frame_skip=1,
                                 max_contacts=8, solver_iterations=2)

    def step_fn(s, u):
        return engine.control_step(m, s, u, rcfg.frame_skip,
                                   max_contacts=rcfg.max_contacts,
                                   solver_iterations=rcfg.solver_iterations)

    us = jnp.tile(jnp.asarray(np.array([0.1, -0.2, 0.3] * 4)), (2, 1))

    def traj(us):
        def body(s, u):
            s2 = step_fn(s, u)
            return s2, s2
        _, states = jax.lax.scan(body, st, us)
        return states

    states = jax.jit(traj)(us)
    A_ad, B_ad = jax.jit(
        lambda s, u: ilqr.ad_linearize(m, step_fn, st, s, u)
    )(states, us)
    A_fd, B_fd = jax.jit(
        lambda s, u: ilqr.fd_linearize(m, step_fn, st, s, u, 1e-6)
    )(states, us)
    assert not np.isnan(np.asarray(A_ad)).any()
    assert not np.isnan(np.asarray(B_ad)).any()
    np.testing.assert_allclose(np.asarray(A_ad), np.asarray(A_fd),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(B_ad), np.asarray(B_fd),
                               rtol=2e-4, atol=2e-5)
