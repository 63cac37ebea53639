"""Batched (lane-physics) task step vs the vmapped per-env task step.

``walking.batched_step`` keeps the task layer vmapped but routes the
physics substeps through the batch-minor leg/lane engine; agreement with
``vmap(walking.step)`` (whose engine is oracle-parity vs CPU MuJoCo)
validates the training-throughput path end to end, task semantics
included (estimator, settling mask, rewards, termination, PO obs).

Airborne, nonzero-velocity start states: through-contact fp chaos makes
different-but-equivalent XLA programs diverge at percent level, so smooth
flight is where exact agreement is provable (see tests/test_lane_engine.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadruped_gym_tpu.envs import vector_env
from quadruped_gym_tpu.models import spec
from quadruped_gym_tpu.tasks import walking

pytestmark = pytest.mark.slow  # multi-minute XLA compile; `make test` skips

B = 4


@pytest.fixture(scope="module")
def m():
    return spec.get_model(collision_geom_prefixes=spec.FEET_COLLISION_PREFIXES)


@pytest.fixture(scope="module")
def cfg():
    return walking.WalkingConfig(
        max_time=5.0, frame_skip=2, settling_time=0.1,
        random_controls=True, random_init=True,
        solver_iterations=8, dtype=jnp.float64,
    )


def _batched_reset(m, cfg, key):
    keys = jax.random.split(key, B)
    return jax.vmap(lambda k: walking.reset(m, cfg, k))(keys)


def _perturb_airborne(state, key):
    k1, k2 = jax.random.split(key)
    qpos = state.phys.qpos.at[:, 2].add(0.5)
    qpos = qpos + 0.02 * jax.random.normal(k1, qpos.shape, qpos.dtype)
    qvel = state.phys.qvel + 0.1 * jax.random.normal(
        k2, state.phys.qvel.shape, state.phys.qvel.dtype
    )
    return state._replace(phys=state.phys._replace(qpos=qpos, qvel=qvel))


def test_batched_step_matches_vmap_step(m, cfg):
    state, obs = _batched_reset(m, cfg, jax.random.PRNGKey(0))
    state = _perturb_airborne(state, jax.random.PRNGKey(1))
    action = 0.3 * jax.random.normal(
        jax.random.PRNGKey(2), (B, m.nu), jnp.float64
    )

    ref = jax.jit(
        jax.vmap(lambda st, a: walking.step(m, cfg, st, a))
    )(state, action)
    out = jax.jit(
        lambda st, a: walking.batched_step(
            m, cfg, st, a, newton_iterations=8, ls_iterations=12
        )
    )(state, action)

    np.testing.assert_allclose(np.asarray(out.obs), np.asarray(ref.obs),
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(out.reward), np.asarray(ref.reward),
                               rtol=1e-7, atol=1e-8)
    np.testing.assert_array_equal(np.asarray(out.terminated),
                                  np.asarray(ref.terminated))
    np.testing.assert_allclose(np.asarray(out.reward_components),
                               np.asarray(ref.reward_components),
                               rtol=1e-7, atol=1e-8)
    for name in ("qpos", "qvel", "act", "time"):
        np.testing.assert_allclose(
            np.asarray(getattr(out.state.phys, name)),
            np.asarray(getattr(ref.state.phys, name)),
            rtol=1e-8, atol=1e-10, err_msg=name,
        )
    np.testing.assert_allclose(
        np.asarray(out.state.ideal_position),
        np.asarray(ref.state.ideal_position), rtol=1e-12, atol=0,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-12
        ),
        out.state.est, ref.state.est,
    )


def test_batched_autoreset_runs_and_is_finite(m, cfg):
    state, obs = _batched_reset(m, cfg, jax.random.PRNGKey(3))
    step = jax.jit(
        lambda st, a: vector_env.batched_autoreset_step(m, cfg, st, a)
    )
    for i in range(3):
        action = 0.2 * jax.random.normal(
            jax.random.PRNGKey(10 + i), (B, m.nu), jnp.float64
        )
        out = step(state, action)
        state = out.state
    assert np.isfinite(np.asarray(out.obs)).all()
    assert np.isfinite(np.asarray(out.reward)).all()
    assert out.obs.shape == (B, walking.obs_size(cfg, m))
