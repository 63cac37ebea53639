"""PPO training-loop smoke + learning tests (tiny configs, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadruped_gym_tpu.models import spec
from quadruped_gym_tpu.rl import ppo
from quadruped_gym_tpu.tasks import walking


@pytest.fixture(scope="module")
def m():
    return spec.get_model(collision_geom_prefixes=spec.MPC_COLLISION_PREFIXES)


@pytest.fixture(scope="module")
def env_cfg():
    return walking.WalkingConfig(
        max_time=0.8, frame_skip=4, random_controls=True,
        max_contacts=12, solver_iterations=4,
    )


@pytest.mark.slow
def test_train_chunk_runs_and_metrics_finite(m, env_cfg):
    cfg = ppo.PPOConfig(num_envs=8, num_steps=8, epochs=2, num_minibatches=2,
                        hidden=(32, 32))
    ts = ppo.init_train_state(m, env_cfg, cfg, jax.random.PRNGKey(0))
    ts2, metrics = jax.jit(
        lambda t: ppo.train_chunk(m, env_cfg, cfg, t, num_updates=2)
    )(ts)
    assert int(ts2.update_idx) == 2
    assert metrics.mean_reward.shape == (2,)
    assert metrics.reward_components.shape[0] == 2
    assert metrics.reward_components.shape[-1] == 11
    for leaf in jax.tree.leaves(metrics):
        assert np.isfinite(np.asarray(leaf)).all()
    # params actually moved
    d = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), ts.params, ts2.params
    )
    assert max(jax.tree.leaves(d)) > 0.0


@pytest.mark.slow
def test_update_is_deterministic(m, env_cfg):
    cfg = ppo.PPOConfig(num_envs=4, num_steps=4, epochs=1, num_minibatches=1,
                        hidden=(16,))
    ts = ppo.init_train_state(m, env_cfg, cfg, jax.random.PRNGKey(1))
    f = jax.jit(lambda t: ppo.train_chunk(m, env_cfg, cfg, t, 1))
    _, m1 = f(ts)
    _, m2 = f(ts)
    np.testing.assert_array_equal(np.asarray(m1.mean_reward),
                                  np.asarray(m2.mean_reward))
