"""Data-parallel PPO over the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadruped_gym_tpu import parallel
from quadruped_gym_tpu.models import spec
from quadruped_gym_tpu.rl import distributed, ppo
from quadruped_gym_tpu.tasks import walking


@pytest.fixture(scope="module")
def setup(cpu_devices):
    m = spec.get_model(collision_geom_prefixes=spec.MPC_COLLISION_PREFIXES)
    env_cfg = walking.WalkingConfig(
        max_time=0.5, frame_skip=4, random_controls=True,
        max_contacts=12, solver_iterations=2,
    )
    cfg = ppo.PPOConfig(num_envs=16, num_steps=4, epochs=1,
                        num_minibatches=2, hidden=(16,))
    mesh = parallel.make_mesh(cpu_devices[:8],
                              axis_names=(parallel.DATA_AXIS,))
    return m, env_cfg, cfg, mesh


@pytest.mark.slow
def test_distributed_update_runs_and_replicates(setup):
    m, env_cfg, cfg, mesh = setup
    ts = distributed.init_distributed_train_state(
        m, env_cfg, cfg, jax.random.PRNGKey(0), mesh
    )
    upd = jax.jit(distributed.make_distributed_update(m, env_cfg, cfg, mesh))
    ts2, metrics = upd(ts)
    assert int(ts2.update_idx) == 1
    for leaf in jax.tree.leaves(metrics):
        assert np.isfinite(np.asarray(leaf)).all()
    # params moved and are consistent across the mesh (gradients pmean'd)
    delta = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), ts.params, ts2.params)))
    assert delta > 0
    # a second update chains (replicated carry stays valid)
    ts3, _ = upd(ts2)
    assert int(ts3.update_idx) == 2
