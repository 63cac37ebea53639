"""Typed config round-tripping."""

import jax.numpy as jnp

from quadruped_gym_tpu.runtime import config
from quadruped_gym_tpu.solvers.mppi import MPPIConfig
from quadruped_gym_tpu.solvers.rollout import RolloutConfig
from quadruped_gym_tpu.tasks.walking import WalkingConfig


def test_roundtrip_default():
    cfg = config.FrameworkConfig()
    d = config.to_dict(cfg)
    cfg2 = config.from_dict(d)
    assert cfg2.env == cfg.env
    assert cfg2.ppo == cfg.ppo
    assert cfg2.mpc.mppi == cfg.mpc.mppi


def test_roundtrip_modified(tmp_path):
    cfg = config.FrameworkConfig(
        env=WalkingConfig(max_time=20.0, frame_skip=10, obs_window=10,
                          partial_obs=True, dtype=jnp.float32),
        seed=7,
    )
    p = str(tmp_path / "cfg.json")
    config.save(p, cfg)
    cfg2 = config.load(p)
    assert cfg2.env.max_time == 20.0
    assert cfg2.env.frame_skip == 10
    assert cfg2.env.dtype is jnp.float32
    assert cfg2.seed == 7


def test_nested_override_from_dict():
    d = config.to_dict(config.FrameworkConfig())
    d["mpc"]["mppi"]["num_samples"] = 2048
    d["mpc"]["mppi"]["rollout"]["horizon"] = 30
    cfg = config.from_dict(d)
    assert cfg.mpc.mppi.num_samples == 2048
    assert cfg.mpc.mppi.rollout.horizon == 30
