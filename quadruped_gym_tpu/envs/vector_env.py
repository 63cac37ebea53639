"""Vectorized walking environment: the TPU-native replacement for the
reference's 10-process ``SubprocVecEnv`` (``train_quadruped.py:49-50``).

One ``vmap`` over the functional task puts thousands of environments on a
single chip; auto-reset keeps the batch dense. Persistent carries behave as
in the reference: the frequency estimator and the frozen control-cost
reference survive episode boundaries.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.spec import PhysicsModel
from ..tasks import walking


class VectorStepOutput(NamedTuple):
    state: walking.WalkingState  # batched pytree
    obs: jnp.ndarray  # (N, obs_dim)
    reward: jnp.ndarray  # (N,)
    done: jnp.ndarray  # (N,)
    reward_components: jnp.ndarray  # (N, 11)


def autoreset_step(
    m: PhysicsModel, cfg: walking.WalkingConfig, st: walking.WalkingState,
    action: jnp.ndarray,
) -> VectorStepOutput:
    """One per-sample step with auto-reset on termination (vmap-able).

    The returned reward/done describe the step that just happened; the state
    and obs are post-reset when the episode ended. Persistent carries (the
    frequency estimator and the frozen control-cost reference) survive the
    reset, matching the reference env's behavior across episodes."""
    out = walking.step(m, cfg, st, action)
    key, sub = jax.random.split(out.state.key)
    fresh, fresh_obs = walking.reset(
        m, cfg, sub, persistent=(out.state.est, out.state.rew)
    )
    fresh = fresh._replace(key=key)
    done = out.terminated
    new_state = jax.tree.map(lambda a, b: jnp.where(done, a, b), fresh, out.state)
    obs = jnp.where(done, fresh_obs, out.obs)
    return VectorStepOutput(
        state=new_state,
        obs=obs,
        reward=out.reward,
        done=done,
        reward_components=out.reward_components,
    )


def batched_autoreset_step(
    m: PhysicsModel, cfg: walking.WalkingConfig, st: walking.WalkingState,
    action: jnp.ndarray, engine_impl: str = "auto",
) -> VectorStepOutput:
    """``vmap(autoreset_step)`` semantics with physics through the
    batch-minor lane/leg engine (see ``walking.batched_step``) — the
    training-throughput path. The reset branch (no physics) stays vmapped."""
    out = walking.batched_step(m, cfg, st, action, engine_impl=engine_impl)

    def _fresh_one(key, est, rew):
        key, sub = jax.random.split(key)
        fresh, fresh_obs = walking.reset(m, cfg, sub, persistent=(est, rew))
        return fresh._replace(key=key), fresh_obs

    fresh, fresh_obs = jax.vmap(_fresh_one)(
        out.state.key, out.state.est, out.state.rew
    )
    done = out.terminated

    def _sel(a, b):
        mask = done.reshape(done.shape + (1,) * (a.ndim - 1))
        return jnp.where(mask, a, b)

    new_state = jax.tree.map(_sel, fresh, out.state)
    obs = _sel(fresh_obs, out.obs)
    return VectorStepOutput(
        state=new_state,
        obs=obs,
        reward=out.reward,
        done=done,
        reward_components=out.reward_components,
    )


class VectorWalkingEnv:
    """Batched auto-resetting environment with jitted reset/step."""

    def __init__(self, m: PhysicsModel, cfg: walking.WalkingConfig,
                 num_envs: int, lane_physics: bool = False):
        self.m = m
        self.cfg = cfg
        self.num_envs = num_envs
        self.obs_size = walking.obs_size(cfg, m)

        def _reset_one(key):
            return walking.reset(m, cfg, key)

        self._reset = jax.jit(jax.vmap(_reset_one))
        if lane_physics:
            self._step = jax.jit(
                lambda st, a: batched_autoreset_step(m, cfg, st, a)
            )
        else:
            self._step = jax.jit(
                jax.vmap(lambda st, a: autoreset_step(m, cfg, st, a))
            )

    def reset(self, key: jax.Array):
        keys = jax.random.split(key, self.num_envs)
        return self._reset(keys)

    def step(self, state, actions: jnp.ndarray) -> VectorStepOutput:
        return self._step(state, actions)
