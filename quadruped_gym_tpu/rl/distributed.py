"""Data-parallel PPO across a device mesh.

The reference's only parallelism is 10 env processes on one host
(``train_quadruped.py:49-50``). Here the env batch shards over the mesh's
``data`` axis — each chip rolls out and evaluates its own env slice — and
the ONLY cross-chip traffic is one gradient pmean per minibatch riding ICI
(plus nothing else: GAE, advantage normalization and the epoch permutation
are computed per shard, which is standard sharded-PPO practice).

Multi-host: call ``jax.distributed.initialize()`` before building the mesh
and pass all processes' devices; the same shard_map program then spans
hosts with gradient reductions crossing DCN only between slices.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..models.spec import PhysicsModel
from ..parallel.mesh import DATA_AXIS
from ..tasks import walking
from . import ppo


def make_distributed_update(
    m: PhysicsModel,
    env_cfg: walking.WalkingConfig,
    cfg: ppo.PPOConfig,
    mesh: Mesh,
    axis: str = DATA_AXIS,
):
    """One sharded PPO update: TrainState -> (TrainState, UpdateMetrics).

    ``cfg.num_envs`` is the GLOBAL env count; it must divide by the data
    axis size. Params/opt state are replicated, env state and obs are
    sharded on the env dim, and metrics come back replicated (pmean)."""
    ndata = mesh.shape[axis]
    if cfg.num_envs % ndata:
        raise ValueError(
            f"num_envs={cfg.num_envs} not divisible by data axis {ndata}"
        )
    local_cfg = ppo.PPOConfig(
        **{**cfg.__dict__, "num_envs": cfg.num_envs // ndata}
    )
    update = ppo.update_fn(m, env_cfg, local_cfg, axis_name=axis)

    def sharded(ts: ppo.TrainState):
        # decorrelate RNG across shards (rollout noise, permutation); the
        # carried key stays REPLICATED: every shard advances the same
        # global key, and the per-shard stream is re-derived each call
        idx = jax.lax.axis_index(axis)
        global_key = ts.key
        shard_key = jax.random.fold_in(global_key, idx)
        new_ts, metrics = update(ts._replace(key=shard_key))
        metrics = jax.tree.map(lambda x: jax.lax.pmean(x, axis), metrics)
        new_ts = new_ts._replace(key=jax.random.split(global_key, 2)[1])
        return new_ts, metrics

    rep = P()
    env_sharded = P(axis)
    # pytree-prefix specs: one spec per TrainState field
    in_specs = ppo.TrainState(
        params=rep, opt_state=rep, env_state=env_sharded,
        obs=env_sharded, key=rep, update_idx=rep,
    )
    out_specs = (in_specs, rep)
    fn = shard_map(
        sharded, mesh=mesh, in_specs=(in_specs,), out_specs=out_specs,
        check_vma=False,
    )
    return fn


def init_distributed_train_state(
    m: PhysicsModel,
    env_cfg: walking.WalkingConfig,
    cfg: ppo.PPOConfig,
    key: jax.Array,
    mesh: Mesh,
    axis: str = DATA_AXIS,
) -> ppo.TrainState:
    """TrainState with env state/obs laid out on the data axis."""
    from jax.sharding import NamedSharding

    ts = ppo.init_train_state(m, env_cfg, cfg, key)
    env_sh = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    return ppo.TrainState(
        params=jax.device_put(ts.params, rep),
        opt_state=jax.device_put(ts.opt_state, rep),
        env_state=jax.tree.map(lambda x: jax.device_put(x, env_sh), ts.env_state),
        obs=jax.device_put(ts.obs, env_sh),
        key=jax.device_put(ts.key, rep),
        update_idx=jax.device_put(ts.update_idx, rep),
    )
