"""Multi-chip sampling MPC: the sample axis sharded over a device mesh.

TPU-native replacement for the reference's process-level parallelism
(``/root/reference/src/train_quadruped.py:49-50``): instead of 10 OS
processes stepping one env each, every chip rolls out ``S/ndev`` control
samples locally (pure compute, zero communication) and the MPPI/CEM
statistics are reduced with XLA collectives over ICI:

- ``pmin`` for the cost baseline (softmax stability),
- ``psum`` for the softmax normalizer and the weighted plan update,
- CEM: ``psum`` of top-k elite sums (local top-k then global re-select).

All of it is ``shard_map`` over a 1D ``sample`` mesh axis, so XLA sees one
SPMD program per chip and a handful of small all-reduces per solve — the
plan (H, nu) is tiny, so collective bytes are negligible vs rollout FLOPs.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..models.spec import PhysicsModel
from ..physics import engine
from ..solvers import mppi as mppi_mod
from ..solvers import rollout as rollout_mod
from ..tasks.commands import Command
from .mesh import DATA_AXIS, SAMPLE_AXIS


def sharded_mppi_plan(
    m: PhysicsModel,
    cfg: mppi_mod.MPPIConfig,
    cost_fn: rollout_mod.CostFn,
    state: engine.State,
    mean: jnp.ndarray,  # (H, nu) replicated
    cmd: Command,
    prev_ctrl: jnp.ndarray,  # (nu,)
    key: jax.Array,
    mesh: Mesh,
    axis: str = SAMPLE_AXIS,
) -> mppi_mod.PlanResult:
    """MPPI solve with ``cfg.num_samples`` split across ``mesh[axis]``.

    Numerically identical to the single-chip ``mppi.plan`` up to the RNG
    stream split (each shard draws its own perturbations from a folded key).
    All inputs are replicated; the returned plan is replicated.
    """
    ndev = mesh.shape[axis]
    if cfg.num_samples % ndev:
        raise ValueError(
            f"num_samples={cfg.num_samples} not divisible by mesh axis "
            f"'{axis}' size {ndev}"
        )
    s_local = cfg.num_samples // ndev
    dtype = mean.dtype
    lo, hi = mppi_mod._ctrl_bounds(m, dtype)
    H, nu = mean.shape

    def solve(state, mean, cmd, prev_ctrl, key):
        # per-shard RNG stream: fold in the device's position on the axis
        idx = jax.lax.axis_index(axis)
        key = jax.random.fold_in(key, idx)

        def one_iter(mean, k):
            eps = cfg.sigma * jax.random.normal(k, (s_local, H, nu), dtype)
            seqs = jnp.clip(mean[None] + eps, lo, hi)
            costs = mppi_mod._rollout_costs(
                m, cfg, cost_fn, state, seqs, cmd, prev_ctrl
            )
            costs = jnp.where(jnp.isfinite(costs), costs, jnp.inf)
            cmin = jax.lax.pmin(jnp.min(costs), axis)  # global baseline
            unnorm = jnp.exp(-(costs - cmin) / cfg.temperature)
            denom = jax.lax.psum(jnp.sum(unnorm), axis)
            w = unnorm / denom
            new_mean = jax.lax.psum(
                jnp.einsum("s,shu->hu", w, seqs), axis
            ).astype(dtype)
            local_ent = -jnp.sum(w * jnp.log(w + 1e-30))
            stats = (
                cmin,
                jax.lax.psum(jnp.sum(costs), axis) / cfg.num_samples,
                jax.lax.psum(local_ent, axis),
            )
            return new_mean, stats

        keys = jax.random.split(key, cfg.iterations)
        mean, stats = jax.lax.scan(one_iter, mean, keys)
        best, mean_c, ent = stats
        return mppi_mod.PlanResult(
            mean=mean, best_cost=best[-1], mean_cost=mean_c[-1],
            weights_entropy=ent[-1],
        )

    rep = P()
    fn = shard_map(
        solve, mesh=mesh,
        in_specs=(rep, rep, rep, rep, rep),
        out_specs=rep,
        check_vma=False,
    )
    return fn(state, mean, cmd, prev_ctrl, key)


def sharded_batch_mppi_plan(
    m: PhysicsModel,
    cfg: mppi_mod.MPPIConfig,
    cost_fn: rollout_mod.CostFn,
    states: engine.State,  # batched (B, ...) — sharded on the data axis
    means: jnp.ndarray,  # (B, H, nu)
    cmds: Command,  # batched (B, ...)
    prev_ctrls: jnp.ndarray,  # (B, nu)
    key: jax.Array,
    mesh: Mesh,
    data_axis: str = DATA_AXIS,
    sample_axis: str = SAMPLE_AXIS,
):
    """The full 2D-sharded solve step: scenarios × samples over the mesh.

    This is the multi-chip "training step" of the framework (BASELINE
    config 3: 65k+ scenarios across hosts): the scenario batch B shards
    over ``data_axis`` (zero communication — each chip group owns its
    scenarios), and within each scenario the ``num_samples`` MPPI rollouts
    shard over ``sample_axis`` with psum/pmin reductions riding ICI.

    Returns per-scenario ``(ctrl, new_mean, best_cost)`` with the batch dim
    sharded on ``data_axis``; the receding-horizon shift is applied here.
    """
    ndata = mesh.shape[data_axis]
    nsample = mesh.shape[sample_axis]
    B = means.shape[0]
    if B % ndata:
        raise ValueError(f"batch {B} not divisible by data axis size {ndata}")
    if cfg.num_samples % nsample:
        raise ValueError(
            f"num_samples={cfg.num_samples} not divisible by sample axis "
            f"size {nsample}"
        )
    s_local = cfg.num_samples // nsample
    dtype = means.dtype
    lo, hi = mppi_mod._ctrl_bounds(m, dtype)
    H, nu = means.shape[-2:]

    def solve(states, means, cmds, prevs, key):
        didx = jax.lax.axis_index(data_axis)
        sidx = jax.lax.axis_index(sample_axis)
        key = jax.random.fold_in(jax.random.fold_in(key, didx), sidx)
        b_local = means.shape[0]

        def one_env(state, mean, cmd, prev, k):
            def one_iter(mean, kk):
                eps = cfg.sigma * jax.random.normal(kk, (s_local, H, nu), dtype)
                seqs = jnp.clip(mean[None] + eps, lo, hi)
                costs = mppi_mod._rollout_costs(
                    m, cfg, cost_fn, state, seqs, cmd, prev
                )
                costs = jnp.where(jnp.isfinite(costs), costs, jnp.inf)
                cmin = jax.lax.pmin(jnp.min(costs), sample_axis)
                unnorm = jnp.exp(-(costs - cmin) / cfg.temperature)
                denom = jax.lax.psum(jnp.sum(unnorm), sample_axis)
                w = unnorm / denom
                new_mean = jax.lax.psum(
                    jnp.einsum("s,shu->hu", w, seqs), sample_axis
                ).astype(dtype)
                return new_mean, cmin

            kks = jax.random.split(k, cfg.iterations)
            mean, cmins = jax.lax.scan(one_iter, mean, kks)
            ctrl = mean[0]
            shifted = jnp.concatenate([mean[1:], mean[-1:]], axis=0)
            return ctrl, shifted, cmins[-1]

        keys = jax.random.split(key, b_local)
        return jax.vmap(one_env)(states, means, cmds, prevs, keys)

    data0 = P(data_axis)
    fn = shard_map(
        solve, mesh=mesh,
        in_specs=(data0, data0, data0, data0, P()),
        out_specs=(data0, data0, data0),
        check_vma=False,
    )
    return fn(states, means, cmds, prev_ctrls, key)


class ShardedBatchResult(NamedTuple):
    costs: jnp.ndarray  # (S,) sharded on the sample axis


def sharded_rollout_costs(
    m: PhysicsModel,
    cfg: rollout_mod.RolloutConfig,
    cost_fn: rollout_mod.CostFn,
    state: engine.State,
    ctrl_seqs: jnp.ndarray,  # (S, H, nu) — sharded on axis 0
    cmd: Command,
    prev_ctrl: jnp.ndarray,
    mesh: Mesh,
    axis: str = SAMPLE_AXIS,
) -> jnp.ndarray:
    """Pure data-parallel rollout scoring: no collectives at all.

    ``ctrl_seqs`` stays sharded on the sample axis end-to-end; use for
    throughput-critical scoring where the reduction happens elsewhere.
    """
    rep = P()
    fn = shard_map(
        lambda st, seqs, c, pc: rollout_mod.batched_rollout_cost(
            m, cfg, cost_fn, st, seqs, c, pc
        ),
        mesh=mesh,
        in_specs=(rep, P(axis), rep, rep),
        out_specs=P(axis),
        check_vma=False,
    )
    return fn(state, ctrl_seqs, cmd, prev_ctrl)
