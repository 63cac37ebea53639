"""MPPI (Model-Predictive Path Integral) sampling MPC.

Information-theoretic MPC (Williams et al.): sample control perturbations,
roll them out in parallel, exponentially weight by cost, update the mean
sequence. Maps perfectly onto one chip: the sample axis is a ``vmap`` that
XLA vectorizes across VPU lanes; across chips the same axis shards with
``shard_map`` + ``psum`` (see quadruped_gym_tpu.parallel).

The receding-horizon shift (warm start) lives in ``runtime.mpc_runtime``.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.spec import PhysicsModel
from ..physics import engine
from ..tasks.commands import Command
from . import rollout as rollout_mod


@dataclasses.dataclass(frozen=True)
class MPPIConfig:
    num_samples: int = 1024
    sigma: float = 0.3  # exploration std (in ctrl units)
    temperature: float = 1.0  # lambda in the MPPI weighting
    iterations: int = 1  # refinement iterations per solve
    rollout: rollout_mod.RolloutConfig = rollout_mod.RolloutConfig()
    # lane=True scores rollouts through the batch-minor lane engine
    # (~5x faster on TPU; fixed Newton budget below instead of the
    # rollout config's solver_iterations)
    lane: bool = False
    lane_newton_iterations: int = 4
    lane_ls_iterations: int = 8
    # which batch-minor engine: "lane" | "leg" | "pallas" | "fused"
    # (see rollout.lane_batched_rollout_cost; "fused" is the TPU
    # speed-of-light whole-rollout kernel)
    lane_engine_impl: str = "leg"


def _rollout_costs(m, cfg: "MPPIConfig", cost_fn, state, seqs, cmd, prev):
    if cfg.lane:
        return rollout_mod.lane_batched_rollout_cost(
            m, cfg.rollout, cost_fn, state, seqs, cmd, prev,
            newton_iterations=cfg.lane_newton_iterations,
            ls_iterations=cfg.lane_ls_iterations,
            engine_impl=cfg.lane_engine_impl,
        )
    return rollout_mod.batched_rollout_cost(
        m, cfg.rollout, cost_fn, state, seqs, cmd, prev
    )


class PlanResult(NamedTuple):
    mean: jnp.ndarray  # (H, nu) updated mean control sequence
    best_cost: jnp.ndarray
    mean_cost: jnp.ndarray
    weights_entropy: jnp.ndarray


def _ctrl_bounds(m: PhysicsModel, dtype):
    lo = jnp.asarray(np.asarray(m.actuator_ctrlrange[:, 0]), dtype)
    hi = jnp.asarray(np.asarray(m.actuator_ctrlrange[:, 1]), dtype)
    return lo, hi


def plan(
    m: PhysicsModel,
    cfg: MPPIConfig,
    cost_fn: rollout_mod.CostFn,
    state: engine.State,
    mean: jnp.ndarray,  # (H, nu)
    cmd: Command,
    prev_ctrl: jnp.ndarray,  # (nu,)
    key: jax.Array,
) -> PlanResult:
    dtype = mean.dtype
    lo, hi = _ctrl_bounds(m, dtype)
    S = cfg.num_samples
    H, nu = mean.shape

    def one_iter(carry, k):
        mean = carry
        eps = cfg.sigma * jax.random.normal(k, (S, H, nu), dtype)
        seqs = jnp.clip(mean[None] + eps, lo, hi)
        costs = _rollout_costs(m, cfg, cost_fn, state, seqs, cmd, prev_ctrl)
        costs = jnp.where(jnp.isfinite(costs), costs, jnp.inf)
        cmin = jnp.min(costs)
        w = jax.nn.softmax(-(costs - cmin) / cfg.temperature)
        new_mean = jnp.einsum("s,shu->hu", w, seqs).astype(dtype)
        stats = (cmin, jnp.mean(costs), -jnp.sum(w * jnp.log(w + 1e-30)))
        return new_mean, stats

    keys = jax.random.split(key, cfg.iterations)
    mean, stats = jax.lax.scan(one_iter, mean, keys)
    best, mean_c, ent = stats
    return PlanResult(
        mean=mean,
        best_cost=best[-1],
        mean_cost=mean_c[-1],
        weights_entropy=ent[-1],
    )
