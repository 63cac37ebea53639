"""Cross-Entropy Method sampling MPC.

Iteratively samples control sequences from a diagonal Gaussian, refits the
distribution to the elite fraction, and returns the refined mean — the
second sampling solver of BASELINE config 3 (CEM+MPPI). Same batched
rollout backend as MPPI; the sample axis vmaps on-chip and shards across
chips.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.spec import PhysicsModel
from ..physics import engine
from ..tasks.commands import Command
from . import rollout as rollout_mod


@dataclasses.dataclass(frozen=True)
class CEMConfig:
    num_samples: int = 1024
    num_elites: int = 64
    iterations: int = 3
    init_sigma: float = 0.3
    min_sigma: float = 0.02
    alpha: float = 0.2  # distribution smoothing (old vs refit)
    rollout: rollout_mod.RolloutConfig = rollout_mod.RolloutConfig()
    # lane=True scores rollouts through the batch-minor lane engine
    lane: bool = False
    lane_newton_iterations: int = 4
    lane_engine_impl: str = "leg"
    lane_ls_iterations: int = 8


class CEMResult(NamedTuple):
    mean: jnp.ndarray  # (H, nu)
    sigma: jnp.ndarray  # (H, nu)
    best_cost: jnp.ndarray
    mean_cost: jnp.ndarray


def plan(
    m: PhysicsModel,
    cfg: CEMConfig,
    cost_fn: rollout_mod.CostFn,
    state: engine.State,
    mean: jnp.ndarray,  # (H, nu)
    cmd: Command,
    prev_ctrl: jnp.ndarray,
    key: jax.Array,
    sigma: jnp.ndarray | None = None,
) -> CEMResult:
    dtype = mean.dtype
    lo = jnp.asarray(np.asarray(m.actuator_ctrlrange[:, 0]), dtype)
    hi = jnp.asarray(np.asarray(m.actuator_ctrlrange[:, 1]), dtype)
    if sigma is None:
        sigma = jnp.full_like(mean, cfg.init_sigma)

    def one_iter(carry, k):
        mean, sigma = carry
        eps = jax.random.normal(k, (cfg.num_samples,) + mean.shape, dtype)
        seqs = jnp.clip(mean[None] + sigma[None] * eps, lo, hi)
        if cfg.lane:
            costs = rollout_mod.lane_batched_rollout_cost(
                m, cfg.rollout, cost_fn, state, seqs, cmd, prev_ctrl,
                newton_iterations=cfg.lane_newton_iterations,
                engine_impl=cfg.lane_engine_impl,
                ls_iterations=cfg.lane_ls_iterations,
            )
        else:
            costs = rollout_mod.batched_rollout_cost(
                m, cfg.rollout, cost_fn, state, seqs, cmd, prev_ctrl
            )
        costs = jnp.where(jnp.isfinite(costs), costs, jnp.inf)
        _, elite_idx = jax.lax.top_k(-costs, cfg.num_elites)
        elites = seqs[elite_idx]
        new_mean = jnp.mean(elites, axis=0)
        new_sigma = jnp.std(elites, axis=0)
        mean = cfg.alpha * mean + (1 - cfg.alpha) * new_mean
        sigma = jnp.maximum(
            cfg.alpha * sigma + (1 - cfg.alpha) * new_sigma, cfg.min_sigma
        )
        return (mean, sigma), (jnp.min(costs), jnp.mean(costs))

    keys = jax.random.split(key, cfg.iterations)
    (mean, sigma), (best, mc) = jax.lax.scan(one_iter, (mean, sigma), keys)
    return CEMResult(mean=mean, sigma=sigma, best_cost=best[-1], mean_cost=mc[-1])
