"""Pipeline parallelism over the MPC horizon (the PP analog, SURVEY §2.5).

The reference has no pipeline dimension at all (its only parallelism is
10 env processes, ``/root/reference/src/train_quadruped.py:49-50``); this
framework's deepest sequential structure is the H-step rollout scan. The
faithful TPU-native PP analog is therefore a GPipe schedule over the
HORIZON: a 1D ``stage`` mesh splits the H control steps into contiguous
segments, each device integrates its segment, and boundary (state,
prev_ctrl) carries hop to the next stage over ICI via ``lax.ppermute``.
The scenario batch is cut into microbatches that flow through the pipe,
so after the (n_stages - 1)-tick fill bubble every stage integrates a
different microbatch concurrently — bubble fraction
(S-1)/(M+S-1), exactly GPipe's.

When this beats pure data parallelism: vmap over scenarios is free of
collectives and is the right default (and what ``sharded_mppi_plan``
does) — but it replicates the whole H-step program per device and keeps
per-device working sets ~batch-sized. Horizon staging divides the
*sequential depth* per device by n_stages, which shortens each device's
compiled scan (compile time, instruction-cache footprint) and lets a
long-horizon solve (H in the hundreds — the long-context analog,
SURVEY §5) run with each chip holding only its segment's rollout
intermediates. It is also the load-balanced alternative to horizon-block
QP *condensation* (solvers/sqp.py) when the horizon work itself, not the
reduction, is the bottleneck.

Numerics: each microbatch's trajectory visits the same physics steps in
the same order as ``solvers.rollout.batched_rollout_cost``; only the
final cost reduction regroups (per-segment partial sums psum'd across
stages), so costs match the sequential path to reduction-order rounding
(validated at ~1e-12 in f64, tests/test_pipeline.py).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.spec import PhysicsModel
from ..physics import engine
from ..solvers import rollout as rollout_mod
from ..tasks.commands import Command

STAGE_AXIS = "stage"


def pipelined_rollout_cost(
    m: PhysicsModel,
    cfg: rollout_mod.RolloutConfig,
    cost_fn: rollout_mod.CostFn,
    state0: engine.State,
    ctrl_seqs: jnp.ndarray,  # (S, H, nu)
    cmd: Command,
    prev_ctrl0: jnp.ndarray,  # (nu,)
    mesh: Mesh,
    stage_axis: str = STAGE_AXIS,
    num_microbatches: Optional[int] = None,
) -> jnp.ndarray:
    """(S,) rollout costs with the horizon pipelined across ``mesh``.

    Semantics match ``rollout.batched_rollout_cost`` (one shared start
    state, per-step stage costs, prev-ctrl carried across steps —
    including across segment boundaries, where it rides the pipe hop).

    ``num_microbatches`` (default: n_stages) controls the GPipe bubble:
    more microbatches amortize the (n_stages - 1)-tick fill/drain.
    """
    S, H, nu = ctrl_seqs.shape
    n_stages = mesh.shape[stage_axis]
    if H % n_stages:
        raise ValueError(f"horizon {H} not divisible by {n_stages} stages")
    seg = H // n_stages
    M = num_microbatches or n_stages
    if S % M:
        raise ValueError(f"batch {S} not divisible by {M} microbatches")
    mb = S // M
    ticks = M + n_stages - 1

    # (M, mb, n_stages, seg, nu): microbatches major, horizon segments on
    # the axis shard_map splits over the stage mesh
    seqs = ctrl_seqs.reshape(M, mb, n_stages, seg, nu)

    def step_one(st, u, prev):
        st2 = engine.control_step(
            m, st, u, cfg.frame_skip,
            max_contacts=cfg.max_contacts,
            solver_iterations=cfg.solver_iterations,
        )
        c = cost_fn(st2.sensordata, u, prev, cmd)
        return st2, c

    fresh_state = jax.tree.map(lambda x: jnp.stack([x] * mb), state0)
    fresh_prev = jnp.tile(prev_ctrl0, (mb, 1))
    fwd_perm = [(i, i + 1) for i in range(n_stages - 1)]

    def impl(seqs_local):  # (M, mb, 1, seg, nu): this stage's segments
        s = jax.lax.axis_index(stage_axis)
        seqs_local = seqs_local[:, :, 0]  # (M, mb, seg, nu)

        def tick(carry, t):
            in_state, in_prev, cost_acc = carry
            mb_idx = jnp.clip(t - s, 0, M - 1)
            # stage 0 sources the fresh microbatch; later stages consume
            # the boundary carry their predecessor sent last tick
            st = jax.tree.map(
                lambda f, i: jnp.where(s == 0, f, i), fresh_state, in_state
            )
            pv = jnp.where(s == 0, fresh_prev, in_prev)
            useg = jax.lax.dynamic_index_in_dim(
                seqs_local, mb_idx, 0, keepdims=False
            )  # (mb, seg, nu)

            def step_body(c, u_t):  # u_t: (mb, nu)
                stc, pvc, acc = c
                st2, cst = jax.vmap(step_one)(stc, u_t, pvc)
                return (st2, u_t, acc + cst), None

            (st_out, pv_out, seg_cost), _ = jax.lax.scan(
                step_body,
                (st, pv, jnp.zeros(mb, ctrl_seqs.dtype)),
                jnp.swapaxes(useg, 0, 1),
            )
            active = (t >= s) & (t - s < M)
            cost_acc = cost_acc.at[mb_idx].add(
                jnp.where(active, seg_cost, 0.0)
            )
            # hand the boundary carry to the next stage (ICI hop); the
            # last stage's output leaves the pipe (no receiver)
            out_state = jax.tree.map(
                lambda x: jax.lax.ppermute(x, stage_axis, fwd_perm), st_out
            )
            out_prev = jax.lax.ppermute(pv_out, stage_axis, fwd_perm)
            return (out_state, out_prev, cost_acc), None

        init = (fresh_state, fresh_prev, jnp.zeros((M, mb), ctrl_seqs.dtype))
        (_, _, cost_acc), _ = jax.lax.scan(
            tick, init, jnp.arange(ticks)
        )
        # every stage holds its segments' partial costs; one psum over
        # ICI assembles the totals (replicated output)
        return jax.lax.psum(cost_acc, stage_axis)

    # check_vma=False: the varying-manual-axes checker rejects the physics
    # solver's internal scan carries (initialized replicated, updated with
    # stage-varying state once the pipe diverges per stage); the final
    # psum makes the output genuinely replicated, which is all the check
    # would otherwise guarantee
    fn = jax.shard_map(
        impl,
        mesh=mesh,
        in_specs=(P(None, None, stage_axis, None, None),),
        out_specs=P(),
        check_vma=False,
    )
    return fn(seqs).reshape(S)


def pipelined_mppi_plan(
    m: PhysicsModel,
    cfg,
    cost_fn: rollout_mod.CostFn,
    state0: engine.State,
    mean: jnp.ndarray,  # (H, nu)
    cmd: Command,
    prev_ctrl0: jnp.ndarray,
    key: jax.Array,
    mesh: Mesh,
    stage_axis: str = STAGE_AXIS,
    num_microbatches: Optional[int] = None,
):
    """One MPPI update whose rollout scoring runs through the horizon
    pipeline. Returns (ctrl, new_mean, best_cost) like ``mppi.plan``'s
    essentials; sampling and weighting are replicated (they are
    negligible next to the physics)."""
    S = cfg.num_samples
    H = mean.shape[0]
    eps = cfg.sigma * jax.random.normal(key, (S, H, m.nu), mean.dtype)
    seqs = jnp.clip(mean[None] + eps, -1.0, 1.0)
    costs = pipelined_rollout_cost(
        m, cfg.rollout, cost_fn, state0, seqs, cmd, prev_ctrl0,
        mesh, stage_axis, num_microbatches,
    )
    w = jax.nn.softmax(-(costs - costs.min()) / cfg.temperature)
    new_mean = jnp.einsum("s,shu->hu", w, seqs)
    return new_mean[0], new_mean, costs.min()
