"""Pallas/Mosaic mega-kernel for the leg-batched physics substep.

Why this exists: the XLA-compiled leg engine is HBM-bound, not
compute-bound. One substep at batch 4096 costs ~1.36 GB of HBM traffic
across ~300 fusions (XLA cost analysis) against only ~0.46 GFLOP of
compute and ~1.3 MB of actual simulation state — >99% of the traffic is
intermediate lane values crossing fusion boundaries. Fusing the ENTIRE
substep into one Pallas kernel keeps every intermediate in
VMEM/registers: per batch tile, the kernel reads the state block, runs
FK -> CRBA -> RNE -> collision -> Newton contact solve -> implicitfast
integration -> sensors entirely on-chip, and writes the new state block.

Layout: the batch axis is reshaped (free bitcast) from (B,) to
(8, B/8) so every lane value fills whole (8, 128) vector registers —
1D (B,) vectors lower to (1, 128)-tiled ops with 1/8 sublane
utilization, which made the first kernel issue-bound at exactly
8 cycles per op. Leg lanes are (4, 8, W): four full vregs per op.

The kernel body *is* ``leg_engine._step_impl`` — the same traced math the
oracle-parity tests validate — with Mosaic-motivated substitutions that
are bit-compatible and active outside kernels too: gather-free hull
vertex selection (``_collide_loop``), gather-free row indexing, and
unrolled leg-axis reductions.

Validated against ``leg_engine.step`` in ``tests/test_pallas_engine.py``
(interpret mode on CPU; on-device in the TPU verify drive).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.spec import PhysicsModel
from . import leg_engine
from .lane_engine import LaneState

DEFAULT_BLOCK = 1024
_SUB = 8  # f32 sublane count: batch folds to (8, B/8)


def _substep_kernel(m, solver_iterations, ls_iterations,
                    qp_ref, qv_ref, act_ref, ctrl_ref,
                    qp_out, qv_out, act_out, sens_out):
    lane_shape = qp_ref.shape[1:]  # (8, W)
    dt = qp_ref.dtype
    ls = LaneState(
        qpos=qp_ref[...],
        qvel=qv_ref[...],
        act=act_ref[...],
        time=jnp.zeros(lane_shape, dt),  # integrated outside the kernel
        sensordata=jnp.zeros((sens_out.shape[0],) + lane_shape, dt),
    )
    out = leg_engine._step_impl(
        m, ls, ctrl_ref[...], solver_iterations, ls_iterations,
        compute_sensors=True, collide_fn=leg_engine._collide_loop,
        const_full=True,
    )
    qp_out[...] = out.qpos
    qv_out[...] = out.qvel
    act_out[...] = out.act
    sens_out[...] = out.sensordata


def step(
    m: PhysicsModel,
    ls: LaneState,
    ctrl: jnp.ndarray,  # (nu, B)
    solver_iterations: int = 4,
    ls_iterations: int = 8,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
) -> LaneState:
    """One physics step (mj_step semantics) as a single fused kernel."""
    S = ls.qpos.shape[1]
    block = min(block, S)
    assert S % block == 0, f"batch {S} not divisible by block {block}"
    assert block % _SUB == 0, f"block {block} not divisible by {_SUB}"
    W = block // _SUB
    dt = ls.qpos.dtype
    kern = functools.partial(
        _substep_kernel, m, solver_iterations, ls_iterations
    )

    def fold(x):  # (d, B) -> (d, 8, B/8); contiguous reshape (bitcast)
        return x.reshape(x.shape[0], _SUB, -1)

    def bs(d):
        return pl.BlockSpec((d, _SUB, W), lambda i: (0, 0, i))

    qpos, qvel, act, sens = pl.pallas_call(
        kern,
        grid=(S // block,),
        in_specs=[bs(m.nq), bs(m.nv), bs(m.na), bs(m.nu)],
        out_specs=[bs(m.nq), bs(m.nv), bs(m.na), bs(m.nsensordata)],
        out_shape=[
            jax.ShapeDtypeStruct((m.nq, _SUB, S // _SUB), dt),
            jax.ShapeDtypeStruct((m.nv, _SUB, S // _SUB), dt),
            jax.ShapeDtypeStruct((m.na, _SUB, S // _SUB), dt),
            jax.ShapeDtypeStruct((m.nsensordata, _SUB, S // _SUB), dt),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(fold(ls.qpos), fold(ls.qvel), fold(ls.act), fold(ctrl))
    return LaneState(
        qpos=qpos.reshape(m.nq, S),
        qvel=qvel.reshape(m.nv, S),
        act=act.reshape(m.na, S),
        time=ls.time + m.timestep,
        sensordata=sens.reshape(m.nsensordata, S),
    )


def control_step(
    m: PhysicsModel,
    ls: LaneState,
    ctrl: jnp.ndarray,  # (nu, B)
    frame_skip: int,
    solver_iterations: int = 4,
    ls_iterations: int = 8,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
) -> LaneState:
    """frame_skip substeps under constant control (one shared kernel)."""

    def body(s, _):
        return step(m, s, ctrl, solver_iterations, ls_iterations,
                    block=block, interpret=interpret), None

    ls, _ = jax.lax.scan(body, ls, None, length=frame_skip)
    return ls
