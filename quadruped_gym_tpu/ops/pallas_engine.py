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


def _resolve_interpret(interpret):
    """Mosaic only compiles for TPU; on the CPU backend (tests, virtual
    meshes, TPU-less users) fall back to interpret mode automatically
    when the caller didn't choose.

    The heuristic keys off the PROCESS defaults (jax_default_device /
    default backend) because the placement of the enclosing jit is not
    visible at trace time. In a mixed process (CPU default device but a
    TPU-placed computation, or vice versa) pass ``interpret`` explicitly
    — it always wins."""
    if interpret is not None:
        return interpret
    dd = jax.config.jax_default_device
    if dd is not None and getattr(dd, "platform", None) == "cpu":
        return True
    return jax.default_backend() == "cpu"


def _dp_from_refs(dp_names, dp_refs):
    from ..models.spec import DomainParams

    return DomainParams(
        **{n: r[...][0] for n, r in zip(dp_names, dp_refs)}
    )


def _dp_inputs(dp, bs, fold):
    """(names, folded (1, 8, S/8) arrays, blockspecs) for the set fields."""
    names, arrays, specs = [], [], []
    if dp is not None:
        for n in ("friction", "gain_scale", "base_mass_scale",
                  "tilt_x", "tilt_y", "terrain_amp", "terrain_freq"):
            v = getattr(dp, n)
            if v is not None:
                names.append(n)
                arrays.append(fold(v[None]))
                specs.append(bs(1))
    return names, arrays, specs


def _substep_kernel(m, solver_iterations, ls_iterations, compute_sensors,
                    dp_names, *refs):
    (qp_ref, qv_ref, act_ref, ctrl_ref), rest = refs[:4], refs[4:]
    dp_refs = rest[: len(dp_names)]
    qp_out, qv_out, act_out, sens_out = rest[len(dp_names):]
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
        compute_sensors=compute_sensors,
        collide_fn=leg_engine._collide_loop,
        const_full=True, dp=_dp_from_refs(dp_names, dp_refs),
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
    interpret: bool | None = None,
    dp=None,
    compute_sensors: bool = True,
) -> LaneState:
    """One physics step (mj_step semantics) as a single fused kernel.
    ``dp`` is an optional ``models.spec.DomainParams`` of (B,) lanes.
    With ``compute_sensors=False`` the returned sensordata is zeros
    (sensor + spatial-acceleration assembly skipped — the intermediate-
    substep configuration, as in ``leg_engine.control_step``)."""
    interpret = _resolve_interpret(interpret)
    S = ls.qpos.shape[1]
    block = min(block, S)
    assert S % block == 0, f"batch {S} not divisible by block {block}"
    assert block % _SUB == 0, f"block {block} not divisible by {_SUB}"
    W = block // _SUB
    dt = ls.qpos.dtype

    def fold(x):  # (d, B) -> (d, 8, B/8); contiguous reshape (bitcast)
        return x.astype(dt).reshape(x.shape[0], _SUB, -1)

    def bs(d):
        return pl.BlockSpec((d, _SUB, W), lambda i: (0, 0, i))

    dp_names, dp_arrays, dp_specs = _dp_inputs(dp, bs, fold)
    kern = functools.partial(
        _substep_kernel, m, solver_iterations, ls_iterations,
        compute_sensors, tuple(dp_names)
    )

    qpos, qvel, act, sens = pl.pallas_call(
        kern,
        grid=(S // block,),
        in_specs=[bs(m.nq), bs(m.nv), bs(m.na), bs(m.nu)] + dp_specs,
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
    )(fold(ls.qpos), fold(ls.qvel), fold(ls.act), fold(ctrl), *dp_arrays)
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
    interpret: bool | None = None,
    dp=None,
) -> LaneState:
    """frame_skip substeps under constant control (sensors on the last —
    intermediate substeps use the cheaper sensor-free kernel variant)."""

    def body(s, _):
        return step(m, s, ctrl, solver_iterations, ls_iterations,
                    block=block, interpret=interpret, dp=dp,
                    compute_sensors=False), None

    if frame_skip > 1:
        ls, _ = jax.lax.scan(body, ls, None, length=frame_skip - 1)
    return step(m, ls, ctrl, solver_iterations, ls_iterations,
                block=block, interpret=interpret, dp=dp)


# --------------------------------------------------------------------------
# fused whole-rollout kernel
#
# Each pallas_call launch carries a fixed ~120 us of overhead on this
# device; per-substep kernels pay it 250x per H=50 solve (~30 ms, ~half
# the solve). The rollout kernel runs ALL H x frame_skip substeps plus the
# stage costs inside one launch per batch tile.


def _lane_stage_cost(sl, sens, ctrl, prev, u_cx, u_cy, cmd_speed, h_x, h_y,
                     height: float):
    """``solvers.rollout.walking_stage_cost`` in lane layout: sens is
    (33, *lane), ctrl/prev (12, *lane); the command enters as scalars
    (unit local-velocity xy, its norm, heading xy). Validated against the
    per-sample cost in tests/test_pallas_engine.py."""
    from ..tasks.rewards import JOINT_CENTERS

    dt = sens.dtype
    vx, vy = sens[sl.vel], sens[sl.vel + 1]
    n2 = vx * vx + vy * vy
    nonzero = n2 > 0.0
    vnorm = jnp.where(nonzero, jnp.sqrt(jnp.where(nonzero, n2, 1.0)), 0.0)
    inv = 1.0 / jnp.maximum(vnorm, 1e-30)
    prog_dir = (vx * inv) * u_cx + (vy * inv) * u_cy
    speed_cost = jnp.square(vnorm - cmd_speed)
    heading = sens[sl.xaxis] * h_x + sens[sl.xaxis + 1] * h_y
    orient = sens[sl.zaxis + 2]
    height_cost = jnp.abs(sens[sl.pos + 2] - height)
    nu = ctrl.shape[0]
    posture2 = 0.0
    dctrl = 0.0
    for u in range(nu):
        d = (ctrl[u] - float(JOINT_CENTERS[u])) / nu
        posture2 = posture2 + d * d
        e = ctrl[u] - prev[u]
        dctrl = dctrl + e * e
    reward = (
        10.0
        + 10.0 * prog_dir
        - 50.0 * speed_cost
        + 10.0 * (jnp.exp(heading) - 1.0)
        + 10.0 * (jnp.exp(orient) - 1.0)
        - 50.0 * (jnp.exp(height_cost) - 1.0)
        - jnp.sqrt(posture2)
        - 2.0 * dctrl
        - jnp.where(orient < 0.0, jnp.asarray(200.0, dt), jnp.asarray(0.0, dt))
    )
    return -reward


def _rollout_kernel(m, sl, horizon, frame_skip, solver_iterations,
                    ls_iterations, height, dp_names, *refs):
    (qp_ref, qv_ref, act_ref, seq_ref, prev_ref, cmd_ref), rest = (
        refs[:6], refs[6:]
    )
    dp_refs = rest[: len(dp_names)]
    (cost_ref,) = rest[len(dp_names):]
    dp = _dp_from_refs(dp_names, dp_refs)
    lane_shape = qp_ref.shape[1:]
    dt = qp_ref.dtype
    u_cx, u_cy, cmd_speed = cmd_ref[0], cmd_ref[1], cmd_ref[2]
    h_x, h_y = cmd_ref[3], cmd_ref[4]

    def make_sub_body(compute_sensors):
        def sub_body(_, c):
            qp, qv, act, sens, ctrl = c
            ls = LaneState(qpos=qp, qvel=qv, act=act,
                           time=jnp.zeros(lane_shape, dt), sensordata=sens)
            out = leg_engine._step_impl(
                m, ls, ctrl, solver_iterations, ls_iterations,
                compute_sensors=compute_sensors,
                collide_fn=leg_engine._collide_loop,
                const_full=True, dp=dp,
            )
            return (out.qpos, out.qvel, out.act, out.sensordata, ctrl)

        return sub_body

    def h_body(h, carry):
        qp, qv, act, prev, cost = carry
        ctrl = seq_ref[h]  # (nu, *lane)
        sens0 = jnp.zeros((m.nsensordata,) + lane_shape, dt)
        c0 = (qp, qv, act, sens0, ctrl)
        # sensors feed only the stage cost, read after the LAST substep;
        # intermediate substeps skip the cacc + sensor assembly
        if frame_skip > 1:
            c0 = jax.lax.fori_loop(
                0, frame_skip - 1, make_sub_body(False), c0
            )
        qp, qv, act, sens, _ = make_sub_body(True)(0, c0)
        c = _lane_stage_cost(sl, sens, ctrl, prev, u_cx, u_cy, cmd_speed,
                             h_x, h_y, height)
        return (qp, qv, act, ctrl, cost + c)

    carry0 = (
        qp_ref[...], qv_ref[...], act_ref[...], prev_ref[...],
        jnp.zeros(lane_shape, dt),
    )
    _, _, _, _, cost = jax.lax.fori_loop(0, horizon, h_body, carry0)
    cost_ref[...] = cost


def fused_rollout_cost(
    m: PhysicsModel,
    state0,  # engine.State (unbatched)
    ctrl_seqs: jnp.ndarray,  # (S, H, nu)
    cmd,  # tasks.commands.Command
    prev_ctrl0: jnp.ndarray,  # (nu,)
    frame_skip: int,
    solver_iterations: int = 4,
    ls_iterations: int = 8,
    height: float = 0.13,
    block: int = DEFAULT_BLOCK,
    interpret: bool | None = None,
    dp=None,
) -> jnp.ndarray:
    """(S,) total walking-stage costs of H-step rollouts from ``state0``,
    one kernel launch per batch tile. The stage cost is hard-wired to the
    walking task (``_lane_stage_cost`` == ``rollout.walking_stage_cost``);
    use the per-control-step engines for custom costs. ``dp`` is an
    optional ``models.spec.DomainParams`` of (S,) lanes — per-SCENARIO
    randomized friction/gains/payload inside one fused launch (BASELINE
    configs 3/5)."""
    from ..tasks.rewards import SensorSlices

    interpret = _resolve_interpret(interpret)
    S, H, nu = ctrl_seqs.shape
    dt = ctrl_seqs.dtype
    block = min(block, S)
    assert S % block == 0 and block % _SUB == 0
    W = block // _SUB
    sl = SensorSlices.from_model(m)

    def bcast_fold(x, d):  # (d,) -> (d, 8, S/8)
        return jnp.broadcast_to(
            x.astype(dt)[:, None, None], (d, _SUB, S // _SUB)
        )

    def fold(x):  # (d, S) -> (d, 8, S/8)
        return x.astype(dt).reshape(x.shape[0], _SUB, -1)

    seqs = jnp.transpose(ctrl_seqs, (1, 2, 0)).reshape(
        H, nu, _SUB, S // _SUB
    )

    v2 = cmd.velocity[:2]
    n2 = jnp.sum(v2 * v2)
    nonzero = n2 > 0.0
    n = jnp.where(nonzero, jnp.sqrt(jnp.where(nonzero, n2, 1.0)), 0.0)
    u = v2 / jnp.maximum(n, 1e-30)
    cmd_scal = jnp.stack(
        [u[0], u[1], n, cmd.heading[0], cmd.heading[1]]
    ).astype(dt)

    def bs(d):
        return pl.BlockSpec((d, _SUB, W), lambda i: (0, 0, i))

    dp_names, dp_arrays, dp_specs = _dp_inputs(dp, bs, fold)
    kern = functools.partial(
        _rollout_kernel, m, sl, H, frame_skip, solver_iterations,
        ls_iterations, height, tuple(dp_names),
    )

    cost = pl.pallas_call(
        kern,
        grid=(S // block,),
        in_specs=[
            bs(m.nq), bs(m.nv), bs(m.na),
            pl.BlockSpec((H, nu, _SUB, W), lambda i: (0, 0, 0, i)),
            bs(nu),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ] + dp_specs,
        out_specs=pl.BlockSpec((_SUB, W), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((_SUB, S // _SUB), dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        bcast_fold(state0.qpos, m.nq),
        bcast_fold(state0.qvel, m.nv),
        bcast_fold(state0.act, m.na),
        seqs,
        bcast_fold(prev_ctrl0, nu),
        cmd_scal,
        *dp_arrays,
    )
    return cost.reshape(S)
