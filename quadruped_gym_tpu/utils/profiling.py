"""Tracing / profiling / roofline accounting.

The reference has no profiling at all (SURVEY.md §5 — its only timing code
is wall-clock render pacing). This framework reports speed-of-light
fractions per compiled program:

- ``trace(path)``: context manager around ``jax.profiler`` for device
  traces (view in TensorBoard / Perfetto).
- ``cost_summary(fn, *args)``: XLA cost analysis of a jitted function —
  flops, HBM bytes, and the roofline bound for the chip.
- ``measure(fn, *args)``: wall-clock of the compiled program (scan-safe:
  one device call, blocked) + achieved fraction of the roofline.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Optional

import jax
import numpy as np


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    """Peak numbers used for roofline accounting."""

    name: str
    peak_flops_f32: float  # FLOP/s
    peak_hbm_bytes: float  # B/s


# TPU v5e (the bench chip); override for other parts.
TPU_V5E = ChipSpec(name="TPU v5e", peak_flops_f32=197e12 / 2, peak_hbm_bytes=819e9)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: ``with profiling.trace("/tmp/trace"): ...``"""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass
class CostSummary:
    flops: float
    bytes_accessed: float
    flop_time_s: float  # time if compute-bound at peak
    mem_time_s: float  # time if bandwidth-bound at peak
    bound: str  # "compute" | "memory"

    @property
    def roofline_s(self) -> float:
        return max(self.flop_time_s, self.mem_time_s)


def cost_summary(fn, *args, chip: ChipSpec = TPU_V5E) -> CostSummary:
    """XLA cost analysis of ``jit(fn)(*args)`` with the roofline bound."""
    comp = jax.jit(fn).lower(*args).compile()
    ca = comp.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))
    ft = flops / chip.peak_flops_f32
    mt = byts / chip.peak_hbm_bytes
    return CostSummary(
        flops=flops, bytes_accessed=byts, flop_time_s=ft, mem_time_s=mt,
        bound="compute" if ft >= mt else "memory",
    )


@dataclasses.dataclass
class Measurement:
    wall_s: float
    cost: Optional[CostSummary]

    @property
    def speed_of_light(self) -> Optional[float]:
        """Achieved fraction of the roofline bound (1.0 == at the roof)."""
        if self.cost is None or self.wall_s <= 0:
            return None
        return self.cost.roofline_s / self.wall_s


def measure(fn, *args, iters: int = 10, chip: ChipSpec = TPU_V5E,
            with_cost: bool = True) -> Measurement:
    """Wall-clock a jitted call (compile + warmup excluded)."""
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    wall = (time.perf_counter() - t0) / iters
    cost = cost_summary(fn, *args, chip=chip) if with_cost else None
    return Measurement(wall_s=wall, cost=cost)
