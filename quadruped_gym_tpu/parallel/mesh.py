"""Device-mesh construction for multi-chip scaling.

The reference's only parallelism is 10 OS processes with pipe IPC
(``/root/reference/src/train_quadruped.py:49-50``). The TPU-native
equivalent is a ``jax.sharding.Mesh`` over the slice:

- ``sample`` axis: MPC rollout samples (the embarrassingly parallel axis;
  collectives only at the weighting reduction — a psum riding ICI).
- ``data`` axis: environment batch for RL training (gradients psum over it).
- ``horizon`` axis: iLQR/SQP horizon-block QP condensation (solvers/sqp.py,
  one psum assembles the condensed system — the TP-analog reduction).
- ``stage`` axis: GPipe-style horizon pipeline (parallel/pipeline.py,
  segment boundary states hop stages via ppermute — the PP analog).

There is no tensor dimension in the *model* itself (the policy is a tiny
MLP and the physics state is 18-dim), so meshes stay 1-2D; the horizon
is the dimension that shards when one chip isn't enough for a solve.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


SAMPLE_AXIS = "sample"
DATA_AXIS = "data"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Tuple[str, ...] = (SAMPLE_AXIS,),
    shape: Optional[Tuple[int, ...]] = None,
) -> Mesh:
    """Build a mesh over ``devices`` (default: all local devices).

    With no explicit ``shape``, all devices go on the first axis and any
    remaining axes get size 1 — the right default for this workload, where
    one data-parallel axis dominates.
    """
    devs = list(devices) if devices is not None else list(jax.devices())
    if shape is None:
        shape = (len(devs),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devs).reshape(shape)
    return Mesh(arr, axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def sharded_on(mesh: Mesh, axis: str, ndim: int, dim: int = 0) -> NamedSharding:
    """NamedSharding placing ``axis`` on array dimension ``dim``."""
    spec = [None] * ndim
    spec[dim] = axis
    return NamedSharding(mesh, P(*spec))
