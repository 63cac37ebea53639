"""Roofline accounting + measurement helpers."""

import jax.numpy as jnp
import numpy as np

from quadruped_gym_tpu.utils import profiling


def test_cost_summary_matmul():
    a = jnp.ones((256, 256), jnp.float32)
    cs = profiling.cost_summary(lambda x: x @ x, a)
    # 2*n^3 flops for a square matmul
    assert cs.flops >= 2 * 256**3 * 0.9
    assert cs.bytes_accessed >= 2 * 256 * 256 * 4
    assert cs.bound in ("compute", "memory")
    assert cs.roofline_s > 0


def test_measure_runs():
    a = jnp.ones((128, 128), jnp.float32)
    meas = profiling.measure(lambda x: (x * 2.0).sum(), a, iters=3)
    assert meas.wall_s > 0
    assert meas.cost is not None
    sol = meas.speed_of_light
    assert sol is None or sol >= 0
