"""Online per-channel frequency & amplitude estimation as an explicit
functional carry.

Exact re-derivation of the reference's stateful
``OnlineFrequencyAmplitudeEstimation`` (``math_utils.py:11-158``):
derivative-sign-crossing counting over a circular window (frequency) and
windowed max-min (amplitude), both EMA-smoothed — including the first-call
behavior (store sample, return zeros) and zero-derivative sign retention.
The circular buffers become fixed-shape arrays in the carry, so the whole
estimator vmaps across environments and lives inside ``lax.scan``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class FreqAmpState(NamedTuple):
    signal_buffer: jnp.ndarray  # (W, C)
    crossings_buffer: jnp.ndarray  # (W, C) 0/1
    buffer_index: jnp.ndarray  # () int32
    crossings_count: jnp.ndarray  # (C,)
    sample_count: jnp.ndarray  # () int32
    prev_sample: jnp.ndarray  # (C,)
    prev_deriv_sign: jnp.ndarray  # (C,)
    has_prev_sample: jnp.ndarray  # () bool (prev_sample is None in the ref)
    has_prev_sign: jnp.ndarray  # () bool
    f_est: jnp.ndarray  # (C,)
    a_est: jnp.ndarray  # (C,)


def window_size(min_freq: float, dt: float) -> int:
    """Two cycles of min_freq (math_utils.py:28)."""
    import math

    return int(math.ceil(2.0 / (min_freq * dt)))


def init(n_channels: int, window: int, dtype=jnp.float32) -> FreqAmpState:
    return FreqAmpState(
        signal_buffer=jnp.zeros((window, n_channels), dtype=dtype),
        crossings_buffer=jnp.zeros((window, n_channels), dtype=dtype),
        buffer_index=jnp.zeros((), dtype=jnp.int32),
        crossings_count=jnp.zeros(n_channels, dtype=dtype),
        sample_count=jnp.zeros((), dtype=jnp.int32),
        prev_sample=jnp.zeros(n_channels, dtype=dtype),
        prev_deriv_sign=jnp.zeros(n_channels, dtype=dtype),
        has_prev_sample=jnp.zeros((), dtype=jnp.bool_),
        has_prev_sign=jnp.zeros((), dtype=jnp.bool_),
        f_est=jnp.zeros(n_channels, dtype=dtype),
        a_est=jnp.zeros(n_channels, dtype=dtype),
    )


def update(
    s: FreqAmpState, x: jnp.ndarray, dt: float, ema_alpha: float = 0.80
):
    """One estimator update. Returns (new_state, f_est, a_est)."""
    W = s.signal_buffer.shape[0]
    dtype = s.signal_buffer.dtype
    first = ~s.has_prev_sample

    # --- first call: only store the sample (math_utils.py:69-74) ---
    sig_first = s.signal_buffer.at[s.buffer_index].set(x)

    # --- regular update ---
    diff = x - s.prev_sample
    sign = jnp.sign(diff)
    sign = jnp.where(
        s.has_prev_sign & (sign == 0), s.prev_deriv_sign, sign
    )
    crossing = jnp.where(
        s.has_prev_sign, (sign != s.prev_deriv_sign).astype(dtype), 0.0
    )
    sample_count = jnp.minimum(s.sample_count + 1, W)
    crossings_count = (
        s.crossings_count - s.crossings_buffer[s.buffer_index] + crossing
    )
    crossings_buffer = s.crossings_buffer.at[s.buffer_index].set(crossing)
    signal_buffer = s.signal_buffer.at[s.buffer_index].set(x)

    effective_duration = sample_count.astype(dtype) * dt
    f_current = (crossings_count / 2.0) / effective_duration
    f_est = ema_alpha * s.f_est + (1 - ema_alpha) * f_current

    # amplitude over the filled portion of the buffer
    row = jnp.arange(W, dtype=jnp.int32)[:, None]
    filled = row < sample_count
    big = jnp.asarray(jnp.inf, dtype)
    amp = jnp.max(jnp.where(filled, signal_buffer, -big), axis=0) - jnp.min(
        jnp.where(filled, signal_buffer, big), axis=0
    )
    a_est = ema_alpha * s.a_est + (1 - ema_alpha) * amp

    new = FreqAmpState(
        signal_buffer=jnp.where(first, sig_first, signal_buffer),
        crossings_buffer=jnp.where(first, s.crossings_buffer, crossings_buffer),
        buffer_index=(s.buffer_index + 1) % W,
        crossings_count=jnp.where(first, s.crossings_count, crossings_count),
        sample_count=jnp.where(first, jnp.asarray(1, jnp.int32), sample_count),
        prev_sample=x,
        prev_deriv_sign=jnp.where(first, s.prev_deriv_sign, sign),
        has_prev_sample=jnp.ones((), jnp.bool_),
        has_prev_sign=s.has_prev_sample,  # sign becomes valid after 2nd call
        f_est=jnp.where(first, s.f_est, f_est),
        a_est=jnp.where(first, s.a_est, a_est),
    )
    f_out = jnp.where(first, s.f_est, f_est)
    a_out = jnp.where(first, s.a_est, a_est)
    return new, f_out, a_out
