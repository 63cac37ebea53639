"""Actor-critic networks in plain JAX pytrees.

Matches the reference's policy capacity — PPO MlpPolicy with
``net_arch=[256, 256, 128]`` and tanh activations
(``/root/reference/src/train_quadruped.py:52-58``) — as separate actor and
critic MLPs with orthogonal initialization (SB3's default scheme) and a
state-independent log-std Gaussian head. No framework dependency: params
are nested dicts, apply functions are pure, everything jit/vmap/pjit-friendly
and the matmuls land on the MXU at any batch size.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class NetConfig:
    obs_dim: int
    act_dim: int
    hidden: Tuple[int, ...] = (256, 256, 128)
    init_log_std: float = 0.0


def _orthogonal(key, shape, scale, dtype):
    a = jax.random.normal(key, shape, jnp.float32)
    q, r = jnp.linalg.qr(a if shape[0] >= shape[1] else a.T)
    q = q * jnp.sign(jnp.diag(r))[None, :]
    if shape[0] < shape[1]:
        q = q.T
    return (scale * q[: shape[0], : shape[1]]).astype(dtype)


def _mlp_init(key, sizes: Sequence[int], out_scale: float, dtype):
    layers = []
    keys = jax.random.split(key, len(sizes) - 1)
    for i in range(len(sizes) - 1):
        scale = out_scale if i == len(sizes) - 2 else float(np.sqrt(2.0))
        layers.append({
            "w": _orthogonal(keys[i], (sizes[i], sizes[i + 1]), scale, dtype),
            "b": jnp.zeros((sizes[i + 1],), dtype),
        })
    return layers


def _mlp_apply(layers, x):
    for i, lyr in enumerate(layers):
        x = x @ lyr["w"] + lyr["b"]
        if i < len(layers) - 1:
            x = jnp.tanh(x)
    return x


def init(key: jax.Array, cfg: NetConfig, dtype=jnp.float32):
    k_pi, k_v = jax.random.split(key)
    return {
        "actor": _mlp_init(
            k_pi, (cfg.obs_dim, *cfg.hidden, cfg.act_dim), 0.01, dtype
        ),
        "critic": _mlp_init(k_v, (cfg.obs_dim, *cfg.hidden, 1), 1.0, dtype),
        "log_std": jnp.full((cfg.act_dim,), cfg.init_log_std, dtype),
    }


def actor_mean(params, obs: jnp.ndarray) -> jnp.ndarray:
    return _mlp_apply(params["actor"], obs)


def value(params, obs: jnp.ndarray) -> jnp.ndarray:
    return _mlp_apply(params["critic"], obs)[..., 0]


def sample_action(params, obs, key):
    """(action, log_prob) under the diagonal Gaussian policy."""
    mean = actor_mean(params, obs)
    std = jnp.exp(params["log_std"])
    eps = jax.random.normal(key, mean.shape, mean.dtype)
    action = mean + std * eps
    logp = gaussian_log_prob(mean, params["log_std"], action)
    return action, logp


def gaussian_log_prob(mean, log_std, action):
    std = jnp.exp(log_std)
    z = (action - mean) / std
    return jnp.sum(
        -0.5 * z**2 - log_std - 0.5 * jnp.log(2.0 * jnp.pi), axis=-1
    )


def entropy(log_std):
    return jnp.sum(log_std + 0.5 * jnp.log(2.0 * jnp.pi * jnp.e))
