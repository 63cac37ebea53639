"""PPO on the TPU: fully on-device rollout + update loop.

TPU-native replacement for the reference's training stack
(SB3 ``PPO`` over a 10-process ``SubprocVecEnv``,
``/root/reference/src/train_quadruped.py:29-141``): thousands of
environments step as one ``vmap`` on-chip, the rollout is a ``lax.scan``,
GAE/minibatch/epoch loops are scans inside ONE jitted update, and whole
training chunks (many updates) run without touching the host. Multi-chip:
the env batch shards over the mesh's data axis and gradients reduce with a
single psum per minibatch (see ``distributed_update_fn``).

Hyperparameters default to SB3's PPO defaults (the reference overrides
nothing but the network shape and batch size).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..envs import vector_env
from ..models.spec import PhysicsModel
from ..tasks import rewards, walking
from . import networks


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    num_envs: int = 2048
    num_steps: int = 32  # rollout length per update
    learning_rate: float = 3e-4
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    epochs: int = 4
    num_minibatches: int = 8
    vf_coef: float = 0.5
    ent_coef: float = 0.0
    max_grad_norm: float = 0.5
    hidden: Tuple[int, ...] = (256, 256, 128)
    # optional bounds on the state-independent log-std head, applied
    # after each minibatch step. SB3's defaults leave the std to shrink
    # only via the surrogate objective, which after 10M steps still
    # leaves std ~ 0.7 — wide enough that the STOCHASTIC policy (the
    # reference's eval protocol, eval_quadruped.py:23) drowns in
    # control-cost noise. A fine-tune phase with log_std_max ~ -1.2
    # (std <= 0.30) makes the sampled policy walk.
    log_std_min: Optional[float] = None
    log_std_max: Optional[float] = None
    # route env physics through the batch-minor lane/leg engine
    # (walking.batched_step) — the training-throughput path
    lane_physics: bool = False

    @property
    def batch_size(self) -> int:
        return self.num_envs * self.num_steps


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    env_state: walking.WalkingState  # batched (num_envs, ...)
    obs: jnp.ndarray  # (num_envs, obs_dim)
    key: jax.Array
    update_idx: jnp.ndarray  # ()


class UpdateMetrics(NamedTuple):
    mean_reward: jnp.ndarray
    mean_episode_done: jnp.ndarray
    pg_loss: jnp.ndarray
    vf_loss: jnp.ndarray
    entropy: jnp.ndarray
    approx_kl: jnp.ndarray
    # (num_steps, 11): one row per policy step, averaged over the env batch —
    # the reference's CSV granularity (RewardCallback._on_step averages each
    # component over its 10 envs every vec-env step, train_quadruped.py:86-110)
    reward_components: jnp.ndarray


def _optimizer(cfg: PPOConfig):
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adam(cfg.learning_rate, eps=1e-5),
    )


def init_train_state(
    m: PhysicsModel,
    env_cfg: walking.WalkingConfig,
    cfg: PPOConfig,
    key: jax.Array,
) -> TrainState:
    k_net, k_env, k_train = jax.random.split(key, 3)
    obs_dim = walking.obs_size(env_cfg, m)
    net_cfg = networks.NetConfig(obs_dim=obs_dim, act_dim=m.nu, hidden=cfg.hidden)
    params = networks.init(k_net, net_cfg)
    opt_state = _optimizer(cfg).init(params)
    env_keys = jax.random.split(k_env, cfg.num_envs)
    env_state, obs = jax.vmap(lambda k: walking.reset(m, env_cfg, k))(env_keys)
    return TrainState(
        params=params,
        opt_state=opt_state,
        env_state=env_state,
        obs=obs,
        key=k_train,
        update_idx=jnp.zeros((), jnp.int32),
    )


class _Transition(NamedTuple):
    obs: jnp.ndarray
    action: jnp.ndarray
    log_prob: jnp.ndarray
    value: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    reward_components: jnp.ndarray


def _rollout(m, env_cfg, cfg: PPOConfig, params, env_state, obs, key):
    """num_steps on-device env steps; returns stacked transitions."""

    def body(carry, _):
        env_state, obs, key = carry
        key, k_act = jax.random.split(key)
        action, logp = networks.sample_action(params, obs, k_act)
        val = networks.value(params, obs)
        action_c = jnp.clip(action, -1.0, 1.0)
        if cfg.lane_physics:
            out = vector_env.batched_autoreset_step(
                m, env_cfg, env_state, action_c
            )
        else:
            out = jax.vmap(
                lambda st, a: vector_env.autoreset_step(m, env_cfg, st, a)
            )(env_state, action_c)
        tr = _Transition(
            obs=obs,
            action=action,
            log_prob=logp,
            value=val,
            reward=out.reward,
            done=out.done,
            reward_components=out.reward_components,
        )
        return (out.state, out.obs, key), tr

    (env_state, obs, key), traj = jax.lax.scan(
        body, (env_state, obs, key), None, length=cfg.num_steps
    )
    return env_state, obs, key, traj


def _gae(cfg: PPOConfig, traj: _Transition, last_value):
    def body(carry, tr):
        gae, next_value = carry
        delta = tr.reward + cfg.gamma * next_value * (1.0 - tr.done) - tr.value
        gae = delta + cfg.gamma * cfg.gae_lambda * (1.0 - tr.done) * gae
        return (gae, tr.value), gae

    (_, _), advantages = jax.lax.scan(
        body,
        (jnp.zeros_like(last_value), last_value),
        traj,
        reverse=True,
    )
    returns = advantages + traj.value
    return advantages, returns


def _loss_fn(params, cfg: PPOConfig, batch):
    obs, action, old_logp, old_value, adv, ret = batch
    mean = networks.actor_mean(params, obs)
    logp = networks.gaussian_log_prob(mean, params["log_std"], action)
    val = networks.value(params, obs)

    ratio = jnp.exp(logp - old_logp)
    adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)
    pg1 = ratio * adv_n
    pg2 = jnp.clip(ratio, 1.0 - cfg.clip_eps, 1.0 + cfg.clip_eps) * adv_n
    pg_loss = -jnp.mean(jnp.minimum(pg1, pg2))

    vf_loss = 0.5 * jnp.mean((val - ret) ** 2)
    ent = networks.entropy(params["log_std"])
    total = pg_loss + cfg.vf_coef * vf_loss - cfg.ent_coef * ent
    approx_kl = jnp.mean(old_logp - logp)
    return total, (pg_loss, vf_loss, ent, approx_kl)


def update_fn(
    m: PhysicsModel,
    env_cfg: walking.WalkingConfig,
    cfg: PPOConfig,
    axis_name: Optional[str] = None,
):
    """One PPO update (rollout + epochs of minibatch SGD), pure function.

    With ``axis_name`` set, gradients psum over that mesh axis (each shard
    rolls out its own env slice — data parallelism over chips)."""
    opt = _optimizer(cfg)

    def update(ts: TrainState) -> Tuple[TrainState, UpdateMetrics]:
        env_state, obs, key, traj = _rollout(
            m, env_cfg, cfg, ts.params, ts.env_state, ts.obs, ts.key
        )
        last_value = networks.value(ts.params, obs)
        adv, ret = _gae(cfg, traj, last_value)

        # flatten (T, N, ...) -> (T*N, ...)
        flat = jax.tree.map(
            lambda x: x.reshape((-1,) + x.shape[2:]),
            (traj.obs, traj.action, traj.log_prob, traj.value, adv, ret),
        )
        n = flat[0].shape[0]
        mb_size = n // cfg.num_minibatches

        def epoch(carry, _):
            params, opt_state, key = carry
            key, k_perm = jax.random.split(key)
            perm = jax.random.permutation(k_perm, n)
            shuffled = jax.tree.map(lambda x: x[perm], flat)

            def minibatch(carry, idx):
                params, opt_state = carry
                mb = jax.tree.map(
                    lambda x: jax.lax.dynamic_slice_in_dim(
                        x, idx * mb_size, mb_size
                    ),
                    shuffled,
                )
                (loss, aux), grads = jax.value_and_grad(
                    _loss_fn, has_aux=True
                )(params, cfg, mb)
                if axis_name is not None:
                    grads = jax.lax.pmean(grads, axis_name)
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                if cfg.log_std_min is not None or cfg.log_std_max is not None:
                    params = dict(params, log_std=jnp.clip(
                        params["log_std"], cfg.log_std_min, cfg.log_std_max
                    ))
                return (params, opt_state), aux

            (params, opt_state), auxs = jax.lax.scan(
                minibatch, (params, opt_state),
                jnp.arange(cfg.num_minibatches),
            )
            return (params, opt_state, key), auxs

        (params, opt_state, key), auxs = jax.lax.scan(
            epoch, (ts.params, ts.opt_state, key), None, length=cfg.epochs
        )
        pg, vf, ent, kl = jax.tree.map(lambda x: x[-1, -1], auxs)

        metrics = UpdateMetrics(
            mean_reward=jnp.mean(traj.reward),
            mean_episode_done=jnp.mean(traj.done),
            pg_loss=pg,
            vf_loss=vf,
            entropy=ent,
            approx_kl=kl,
            reward_components=jnp.mean(traj.reward_components, axis=1),
        )
        new_ts = TrainState(
            params=params,
            opt_state=opt_state,
            env_state=env_state,
            obs=obs,
            key=key,
            update_idx=ts.update_idx + 1,
        )
        return new_ts, metrics

    return update


def train_chunk(
    m: PhysicsModel,
    env_cfg: walking.WalkingConfig,
    cfg: PPOConfig,
    ts: TrainState,
    num_updates: int,
):
    """Run ``num_updates`` PPO updates in one jitted scan.

    Returns (train_state, stacked UpdateMetrics) — the host only sees the
    final state and the metrics history (the reference's per-step CSV rows,
    ``train_quadruped.py:86-110``, fall out of reward_components)."""
    update = update_fn(m, env_cfg, cfg)

    def body(ts, _):
        return update(ts)

    return jax.lax.scan(body, ts, None, length=num_updates)
