"""On-device reinforcement learning (PPO) for the walking task.

Replaces the reference's SB3/torch training stack
(``/root/reference/src/train_quadruped.py``) with a pure-JAX PPO whose
rollouts, GAE and minibatch epochs all run inside one jitted scan on the
TPU; environments are the vmapped functional walking task.
"""

from . import distributed, networks, ppo  # noqa: F401
from .ppo import (  # noqa: F401
    PPOConfig,
    TrainState,
    UpdateMetrics,
    init_train_state,
    train_chunk,
    update_fn,
)
