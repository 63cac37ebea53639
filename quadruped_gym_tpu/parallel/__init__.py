"""Multi-chip parallelism: device meshes, sharded MPC, collectives.

Replaces the reference's process-level data parallelism
(``SubprocVecEnv`` over pipes, ``/root/reference/src/train_quadruped.py:49-50``)
with SPMD over a ``jax.sharding.Mesh``: the MPC sample axis and the RL env
batch axis shard across chips, and the only cross-chip traffic is a handful
of small psum/pmin all-reduces riding ICI.
"""

from . import multihost  # noqa: F401
from .mesh import (  # noqa: F401
    DATA_AXIS,
    SAMPLE_AXIS,
    make_mesh,
    replicated,
    sharded_on,
)
from .pipeline import (  # noqa: F401
    STAGE_AXIS,
    pipelined_mppi_plan,
    pipelined_rollout_cost,
)
from .sharded_mpc import (  # noqa: F401
    sharded_batch_mppi_plan,
    sharded_mppi_plan,
    sharded_rollout_costs,
)
