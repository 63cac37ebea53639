"""Trajectory-optimization solvers: sampling MPC (MPPI, CEM) + iLQR/SQP.

The sampling solvers vmap thousands of H-step rollouts per solve (the
BASELINE north-star workload); iLQR is the gradient-based companion with
batched finite-difference linearization. All are pure functions usable
under jit/shard_map; the receding-horizon runtime lives in
``quadruped_gym_tpu.runtime.mpc_runtime``.
"""

from . import cem, ilqr, mppi, rollout, sqp  # noqa: F401
from .cem import CEMConfig  # noqa: F401
from .ilqr import ILQRConfig, ILQRResult  # noqa: F401
from .mppi import MPPIConfig, PlanResult  # noqa: F401
from .sqp import SQPConfig, SQPResult  # noqa: F401
from .rollout import RolloutConfig, make_cost_fn  # noqa: F401
