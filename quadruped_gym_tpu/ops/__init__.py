"""TPU-native hot-path ops: lane-batched (batch-minor) physics engine.

``lane_engine`` is the throughput path for sampling MPC: identical math to
``physics.engine`` (the oracle-parity path) but laid out so the batch rides
the TPU's 128-lane vector registers with zero padding.
"""

from . import lane, lane_engine  # noqa: F401
from .lane_engine import (  # noqa: F401
    LaneState,
    control_step,
    from_batched,
    make_lane_state,
    step,
    to_batched,
)
