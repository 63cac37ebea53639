"""TPU-native hot-path ops: lane-batched (batch-minor) physics engine.

``lane_engine`` is the throughput path for sampling MPC: identical math to
``physics.engine`` (the oracle-parity path) but laid out so the batch rides
the TPU's 128-lane vector registers with zero padding. ``leg_engine``
additionally folds the four identical legs into a (4, B) lane dim (~3x
fewer vector ops on this instruction-issue-bound workload) and is the
default planner engine; it requires the feet-only collision model.
"""

from . import lane, lane_engine, leg_engine  # noqa: F401
from .lane_engine import (  # noqa: F401
    LaneState,
    control_step,
    from_batched,
    make_lane_state,
    step,
    to_batched,
)
