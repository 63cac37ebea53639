"""Gymnasium-compatible environment layer.

Drop-in equivalents of the reference env classes
(``/root/reference/src/envs/*.py``) backed by the JAX engine, plus the
TPU-native vectorized env (`VectorWalkingEnv`) that replaces
``SubprocVecEnv`` process parallelism with on-device batching.
"""

from .gym_env import (  # noqa: F401
    DummyWalkingQuadrupedEnv,
    POWalkingQuadrupedEnv,
    QuadrupedEnv,
    VelocityHeadingControls,
    WalkingQuadrupedEnv,
)
from .vector_env import VectorStepOutput, VectorWalkingEnv  # noqa: F401
