"""Observability: reward CSV logging, static plots, live dashboard.

Equivalents of the reference's L6 layer (``src/utils/plot.py``,
``src/utils/server.py``, the ``RewardCallback`` CSV schema)."""

from .metrics import RewardCSVLogger, read_reward_csv  # noqa: F401
from .plot import (  # noqa: F401
    moving_average,
    plot_data,
    plot_data_line,
    plot_reward_components,
)
