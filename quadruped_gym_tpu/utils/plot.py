"""Static training plots (reference L6: ``src/utils/plot.py``).

Same three entry points as the reference — moving-average reward curves
with a std band (``plot.py:13-66``), binned mean±std curves
(``plot.py:68-146``), and an every-component overview
(``plot.py:150-179``). The reference's plotly HTML output is gated on
plotly being installed (it is not in this image); the overview falls back
to a multi-panel matplotlib PNG so the artifact always exists.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

try:  # optional, matches the reference's interactive HTML output
    import plotly.graph_objects as go  # type: ignore

    _HAS_PLOTLY = True
except Exception:  # pragma: no cover
    _HAS_PLOTLY = False


def moving_average(x: np.ndarray, window: int) -> np.ndarray:
    if window <= 1:
        return np.asarray(x, float)
    k = np.ones(window) / window
    return np.convolve(np.asarray(x, float), k, mode="valid")


def plot_data_line(
    values: Sequence[float],
    window: int = 100,
    title: str = "Reward",
    ylabel: str = "reward",
    save_path: Optional[str] = None,
):
    """Moving-average curve with a rolling-std band (plot.py:13-66)."""
    v = np.asarray(values, float)
    fig, ax = plt.subplots(figsize=(10, 5))
    if len(v) >= max(2, window):
        ma = moving_average(v, window)
        xs = np.arange(len(ma)) + window - 1
        roll_std = np.array(
            [v[max(0, i - window + 1): i + 1].std() for i in xs]
        )
        ax.plot(xs, ma, lw=1.5, label=f"moving avg (w={window})")
        ax.fill_between(xs, ma - roll_std, ma + roll_std, alpha=0.25,
                        label="±1 std")
    ax.plot(np.arange(len(v)), v, alpha=0.25, lw=0.5, label="raw")
    ax.set_title(title)
    ax.set_xlabel("step")
    ax.set_ylabel(ylabel)
    ax.legend(loc="best")
    fig.tight_layout()
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
        return save_path
    return fig


def plot_data(
    values: Sequence[float],
    num_bins: int = 100,
    title: str = "Reward",
    ylabel: str = "reward",
    save_path: Optional[str] = None,
):
    """Binned mean ± std curve (plot.py:68-146)."""
    v = np.asarray(values, float)
    n = max(1, len(v) // max(1, num_bins))
    nbins = len(v) // n
    if nbins == 0:
        return plot_data_line(values, 1, title, ylabel, save_path)
    trimmed = v[: nbins * n].reshape(nbins, n)
    mean = trimmed.mean(axis=1)
    std = trimmed.std(axis=1)
    xs = (np.arange(nbins) + 0.5) * n
    fig, ax = plt.subplots(figsize=(10, 5))
    ax.plot(xs, mean, lw=1.5, label="bin mean")
    ax.fill_between(xs, mean - std, mean + std, alpha=0.25, label="±1 std")
    ax.set_title(title)
    ax.set_xlabel("step")
    ax.set_ylabel(ylabel)
    ax.legend(loc="best")
    fig.tight_layout()
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
        return save_path
    return fig


def plot_reward_components(
    components: np.ndarray,
    keys: Sequence[str],
    save_path: str,
    window: int = 100,
):
    """All reward components in one artifact (plot.py:150-179).

    ``components``: (steps, n_components). Writes interactive HTML when
    plotly is available, else a multi-panel PNG."""
    comp = np.asarray(components, float)
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    if _HAS_PLOTLY and save_path.endswith(".html"):  # pragma: no cover
        fig = go.Figure()
        for i, k in enumerate(keys):
            fig.add_trace(go.Scatter(y=comp[:, i], name=k, mode="lines"))
        fig.update_layout(title="Reward components", xaxis_title="step")
        fig.write_html(save_path)
        return save_path
    if save_path.endswith(".html"):
        save_path = save_path[:-5] + ".png"
    ncols = 3
    nrows = (len(keys) + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols, figsize=(4 * ncols, 2.5 * nrows),
                             squeeze=False)
    for i, k in enumerate(keys):
        ax = axes[i // ncols][i % ncols]
        v = comp[:, i]
        ax.plot(v, alpha=0.3, lw=0.5)
        if len(v) >= window:
            ax.plot(np.arange(window - 1, len(v)), moving_average(v, window),
                    lw=1.2)
        ax.set_title(k, fontsize=9)
    for j in range(len(keys), nrows * ncols):
        axes[j // ncols][j % ncols].axis("off")
    fig.tight_layout()
    fig.savefig(save_path, dpi=120)
    plt.close(fig)
    return save_path
