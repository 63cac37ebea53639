"""CSV logger, plots, and dashboard endpoint tests (reference L6 parity)."""

import json
import os
import urllib.request

import numpy as np

from quadruped_gym_tpu.tasks.rewards import REWARD_KEYS
from quadruped_gym_tpu.utils import metrics, plot


def test_csv_roundtrip(tmp_path):
    path = str(tmp_path / "rewards_continuous.csv")
    lg = metrics.RewardCSVLogger(path)
    comp = np.arange(22, dtype=float).reshape(2, 11)
    lg.log_many(0, comp)
    lg.close()
    steps, totals, out, keys = metrics.read_reward_csv(path)
    assert keys == REWARD_KEYS
    np.testing.assert_allclose(out, comp)
    np.testing.assert_allclose(totals, comp.sum(axis=1))
    # appending (crash-resume) keeps the header unique
    lg2 = metrics.RewardCSVLogger(path)
    lg2.log_many(2, comp[:1])
    lg2.close()
    steps, _, out, _ = metrics.read_reward_csv(path)
    assert len(steps) == 3 and steps[-1] == 2


def test_plots_write_files(tmp_path):
    vals = np.sin(np.linspace(0, 10, 500)) + np.random.RandomState(0).randn(500) * 0.1
    p1 = plot.plot_data_line(vals, window=50, save_path=str(tmp_path / "a.png"))
    p2 = plot.plot_data(vals, num_bins=20, save_path=str(tmp_path / "b.png"))
    comp = np.random.RandomState(1).randn(200, 11)
    p3 = plot.plot_reward_components(comp, REWARD_KEYS, str(tmp_path / "c.html"))
    for p in (p1, p2, p3):
        assert os.path.exists(p) and os.path.getsize(p) > 0


def test_dashboard_serves_data(tmp_path):
    from quadruped_gym_tpu.utils.server import launch_dash

    path = str(tmp_path / "rewards_continuous.csv")
    lg = metrics.RewardCSVLogger(path)
    lg.log_many(0, np.ones((3, 11)))
    lg.close()
    srv = launch_dash(path, host="127.0.0.1", port=18050, block=False)
    try:
        with urllib.request.urlopen("http://127.0.0.1:18050/data") as r:
            payload = json.loads(r.read())
        assert payload["keys"] == list(REWARD_KEYS)
        assert len(payload["rows"]) == 3
        with urllib.request.urlopen("http://127.0.0.1:18050/") as r:
            assert b"quadruped-gym-tpu" in r.read()
    finally:
        srv.shutdown()
