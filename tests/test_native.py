"""Native telemetry logger: build, schema parity, throughput sanity."""

import numpy as np
import pytest

from quadruped_gym_tpu import native
from quadruped_gym_tpu.tasks.rewards import REWARD_KEYS
from quadruped_gym_tpu.utils import metrics


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("g++ unavailable")
    return lib


def test_native_csv_matches_python_logger(tmp_path, lib):
    comp = np.arange(33, dtype=float).reshape(3, 11)

    p_native = str(tmp_path / "native.csv")
    lg = native.NativeRewardLogger(p_native, REWARD_KEYS)
    lg.log_many(0, comp)
    lg.flush()
    assert lg.dropped == 0
    lg.close()

    p_py = str(tmp_path / "python.csv")
    plg = metrics.RewardCSVLogger(p_py, REWARD_KEYS)
    plg.log_many(0, comp)
    plg.close()

    s1, t1, c1, k1 = metrics.read_reward_csv(p_native)
    s2, t2, c2, k2 = metrics.read_reward_csv(p_py)
    assert k1 == k2
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_allclose(c1, c2)
    np.testing.assert_allclose(t1, t2)


def test_native_append_keeps_single_header(tmp_path, lib):
    p = str(tmp_path / "r.csv")
    for start in (0, 2):
        lg = native.NativeRewardLogger(p, REWARD_KEYS)
        lg.log_many(start, np.ones((2, 11)))
        lg.flush()
        lg.close()
    steps, _, comp, _ = metrics.read_reward_csv(p)
    assert list(steps) == [0, 1, 2, 3]


def test_native_high_rate(tmp_path, lib):
    p = str(tmp_path / "fast.csv")
    lg = native.NativeRewardLogger(p, REWARD_KEYS, capacity_rows=1 << 15)
    rows = np.random.RandomState(0).randn(20000, 11)
    lg.log_many(0, rows)
    lg.flush()
    assert lg.dropped == 0
    lg.close()
    steps, _, comp, _ = metrics.read_reward_csv(p)
    assert len(steps) == 20000
    np.testing.assert_allclose(comp[-1], rows[-1], rtol=1e-9)


def test_fallback_factory(tmp_path):
    lg = native.make_reward_logger(str(tmp_path / "x.csv"), REWARD_KEYS)
    lg.log_many(0, np.zeros((1, 11)))
    lg.flush()
    lg.close()
