"""Native telemetry logger: build, schema parity, throughput sanity."""

import os

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


def test_control_bus_roundtrip(lib):
    name = f"/qgt_bus_test_{os.getpid()}"
    bus = native.ControlBus.create(name, nsensor=33, nctrl=12)
    try:
        assert bus.read_sensor()[0] == 0  # never written
        bus.write_sensor(np.arange(33.0), t=1.25)
        bus.write_ctrl(np.arange(12.0) * 0.1, t=2.5)
        seq, v, t = bus.read_sensor()
        assert seq == 2 and t == 1.25
        np.testing.assert_array_equal(v, np.arange(33.0))
        # a second process attaches and exchanges both directions
        other = native.ControlBus.open(name)
        seq, v, t = other.read_ctrl()
        assert seq == 2 and t == 2.5
        np.testing.assert_allclose(v, np.arange(12.0) * 0.1)
        other.write_sensor(np.full(33, 7.0), t=9.0)
        other.close()
        seq, v, t = bus.read_sensor()
        assert seq == 4 and t == 9.0 and (v == 7.0).all()
    finally:
        bus.unlink()
        bus.close()


def test_control_bus_no_torn_reads(lib):
    """Seqlock consistency under a concurrent writer: every snapshot the
    reader obtains is internally consistent (all elements equal)."""
    import threading

    name = f"/qgt_bus_tear_{os.getpid()}"
    bus = native.ControlBus.create(name, nsensor=64, nctrl=12)
    stop = threading.Event()

    def writer():
        k = 0.0
        while not stop.is_set():
            k += 1.0
            bus.write_sensor(np.full(64, k), t=k)

    th = threading.Thread(target=writer, daemon=True)
    th.start()
    try:
        reads = 0
        while reads < 2000:
            seq, v, t = bus.read_sensor()
            if seq == 0:
                continue
            assert v.min() == v.max(), "torn snapshot"
            assert t == v[0]
            reads += 1
    finally:
        stop.set()
        th.join(timeout=5)
        bus.unlink()
        bus.close()
