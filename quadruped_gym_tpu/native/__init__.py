"""Native (C++) runtime components, loaded via ctypes.

The compute path of this framework is JAX/XLA on TPU by design; the native
layer covers the host-side runtime pieces where C++ genuinely helps — the
high-rate telemetry writer (``telemetry.cc``: wait-free SPSC ring + writer
thread, so the 100 Hz solve loop never blocks on file IO or the GIL).

The shared library builds on demand with the in-image toolchain
(``g++ -O2 -shared``) and caches next to the source; every consumer has a
pure-Python fallback so a missing compiler never disables a feature.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRCS = [
    os.path.join(_DIR, "telemetry.cc"),
    os.path.join(_DIR, "control_bus.cc"),
]
_SO = os.path.join(_DIR, "_qgt_native.so")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> bool:
    cmd = [
        "g++", "-O2", "-std=c++17", "-fPIC", "-shared", "-pthread",
        *_SRCS, "-o", _SO, "-lrt",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """The native library, building it on first use; None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        stale = not os.path.exists(_SO) or any(
            os.path.getmtime(_SO) < os.path.getmtime(src) for src in _SRCS
        )
        if stale:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.qgt_logger_open.restype = ctypes.c_void_p
        lib.qgt_logger_open.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_size_t,
            ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
        ]
        lib.qgt_logger_log.restype = ctypes.c_int
        lib.qgt_logger_log.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.POINTER(ctypes.c_double),
        ]
        lib.qgt_logger_log_many.restype = ctypes.c_int
        lib.qgt_logger_log_many.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_size_t,
        ]
        lib.qgt_logger_dropped.restype = ctypes.c_uint64
        lib.qgt_logger_dropped.argtypes = [ctypes.c_void_p]
        lib.qgt_logger_flush.argtypes = [ctypes.c_void_p]
        lib.qgt_logger_close.argtypes = [ctypes.c_void_p]
        lib.qgt_bus_create.restype = ctypes.c_void_p
        lib.qgt_bus_create.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
        lib.qgt_bus_open.restype = ctypes.c_void_p
        lib.qgt_bus_open.argtypes = [ctypes.c_char_p]
        lib.qgt_bus_nsensor.restype = ctypes.c_int
        lib.qgt_bus_nsensor.argtypes = [ctypes.c_void_p]
        lib.qgt_bus_nctrl.restype = ctypes.c_int
        lib.qgt_bus_nctrl.argtypes = [ctypes.c_void_p]
        _dp = ctypes.POINTER(ctypes.c_double)
        lib.qgt_bus_write_sensor.argtypes = [ctypes.c_void_p, _dp, ctypes.c_double]
        lib.qgt_bus_write_ctrl.argtypes = [ctypes.c_void_p, _dp, ctypes.c_double]
        lib.qgt_bus_read_sensor.restype = ctypes.c_ulonglong
        lib.qgt_bus_read_sensor.argtypes = [ctypes.c_void_p, _dp, _dp]
        lib.qgt_bus_read_ctrl.restype = ctypes.c_ulonglong
        lib.qgt_bus_read_ctrl.argtypes = [ctypes.c_void_p, _dp, _dp]
        lib.qgt_bus_close.argtypes = [ctypes.c_void_p]
        lib.qgt_bus_unlink.restype = ctypes.c_int
        lib.qgt_bus_unlink.argtypes = [ctypes.c_char_p]
        _LIB = lib
        return _LIB


class NativeRewardLogger:
    """Drop-in, non-blocking replacement for utils.metrics.RewardCSVLogger.

    Same CSV schema (``step,total,<components...>``); enqueue is wait-free
    from the caller's thread, a C++ writer thread owns the file."""

    def __init__(self, path: str, keys: Sequence[str], capacity_rows: int = 65536,
                 binary: bool = False, append: bool = True):
        lib = load()
        if lib is None:
            raise RuntimeError("native telemetry library unavailable")
        self._lib = lib
        self.keys = tuple(keys)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._h = lib.qgt_logger_open(
            path.encode(), ",".join(keys).encode(), len(keys),
            capacity_rows, int(binary), int(append),
        )
        if not self._h:
            raise OSError(f"cannot open {path}")

    def log(self, step: int, components: np.ndarray) -> None:
        row = np.ascontiguousarray(components, dtype=np.float64)
        assert row.shape == (len(self.keys),)
        self._lib.qgt_logger_log(
            self._h, step, row.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
        )

    def log_many(self, start_step: int, components: np.ndarray) -> None:
        rows = np.ascontiguousarray(components, dtype=np.float64)
        assert rows.ndim == 2 and rows.shape[1] == len(self.keys)
        self._lib.qgt_logger_log_many(
            self._h, start_step,
            rows.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            rows.shape[0],
        )

    @property
    def dropped(self) -> int:
        return int(self._lib.qgt_logger_dropped(self._h))

    def flush(self) -> None:
        self._lib.qgt_logger_flush(self._h)

    def close(self) -> None:
        if self._h:
            self._lib.qgt_logger_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def make_reward_logger(path: str, keys: Sequence[str]):
    """NativeRewardLogger when the toolchain allows, else the Python CSV
    logger — identical schema either way."""
    try:
        return NativeRewardLogger(path, keys)
    except Exception:
        from ..utils.metrics import RewardCSVLogger

        return RewardCSVLogger(path, keys)


class ControlBus:
    """Shared-memory real-time exchange with a robot driver process.

    Two seqlock-protected blocks in POSIX shm (``control_bus.cc``): the
    driver publishes (timestamp, sensordata) at its own rate; the MPC loop
    publishes (timestamp, ctrl). Writers are wait-free, readers retry on
    torn snapshots; either process can crash and reattach.

    >>> bus = ControlBus.create("/qgt_robot0", nsensor=33, nctrl=12)
    >>> bus.write_ctrl(ctrl, t)                  # MPC side, 100 Hz
    >>> seq, sens, t = bus.read_sensor()          # returns (0, None, None)
    ...                                           # until the driver writes
    """

    def __init__(self, lib, handle, name: str):
        self._lib = lib
        self._h = handle
        self.name = name
        self.nsensor = int(lib.qgt_bus_nsensor(handle))
        self.nctrl = int(lib.qgt_bus_nctrl(handle))

    @classmethod
    def create(cls, name: str, nsensor: int, nctrl: int) -> "ControlBus":
        lib = load()
        if lib is None:
            raise RuntimeError("native control-bus library unavailable")
        h = lib.qgt_bus_create(name.encode(), nsensor, nctrl)
        if not h:
            raise OSError(f"cannot create shm bus {name}")
        return cls(lib, h, name)

    @classmethod
    def open(cls, name: str) -> "ControlBus":
        lib = load()
        if lib is None:
            raise RuntimeError("native control-bus library unavailable")
        h = lib.qgt_bus_open(name.encode())
        if not h:
            raise OSError(f"cannot open shm bus {name}")
        return cls(lib, h, name)

    def _write(self, fn, values, n, t):
        if not self._h:
            raise RuntimeError("ControlBus is closed")
        v = np.ascontiguousarray(values, dtype=np.float64)
        if v.shape != (n,):
            raise ValueError(f"expected shape ({n},), got {v.shape}")
        fn(self._h, v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
           float(t))

    def write_sensor(self, values, t: float = 0.0) -> None:
        self._write(self._lib.qgt_bus_write_sensor, values, self.nsensor, t)

    def write_ctrl(self, values, t: float = 0.0) -> None:
        self._write(self._lib.qgt_bus_write_ctrl, values, self.nctrl, t)

    def _read(self, fn, n):
        if not self._h:
            raise RuntimeError("ControlBus is closed")
        out = np.empty(n, np.float64)
        t = ctypes.c_double(0.0)
        seq = fn(self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                 ctypes.byref(t))
        if seq == 0:
            return 0, None, None
        return int(seq), out, float(t.value)

    def read_sensor(self):
        """(seq, values, timestamp); seq==0 means never written."""
        return self._read(self._lib.qgt_bus_read_sensor, self.nsensor)

    def read_ctrl(self):
        return self._read(self._lib.qgt_bus_read_ctrl, self.nctrl)

    def close(self) -> None:
        if self._h:
            self._lib.qgt_bus_close(self._h)
            self._h = None

    def unlink(self) -> None:
        self._lib.qgt_bus_unlink(self.name.encode())

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
