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
_SRC = os.path.join(_DIR, "telemetry.cc")
_SO = os.path.join(_DIR, "_qgt_native.so")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> bool:
    cmd = [
        "g++", "-O2", "-std=c++17", "-fPIC", "-shared", "-pthread",
        _SRC, "-o", _SO,
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
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
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
