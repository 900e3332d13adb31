"""ctypes binding to the native wideband-PESQ library.

Builds libcmgan_pesq.so on first use if it is missing (g++ via the
Makefile in cmgan_tpu/native/pesq). Falls back to the numpy behavioral
spec (`pesq_ref.pesq_wb_np`) when no compiler is available, so the
framework degrades gracefully instead of hard-failing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native", "pesq"
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libcmgan_pesq.so")

_lock = threading.Lock()
_lib = None
_lib_failed = False


def _load_library():
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-s"],
                    cwd=_NATIVE_DIR,
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except (OSError, subprocess.SubprocessError):
                _lib_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.cmgan_pesq_wb.restype = ctypes.c_double
            lib.cmgan_pesq_wb.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_long,
            ]
            lib.cmgan_pesq_wb_batch.restype = None
            lib.cmgan_pesq_wb_batch.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_long,
                ctypes.c_long,
                ctypes.POINTER(ctypes.c_double),
            ]
            _lib = lib
        except OSError:
            _lib_failed = True
        return _lib


def native_available() -> bool:
    return _load_library() is not None


def pesq(sample_rate: int, ref, deg, mode: str = "wb") -> float:
    """Wideband PESQ MOS-LQO. Signature mirrors the `pesq` wheel."""
    if mode != "wb":
        raise ValueError("only wideband (P.862.2) mode is supported")
    if sample_rate != 16000:
        raise ValueError("wideband PESQ requires 16 kHz input")
    ref = np.ascontiguousarray(ref, np.float64).reshape(-1)
    deg = np.ascontiguousarray(deg, np.float64).reshape(-1)
    n = min(ref.size, deg.size)

    lib = _load_library()
    if lib is None:
        from cmgan_tpu.metrics.pesq_ref import pesq_wb_np

        return pesq_wb_np(ref[:n], deg[:n])

    return float(
        lib.cmgan_pesq_wb(
            ref.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            deg.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            n,
        )
    )


def pesq_batch(ref: np.ndarray, deg: np.ndarray, sample_rate: int = 16000) -> np.ndarray:
    """Score a batch of equal-length pairs: ref, deg [B, N] -> [B]."""
    if sample_rate != 16000:
        raise ValueError("wideband PESQ requires 16 kHz input")
    ref = np.ascontiguousarray(ref, np.float64)
    deg = np.ascontiguousarray(deg, np.float64)
    assert ref.shape == deg.shape and ref.ndim == 2
    b, n = ref.shape

    lib = _load_library()
    if lib is None:
        from cmgan_tpu.metrics.pesq_ref import pesq_wb_np

        return np.array([pesq_wb_np(ref[i], deg[i]) for i in range(b)])

    out = np.empty(b, np.float64)
    lib.cmgan_pesq_wb_batch(
        ref.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        deg.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        b,
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out
