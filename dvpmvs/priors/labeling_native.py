"""ctypes binding for the native connected-component labeler.

Builds lazily via ``make -C native`` on first use; callers fall back to
scipy when unavailable (see priors.edges.connected_components).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"


def _load() -> ctypes.CDLL:
    global _LIB
    if _LIB is not None:
        return _LIB
    so = _NATIVE_DIR / "liblabeling.so"
    if not so.exists():
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(str(so))
    lib.label_zero_components.restype = ctypes.c_int32
    lib.label_zero_components.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
    ]
    _LIB = lib
    return lib


def label(zero_mask: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """zero_mask [H, W] bool (True = pixel to label) ->
    (labels int32 [H, W], counts int64 [n+1])."""
    lib = _load()
    h, w = zero_mask.shape
    mask = np.ascontiguousarray(~zero_mask, np.uint8)   # nonzero = background
    labels = np.zeros((h, w), np.int32)
    counts = np.zeros(h * w + 1, np.int64)
    n = lib.label_zero_components(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int32(h), ctypes.c_int32(w),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return labels, counts[:n + 1].copy()
