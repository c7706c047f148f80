"""ctypes binding for the native C++ data pipeline (native/dataload.cpp).

The library is compiled on first use with g++ (cached next to the source);
when no toolchain is available every entry point degrades to the numpy
``Transform`` path, so the framework stays importable everywhere.

ctypes calls release the GIL, so the pool's resize/crop/normalize work
overlaps the training/serving loop — the role torch's DataLoader worker
processes play in the reference (SURVEY.md section 3.1 process boundary).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "dataload.cpp")
_SO = os.path.join(os.path.dirname(__file__), "..", "..", "native", "_dataload.so")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> Optional[str]:
    src = os.path.abspath(_SRC)
    so = os.path.abspath(_SO)
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    # NOTE: no -march=native — this host advertises AVX-512 but executes
    # gather/scatter pathologically slowly (XLA itself pins prefer-no-gather);
    # baseline x86-64 + integer fixed-point kernels is faster in practice.
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread", src, "-o", so]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=240)
        return so
    except Exception as e:  # pragma: no cover - toolchain-dependent
        logger.warning("native dataload build failed (%s); using numpy path", e)
        return None


def load_library() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.qtpu_pipeline_create.restype = ctypes.c_void_p
        lib.qtpu_pipeline_create.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_uint64, ctypes.c_int,
        ]
        lib.qtpu_pipeline_destroy.argtypes = [ctypes.c_void_p]
        lib.qtpu_pipeline_run.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_uint64,
        ]
        lib.qtpu_pipeline_run_varied.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_uint64,
        ]
        _LIB = lib
        return _LIB


def available() -> bool:
    return load_library() is not None


class NativePipeline:
    """Thread-pooled image preprocessing: uint8 HWC images -> normalized f32
    NHWC batch. Mirrors a ``Transform``'s eval/CIFAR-train semantics (the
    inception-style random-sized-crop stays on the numpy path)."""

    def __init__(self, transform, threads: int = 0, seed: int = 0):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native dataload library unavailable")
        self._lib = lib
        self.transform = transform
        c = len(transform.mean)
        mean = (ctypes.c_float * c)(*[float(m) for m in transform.mean])
        std = (ctypes.c_float * c)(*[float(s) for s in transform.std])
        self.channels = c
        self.input_size = transform.input_size
        self._handle = lib.qtpu_pipeline_create(
            transform.input_size, transform.scale_size, c, mean, std,
            1 if transform.augment else 0, transform.pad if transform.augment else 0,
            seed, threads,
        )
        self._counter = 0

    def __del__(self):  # pragma: no cover
        h = getattr(self, "_handle", None)
        if h:
            self._lib.qtpu_pipeline_destroy(h)
            self._handle = None

    def __call__(self, batch_u8: np.ndarray) -> np.ndarray:
        """(N, H, W, C) uint8 contiguous -> (N, size, size, C) f32."""
        batch_u8 = np.ascontiguousarray(batch_u8, np.uint8)
        if batch_u8.ndim == 3:
            batch_u8 = batch_u8[..., None]
        n, h, w, c = batch_u8.shape
        assert c == self.channels, (c, self.channels)
        out = np.empty((n, self.input_size, self.input_size, c), np.float32)
        self._lib.qtpu_pipeline_run(
            self._handle,
            batch_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n, h, w,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._counter,
        )
        self._counter += n
        return out

    def process_varied(self, images) -> np.ndarray:
        """List of differently-shaped uint8 HWC images -> f32 NHWC batch."""
        images = [np.ascontiguousarray(im if im.ndim == 3 else im[..., None], np.uint8) for im in images]
        n = len(images)
        ptrs = (ctypes.POINTER(ctypes.c_uint8) * n)(
            *[im.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for im in images]
        )
        hs = (ctypes.c_int * n)(*[im.shape[0] for im in images])
        ws = (ctypes.c_int * n)(*[im.shape[1] for im in images])
        out = np.empty((n, self.input_size, self.input_size, self.channels), np.float32)
        self._lib.qtpu_pipeline_run_varied(
            self._handle, ptrs, hs, ws, n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), self._counter,
        )
        self._counter += n
        return out
