"""Calibration: observer buffers -> integer-execution qparams.

The semantic contract (SURVEY.md section 3.2): eval-time fake-quant uses
frozen ``running_min/max``; the engine derives
``scale_a = (max - min) / 255`` and an integer (nudged) zero-point so that
zero-padding is exactly representable and the MXU accumulates pure int32
(SURVEY.md section 7 hard part #2). Weights upgrade to per-channel symmetric
int8 (zero_point 0, range +-127) — per-tensor affine (the reference's own
scheme) is kept as an option for strict-parity mode.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class ActQParams:
    """Asymmetric uint8 activation quantization (stored values 0..255)."""

    scale: float
    zero_point: int  # integer, on [0, 255]

    def quantize(self, x: np.ndarray) -> np.ndarray:
        q = np.round(x / self.scale) + self.zero_point
        return np.clip(q, 0, 255).astype(np.uint8)

    def dequantize(self, q: np.ndarray) -> np.ndarray:
        return (q.astype(np.float32) - self.zero_point) * self.scale


@dataclasses.dataclass(frozen=True)
class WeightQParams:
    """Symmetric int8 weights, per-channel (vector scale) or per-tensor."""

    scale: np.ndarray  # (Cout,) or scalar array
    per_channel: bool

    def quantize(self, w_hwio: np.ndarray) -> np.ndarray:
        s = self.scale if not self.per_channel else self.scale[None, None, None, :]
        q = np.round(w_hwio / s)
        return np.clip(q, -127, 127).astype(np.int8)

    def dequantize(self, q: np.ndarray) -> np.ndarray:
        s = self.scale if not self.per_channel else self.scale[None, None, None, :]
        return q.astype(np.float32) * s


def activation_qparams_from_observer(
    running_min: float, running_max: float, num_bits: int = 8
) -> ActQParams:
    """Nudged (scale, int zp) from frozen QuantMeasure buffers. The range is
    extended to contain 0 so padding quantizes exactly (post-ReLU observers
    have running_min ~ 0 anyway)."""
    rmin = min(float(running_min), 0.0)
    rmax = max(float(running_max), 0.0)
    qmax = 2.0**num_bits - 1.0
    scale = max((rmax - rmin) / qmax, 1e-8)
    zp = int(np.clip(round(-rmin / scale), 0, qmax))
    return ActQParams(scale=float(scale), zero_point=zp)


def weight_qparams_per_channel(w_hwio: np.ndarray, num_bits: int = 8) -> WeightQParams:
    """Symmetric per-out-channel scales: max|W_c| / (2^(b-1) - 1)."""
    qmax = 2.0 ** (num_bits - 1) - 1.0
    absmax = np.max(np.abs(w_hwio.reshape(-1, w_hwio.shape[-1])), axis=0)
    scale = np.maximum(absmax / qmax, 1e-12).astype(np.float32)
    return WeightQParams(scale=scale, per_channel=True)


def weight_qparams_per_tensor(w: np.ndarray, num_bits: int = 8) -> WeightQParams:
    qmax = 2.0 ** (num_bits - 1) - 1.0
    scale = np.float32(max(np.max(np.abs(w)) / qmax, 1e-12))
    return WeightQParams(scale=np.asarray(scale), per_channel=False)


def linear_weight_qparams_per_channel(w_oi: np.ndarray, num_bits: int = 8) -> WeightQParams:
    """(out, in) linear weights: per-row scales."""
    qmax = 2.0 ** (num_bits - 1) - 1.0
    absmax = np.max(np.abs(w_oi), axis=1)
    scale = np.maximum(absmax / qmax, 1e-12).astype(np.float32)
    return WeightQParams(scale=scale, per_channel=True)
