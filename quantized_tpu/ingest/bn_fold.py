"""BatchNorm folding (new work — the reference never folds; SURVEY.md #9).

Standard BN inference is ``y = (x - mu) / sqrt(var + eps) * gamma + beta``.
For a conv ``z = W * x + b`` feeding BN, folding absorbs the affine into the
conv (per out-channel c):

    f_c  = gamma_c / sqrt(var_c + eps)
    W'_c = W_c * f_c
    b'_c = beta_c + (b_c - mu_c) * f_c

RangeBN inference (SURVEY.md #7) is ``y = (x - mu) / (scale + eps) * q(gamma)
+ q(beta)`` where ``running_var`` *stores the range-derived scale* (a std
proxy, not a variance) and gamma/beta pass through 8-bit fake-quant. Folding
uses ``f_c = q(gamma)_c / (scale_c + eps)`` and ``q(beta)``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from quantized_tpu.quantcore.affine import fake_quant_array


def fold_bn_into_conv(
    kernel_hwio: np.ndarray,
    bias: Optional[np.ndarray],
    gamma: np.ndarray,
    beta: np.ndarray,
    mean: np.ndarray,
    var: np.ndarray,
    eps: float = 1e-5,
) -> Tuple[np.ndarray, np.ndarray]:
    """Fold standard float BN into HWIO conv weights. Returns (W', b')."""
    kernel_hwio = np.asarray(kernel_hwio, np.float32)
    factor = np.asarray(gamma, np.float32) / np.sqrt(np.asarray(var, np.float32) + eps)
    w = kernel_hwio * factor[None, None, None, :]
    b0 = np.zeros_like(factor) if bias is None else np.asarray(bias, np.float32)
    b = np.asarray(beta, np.float32) + (b0 - np.asarray(mean, np.float32)) * factor
    return w, b


def rangebn_fold_params(
    gamma: Optional[np.ndarray],
    beta: Optional[np.ndarray],
    scale: np.ndarray,
    eps: float = 1e-5,
    num_bits: int = 8,
) -> Tuple[np.ndarray, np.ndarray]:
    """(factor, qbeta) of the RangeBN eval affine ``y = factor*(z - mean) +
    qbeta`` with the reference's own 8-bit quantization of the scale/gamma/
    beta vectors — the single source of truth for every fold site AND for
    the engine's pre-BN observer clamp (convert._rangebn_y_clip), which must
    use bit-identical factors to the folded weights."""
    scale = np.asarray(scale, np.float32)
    # the reference eval quantizes the scale vector itself before normalizing
    qscale = np.asarray(
        fake_quant_array(scale, num_bits=num_bits, min_value=float(np.min(scale)), max_value=float(np.max(scale)))
    )
    if gamma is not None:
        qgamma = np.asarray(
            fake_quant_array(gamma, num_bits=num_bits, min_value=float(np.min(gamma)), max_value=float(np.max(gamma)))
        )
    else:
        qgamma = np.ones_like(scale)
    qbeta = (
        np.asarray(fake_quant_array(beta, num_bits=num_bits))
        if beta is not None
        else np.zeros_like(scale)
    )
    return (qgamma / (qscale + eps)).astype(np.float32), qbeta.astype(np.float32)


def fold_rangebn_into_conv(
    kernel_hwio: np.ndarray,
    bias: Optional[np.ndarray],
    gamma: Optional[np.ndarray],
    beta: Optional[np.ndarray],
    mean: np.ndarray,
    scale: np.ndarray,
    eps: float = 1e-5,
    num_bits: int = 8,
) -> Tuple[np.ndarray, np.ndarray]:
    """Fold RangeBN (running_var == range-derived scale; gamma/beta 8-bit
    fake-quantized exactly as the reference eval does) into HWIO conv weights."""
    kernel_hwio = np.asarray(kernel_hwio, np.float32)
    factor, qbeta = rangebn_fold_params(gamma, beta, scale, eps=eps, num_bits=num_bits)
    w = kernel_hwio * factor[None, None, None, :]
    b0 = np.zeros_like(factor) if bias is None else np.asarray(bias, np.float32)
    b = qbeta + (b0 - np.asarray(mean, np.float32)) * factor
    return w, b
