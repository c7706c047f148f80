"""Torch-CPU oracle: an independent re-encoding of the reference's fake-quant
math (SURVEY.md section 2 #1/#4/#7 semantics) used to cross-check the JAX
implementation bit-for-bit. Kept deliberately separate from the framework —
tests import this, the framework never does.
"""

from __future__ import annotations

import math

import torch


def oracle_quantize(
    x: torch.Tensor,
    num_bits: int = 8,
    min_value=None,
    max_value=None,
    num_chunks=None,
    enforce_true_zero: bool = False,
    f32_scalar_params: bool = False,
) -> torch.Tensor:
    """Reference UniformQuantize.forward without stochastic noise.

    ``f32_scalar_params=True`` derives scale/zero-point in float32 instead of
    Python float64 — the JAX implementation keeps scalar qparams in f32 (TPUs
    have no f64), so the strict bit-exactness tests compare against this mode
    and a separate test bounds the f64-vs-f32 deviation at <=1 integer level.
    """
    import numpy as np

    x = x.float()
    if min_value is None or max_value is None:
        nc = 1 if num_chunks is None else num_chunks
        n = x.numel()
        chunk = n // nc
        y = x.reshape(-1)[: chunk * nc].reshape(nc, chunk)
        if min_value is None:
            min_value = y.min(-1)[0].mean().item()
        if max_value is None:
            max_value = y.max(-1)[0].mean().item()
    out = x.clone()
    qmin, qmax = 0.0, 2.0**num_bits - 1.0
    if f32_scalar_params:
        min_value = np.float32(min_value)
        max_value = np.float32(max_value)
        scale = (max_value - np.float32(min_value)) / np.float32(qmax - qmin)
        scale = np.maximum(scale, np.float32(1e-8))
        min_value = float(min_value)
        max_value = float(max_value)
        scale = float(scale)
    else:
        min_value = float(min_value)
        max_value = float(max_value)
        scale = (max_value - min_value) / (qmax - qmin)
        scale = max(scale, 1e-8)
    if enforce_true_zero:
        if f32_scalar_params:
            initial_zero_point = float(
                np.float32(qmin) - np.float32(min_value) / np.float32(scale)
            )
        else:
            initial_zero_point = qmin - min_value / scale
        zero_point = min(max(initial_zero_point, qmin), qmax)
        zero_point = int(zero_point)
        out.div_(scale).add_(zero_point)
    else:
        out.add_(-min_value).div_(scale).add_(qmin)
    out.clamp_(qmin, qmax).round_()
    if enforce_true_zero:
        out.add_(-zero_point).mul_(scale)
    else:
        out.add_(-qmin).mul_(scale).add_(min_value)
    return out


def oracle_quant_measure_stat(x: torch.Tensor):
    """QuantMeasure per-batch statistic."""
    b = x.shape[0]
    y = x.reshape(b, -1)
    return y.min(-1)[0].mean().item(), y.max(-1)[0].mean().item()


def oracle_ema(running: float, new: float, momentum: float = 0.1) -> float:
    return running * momentum + new * (1.0 - momentum)


def oracle_range_bn_stats(x_nchw: torch.Tensor, num_chunks: int = 16):
    """RangeBN training statistics on an NCHW tensor."""
    b, c, h, w = x_nchw.shape
    y = x_nchw.transpose(0, 1).contiguous().view(c, num_chunks, b * h * w // num_chunks)
    mean_max = y.max(-1)[0].mean(-1)
    mean_min = y.min(-1)[0].mean(-1)
    mean = y.view(c, -1).mean(-1)
    n = y.size(-1)
    scale_fix = (0.5 * 0.35) * (1 + (math.pi * math.log(4)) ** 0.5) / ((2 * math.log(n)) ** 0.5)
    scale = (mean_max - mean_min) * scale_fix
    return mean, scale


def oracle_range_bn_apply(x_nchw, mean, scale, gamma, beta, eps=1e-5, num_bits=8):
    qscale = oracle_quantize(
        scale, num_bits, float(scale.min()), float(scale.max())
    )
    out = (x_nchw - mean.view(1, -1, 1, 1)) / (qscale.view(1, -1, 1, 1) + eps)
    if gamma is not None:
        qg = oracle_quantize(gamma, num_bits, float(gamma.min()), float(gamma.max()))
        out = out * qg.view(1, -1, 1, 1)
    if beta is not None:
        qb = oracle_quantize(beta, num_bits)
        out = out + qb.view(1, -1, 1, 1)
    return out
