"""RangeBN — range-based batch normalization (reference ``RangeBN``).

Reference semantics (SURVEY.md section 2 #7, quantize.py ~L335-380):

- input first passes through the layer's own ``QuantMeasure``.
- training statistic, per channel C over a ``(B, C, H, W)`` tensor
  (reference layout; our models are NHWC and transpose accordingly):
  ``y = x.transpose(0,1).view(C, num_chunks, B*H*W//num_chunks)``;
  ``mean_max = y.max(-1).mean(-1)``; ``mean_min = y.min(-1).mean(-1)``;
  ``mean = y.view(C,-1).mean(-1)``;
  ``scale_fix = (0.5*0.35) * (1 + (pi*ln4)**0.5) / (2*ln(n))**0.5`` with
  ``n = B*H*W // num_chunks`` (the chunk length);
  ``scale = (mean_max - mean_min) * scale_fix``.
- running buffers use the inverted EMA (new stat gets weight 0.9);
  ``running_var`` stores the *scale* (range-derived std proxy), NOT variance.
- normalization: ``out = (x - mean) / (q(scale) + eps)`` where the scale
  vector itself is quantized per-tensor (min/max of the scale vector);
  then ``out = out * q(gamma) + q(beta)`` with gamma/beta quantized the same
  way (beta via the chunk-estimator default range).
- 2-D inputs are unsqueezed to 4-D and squeezed back.
- optional ``quantize_grad`` on the output (training only).

Inference contract for BN folding (SURVEY.md section 3.4):
``y = (x - running_mean) / (running_var + eps) * q(gamma) + q(beta)``.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from quantized_tpu.quantcore.ste import fake_quant

RANGE_BN_NUM_CHUNKS = 16


def range_bn_scale_fix(n: int) -> float:
    """The paper's Gaussian range->std correction factor for chunk length n."""
    return (0.5 * 0.35) * (1 + (math.pi * math.log(4)) ** 0.5) / ((2 * math.log(n)) ** 0.5)


def range_bn_stats(
    x_nhwc: jax.Array, num_chunks: int = RANGE_BN_NUM_CHUNKS
) -> Tuple[jax.Array, jax.Array]:
    """Per-channel (mean, range-scale) over an NHWC batch.

    Matches the reference's C x num_chunks x (B*H*W/num_chunks) chunking. The
    reference chunks the flattened (B, H, W) axis per channel in NCHW memory
    order; we reproduce that order by transposing NHWC -> C,(B,H,W).
    """
    b, h, w, c = x_nhwc.shape
    y = jnp.transpose(x_nhwc, (3, 0, 1, 2)).reshape(c, -1)
    n_total = b * h * w
    chunk = n_total // num_chunks
    yc = y[:, : chunk * num_chunks].reshape(c, num_chunks, chunk)
    mean_max = jnp.mean(jnp.max(yc, axis=-1), axis=-1)
    mean_min = jnp.mean(jnp.min(yc, axis=-1), axis=-1)
    mean = jnp.mean(y, axis=-1)
    scale = (mean_max - mean_min) * range_bn_scale_fix(chunk)
    return mean, scale


def range_bn_apply(
    x_nhwc: jax.Array,
    mean: jax.Array,
    scale: jax.Array,
    gamma: Optional[jax.Array],
    beta: Optional[jax.Array],
    eps: float = 1e-5,
    num_bits: int = 8,
    fake_quant_fn=fake_quant,
) -> jax.Array:
    """Normalize with quantized scale/gamma/beta (reference forward tail).

    ``fake_quant_fn`` defaults to the STE wrapper (reference parity).
    """
    qscale = fake_quant_fn(
        scale, num_bits=num_bits, min_value=jnp.min(scale), max_value=jnp.max(scale)
    )
    out = (x_nhwc - mean[None, None, None, :]) / (qscale[None, None, None, :] + eps)
    if gamma is not None:
        qgamma = fake_quant_fn(
            gamma, num_bits=num_bits, min_value=jnp.min(gamma), max_value=jnp.max(gamma)
        )
        out = out * qgamma[None, None, None, :]
    if beta is not None:
        qbeta = fake_quant_fn(beta, num_bits=num_bits)
        out = out + qbeta[None, None, None, :]
    return out
