"""Affine uniform quantization math (bit-exact to the reference).

Reference semantics captured here (SURVEY.md section 2 #1, reference
``models/modules/quantize.py`` ~L15-110, class ``UniformQuantize`` + ``def
quantize``):

- ``qmin = 0``, ``qmax = 2**num_bits - 1`` (asymmetric, unsigned grid even for
  weights).
- ``scale = (max - min) / (qmax - qmin)``, floored at ``1e-8``.
- forward transform ``x -> (x - min) / scale + qmin``, optional stochastic
  rounding (uniform noise in [-0.5, 0.5)), ``clamp(qmin, qmax)``, round
  (half-to-even, matching ``torch.round_``), then immediate dequantize
  ``q -> (q - qmin) * scale + min``.
- ``enforce_true_zero`` (gemmlowp-style): ``zp = int(clamp(qmin - min/scale,
  qmin, qmax))`` (``int()`` truncates), transform ``x -> x/scale + zp``,
  dequant ``q -> (q - zp) * scale``.
- when min/max are not supplied they are derived with the mean-of-chunk-extrema
  estimator: reshape to ``(num_chunks, -1)``, take per-chunk min/max, average
  (NOT a global min/max).

The true-integer engine additionally needs *integer* zero-points (the
reference's eval path keeps a fractional zero-point because it dequantizes
immediately); ``nudged_qparams`` provides the standard nudged (scale, int zp)
pair used by the int8 execution path, and ``quantize_int`` / ``dequantize``
convert between real and integer domains.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

SCALE_FLOOR = 1e-8


def chunked_min_max(x: jax.Array, num_chunks: Optional[int] = None) -> Tuple[jax.Array, jax.Array]:
    """Mean-of-chunk-extrema range estimator.

    Reference: ``UniformQuantize.forward`` derives missing min/max by viewing
    the tensor as row chunks and averaging per-chunk extrema (quantize.py
    ~L20-30). With ``num_chunks=None`` (the bias path) this degenerates to the
    global min/max (single chunk).
    """
    if num_chunks is None:
        num_chunks = 1
    n = x.size
    # Pad is never needed for the reference's usage (sizes divide evenly for
    # the tensors it feeds); guard anyway by trimming the remainder like a
    # `view` would refuse — we instead fold remainder into the last chunk.
    chunk = n // num_chunks
    y = jnp.reshape(x, (-1,))[: chunk * num_chunks].reshape(num_chunks, chunk)
    min_value = jnp.mean(jnp.min(y, axis=-1))
    max_value = jnp.mean(jnp.max(y, axis=-1))
    return min_value, max_value


def fake_quant_array(
    x: jax.Array,
    num_bits: int = 8,
    min_value: Optional[jax.Array] = None,
    max_value: Optional[jax.Array] = None,
    num_chunks: Optional[int] = None,
    stochastic: bool = False,
    enforce_true_zero: bool = False,
    key: Optional[jax.Array] = None,
    out_half: bool = False,
) -> jax.Array:
    """Quantize-dequantize ``x`` on the reference's affine grid (no gradient
    semantics — see :func:`quantized_tpu.quantcore.ste.fake_quant` for the
    straight-through wrapper).

    Operation order mirrors the reference exactly so float32 results agree
    bit-for-bit with the torch implementation (oracle-tested in
    ``tests/test_quantcore_oracle.py``).
    """
    x = jnp.asarray(x)
    compute = x.astype(jnp.float32) if x.dtype != jnp.float32 else x
    if min_value is None or max_value is None:
        est_min, est_max = chunked_min_max(compute, num_chunks)
        if min_value is None:
            min_value = est_min
        if max_value is None:
            max_value = est_max
    min_value = jnp.asarray(min_value, dtype=jnp.float32)
    max_value = jnp.asarray(max_value, dtype=jnp.float32)

    qmin = jnp.float32(0.0)
    qmax = jnp.float32(2.0**num_bits - 1.0)
    scale = (max_value - min_value) / (qmax - qmin)
    scale = jnp.maximum(scale, jnp.float32(SCALE_FLOOR))

    if enforce_true_zero:
        # int() in the reference truncates toward zero after clamping.
        initial_zero_point = qmin - min_value / scale
        zero_point = jnp.clip(initial_zero_point, qmin, qmax)
        zero_point = jnp.trunc(zero_point)
        out = compute / scale + zero_point
    else:
        out = (compute - min_value) / scale + qmin

    if stochastic:
        if key is None:
            raise ValueError("stochastic rounding requires a PRNG key")
        noise = jax.random.uniform(key, out.shape, dtype=out.dtype, minval=-0.5, maxval=0.5)
        out = out + noise

    out = jnp.clip(out, qmin, qmax)
    out = jnp.round(out)  # round-half-to-even, same as torch.round_

    if enforce_true_zero:
        out = (out - zero_point) * scale
    else:
        out = (out - qmin) * scale + min_value

    if out_half and num_bits <= 16:
        out = out.astype(jnp.float16)
    elif x.dtype != compute.dtype:
        out = out.astype(x.dtype)
    return out


# ---------------------------------------------------------------------------
# Integer-domain parameters for the true-integer execution engine.
# ---------------------------------------------------------------------------


def qparams_from_range(
    min_value: jax.Array,
    max_value: jax.Array,
    num_bits: int = 8,
) -> Tuple[jax.Array, jax.Array]:
    """(scale, fractional zero_point) exactly as the reference's eval-time
    fake-quant implies: ``scale = (max-min)/(2^b-1)`` (floored), ``zp =
    -min/scale`` (NOT rounded). Dequantized grid: ``x_hat = (q - zp) * scale
    = q*scale + min``.
    """
    qmax = 2.0**num_bits - 1.0
    scale = (jnp.asarray(max_value, jnp.float32) - jnp.asarray(min_value, jnp.float32)) / qmax
    scale = jnp.maximum(scale, SCALE_FLOOR)
    zero_point = -jnp.asarray(min_value, jnp.float32) / scale
    return scale, zero_point


def nudged_qparams(
    min_value: jax.Array,
    max_value: jax.Array,
    num_bits: int = 8,
) -> Tuple[jax.Array, jax.Array]:
    """Nudged (scale, integer zero_point) for true-integer execution
    (gemmlowp-style; reference's ``enforce_true_zero`` branch is the same idea
    with truncation — we round-to-nearest for a strictly better grid).

    The range is first extended to include 0 so that zero-padding in convs is
    exactly representable; then zp is rounded to an integer on [0, 2^b-1].
    """
    min_value = jnp.minimum(jnp.asarray(min_value, jnp.float32), 0.0)
    max_value = jnp.maximum(jnp.asarray(max_value, jnp.float32), 0.0)
    qmax = 2.0**num_bits - 1.0
    scale = (max_value - min_value) / qmax
    scale = jnp.maximum(scale, SCALE_FLOOR)
    zero_point = jnp.clip(jnp.round(-min_value / scale), 0.0, qmax)
    return scale, zero_point.astype(jnp.int32)


def quantize_int(
    x: jax.Array,
    scale: jax.Array,
    zero_point: jax.Array,
    num_bits: int = 8,
    dtype: jnp.dtype = jnp.int8,
    channel_axis: Optional[int] = None,
) -> jax.Array:
    """Real -> integer domain: ``q = clamp(round(x/scale) + zp, 0, 2^b-1)``.

    The unsigned grid [0, 2^b-1] is stored in a *signed* ``dtype`` shifted by
    ``-2^(b-1)`` when ``dtype`` is signed (int8 holds uint8 values - 128) so
    the MXU's s8 x s8 path applies; the shift is absorbed into the zero-point
    by the caller via :func:`storage_shift`.
    """
    qmax = 2.0**num_bits - 1.0
    if channel_axis is not None:
        shape = [1] * x.ndim
        shape[channel_axis] = -1
        scale = jnp.reshape(scale, shape)
        zero_point = jnp.reshape(zero_point, shape)
    q = jnp.round(x.astype(jnp.float32) / scale) + zero_point.astype(jnp.float32)
    q = jnp.clip(q, 0.0, qmax)
    if dtype == jnp.int8:
        q = q - 2.0 ** (num_bits - 1)
    return q.astype(dtype)


def storage_shift(num_bits: int, dtype: jnp.dtype) -> int:
    """Offset between the logical unsigned grid and the stored signed values."""
    return int(2 ** (num_bits - 1)) if dtype == jnp.int8 else 0


def dequantize(
    q: jax.Array,
    scale: jax.Array,
    zero_point: jax.Array,
    num_bits: int = 8,
    channel_axis: Optional[int] = None,
) -> jax.Array:
    """Integer -> real: ``x_hat = (u - zp) * scale`` with ``u`` the logical
    unsigned value (un-shifting signed storage first)."""
    shift = storage_shift(num_bits, q.dtype)
    u = q.astype(jnp.float32) + float(shift)
    if channel_axis is not None:
        shape = [1] * q.ndim
        shape[channel_axis] = -1
        scale = jnp.reshape(scale, shape)
        zero_point = jnp.reshape(zero_point, shape)
    return (u - jnp.asarray(zero_point, jnp.float32)) * scale
