"""Int8 convolution: im2col + Pallas GEMM, and the XLA-native path.

Conv lowering (SURVEY.md section 7 step 4b): NHWC int8 activations are padded
with the *stored zero-point* (so padded taps contribute exactly 0 — see
int8_matmul.py), patches are extracted into a (N*Ho*Wo, Kh*Kw*Cin) int8
matrix, and one MXU GEMM against the (Kh*Kw*Cin, Cout) reshaped kernel
produces the int32 accumulator consumed by the fused dequant epilogue.

``int8_conv_xla`` keeps the same contract on ``lax.conv_general_dilated``
with ``preferred_element_type=int32`` — used where XLA's own int8 conv
already hits the MXU, and as a cross-check for the Pallas path.
"""

from __future__ import annotations

import functools
import logging
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from quantized_tpu.ops.int8_matmul import int8_matmul, int8_matmul_requant

Ints = Tuple[int, int]


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def pad_stored_zp(x_q: jax.Array, padding: Ints, stored_zp: int) -> jax.Array:
    """Pad NHWC int8 activations with the stored zero-point (= zp - 128)."""
    ph, pw = _pair(padding)
    if ph == 0 and pw == 0:
        return x_q
    return jnp.pad(
        x_q,
        ((0, 0), (ph, ph), (pw, pw), (0, 0)),
        constant_values=jnp.int8(stored_zp),
    )


def im2col_int8(
    x_q: jax.Array,  # (N, H, W, C) int8, already padded
    kernel_size: Ints,
    stride: Ints = 1,
    dilation: Ints = 1,
) -> jax.Array:
    """(N, Ho, Wo, Kh*Kw*C) patches, K ordered (kh, kw, c) to match an HWIO
    kernel reshaped to (Kh*Kw*Cin, Cout)."""
    kh, kw = _pair(kernel_size)
    sh, sw = _pair(stride)
    dh, dw = _pair(dilation)
    n, h, w, c = x_q.shape
    ho = (h - (kh - 1) * dh - 1) // sh + 1
    wo = (w - (kw - 1) * dw - 1) // sw + 1
    # gather kh*kw strided slices; XLA fuses these into an efficient copy
    cols = []
    for i in range(kh):
        for j in range(kw):
            sl = jax.lax.slice(
                x_q,
                (0, i * dh, j * dw, 0),
                (n, i * dh + (ho - 1) * sh + 1, j * dw + (wo - 1) * sw + 1, c),
                (1, sh, sw, 1),
            )
            cols.append(sl)
    patches = jnp.stack(cols, axis=3)  # (N, Ho, Wo, Kh*Kw, C)
    return patches.reshape(n, ho, wo, kh * kw * c)


def int8_conv_gemm(
    x_q: jax.Array,  # (N, H, W, Cin) int8 stored (u-128), unpadded
    w_q: jax.Array,  # (Kh, Kw, Cin, Cout) int8 symmetric
    alpha: jax.Array,  # (Cout,) f32
    beta: jax.Array,  # (Cout,) f32
    stride: Ints = 1,
    padding: Ints = 0,
    stored_zp: int = -128,
    relu: bool = False,
    out_requant: Optional[Tuple[float, int]] = None,
    interpret: bool = None,
) -> jax.Array:
    """Pallas path: im2col + fused-epilogue GEMM. Returns NHWC f32, or int8
    when ``out_requant=(out_scale, out_zp)`` is given."""
    kh, kw, cin, cout = w_q.shape
    xp = pad_stored_zp(x_q, padding, stored_zp)
    patches = im2col_int8(xp, (kh, kw), stride)
    n, ho, wo, k = patches.shape
    a = patches.reshape(n * ho * wo, k)
    b = w_q.reshape(kh * kw * cin, cout)
    if out_requant is None:
        y = int8_matmul(a, b, alpha, beta, relu=relu, interpret=interpret)
    else:
        y = int8_matmul_requant(
            a, b, alpha, beta, out_requant[0], out_requant[1], relu=relu, interpret=interpret
        )
    return y.reshape(n, ho, wo, cout)


def int8_conv_xla(
    x_q: jax.Array,
    w_q: jax.Array,
    alpha: jax.Array,
    beta: jax.Array,
    stride: Ints = 1,
    padding: Ints = 0,
    stored_zp: int = -128,
    relu: bool = False,
    out_requant: Optional[Tuple[float, int]] = None,
    groups: int = 1,
    round_s16: bool = False,
    y_clip: Optional[Tuple[jax.Array, jax.Array]] = None,
) -> jax.Array:
    """XLA-native path: int8 conv with int32 accumulation + the same epilogue
    (XLA fuses it). Also the reference implementation for Pallas-path tests.

    ``y_clip=(ylo, yhi)``: per-channel pre-relu clamp bounds on the
    alpha/beta epilogue output (the folded RangeBN input-observer range clip,
    convert._rangebn_y_clip; callers pre-scale the bounds when alpha/beta
    arrive prescaled). In the fused-requant branch the clamp rides the
    existing clip as per-channel integer bounds — zero extra passes."""
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    xp = pad_stored_zp(x_q, (ph, pw), stored_zp)
    acc = jax.lax.conv_general_dilated(
        xp,
        w_q,
        window_strides=(sh, sw),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32,
    )
    if out_requant is not None:
        # minimal-op fused requant: 1/s folds into alpha/beta, the -128
        # storage shift into the zero-point, and ReLU into the clip floor
        # (dequant(zp) == 0, round is monotone) — measured ~15% faster than
        # the naive mul/max/mul/round/add/clip/sub chain on v5e (VPU-bound).
        out_scale, out_zp = out_requant
        inv = jnp.float32(1.0 / out_scale)
        alpha2 = alpha * inv
        beta2 = beta * inv + jnp.float32(out_zp - 128)
        lo = jnp.float32(out_zp - 128 if relu else -128)
        hi = jnp.float32(127.0)
        if y_clip is not None:
            zps = jnp.float32(out_zp - 128)
            lo = jnp.maximum(lo, jnp.round(y_clip[0] * inv + zps))
            hi = jnp.minimum(hi, jnp.round(y_clip[1] * inv + zps))
        q = jnp.round(acc.astype(jnp.float32) * alpha2 + beta2)
        return jnp.clip(q, lo, hi).astype(jnp.int8)
    y = acc.astype(jnp.float32) * alpha + beta
    if y_clip is not None:
        y = jnp.clip(y, y_clip[0], y_clip[1])
    if relu:
        y = jnp.maximum(y, 0.0)
    if round_s16:
        # fine-grained int16 emission (callers pre-scale alpha/beta so one
        # s16 count is a known fraction of the consumer's grid step): halves
        # the materialized bytes of a residual leg vs f32 — see
        # Int8Bottleneck's downsample path
        return clip_s16_checked(jnp.round(y))
    return y


# Saturation telemetry for the fine-grained s16 residual legs. The +-32767
# clip represents +-32767/S16_FINE = +-1024 output steps — believed never to
# bind for calibrated shortcut legs, but a silently binding clip would break
# the <=1/(2*S16_FINE)-step error contract. Under QTPU_DEBUG_S16 (or the
# engine's --debug-nans, which sets it) every s16 emission counts clipped
# elements on-device and reports them host-side.
_s16_saturated_total = 0


def s16_saturated_total() -> int:
    """Total saturated elements seen since process start (debug mode only)."""
    return _s16_saturated_total


def _s16_sat_report(n) -> None:
    global _s16_saturated_total
    n = int(n)
    if n:
        _s16_saturated_total += n
        logging.getLogger(__name__).error(
            "s16 residual-leg saturation: %d element(s) clipped at +-32767 — "
            "the fine-grained leg's error bound is violated; lower S16_FINE "
            "for this layer or widen its calibration", n,
        )


def clip_s16_checked(q: jax.Array) -> jax.Array:
    """``clip(q, +-32767).astype(int16)`` with debug-mode saturation counting
    (round-3 advisor: detect rather than silently saturate)."""
    if os.environ.get("QTPU_DEBUG_S16"):
        jax.debug.callback(_s16_sat_report, jnp.sum(jnp.abs(q) > 32767.0))
    return jnp.clip(q, -32767.0, 32767.0).astype(jnp.int16)
