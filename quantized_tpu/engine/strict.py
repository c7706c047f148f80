"""Strict-parity integer engine: exact twin of the reference's eval semantics.

The production engine (``convert_to_int`` / ``build_int8_resident``) upgrades
weights to per-channel *symmetric* int8 and folds BN — better accuracy and
speed, but a different grid than the reference. This module executes the
reference's scheme (SURVEY.md section 3.2, quantize.py ~L240-290) with true
integer arithmetic and NO semantic upgrades:

- activations: frozen-observer affine uint8 grid, ``x_hat = u*s_a + rmin``
  (fractional zero-point ``-rmin/s_a`` — the reference never nudges it);
- weights: per-TENSOR affine uint8 grid recomputed from the weight min/max,
  ``w_hat = q_w*s_w + wmin``;
- bias: fake-quantized on its own global min/max grid at ``num_bits_weight``;
- BN is NOT folded — it stays a separate f32 module, exactly like the
  reference's ``F.conv2d`` -> ``nn.BatchNorm2d`` composition.

Exact integer decomposition (per output position p, channel c, window taps k;
``u`` the logical uint8 activation, ``q`` the logical uint8 weight):

    sum_k x_hat_k * w_hat_kc
      = s_a*s_w * sum_k u_k q_kc            (int32 MXU dot + static colsum)
      + s_a*wmin * sum_k u_k                (int32 window rowsum)
      + rmin * sum_{k in real taps} w_hat_kc    (static border map)

Padded taps carry ``u = 0`` (stored -128) so they contribute exactly 0 to the
first two sums — matching ``F.conv2d``'s zero-padding of the *dequantized*
input — and drop out of the third sum via the indicator-ones border map
(constant-folded by XLA; at interior positions it equals
``s_w*colsum(q) + K*wmin``).

All integer terms combine in int32 (bounded by 255*255*K < 2^31 for every
reference shape) before one f32 epilogue, so the only divergence from the
reference's f32 fake-quant forward is f32 summation order — bounded well
under one activation quant step (pinned by tests/test_strict_parity.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from quantized_tpu.ops.int8_conv import pad_stored_zp
from quantized_tpu.quantcore.affine import SCALE_FLOOR, fake_quant_array

Ints = Tuple[int, int]


def strict_act_qparams(running_min: float, running_max: float,
                       num_bits: int = 8) -> Tuple[float, float]:
    """(scale, rmin) of the reference's eval grid — scale floored, range NOT
    extended to contain zero, zero-point left fractional (= -rmin/scale)."""
    qmax = 2.0**num_bits - 1.0
    scale = max((float(running_max) - float(running_min)) / qmax, SCALE_FLOOR)
    return float(scale), float(running_min)


def quantize_strict_stored(x: jax.Array, scale: float, rmin: float) -> jax.Array:
    """f32 -> stored int8 (logical uint8 - 128) on the exact reference grid,
    mirroring the reference's op order ((x - min)/scale, clip, round) so the
    integer values agree bit-for-bit with the fake-quant path."""
    t = (x - jnp.float32(rmin)) / jnp.float32(scale)
    t = jnp.clip(t, 0.0, 255.0)
    return (jnp.round(t) - 128.0).astype(jnp.int8)


def _strict_weight_grid(w: jax.Array, num_bits: int) -> Tuple[np.ndarray, float, float]:
    """Reference per-tensor affine weight quantization (same op order as
    fake_quant_array with min/max = global extrema). Returns (stored int8
    ``q - 128``, s_w, wmin)."""
    w = jnp.asarray(w, jnp.float32)
    wmin = jnp.min(w)
    wmax = jnp.max(w)
    qmax = 2.0**num_bits - 1.0
    scale = jnp.maximum((wmax - wmin) / qmax, jnp.float32(SCALE_FLOOR))
    t = jnp.clip((w - wmin) / scale, 0.0, qmax)
    q = jnp.round(t)
    stored = np.asarray(q - 128.0, np.float32).astype(np.int8)
    return stored, float(scale), float(wmin)


def _window_sum(x_i32: jax.Array, kernel: Ints, stride: Ints) -> jax.Array:
    """Sum of an (already padded) int32 NHWC tensor over each conv window
    (VALID), per channel — the dynamic rowsum term."""
    return jax.lax.reduce_window(
        x_i32, jnp.int32(0), jax.lax.add,
        window_dimensions=(1, kernel[0], kernel[1], 1),
        window_strides=(1, stride[0], stride[1], 1),
        padding="VALID",
    )


class StrictIntConv2d(nnx.Module):
    """Integer conv on the reference's per-tensor affine grids (see module
    docstring). Output is f32; BN/ReLU/pool run unchanged around it."""

    def __init__(self, conv) -> None:  # conv: models.layers.QConv2d
        from quantized_tpu.models.layers import QConv2d

        if not isinstance(conv, QConv2d):
            raise TypeError(type(conv).__name__)
        w = conv.kernel.get_value()  # HWIO
        w_s, s_w, wmin = _strict_weight_grid(w, conv.num_bits_weight)
        self.w_q = nnx.Param(jnp.asarray(w_s))
        self.s_w = s_w
        self.wmin = wmin
        obs = conv.quantize_input
        self.act_scale, self.act_rmin = strict_act_qparams(
            float(obs.running_min.get_value()[0]), float(obs.running_max.get_value()[0]),
            conv.num_bits,
        )
        self.stride = conv.stride
        self.padding = conv.padding
        self.groups = conv.groups
        kh, kw, cg, cout = w_s.shape
        self.taps = kh * kw * cg  # taps per output channel (per group)
        # static per-channel colsum of the stored weights
        self.colsum = nnx.Param(
            jnp.asarray(w_s.astype(np.int64).reshape(-1, cout).sum(0), jnp.int32)
        )
        # reference bias path: fake-quant on the bias' own global min/max grid
        if conv.bias is not None:
            self.bias_hat = nnx.Param(
                fake_quant_array(conv.bias.get_value(), num_bits=conv.num_bits_weight)
            )
        else:
            self.bias_hat = None

    def _border_map(self, h: int, w: int, cin: int) -> jax.Array:
        """rmin * conv(real-tap indicator, w_hat): the static per-position
        correction for padded taps (constant input — XLA folds it)."""
        q_w = self.w_q.get_value().astype(jnp.float32) + 128.0
        w_hat = q_w * jnp.float32(self.s_w) + jnp.float32(self.wmin)
        ind = jnp.ones((1, h, w, cin), jnp.float32)
        ph, pw = self.padding
        b = jax.lax.conv_general_dilated(
            ind, w_hat, window_strides=self.stride,
            padding=((ph, ph), (pw, pw)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
        )
        return jnp.float32(self.act_rmin) * b  # (1, Ho, Wo, Cout)

    def __call__(self, x: jax.Array) -> jax.Array:
        a_s = quantize_strict_stored(x, self.act_scale, self.act_rmin)
        return self.run_q(a_s)

    def run_q(self, a_s: jax.Array) -> jax.Array:
        """``a_s``: stored int8 on this layer's strict grid."""
        n, h, w, cin = a_s.shape
        a_p = pad_stored_zp(a_s, self.padding, -128)
        w_s = self.w_q.get_value()
        kh, kw, cg, cout = w_s.shape
        acc = jax.lax.conv_general_dilated(
            a_p, w_s, window_strides=self.stride, padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
            preferred_element_type=jnp.int32,
        )
        # dynamic window rowsum per group: sum_k a_s over each window
        g = self.groups
        a_i = a_p.astype(jnp.int32)
        if g > 1:
            a_i = a_i.reshape(*a_p.shape[:3], g, cin // g).sum(-1)
        else:
            a_i = a_i.sum(-1, keepdims=True)
        r = _window_sum(a_i, (kh, kw), self.stride)  # (N, Ho, Wo, g)
        if g > 1:
            r = jnp.repeat(r, cout // g, axis=-1)
        # sum_k u q = acc + 128 R + 128 colsum + 128^2 K   (all int32-exact)
        k_taps = self.taps
        sum_uq = acc + 128 * r + (128 * self.colsum.get_value() + jnp.int32(128 * 128 * k_taps))
        sum_u = r + jnp.int32(128 * k_taps)
        y = (
            jnp.float32(self.act_scale * self.s_w) * sum_uq.astype(jnp.float32)
            + jnp.float32(self.act_scale * self.wmin) * sum_u.astype(jnp.float32)
            + self._border_map(h, w, cin)
        )
        if self.bias_hat is not None:
            y = y + self.bias_hat.get_value()
        return y


class StrictIntLinear(nnx.Module):
    """Integer dense layer on the reference's per-tensor affine grids."""

    def __init__(self, lin) -> None:  # lin: models.layers.QLinear
        from quantized_tpu.models.layers import QLinear

        if not isinstance(lin, QLinear):
            raise TypeError(type(lin).__name__)
        w_oi = lin.weight.get_value()  # (out, in)
        w_s, s_w, wmin = _strict_weight_grid(w_oi, lin.num_bits_weight)
        self.w_q = nnx.Param(jnp.asarray(w_s.T))  # (in, out) for the GEMM
        self.s_w = s_w
        self.wmin = wmin
        obs = lin.quantize_input
        self.act_scale, self.act_rmin = strict_act_qparams(
            float(obs.running_min.get_value()[0]), float(obs.running_max.get_value()[0]),
            lin.num_bits,
        )
        k, n = self.w_q.get_value().shape
        self.taps = k
        self.colsum = nnx.Param(
            jnp.asarray(w_s.astype(np.int64).sum(1), jnp.int32)  # sum over in -> (out,)
        )
        if lin.bias is not None:
            self.bias_hat = nnx.Param(
                fake_quant_array(lin.bias.get_value(), num_bits=lin.num_bits_weight)
            )
        else:
            self.bias_hat = None

    def __call__(self, x: jax.Array) -> jax.Array:
        a_s = quantize_strict_stored(x, self.act_scale, self.act_rmin)
        w_s = self.w_q.get_value()
        acc = jax.lax.dot_general(
            a_s, w_s, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        k = self.taps
        colsum = self.colsum.get_value()
        r = a_s.astype(jnp.int32).sum(-1, keepdims=True)
        sum_uq = acc + 128 * r + (128 * colsum + jnp.int32(128 * 128 * k))
        sum_u = r + jnp.int32(128 * k)
        # no padding: the "border" term is the constant rmin * sum_k w_hat_kc
        colsum_q = (colsum + jnp.int32(128 * k)).astype(jnp.float32)
        const = jnp.float32(self.act_rmin) * (
            jnp.float32(self.s_w) * colsum_q + jnp.float32(k * self.wmin)
        )
        y = (
            jnp.float32(self.act_scale * self.s_w) * sum_uq.astype(jnp.float32)
            + jnp.float32(self.act_scale * self.wmin) * sum_u.astype(jnp.float32)
            + const
        )
        if self.bias_hat is not None:
            y = y + self.bias_hat.get_value()
        return y


def convert_to_int_strict(model: nnx.Module) -> nnx.Module:
    """In-place strict-parity conversion: every QConv2d/QLinear becomes its
    integer twin on the reference's own grids; BN/RangeBN modules are left
    untouched (they run in f32 exactly as the reference composes them).

    This is ``convert_to_int(weight_quant='per_tensor')``'s implementation —
    the honest "exact twin" mode (logits match fake-quant eval to f32
    summation noise; quantized integers match bit-for-bit)."""
    from quantized_tpu.models.layers import QConv2d, QLinear

    for _path, module in list(nnx.iter_modules(model)):
        for name, child in list(vars(module).items()):
            if isinstance(child, QConv2d):
                setattr(module, name, StrictIntConv2d(child))
            elif isinstance(child, QLinear):
                setattr(module, name, StrictIntLinear(child))
    return model
