"""Integer-executing NNX layers (engine counterparts of QConv2d/QLinear).

Each layer statically owns its input qparams (from the source model's frozen
observers), per-channel int8 weights (BN already folded), and the fused
epilogue (alpha, beta). Activations enter as f32, are quantized to the uint8
grid on the fly (a cheap VPU op XLA fuses into the surrounding graph), run
through the s8 MXU path, and exit dequantized f32 — so pooling / residual
adds / ReLU in the surrounding model code run unchanged.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from quantized_tpu.ops.int8_conv import (
    clip_s16_checked,
    int8_conv_gemm,
    int8_conv_xla,
)
from quantized_tpu.ops.int8_matmul import (
    int8_matmul,
    int8_matmul_xla,
    matmul_epilogue_params,
)
from quantized_tpu.ops.int4 import int4_matmul_s4, pack_int4


# Fine-grain factor for int16 prescaled residual legs: one s16 count is
# 1/S16_FINE of the consumer's output step (error <= 1/(2*S16_FINE) step,
# representable range +-32767/S16_FINE = +-1024 output steps — far beyond any
# realizable shortcut magnitude for calibrated legs; under QTPU_DEBUG_S16
# (set by --debug-nans) every s16 emission counts clipped elements so a
# binding clip is *detected*, not silent (ops/int8_conv.clip_s16_checked).
S16_FINE = 32.0


class Identity(nnx.Module):
    """Replaces folded-away BN modules."""

    def __call__(self, x):
        return x


# When set (autotuner shape-recording pass), run_q logs input shapes here
# keyed by id(module) — nnx forbids attribute mutation on outer modules from
# inside a trace, so recording must not touch the module itself.
_SHAPE_RECORDER: Optional[dict] = None


def quantize_input_stored(x: jax.Array, scale: float, zero_point: int) -> jax.Array:
    """f32 -> stored int8 (logical uint8 - 128) on the layer's activation grid.

    Minimal-op form: the -128 storage shift folds into the zero-point (exact:
    round(t) + c == round(t + c) for integer c), so the chain is one fma,
    round, two clips, convert — no separate shift pass."""
    q = jnp.round(x * jnp.float32(1.0 / scale) + jnp.float32(zero_point - 128))
    return jnp.clip(q, -128.0, 127.0).astype(jnp.int8)


def dequantize_stored(x_q: jax.Array, scale: float, zero_point: int) -> jax.Array:
    """Stored int8 -> f32: ``(u - zp) * scale`` with ``u = stored + 128``."""
    return (x_q.astype(jnp.float32) + jnp.float32(128 - zero_point)) * jnp.float32(scale)


def requantize_stored(
    x_q: jax.Array, from_grid: Tuple[float, int], to_grid: Tuple[float, int]
) -> jax.Array:
    """Regrid a stored-int8 tensor onto another uint8 grid (one fused
    elementwise pass; used when two consumers observe the same tensor with
    different frozen ranges, e.g. a block's conv1 vs its downsample)."""
    return quantize_input_stored(dequantize_stored(x_q, *from_grid), *to_grid)


class IntConv2d(nnx.Module):
    """Integer conv with folded BN and fused dequant epilogue.

    backend: 'xla' = lax int8 conv; 'gemm' = Pallas im2col GEMM;
    'pallas' = direct Pallas conv; 'bf16' = dequantized-int8-weights bf16
    conv (same activation/weight grids, f32 accumulate — used by the
    per-layer autotuner where the MXU bf16 path beats the s8 path).

    'xla-split' / 'bf16-split': same math, but the requant-to-int8 tail runs
    as a *separate* elementwise pass over the f32 conv output instead of
    being folded into the conv's epilogue. Counterintuitively this is ~2x
    faster on v5e for the "expand" 1x1 shapes (e.g. 56x56, 64->256: 0.41 ms
    fused vs 0.25 ms split at B=128) — with the s8 output fused in, XLA
    picks a layout/fusion for the conv that stalls on the (8,128)->(32,128)
    retiling; left as f32, the conv runs at the HBM roofline and the
    quantize pass streams at full elementwise bandwidth. Autotuned per shape.
    """

    def __init__(
        self,
        w_q: jax.Array,  # (Kh,Kw,Cin,Cout) int8
        alpha: jax.Array,  # (Cout,) f32
        beta: jax.Array,  # (Cout,) f32
        act_scale: float,
        act_zero_point: int,
        stride=(1, 1),
        padding=(0, 0),
        groups: int = 1,
        relu: bool = False,
        backend: str = "xla",
        int4_shape: Optional[Tuple[int, int, int, int]] = None,
        y_clip: Optional[jax.Array] = None,
    ):
        self.w_q = nnx.Param(w_q)
        self.alpha = nnx.Param(alpha)
        self.beta = nnx.Param(beta)
        # (2, Cout) pre-relu clamp bounds on the epilogue output — the folded
        # form of a RangeBN input observer's range clip (convert._rangebn_y_clip;
        # dropping it cost 17 top-1 pt on the trained flagship). Fuses into
        # the requant clip: no extra passes.
        self.y_clip = None if y_clip is None else nnx.Param(y_clip)
        self.act_scale = float(act_scale)
        self.act_zero_point = int(act_zero_point)
        self.stride = stride
        self.padding = padding
        self.groups = groups
        self.relu = relu
        self.backend = backend
        # int4 weight-only: w_q holds packed nibbles, int4_shape the HWIO shape
        self.int4_shape = int4_shape
        if backend.startswith("bf16"):
            # materialize the dequantized bf16 weight copy now — constructing
            # with a bf16 backend (CLI --resident --backend bf16) must not
            # defer to a set_backend() call that may never happen
            self.set_backend(backend)

    def weights(self) -> jax.Array:
        """HWIO int8 kernel (unpacks channel-split int4 storage on the fly;
        the production int4 conv path never calls this — it bitcasts the
        packed bytes to native S4 instead, see run_q)."""
        if self.int4_shape is not None:
            from quantized_tpu.ops.int4 import unpack_int4_conv_channels

            return unpack_int4_conv_channels(self.w_q.get_value())
        return self.w_q.get_value()

    @property
    def stored_zp(self) -> int:
        return self.act_zero_point - 128

    def set_backend(self, backend: str) -> None:
        """Switch the execution path; materializes the dequantized bf16
        weight copy on first switch to 'bf16'. Call outside jit."""
        self.backend = backend
        if backend.startswith("bf16") and not hasattr(self, "w_bf16"):
            w_f = self.weights().astype(jnp.float32)
            s_w = self.alpha.get_value() / jnp.float32(self.act_scale)
            colsum = jnp.sum(w_f, axis=(0, 1, 2))
            # beta = alpha*(128-zp)*colsum + bias  =>  bias = beta - that
            bias_f = self.beta.get_value() - self.alpha.get_value() * jnp.float32(
                128 - self.act_zero_point
            ) * colsum
            self.w_bf16 = nnx.Param((w_f * s_w).astype(jnp.bfloat16))
            self.bias_f = nnx.Param(bias_f)

    def _run_bf16(
        self, x_q: jax.Array, relu: bool, out_requant: Optional[Tuple[float, int]],
        out_prescale: Optional[float] = None, round_s16: bool = False,
        y_clip: Optional[Tuple[jax.Array, jax.Array]] = None,
    ) -> jax.Array:
        """bf16 path on the same stored-int8 grids. The dequantized value of
        the stored zero-point is exactly 0.0, so plain zero-padded lax conv
        is correct (no explicit pad pass). ``y_clip``: per-channel pre-relu
        clamp bounds in the natural epilogue domain (v = y + bias_f) — the
        RangeBN observer fold; each branch maps them through its own
        monotone transform so the clamp fuses into the existing pass."""
        xb = (
            (x_q.astype(jnp.float32) + jnp.float32(128 - self.act_zero_point))
            * jnp.float32(self.act_scale)
        ).astype(jnp.bfloat16)
        ph, pw = self.padding
        y = jax.lax.conv_general_dilated(
            xb,
            self.w_bf16.get_value(),
            window_strides=self.stride,
            padding=[(ph, ph), (pw, pw)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
            preferred_element_type=jnp.float32,
        )
        if out_requant is not None:
            # minimal-op fused requant (see int8_conv_xla): fold 1/s, the
            # -128 shift and ReLU into one fma + round + clip chain
            out_scale, out_zp = out_requant
            inv = jnp.float32(1.0 / out_scale)
            beta2 = self.bias_f.get_value() * inv + jnp.float32(out_zp - 128)
            lo = jnp.float32(out_zp - 128 if relu else -128)
            hi = jnp.float32(127.0)
            if y_clip is not None:
                zps = jnp.float32(out_zp - 128)
                lo = jnp.maximum(lo, jnp.round(y_clip[0] * inv + zps))
                hi = jnp.minimum(hi, jnp.round(y_clip[1] * inv + zps))
            q = jnp.round(y * inv + beta2)
            return jnp.clip(q, lo, hi).astype(jnp.int8)
        if out_prescale is not None:
            scale, shift = out_prescale
            inv = jnp.float32(1.0 / scale)
            if round_s16:
                inv = inv * jnp.float32(S16_FINE)
                val = y * inv + (self.bias_f.get_value() * inv
                                 + jnp.float32(shift * S16_FINE))
                if y_clip is not None:
                    val = jnp.clip(val, y_clip[0] * inv + jnp.float32(shift * S16_FINE),
                                   y_clip[1] * inv + jnp.float32(shift * S16_FINE))
                return clip_s16_checked(jnp.round(val))
            val = y * inv + (self.bias_f.get_value() * inv + jnp.float32(shift))
            if y_clip is not None:
                val = jnp.clip(val, y_clip[0] * inv + jnp.float32(shift),
                               y_clip[1] * inv + jnp.float32(shift))
            return val
        y = y + self.bias_f.get_value()
        if y_clip is not None:
            y = jnp.clip(y, y_clip[0], y_clip[1])
        if relu:
            y = jnp.maximum(y, 0.0)
        return y

    @property
    def grid(self) -> Tuple[float, int]:
        """(scale, zero_point) of the uint8 grid this conv expects its input
        on — the frozen observer range of the source QConv2d."""
        return (self.act_scale, self.act_zero_point)

    def __call__(self, x: jax.Array) -> jax.Array:
        x_q = quantize_input_stored(x, self.act_scale, self.act_zero_point)
        return self.run_q(x_q, relu=self.relu)

    def run_q(
        self,
        x_q: jax.Array,
        relu: Optional[bool] = None,
        out_requant: Optional[Tuple[float, int]] = None,
        out_prescale: Optional[Tuple[float, float]] = None,
        prescale_s16: bool = False,
    ) -> jax.Array:
        """Quantized-input entry (int8-resident mode): ``x_q`` must already be
        stored int8 on ``self.grid``. Returns f32, or int8 on ``out_requant``'s
        grid with relu folded before the requant.

        ``out_prescale=(scale, shift)`` returns f32 ``y/scale + shift``
        (no relu, no requant) with the division folded into the epilogue's
        alpha/beta — the residual tail consumes this so its final fused pass
        is just round+clip, no per-element multiply.

        ``prescale_s16`` (with ``out_prescale``): emit int16 of
        ``round((y/scale + shift) * S16_FINE)`` instead of f32 — halves the
        materialized bytes of a downsample residual leg (measured 1.5-1.7x on
        the ds-block tail, bench/residual_tail_probe.py) at <=1/(2*S16_FINE)
        output-step error, inside the engine's <=1-int-step contract. Honored
        on the xla/bf16 backends; others return f32 (consumers dispatch on
        dtype)."""
        relu = self.relu if relu is None else relu
        if _SHAPE_RECORDER is not None:
            _SHAPE_RECORDER[id(self)] = tuple(x_q.shape)
        alpha, beta = self.alpha.get_value(), self.beta.get_value()
        # pre-relu clamp bounds (RangeBN observer fold — see __init__):
        # *_raw is in the epilogue's natural y-domain (what _run_bf16 takes);
        # *_adj rides any prescale fold applied to alpha/beta below (what
        # int8_conv_xla takes, since its alpha/beta args arrive pre-folded)
        y_clip_raw = None
        if self.y_clip is not None:
            yc = self.y_clip.get_value()
            y_clip_raw = (yc[0], yc[1])
        y_clip_adj = y_clip_raw
        round_s16 = False
        if out_prescale is not None:
            assert out_requant is None and not relu, "prescale excludes requant/relu"
            scale, shift = out_prescale
            inv = jnp.float32(1.0 / scale)
            if prescale_s16 and (
                self.backend.startswith("xla") or self.backend.startswith("bf16")
            ):
                inv = inv * jnp.float32(S16_FINE)
                shift = shift * S16_FINE
                round_s16 = True
            alpha = alpha * inv
            beta = beta * inv + jnp.float32(shift)
            if y_clip_raw is not None:
                y_clip_adj = (y_clip_raw[0] * inv + jnp.float32(shift),
                              y_clip_raw[1] * inv + jnp.float32(shift))
        backend = self.backend
        if y_clip_raw is not None and (
            backend.startswith("s4") or backend in ("pallas", "gemm")
        ):
            # those kernels' fused epilogues don't carry the clamp — the xla
            # path is the semantics-complete fallback (the clamp only exists
            # on RangeBN-flavor models, whose autotuned winners are the
            # xla/bf16 forms anyway)
            backend = "xla-split" if backend.endswith("-split") else "xla"
        split = backend.endswith("-split") and out_requant is not None
        if split:
            # run the conv with a plain f32 epilogue, then requantize in a
            # separate pass (see class docstring for why this can be faster).
            # RangeBN clamp placement matters here: clipping inside the conv's
            # f32 epilogue disturbs XLA's conv-output fusion (measured +4.7%
            # whole-net); applying the SAME bounds as per-channel integer
            # limits on the separate requant pass's existing clip is free —
            # clip commutes with the monotone round(y/s + zp) map to within
            # one output step (inside the engine's <=1-step contract).
            out_scale, out_zp = out_requant
            if backend == "bf16-split":
                y = self._run_bf16(x_q, relu, None, None)
            elif backend == "s4-split":
                from quantized_tpu.ops.int4 import int4_conv_s4

                y = int4_conv_s4(
                    x_q, self.w_q.get_value(), alpha, beta, self.stride,
                    self.padding, self.stored_zp, relu=relu, groups=self.groups,
                )
            else:
                y = int8_conv_xla(
                    x_q, self.weights(), alpha, beta, self.stride, self.padding,
                    self.stored_zp, relu=relu, groups=self.groups,
                )
            if y_clip_raw is not None:
                # f32 clamp right before the (unchanged) quantize pattern —
                # XLA fuses both into the one requant pass
                y = jnp.clip(y, y_clip_raw[0], y_clip_raw[1])
            return quantize_input_stored(y, out_scale, out_zp)
        if backend.startswith("bf16"):
            return self._run_bf16(x_q, relu, out_requant, out_prescale, round_s16,
                                  y_clip=y_clip_raw)
        if backend.startswith("s4"):
            # native-S4 two-half-conv on the packed bytes (halved weight HBM;
            # only valid for channel-packed int4 layers — autotuned against
            # the unpack-single-conv "xla" form, which wins where per-op
            # overhead dominates)
            assert self.int4_shape is not None, "s4 backend needs packed int4 weights"
            from quantized_tpu.ops.int4 import int4_conv_s4

            return int4_conv_s4(
                x_q, self.w_q.get_value(), alpha, beta, self.stride,
                self.padding, self.stored_zp, relu=relu, groups=self.groups,
                out_requant=out_requant,
            )
        if backend == "pallas" and self.groups == 1:
            from quantized_tpu.ops.int8_conv_pallas import int8_conv_direct

            return int8_conv_direct(
                x_q,
                self.weights(),
                alpha,
                beta,
                stride=self.stride,
                padding=self.padding,
                stored_zp=self.stored_zp,
                relu=relu,
                out_requant=out_requant,
            )
        if backend == "gemm" and self.groups == 1:
            return int8_conv_gemm(
                x_q,
                self.weights(),
                alpha,
                beta,
                self.stride,
                self.padding,
                self.stored_zp,
                relu=relu,
                out_requant=out_requant,
            )
        return int8_conv_xla(
            x_q,
            self.weights(),
            alpha,
            beta,
            self.stride,
            self.padding,
            self.stored_zp,
            relu=relu,
            groups=self.groups,
            out_requant=out_requant,
            round_s16=round_s16,
            y_clip=y_clip_adj,
        )


class IntLinear(nnx.Module):
    """Integer dense layer; weights stored (K, N) = (in, out) int8 (or packed
    int4 when ``int4=True``)."""

    def __init__(
        self,
        w_q_kn: jax.Array,
        alpha: jax.Array,
        beta: jax.Array,
        act_scale: float,
        act_zero_point: int,
        relu: bool = False,
        int4: bool = False,
    ):
        self.w_q = nnx.Param(w_q_kn)
        self.alpha = nnx.Param(alpha)
        self.beta = nnx.Param(beta)
        self.act_scale = float(act_scale)
        self.act_zero_point = int(act_zero_point)
        self.relu = relu
        self.int4 = int4
        # 'pallas' (kernel-default blocks) | 'pallas:bm,bn,bk' (tuned blocks)
        # | 'xla' (lax s8 dot) — pinned per fc signature by the autotuner
        self.backend = "pallas"

    def set_backend(self, backend: str) -> None:
        self.backend = backend

    @property
    def grid(self) -> Tuple[float, int]:
        return (self.act_scale, self.act_zero_point)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.run_q(quantize_input_stored(x, self.act_scale, self.act_zero_point))

    def run_q(
        self,
        x_q: jax.Array,
        relu: Optional[bool] = None,
        out_requant: Optional[Tuple[float, int]] = None,
    ) -> jax.Array:
        """Quantized-input entry (int8-resident mode): ``x_q`` already stored
        int8 on ``self.grid``. Returns f32, or int8 on ``out_requant``'s grid
        (split-style: separate quantize pass — see IntConv2d docstring)."""
        relu = self.relu if relu is None else relu
        if _SHAPE_RECORDER is not None:
            _SHAPE_RECORDER[id(self)] = tuple(x_q.shape)
        w, al, be = self.w_q.get_value(), self.alpha.get_value(), self.beta.get_value()
        backend = getattr(self, "backend", "pallas")
        if self.int4:
            # native-S4 bitcast path (halved weight HBM; the Pallas VPU-unpack
            # kernel is kept for comparison but loses — bench/int4_weightbound.py)
            y = int4_matmul_s4(x_q, w, al, be, relu=relu)
        elif backend == "xla":
            y = int8_matmul_xla(x_q, w, al, be, relu=relu)
        elif backend.startswith("pallas:"):
            bm, bn, bk = (int(v) for v in backend[len("pallas:"):].split(","))
            y = int8_matmul(x_q, w, al, be, relu=relu, block_m=bm, block_n=bn, block_k=bk)
        else:
            y = int8_matmul(x_q, w, al, be, relu=relu)
        if out_requant is not None:
            return quantize_input_stored(y, *out_requant)
        return y
