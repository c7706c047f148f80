"""Fake-quant model -> integer model conversion (module surgery).

Walks a calibrated NNX model (frozen QuantMeasure observers), and for every
(quantized conv/linear, following BN) attribute pair folds the BN into the
weights, derives activation qparams from the observers and per-channel
symmetric int8 (or int4) weight scales, precomputes the fused epilogue
(alpha, beta), and replaces the pair with ``IntConv2d``/``IntLinear`` +
``Identity`` *in place* — the surrounding model code (residual adds, ReLU,
pooling) keeps running unchanged in f32 and XLA fuses it into the conv
epilogues.

Name-pair convention across the zoo:
ResNet blocks/stems conv1..3/bn1..3, Downsample conv/bn, AlexNet conv1..5/
bn1..5 + fc1/bnf1 + fc2/bnf2, MobileNet dw/bn1 + pw/bn2.

AlexNet caveat: its blocks pool *between* conv and BN; a per-channel affine
commutes with maxpool only for positive factors. Folding itself is exact for
any sign (the sign moves into the quantized weights) — what breaks is this
module's pool-after-fold ORDER for negative-factor channels. convert_to_int
warns when that case is detected; ``build_int8_alexnet``
(engine/int8_alexnet.py) handles both signs exactly via per-channel
max/min-pool selection and is the recommended path.
"""

from __future__ import annotations

import logging
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import nnx

from quantized_tpu.engine.int_layers import Identity, IntConv2d, IntLinear
from quantized_tpu.ingest.bn_fold import fold_bn_into_conv, fold_rangebn_into_conv
from quantized_tpu.ingest.calibrate import ActQParams, activation_qparams_from_observer
from quantized_tpu.models.layers import QConv2d, QLinear, RangeBN
from quantized_tpu.ops.int4 import pack_int4
from quantized_tpu.ops.int8_matmul import matmul_epilogue_params

logger = logging.getLogger(__name__)

_PAIRS = [
    ("conv1", "bn1"),
    ("conv2", "bn2"),
    ("conv3", "bn3"),
    ("conv4", "bn4"),
    ("conv5", "bn5"),
    ("conv", "bn"),
    ("dw", "bn1"),
    ("pw", "bn2"),
    ("fc1", "bnf1"),
    ("fc2", "bnf2"),
    ("fc", None),
    ("fc3", None),
]


def _observer_qparams(q_module):
    obs = q_module.quantize_input
    return activation_qparams_from_observer(
        float(obs.running_min.get_value()[0]), float(obs.running_max.get_value()[0])
    )


def observer_grid(q_module) -> Tuple[float, int]:
    """(scale, zero_point) of the uint8 grid derived from a QConv2d/QLinear's
    frozen observer — the single source of the observer->grid rule (shared by
    the resident engine builders)."""
    qp = _observer_qparams(q_module)
    return (qp.scale, qp.zero_point)


def bn_factor(bn) -> np.ndarray:
    """Per-channel folded BN factor gamma/sqrt(var+eps) (nnx.BatchNorm). Its
    sign decides max-vs-min pool commutation for pool-before-BN architectures
    (AlexNet) — shared by convert_to_int's warning and build_int8_alexnet's
    min-pool channel masks."""
    return np.asarray(bn.scale.get_value()) / np.sqrt(
        np.asarray(bn.var.get_value()) + float(bn.epsilon)
    )


def _fold(conv_or_lin, bn) -> Tuple[np.ndarray, np.ndarray]:
    """Returns folded (weight, bias) in f32 numpy. Conv weights HWIO; linear
    weights (out, in)."""
    if isinstance(conv_or_lin, QConv2d):
        w = np.asarray(conv_or_lin.kernel.get_value(), np.float32)
        b = None if conv_or_lin.bias is None else np.asarray(conv_or_lin.bias.get_value(), np.float32)
        cout_axis_last = True
    else:  # QLinear, (out, in) -> fold over rows
        w_oi = np.asarray(conv_or_lin.weight.get_value(), np.float32)
        w = w_oi
        b = None if conv_or_lin.bias is None else np.asarray(conv_or_lin.bias.get_value(), np.float32)
        cout_axis_last = False

    if bn is None:
        bias = np.zeros(w.shape[-1] if cout_axis_last else w.shape[0], np.float32) if b is None else b
        return w, bias

    if isinstance(bn, RangeBN):
        gamma = None if bn.weight is None else np.asarray(bn.weight.get_value())
        beta = None if bn.bias is None else np.asarray(bn.bias.get_value())
        mean = np.asarray(bn.running_mean.get_value())
        scale = np.asarray(bn.running_var.get_value())
        if cout_axis_last:
            return fold_rangebn_into_conv(w, b, gamma, beta, mean, scale, eps=bn.eps)
        wt, bt = fold_rangebn_into_conv(
            w.T[None, None], None if b is None else b, gamma, beta, mean, scale, eps=bn.eps
        )
        return wt[0, 0].T, bt
    # nnx.BatchNorm
    gamma = np.asarray(bn.scale.get_value())
    beta = np.asarray(bn.bias.get_value())
    mean = np.asarray(bn.mean.get_value())
    var = np.asarray(bn.var.get_value())
    eps = float(bn.epsilon)
    # BN folding itself is exact for any factor sign; a non-positive factor
    # only matters when the surrounding model pools BETWEEN the conv and the
    # BN (AlexNet-OWT order) — convert_to_int warns for that case below, and
    # build_int8_alexnet handles it exactly with per-channel min-pools.
    if cout_axis_last:
        return fold_bn_into_conv(w, b, gamma, beta, mean, var, eps)
    wt, bt = fold_bn_into_conv(w.T[None, None], b, gamma, beta, mean, var, eps)
    return wt[0, 0].T, bt


def _weight_scales(w: np.ndarray, cout_axis_last: bool, num_bits: int) -> np.ndarray:
    qmax = 2.0 ** (num_bits - 1) - 1.0
    if cout_axis_last:
        absmax = np.max(np.abs(w.reshape(-1, w.shape[-1])), axis=0)
    else:
        absmax = np.max(np.abs(w), axis=1)
    return np.maximum(absmax / qmax, 1e-12).astype(np.float32)


def _rangebn_y_clip(conv, bn, b_f: np.ndarray) -> Optional[np.ndarray]:
    """Per-channel clamp bounds (2, Cout) that reproduce the RangeBN *input
    observer's* range clip in the folded engine (round-5 fix).

    RangeBN quantizes its input on the observer's running range BEFORE
    normalizing (models/layers.py RangeBN.__call__). Folding BN into the
    conv drops that step; at a trained checkpoint the CLIP part is a
    load-bearing saturating nonlinearity — dropping it cost 17.2 top-1 pt
    on the flagship QAT ResNet-20 (91.02 -> 73.44 measured 2026-08-21; a
    clip-only ablation recovered 90.62 = full fake-quant accuracy, and the
    8-bit *rounding* part measured 0.0 pt). The clip commutes through the
    monotone per-channel BN affine into constant output-domain bounds:

        y = f_c * clip(z, mn, mx) + c_c
          = clip(f_c * z + c_c, min(f_c*mn, f_c*mx) + c_c, max(...) + c_c)

    so the engine applies it as a per-channel clamp fused into the existing
    epilogue/requant pass — zero extra HBM traffic. ``b_f`` is the folded
    bias (= qbeta + (b0 - mean)*factor), from which c_c = b_f - factor*b0.
    Returns None when the observer holds no real range (uncalibrated)."""
    from quantized_tpu.ingest.bn_fold import rangebn_fold_params
    from quantized_tpu.models.layers import QuantMeasure

    obs = getattr(bn, "quantize_input", None)
    if not isinstance(obs, QuantMeasure):
        return None
    mn = float(np.asarray(obs.running_min.get_value())[0])
    mx = float(np.asarray(obs.running_max.get_value())[0])
    if not mx > mn:
        return None  # uncalibrated observer: fake-quant collapses too
    gamma = None if bn.weight is None else np.asarray(bn.weight.get_value())
    scale = np.asarray(bn.running_var.get_value())
    factor, _ = rangebn_fold_params(gamma, None, scale, eps=bn.eps)
    b0 = 0.0 if conv.bias is None else np.asarray(conv.bias.get_value(), np.float32)
    c = np.asarray(b_f, np.float32) - factor * b0
    lo = np.minimum(factor * mn, factor * mx) + c
    hi = np.maximum(factor * mn, factor * mx) + c
    return np.stack([lo, hi]).astype(np.float32)


def _convert_conv(
    conv: QConv2d, bn, weight_bits: int, backend: str, int4_pack: bool = False,
    act_grid: Optional[Tuple[float, int]] = None,
) -> IntConv2d:
    """``act_grid=(scale, zero_point)`` overrides the conv's own observer
    grid. The epilogue (alpha/beta) is exact for whatever grid the input
    actually arrives on — the int8-resident builder uses this to feed a
    block's downsample conv the conv1-quantized tensor directly, with no
    regrid pass and no double quantization."""
    if act_grid is not None:
        qp = ActQParams(scale=float(act_grid[0]), zero_point=int(act_grid[1]))
    else:
        qp = _observer_qparams(conv)
    w_f, b_f = _fold(conv, bn)
    s_w = _weight_scales(w_f, True, weight_bits)
    lim = 2.0 ** (weight_bits - 1) - 1.0
    w_q = np.clip(np.round(w_f / s_w[None, None, None, :]), -lim, lim).astype(np.int8)
    colsum = w_q.astype(np.int32).reshape(-1, w_q.shape[-1]).sum(axis=0)
    alpha, beta = matmul_epilogue_params(
        qp.scale, qp.zero_point, jnp.asarray(s_w), jnp.asarray(colsum), jnp.asarray(b_f)
    )
    int4_shape = None
    w_store = jnp.asarray(w_q)
    if int4_pack and weight_bits == 4 and w_q.shape[2] % 2 == 0:
        # channel-split-half packing -> native-S4 conv execution (halved
        # weight HBM); odd Cin-per-group (stem Cin=3, depthwise Cg=1) stays
        # unpacked int8 — those weights are tiny, the grid is int4 either way
        from quantized_tpu.ops.int4 import pack_int4_conv_channels

        int4_shape = w_q.shape
        w_store = pack_int4_conv_channels(w_store)
    y_clip = _rangebn_y_clip(conv, bn, b_f) if isinstance(bn, RangeBN) else None
    return IntConv2d(
        w_store,
        alpha,
        beta,
        qp.scale,
        qp.zero_point,
        stride=conv.stride,
        padding=conv.padding,
        groups=conv.groups,
        relu=False,
        backend=backend,
        int4_shape=int4_shape,
        y_clip=None if y_clip is None else jnp.asarray(y_clip),
    )


def _convert_linear(lin: QLinear, bn, weight_bits: int, int4_pack: bool) -> IntLinear:
    qp = _observer_qparams(lin)
    w_f, b_f = _fold(lin, bn)  # (out, in)
    s_w = _weight_scales(w_f, False, weight_bits)
    lim = 2.0 ** (weight_bits - 1) - 1.0
    w_q_oi = np.clip(np.round(w_f / s_w[:, None]), -lim, lim).astype(np.int8)
    w_q_kn = w_q_oi.T  # (in, out) for the GEMM
    colsum = w_q_kn.astype(np.int32).sum(axis=0)
    alpha, beta = matmul_epilogue_params(
        qp.scale, qp.zero_point, jnp.asarray(s_w), jnp.asarray(colsum), jnp.asarray(b_f)
    )
    use_int4 = int4_pack and weight_bits == 4
    if use_int4:
        k = w_q_kn.shape[0]
        if k % 2:
            w_q_kn = np.pad(w_q_kn, ((0, 1), (0, 0)))
        w_store = pack_int4(jnp.asarray(w_q_kn))
    else:
        w_store = jnp.asarray(w_q_kn)
    return IntLinear(w_store, alpha, beta, qp.scale, qp.zero_point, relu=False, int4=use_int4)


def convert_to_int(
    model: nnx.Module,
    weight_bits: int = 8,
    backend: str = "xla",
    int4_pack_linear: bool = True,
    int4_pack_conv: bool = True,
    weight_quant: str = "per_channel",
) -> nnx.Module:
    """In-place conversion; returns the (mutated) model.

    weight_bits: 8 (int8) or 4 (int4 weight-only; activations stay uint8).
    backend: 'xla' | 'gemm' (Pallas im2col) | 'pallas' (direct) for convs.
    int4_pack_*: at weight_bits=4, store two nibbles per byte (HBM halving);
    kernels unpack in the weight-read pass.
    weight_quant: 'per_channel' (production: symmetric per-out-channel grid,
    BN folded) or 'per_tensor' (strict-parity mode: the reference's own
    per-tensor affine weight grid, BN left unfolded — the exact twin of
    fake-quant eval; see engine/strict.py). Strict mode uses each module's
    own num_bits_weight and ignores weight_bits/backend.
    """
    if weight_quant == "per_tensor":
        from quantized_tpu.engine.strict import convert_to_int_strict

        return convert_to_int_strict(model)
    if weight_quant != "per_channel":
        raise ValueError("weight_quant must be 'per_channel' or 'per_tensor'")
    if weight_bits not in (4, 8):
        raise ValueError("weight_bits must be 4 or 8")
    # AlexNet-OWT pools BETWEEN conv and BN; the module-surgery engine folds
    # BN into the conv and therefore pools *after* it, which flips max to min
    # for negative-gamma channels. Exact for the common all-positive case;
    # the int8-resident builder (build_int8_alexnet) is exact for both signs.
    from quantized_tpu.models.alexnet import AlexNetOWTBN

    if isinstance(model, AlexNetOWTBN):
        for bn_name in ("bn1", "bn2", "bn5"):
            bn = getattr(model, bn_name, None)
            if bn is not None and not isinstance(bn, Identity) and hasattr(bn, "scale"):
                if np.any(bn_factor(bn) < 0):
                    logger.warning(
                        "%s has negative-scale channels; folding it across the "
                        "following maxpool is unsound here — use "
                        "build_int8_alexnet for exact semantics", bn_name,
                    )
    for _path, module in list(nnx.iter_modules(model)):
        for conv_name, bn_name in _PAIRS:
            target = getattr(module, conv_name, None)
            if target is None:
                continue
            bn = getattr(module, bn_name, None) if bn_name else None
            if isinstance(target, QConv2d):
                setattr(
                    module,
                    conv_name,
                    _convert_conv(target, bn, weight_bits, backend, int4_pack=int4_pack_conv),
                )
                if bn is not None:
                    setattr(module, bn_name, Identity())
            elif isinstance(target, QLinear):
                setattr(
                    module, conv_name, _convert_linear(target, bn, weight_bits, int4_pack_linear)
                )
                if bn is not None:
                    setattr(module, bn_name, Identity())
    return model
