"""Int8-resident ResNet execution: activations stay int8 across the net.

Motivation (bench/micro_int8.py, live v5e): the f32-boundary engine is HBM
bandwidth-bound — a 1x1 conv that runs at 20 TOPS with f32 in/out hits
48-114 TOPS with int8 boundaries. This module executes the whole ResNet with
inter-layer tensors stored int8 (logical uint8 - 128), requantization fused
into each conv epilogue, maxpool in the int8 domain (max commutes with the
monotone affine map), and the residual add as one fused elementwise pass.

Semantics vs. the reference fake-quant eval (SURVEY.md section 3.2): each
activation tensor is quantized ONCE onto the frozen observer grid of its
first consumer (the block's conv1), instead of every consumer quantizing the
raw f32 tensor independently. Two deviations follow, both standard in
production int8 engines and bounded by 1 quantization step:

- a block's downsample conv consumes the conv1-quantized tensor directly
  (its epilogue is built on conv1's grid — exact for that input, but the
  input was quantized on conv1's observer range, not the downsample's own);
- the identity shortcut carries the conv1-quantized tensor, not raw f32.

The exact-mode engine (convert_to_int, f32 boundaries) remains the bit-exact
twin for parity tests; this mode trades <=1-ULP(int8) activation error for
~4x less activation HBM traffic. Accuracy deltas are covered by the parity
test in tests/test_int8_resident.py.

Built from a *calibrated* fake-quant model (frozen QuantMeasure observers,
the checkpoint artifacts of reference main.py --evaluate, SURVEY.md 3.4).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from quantized_tpu.engine.convert import _convert_conv, _convert_linear
from quantized_tpu.engine.int_layers import (
    S16_FINE,
    IntConv2d,
    IntLinear,
    dequantize_stored,
    quantize_input_stored,
)
from quantized_tpu.models import resnet_common
from quantized_tpu.models.layers import QConv2d, QLinear

Grid = Tuple[float, int]


def _prescaled_identity(x_q: jax.Array, grid: Grid, out_scale: float) -> jax.Array:
    """Identity shortcut dequantized AND pre-divided by the output grid's
    scale in one fma: ``(x + (128 - zp)) * (s / s_out)``."""
    scale, zp = grid
    k = jnp.float32(scale / out_scale)
    return x_q.astype(jnp.float32) * k + jnp.float32((128 - zp) * (scale / out_scale))


def _residual_requant_prescaled(acc_ps: jax.Array, identity_ps: jax.Array,
                                shift: int) -> jax.Array:
    """Minimal-op residual tail: both inputs arrive pre-divided by the output
    scale (conv epilogues absorbed the 1/s — see IntConv2d.run_q out_prescale;
    ``acc_ps`` also carries the ``zp-128`` shift), so the fused pass is one
    add + round + clip. ReLU folds into the clip floor: the stored zero-point
    dequantizes to exactly 0 and round is monotone."""
    q = jnp.round(acc_ps + identity_ps)
    return jnp.clip(q, jnp.float32(shift), 127.0).astype(jnp.int8)


class Int8Bottleneck(nnx.Module):
    """1x1 -> 3x3 -> 1x1 with int8-resident plumbing. Input int8 on
    ``conv1.grid``; output int8 on ``out_grid`` (or f32 when None)."""

    def __init__(self, conv1: IntConv2d, conv2: IntConv2d, conv3: IntConv2d,
                 downsample: Optional[IntConv2d], out_grid: Optional[Grid]):
        self.conv1 = conv1
        self.conv2 = conv2
        self.conv3 = conv3
        self.downsample = downsample
        self.out_grid = out_grid

    def __call__(self, x_q: jax.Array) -> jax.Array:
        # per-conv named scopes: XProf framework_op_stats groups by op name,
        # so without these every conv in the block lands in one row
        with jax.named_scope("c1"):
            h = self.conv1.run_q(x_q, relu=True, out_requant=self.conv2.grid)
        with jax.named_scope("c2"):
            h = self.conv2.run_q(h, relu=True, out_requant=self.conv3.grid)
        if self.out_grid is not None:
            s_out, zp_out = self.out_grid
            shift = zp_out - 128
            with jax.named_scope("c3"):
                acc = self.conv3.run_q(h, relu=False, out_prescale=(s_out, float(shift)))
            if self.downsample is not None:
                # downsample epilogue was built on conv1's grid (see
                # build_int8_resident): consumes x_q directly, no regrid pass.
                # The leg materializes (the residual pass can only fuse into
                # ONE producer, and it fuses into conv3) — emit fine-grained
                # int16 instead of f32: half the bytes, measured 1.5-1.7x on
                # the ds tail (bench/residual_tail_probe.py), error
                # <=1/(2*S16_FINE) of an output step.
                with jax.named_scope("ds"):
                    idq = self.downsample.run_q(
                        x_q, relu=False, out_prescale=(s_out, 0.0), prescale_s16=True
                    )
                if idq.dtype == jnp.int16:
                    idq = idq.astype(jnp.float32) * jnp.float32(1.0 / S16_FINE)
            else:
                idq = _prescaled_identity(x_q, self.conv1.grid, s_out)
            return _residual_requant_prescaled(acc, idq, shift)
        # final block: f32 out for avgpool/fc
        acc = self.conv3.run_q(h, relu=False)
        if self.downsample is not None:
            idq = self.downsample.run_q(x_q, relu=False)
        else:
            idq = dequantize_stored(x_q, *self.conv1.grid)
        return jnp.maximum(acc + idq, 0.0)


class Int8BasicBlock(nnx.Module):
    """3x3 -> 3x3 variant (ResNet-18/34 and the CIFAR geometry)."""

    def __init__(self, conv1: IntConv2d, conv2: IntConv2d,
                 downsample: Optional[IntConv2d], out_grid: Optional[Grid]):
        self.conv1 = conv1
        self.conv2 = conv2
        self.downsample = downsample
        self.out_grid = out_grid

    def __call__(self, x_q: jax.Array) -> jax.Array:
        h = self.conv1.run_q(x_q, relu=True, out_requant=self.conv2.grid)
        if self.out_grid is not None:
            s_out, zp_out = self.out_grid
            shift = zp_out - 128
            acc = self.conv2.run_q(h, relu=False, out_prescale=(s_out, float(shift)))
            if self.downsample is not None:
                idq = self.downsample.run_q(
                    x_q, relu=False, out_prescale=(s_out, 0.0), prescale_s16=True
                )
                if idq.dtype == jnp.int16:
                    idq = idq.astype(jnp.float32) * jnp.float32(1.0 / S16_FINE)
            else:
                idq = _prescaled_identity(x_q, self.conv1.grid, s_out)
            return _residual_requant_prescaled(acc, idq, shift)
        acc = self.conv2.run_q(h, relu=False)
        if self.downsample is not None:
            idq = self.downsample.run_q(x_q, relu=False)
        else:
            idq = dequantize_stored(x_q, *self.conv1.grid)
        return jnp.maximum(acc + idq, 0.0)


class _Int8Stage(nnx.Module):
    def __init__(self, blocks: List[nnx.Module]):
        for i, b in enumerate(blocks):
            setattr(self, str(i), b)
        self.num_blocks = len(blocks)

    def __call__(self, x_q: jax.Array) -> jax.Array:
        for i in range(self.num_blocks):
            with jax.named_scope(f"block{i}"):
                x_q = getattr(self, str(i))(x_q)
        return x_q


class Int8SpaceToDepthStem(nnx.Module):
    """7x7/s2/p3 ImageNet stem rewritten as space-to-depth + 4x4/s1 conv.

    The 7x7 stride-2 conv on Cin=3 wastes the MXU (K = 147, and XLA pads the
    3-channel input); re-indexing the padded input into 2x2 blocks
    ((B,230,230,3) -> (B,115,115,12)) turns it into a dense 4x4 stride-1 conv
    with K = 192 — the standard MLPerf ResNet trick, done here entirely in
    the int8 domain. Exact: the remapped kernel contains the same taps
    (zeros elsewhere), padding uses the stored zero-point so padded taps
    contribute exactly 0, and the epilogue (alpha/beta incl. colsum
    correction) is unchanged because the tap sum is permutation-invariant.
    """

    def __init__(self, stem: IntConv2d):
        kh, kw, cin, cout = stem.w_q.get_value().shape
        assert (kh, kw) == (7, 7) and stem.stride == (2, 2) and stem.padding == (3, 3), (
            "space-to-depth stem expects the reference 7x7/s2/p3 geometry"
        )
        w = jnp.zeros((4, 4, 4 * cin, cout), jnp.int8)
        w_src = stem.w_q.get_value()
        for kr in range(7):
            for kc in range(7):
                block = (kr % 2) * 2 + (kc % 2)
                w = w.at[kr // 2, kc // 2, block * cin:(block + 1) * cin, :].set(
                    w_src[kr, kc]
                )
        self.w_q = nnx.Param(w)
        self.alpha = stem.alpha
        self.beta = stem.beta
        self.y_clip = stem.y_clip  # RangeBN observer clamp rides along
        self.act_scale = stem.act_scale
        self.act_zero_point = stem.act_zero_point
        self.cin = cin
        # keep the raw 7x7 conv too: with the bf16 emitter XLA handles the
        # Cin=3 stem well, and "raw-bf16-split" measured *faster* than every
        # s2d form at B=128 (0.498 vs 0.539 ms) — the form is autotuned.
        self.raw = stem
        # "xla" (s8 conv), "bf16" (dequantized-weight MXU bf16 conv),
        # "xla-split" (s8 conv + separate requant), or "raw-<backend>"
        # (bypass space-to-depth, run the original 7x7 IntConv2d with
        # <backend>) — pinned per-shape by the autotuner.
        self.backend = "xla"

    @property
    def grid(self) -> Grid:
        return (self.act_scale, self.act_zero_point)

    def set_backend(self, backend: str) -> None:
        """Switch execution path; materializes the dequantized bf16 weight
        copy on first switch to 'bf16'. Call outside jit."""
        self.backend = backend
        if backend.startswith("raw-"):
            self.raw.set_backend(backend[len("raw-"):])
            return
        if backend == "bf16" and not hasattr(self, "w_bf16"):
            w_f = self.w_q.get_value().astype(jnp.float32)
            s_w = self.alpha.get_value() / jnp.float32(self.act_scale)
            colsum = jnp.sum(w_f, axis=(0, 1, 2))
            # beta = alpha*(128-zp)*colsum + bias  =>  bias = beta - that
            bias_f = self.beta.get_value() - self.alpha.get_value() * jnp.float32(
                128 - self.act_zero_point
            ) * colsum
            self.w_bf16 = nnx.Param((w_f * s_w).astype(jnp.bfloat16))
            self.bias_f = nnx.Param(bias_f)

    def _s2d(self, x_q: jax.Array) -> jax.Array:
        from quantized_tpu.ops.int8_conv import pad_stored_zp

        n = x_q.shape[0]
        xp = pad_stored_zp(x_q, (3, 3), self.act_zero_point - 128)  # (B,230,230,C)
        h2, w2 = xp.shape[1] // 2, xp.shape[2] // 2
        xs = xp.reshape(n, h2, 2, w2, 2, self.cin)
        return xs.transpose(0, 1, 3, 2, 4, 5).reshape(n, h2, w2, 4 * self.cin)

    def run_q(self, x_q: jax.Array, relu: bool, out_requant: Grid) -> jax.Array:
        from quantized_tpu.ops.int8_conv import int8_conv_xla

        if self.backend.startswith("raw-"):
            return self.raw.run_q(x_q, relu=relu, out_requant=out_requant)
        xs = self._s2d(x_q)
        yc = None
        if self.y_clip is not None:
            v = self.y_clip.get_value()
            yc = (v[0], v[1])
        if self.backend == "bf16":
            # stored zero-point dequantizes to exactly 0.0, so the padded
            # taps still contribute 0 in the bf16 domain
            xb = (
                (xs.astype(jnp.float32) + jnp.float32(128 - self.act_zero_point))
                * jnp.float32(self.act_scale)
            ).astype(jnp.bfloat16)
            y = jax.lax.conv_general_dilated(
                xb, self.w_bf16.get_value(), window_strides=(1, 1), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ) + self.bias_f.get_value()
            if yc is not None:
                y = jnp.clip(y, yc[0], yc[1])
            if relu:
                y = jnp.maximum(y, 0.0)
            return quantize_input_stored(y, *out_requant)
        if self.backend == "xla-split":
            # f32-out conv + separate requant pass (see IntConv2d docstring)
            y = int8_conv_xla(
                xs, self.w_q.get_value(), self.alpha.get_value(), self.beta.get_value(),
                stride=(1, 1), padding=(0, 0), stored_zp=self.act_zero_point - 128,
                relu=relu, y_clip=yc,
            )
            return quantize_input_stored(y, *out_requant)
        return int8_conv_xla(
            xs, self.w_q.get_value(), self.alpha.get_value(), self.beta.get_value(),
            stride=(1, 1), padding=(0, 0), stored_zp=self.act_zero_point - 128,
            relu=relu, out_requant=out_requant, y_clip=yc,
        )


# Measured on v5e at (B,112,112,64) int8: XLA's reduce_window is chaotic in
# batch (1.71 ms @64, 0.18 @128, 5.12 @192, 0.35 @256 — its layout choice
# flips), while the phase-decomposed form is stable-fast at small batch
# (0.19 @32, 0.42 @64) and stable-slow at large (1.5 @192+). Per-shape wins
# are pinned by autotune (engine/autotune.py) into this table; unseen shapes
# fall back to the element-count heuristic below.
_POOL_IMPL_TABLE: dict = {}
_POOL_HEURISTIC_RW_MIN_ELEMS = 100_000_000


def maxpool_3x3_s2_int8(x_q: jax.Array, impl: Optional[str] = None) -> jax.Array:
    """3x3/stride-2/pad-1 maxpool on stored int8. Two bit-exact
    implementations (tests pin equality):

    - ``"rw"``: ``lax.reduce_window`` with the int8 identity (-128 = stored
      uint8 zero);
    - ``"interleave"``: even/odd phase decomposition — per axis,
      out[j] = max(x[2j-1], x[2j], x[2j+1]) where x[2j]/x[2j+1] are the
      phases of a (n//2, 2) reshape and x[2j-1] is the odd phase shifted by
      one; only contiguous reshapes, one-pixel pads and elementwise max, so
      its layout never degenerates.

    ``impl=None`` consults the autotune table, then the size heuristic."""
    n, h, w, c = x_q.shape
    if impl is None:
        impl = _POOL_IMPL_TABLE.get((n, h, w, c))
    if impl is None:
        impl = "rw" if x_q.size >= _POOL_HEURISTIC_RW_MIN_ELEMS else "interleave"
    if impl == "rw":
        return jax.lax.reduce_window(
            x_q, jnp.int8(-128), jax.lax.max,
            window_dimensions=(1, 3, 3, 1), window_strides=(1, 2, 2, 1),
            padding=((0, 0), (1, 1), (1, 1), (0, 0)),
        )
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    ho, wo = h // 2, w // 2
    xw = x_q.reshape(n, h, wo, 2, c)
    e, o = xw[:, :, :, 0, :], xw[:, :, :, 1, :]
    o_prev = jnp.pad(o, ((0, 0), (0, 0), (1, 0), (0, 0)), constant_values=-128)[:, :, :wo, :]
    pw = jnp.maximum(jnp.maximum(e, o), o_prev)
    xh = pw.reshape(n, ho, 2, wo, c)
    e2, o2 = xh[:, :, 0], xh[:, :, 1]
    o2_prev = jnp.pad(o2, ((0, 0), (1, 0), (0, 0), (0, 0)), constant_values=-128)[:, :ho]
    return jnp.maximum(jnp.maximum(e2, o2), o2_prev)


def quantize_u8_stored(
    u8: jax.Array, grid: Grid,
    mean: jax.Array, std: jax.Array,
) -> jax.Array:
    """Raw uint8 images -> stored int8 on ``grid``, with the preprocessing
    normalize folded in: quantize(((u/255) - mean)/std) collapses to one
    per-channel affine ``clip(round(u*a + b)) - 128`` — the serving ingest
    path reads 1 B/pixel instead of 4 B (reference preprocess.py normalize
    + SURVEY.md section 3.2 eval quantization, composed exactly)."""
    scale, zp = grid
    a = 1.0 / (255.0 * std * jnp.float32(scale))
    b = jnp.float32(zp - 128) - mean / (std * jnp.float32(scale))
    q = jnp.round(u8.astype(jnp.float32) * a + b)
    return jnp.clip(q, -128.0, 127.0).astype(jnp.int8)


def u8_to_stored(u8: jax.Array, grid: Grid, mean=None, std=None) -> jax.Array:
    """uint8 images -> stored int8 on ``grid`` with default ImageNet stats —
    the shared body of every resident engine's ``run_u8``."""
    from quantized_tpu.data.preprocess import IMAGENET_MEAN, IMAGENET_STD

    mean = jnp.asarray(IMAGENET_MEAN if mean is None else mean, jnp.float32)
    std = jnp.asarray(IMAGENET_STD if std is None else std, jnp.float32)
    return quantize_u8_stored(u8, grid, mean, std)


class Int8ResNet(nnx.Module):
    """Int8-resident ResNet (both geometries). Built via
    :func:`build_int8_resident`; forward takes f32 NHWC images and returns
    f32 logits — everything between the stem quantize and the global avgpool
    flows as stored int8. :meth:`run_u8` ingests raw uint8 images directly
    (normalize folded into the quantize — 4x less input HBM traffic)."""

    def __init__(self, stem: IntConv2d, stem_out_grid: Grid, stages: List[_Int8Stage],
                 fc: IntLinear, imagenet_pool: bool):
        self.stem = stem
        self.stem_out_grid = stem_out_grid
        for i, s in enumerate(stages):
            setattr(self, f"layer{i + 1}", s)
        self.num_stages = len(stages)
        self.fc = fc
        self.imagenet_pool = imagenet_pool
        # final stage emits f32 (out_grid=None on its last block)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self._forward_q(quantize_input_stored(x, *self.stem.grid))

    def run_u8(self, u8: jax.Array, mean=None, std=None) -> jax.Array:
        """Forward from raw uint8 NHWC images (values 0..255); ``mean``/
        ``std`` are the preprocessing stats the calibration observers saw
        (default: the reference ImageNet stats)."""
        return self._forward_q(u8_to_stored(u8, self.stem.grid, mean, std))

    def _forward_q(self, x_q: jax.Array) -> jax.Array:
        # named scopes flow into XProf op names so per-stage time/bandwidth
        # is attributable from one whole-net trace (bench/xprof_mxu.py)
        with jax.named_scope("stem"):
            x_q = self.stem.run_q(x_q, relu=True, out_requant=self.stem_out_grid)
            if self.imagenet_pool:
                # max commutes with the monotone uint8 affine map: pool on int8.
                x_q = maxpool_3x3_s2_int8(x_q)
        h = x_q
        for i in range(self.num_stages):
            with jax.named_scope(f"layer{i + 1}"):
                h = getattr(self, f"layer{i + 1}")(h)
        with jax.named_scope("head"):
            h = jnp.mean(h, axis=(1, 2))  # f32 from the last block
            return self.fc(h)


def _block_convs(block) -> Sequence[Tuple[str, str]]:
    if hasattr(block, "conv3"):
        return [("conv1", "bn1"), ("conv2", "bn2"), ("conv3", "bn3")]
    return [("conv1", "bn1"), ("conv2", "bn2")]


def build_int8_resident(model: nnx.Module, weight_bits: int = 8,
                        backend: str = "xla",
                        space_to_depth: bool = True) -> Int8ResNet:
    """Convert a calibrated fake-quant ResNet (float-BN or RangeBN flavor,
    either geometry) into an :class:`Int8ResNet`.

    The source model is the same artifact ``convert_to_int`` consumes: frozen
    observers + weights (e.g. ingested from a reference ``.pth.tar``).
    ``space_to_depth`` rewrites a 7x7/s2 ImageNet stem as
    :class:`Int8SpaceToDepthStem` (exact, faster on the MXU)."""
    is_imagenet = isinstance(model, resnet_common.ResNetImageNet) or hasattr(model, "layer4")
    stage_names = [n for n in ("layer1", "layer2", "layer3", "layer4") if hasattr(model, n)]

    def conv_of(m, conv_name, bn_name, act_grid=None) -> IntConv2d:
        conv = getattr(m, conv_name)
        bn = getattr(m, bn_name, None)
        if not isinstance(conv, QConv2d):
            raise TypeError(f"{conv_name} is {type(conv).__name__}, expected QConv2d "
                            "(build_int8_resident needs the quantized flavor)")
        return _convert_conv(conv, bn, weight_bits, backend,
                             int4_pack=weight_bits == 4, act_grid=act_grid)

    # walk blocks in execution order to wire each block's out_grid to the
    # next consumer's conv1 observer grid
    blocks_src = []
    for sn in stage_names:
        stage = getattr(model, sn)
        blocks_src.extend(getattr(stage, str(i)) for i in range(stage.num_blocks))

    int_blocks: List[nnx.Module] = []
    for bi, blk in enumerate(blocks_src):
        convs = [conv_of(blk, cn, bn) for cn, bn in _block_convs(blk)]
        ds = None
        if getattr(blk, "downsample", None) is not None:
            # the downsample consumes the conv1-quantized tensor directly:
            # its epilogue is built on conv1's grid (exact — no regrid pass,
            # no double quantization; its own observer grid is unused here)
            ds = conv_of(blk.downsample, "conv", "bn",
                         act_grid=_grid_of_qconv(blk.conv1))
        if bi + 1 < len(blocks_src):
            nxt = blocks_src[bi + 1]
            out_grid = _grid_of_qconv(nxt.conv1)
        else:
            out_grid = None  # last block emits f32 for avgpool/fc
        if len(convs) == 3:
            int_blocks.append(Int8Bottleneck(convs[0], convs[1], convs[2], ds, out_grid))
        else:
            int_blocks.append(Int8BasicBlock(convs[0], convs[1], ds, out_grid))

    # regroup into stages of the source sizes
    stages: List[_Int8Stage] = []
    idx = 0
    for sn in stage_names:
        n = getattr(model, sn).num_blocks
        stages.append(_Int8Stage(int_blocks[idx: idx + n]))
        idx += n

    stem = conv_of(model, "conv1", "bn1")
    if (space_to_depth and is_imagenet
            and stem.w_q.get_value().shape[:2] == (7, 7) and stem.stride == (2, 2)):
        stem = Int8SpaceToDepthStem(stem)
    stem_out_grid = _grid_of_qconv(blocks_src[0].conv1)
    if not isinstance(model.fc, QLinear):
        raise TypeError("model.fc must be QLinear")
    fc = _convert_linear(model.fc, None, weight_bits, int4_pack=False)
    eng = Int8ResNet(stem, stem_out_grid, stages, fc, imagenet_pool=is_imagenet)
    # serving needs the geometry (serve() reads input_size; a CIFAR engine
    # must not default to 224)
    eng.input_size = getattr(model, "input_size", 224)
    return eng


def _grid_of_qconv(qconv: QConv2d) -> Grid:
    from quantized_tpu.engine.convert import observer_grid

    return observer_grid(qconv)
