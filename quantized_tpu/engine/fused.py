"""Fused-block execution for the int8-resident engine.

``fuse_resident_blocks`` replaces every eligible residual block — identity
and downsample, Bottleneck and BasicBlock, all int8-stored — in a built
``Int8ResNet`` with a fused twin that runs the whole block in one Pallas
kernel (ops/fused_block.py); interior activations never touch HBM. The
epilogue constants are precomputed here in exactly the minimal-op forms the
unfused path uses (int8_conv.int8_conv_xla's fused requant and
int8_resident's prescaled residual/shortcut tails), so each fused block is
bit-identical to the module composition it replaces (pinned by
tests/test_fused_block.py). The autotuner races fused vs unfused per block
signature and applies only the winners (engine/autotune.py _tune_blocks).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

from quantized_tpu.engine.int8_resident import (
    Int8BasicBlock,
    Int8Bottleneck,
    Int8ResNet,
    _Int8Stage,
)
from quantized_tpu.engine.int_layers import S16_FINE, IntConv2d
from quantized_tpu.ops.fused_block import (
    fused_basicblock_ds,
    fused_basicblock_s1,
    fused_bottleneck_ds,
    fused_bottleneck_s1,
    fused_dw_pw,
)


def _is_1x1_s1(conv: IntConv2d) -> bool:
    return (
        conv.int4_shape is None
        and conv.groups == 1
        and conv.stride == (1, 1)
        and conv.padding == (0, 0)
        and conv.w_q.get_value().shape[:2] == (1, 1)
    )


def _is_3x3_s1(conv: IntConv2d) -> bool:
    return (
        conv.int4_shape is None
        and conv.groups == 1
        and conv.stride == (1, 1)
        and conv.padding == (1, 1)
        and conv.w_q.get_value().shape[:2] == (3, 3)
    )


class FusedInt8Bottleneck(nnx.Module):
    """Single-kernel bottleneck (see ops/fused_block.py). Holds the reshaped
    int8 kernels plus the fully-folded epilogue vectors."""

    def __init__(self, blk: Int8Bottleneck):
        c1, c2, c3 = blk.conv1, blk.conv2, blk.conv3
        s2, zp2 = c2.grid
        s3, zp3 = c3.grid
        s_out, zp_out = blk.out_grid
        s1, zp1 = c1.grid

        w1 = c1.w_q.get_value()
        w2 = c2.w_q.get_value()
        w3 = c3.w_q.get_value()
        self.w1 = nnx.Param(w1.reshape(w1.shape[2], w1.shape[3]))
        self.w2 = nnx.Param(w2)
        self.w3 = nnx.Param(w3.reshape(w3.shape[2], w3.shape[3]))
        # conv1/conv2: fused requant onto the next conv's grid (ReLU folded
        # into the clip floor); conv3: prescaled by the out grid
        self.a1 = nnx.Param(c1.alpha.get_value() / jnp.float32(s2))
        self.b1 = nnx.Param(c1.beta.get_value() / jnp.float32(s2) + jnp.float32(zp2 - 128))
        self.a2 = nnx.Param(c2.alpha.get_value() / jnp.float32(s3))
        self.b2 = nnx.Param(c2.beta.get_value() / jnp.float32(s3) + jnp.float32(zp3 - 128))
        shift = zp_out - 128
        self.a3 = nnx.Param(c3.alpha.get_value() / jnp.float32(s_out))
        self.b3 = nnx.Param(c3.beta.get_value() / jnp.float32(s_out) + jnp.float32(shift))
        self.lo1 = float(zp2 - 128)
        self.lo2 = float(zp3 - 128)
        self.shift = float(shift)
        self.zp2_stored = int(zp2 - 128)
        self.id_k = float(s1 / s_out)
        self.id_c = float((128 - zp1) * (s1 / s_out))
        self.in_grid = (s1, zp1)
        self.out_grid = blk.out_grid

    def __call__(self, x_q: jax.Array) -> jax.Array:
        return fused_bottleneck_s1(
            x_q,
            self.w1.get_value(), self.w2.get_value(), self.w3.get_value(),
            self.a1.get_value(), self.b1.get_value(),
            self.a2.get_value(), self.b2.get_value(),
            self.a3.get_value(), self.b3.get_value(),
            lo1=self.lo1, lo2=self.lo2, shift=self.shift,
            zp2_stored=self.zp2_stored, id_k=self.id_k, id_c=self.id_c,
        )


class FusedInt8BasicBlock(nnx.Module):
    """Single-kernel 3x3->3x3 identity block (ResNet-18/34 + CIFAR geometry);
    epilogue derivation mirrors Int8BasicBlock's out_grid path exactly."""

    def __init__(self, blk: Int8BasicBlock):
        c1, c2 = blk.conv1, blk.conv2
        s1, zp1 = c1.grid
        s2, zp2 = c2.grid
        s_out, zp_out = blk.out_grid

        self.w1 = nnx.Param(c1.w_q.get_value())
        self.w2 = nnx.Param(c2.w_q.get_value())
        self.a1 = nnx.Param(c1.alpha.get_value() / jnp.float32(s2))
        self.b1 = nnx.Param(c1.beta.get_value() / jnp.float32(s2) + jnp.float32(zp2 - 128))
        shift = zp_out - 128
        self.a2 = nnx.Param(c2.alpha.get_value() / jnp.float32(s_out))
        self.b2 = nnx.Param(c2.beta.get_value() / jnp.float32(s_out) + jnp.float32(shift))
        self.lo1 = float(zp2 - 128)
        self.shift = float(shift)
        self.zp1_stored = int(zp1 - 128)
        self.zp2_stored = int(zp2 - 128)
        self.id_k = float(s1 / s_out)
        self.id_c = float((128 - zp1) * (s1 / s_out))
        self.in_grid = (s1, zp1)
        self.out_grid = blk.out_grid

    def __call__(self, x_q: jax.Array) -> jax.Array:
        return fused_basicblock_s1(
            x_q,
            self.w1.get_value(), self.w2.get_value(),
            self.a1.get_value(), self.b1.get_value(),
            self.a2.get_value(), self.b2.get_value(),
            lo1=self.lo1, shift=self.shift,
            zp1_stored=self.zp1_stored, zp2_stored=self.zp2_stored,
            id_k=self.id_k, id_c=self.id_c,
        )


class FusedInt8BottleneckDS(nnx.Module):
    """Single-kernel *downsample* bottleneck (1x1 -> 3x3/s -> 1x1 with a
    1x1/s shortcut conv); epilogue derivation mirrors Int8Bottleneck's
    downsample path exactly (shortcut epilogue prescaled by the out grid)."""

    def __init__(self, blk: Int8Bottleneck):
        c1, c2, c3, d = blk.conv1, blk.conv2, blk.conv3, blk.downsample
        s2, zp2 = c2.grid
        s3, zp3 = c3.grid
        s_out, zp_out = blk.out_grid

        w1 = c1.w_q.get_value()
        w2 = c2.w_q.get_value()
        w3 = c3.w_q.get_value()
        wd = d.w_q.get_value()
        self.w1 = nnx.Param(w1.reshape(w1.shape[2], w1.shape[3]))
        self.w2 = nnx.Param(w2)
        self.w3 = nnx.Param(w3.reshape(w3.shape[2], w3.shape[3]))
        self.wd = nnx.Param(wd.reshape(wd.shape[2], wd.shape[3]))
        self.a1 = nnx.Param(c1.alpha.get_value() / jnp.float32(s2))
        self.b1 = nnx.Param(c1.beta.get_value() / jnp.float32(s2) + jnp.float32(zp2 - 128))
        self.a2 = nnx.Param(c2.alpha.get_value() / jnp.float32(s3))
        self.b2 = nnx.Param(c2.beta.get_value() / jnp.float32(s3) + jnp.float32(zp3 - 128))
        shift = zp_out - 128
        self.a3 = nnx.Param(c3.alpha.get_value() / jnp.float32(s_out))
        self.b3 = nnx.Param(c3.beta.get_value() / jnp.float32(s_out) + jnp.float32(shift))
        self.ad = nnx.Param(d.alpha.get_value() / jnp.float32(s_out))
        self.bd = nnx.Param(d.beta.get_value() / jnp.float32(s_out))
        self.stride = int(c2.stride[0])
        self.lo1 = float(zp2 - 128)
        self.lo2 = float(zp3 - 128)
        self.shift = float(shift)
        self.zp2_stored = int(zp2 - 128)
        self.in_grid = c1.grid
        self.out_grid = blk.out_grid

    def __call__(self, x_q: jax.Array) -> jax.Array:
        return fused_bottleneck_ds(
            x_q,
            self.w1.get_value(), self.w2.get_value(),
            self.w3.get_value(), self.wd.get_value(),
            self.a1.get_value(), self.b1.get_value(),
            self.a2.get_value(), self.b2.get_value(),
            self.a3.get_value(), self.b3.get_value(),
            self.ad.get_value(), self.bd.get_value(),
            stride=self.stride,
            lo1=self.lo1, lo2=self.lo2, shift=self.shift,
            zp2_stored=self.zp2_stored,
            ds_fine=S16_FINE,  # mirror the unfused s16 identity leg
        )


def _is_3x3_s(conv: IntConv2d, s: int) -> bool:
    return (
        conv.int4_shape is None
        and conv.groups == 1
        and conv.stride == (s, s)
        and conv.padding == (1, 1)
        and conv.w_q.get_value().shape[:2] == (3, 3)
    )


def _is_1x1_s(conv: IntConv2d, s: int) -> bool:
    return (
        conv.int4_shape is None
        and conv.groups == 1
        and conv.stride == (s, s)
        and conv.padding == (0, 0)
        and conv.w_q.get_value().shape[:2] == (1, 1)
    )


class FusedInt8BasicBlockDS(nnx.Module):
    """Single-kernel *downsample* BasicBlock (3x3/s -> 3x3, 1x1/s shortcut
    conv); mirrors Int8BasicBlock's downsample path."""

    def __init__(self, blk: Int8BasicBlock):
        c1, c2, d = blk.conv1, blk.conv2, blk.downsample
        s1, zp1 = c1.grid
        s2, zp2 = c2.grid
        s_out, zp_out = blk.out_grid

        wd = d.w_q.get_value()
        self.w1 = nnx.Param(c1.w_q.get_value())
        self.w2 = nnx.Param(c2.w_q.get_value())
        self.wd = nnx.Param(wd.reshape(wd.shape[2], wd.shape[3]))
        self.a1 = nnx.Param(c1.alpha.get_value() / jnp.float32(s2))
        self.b1 = nnx.Param(c1.beta.get_value() / jnp.float32(s2) + jnp.float32(zp2 - 128))
        shift = zp_out - 128
        self.a2 = nnx.Param(c2.alpha.get_value() / jnp.float32(s_out))
        self.b2 = nnx.Param(c2.beta.get_value() / jnp.float32(s_out) + jnp.float32(shift))
        self.ad = nnx.Param(d.alpha.get_value() / jnp.float32(s_out))
        self.bd = nnx.Param(d.beta.get_value() / jnp.float32(s_out))
        self.stride = int(c1.stride[0])
        self.lo1 = float(zp2 - 128)
        self.shift = float(shift)
        self.zp1_stored = int(zp1 - 128)
        self.zp2_stored = int(zp2 - 128)
        self.in_grid = c1.grid
        self.out_grid = blk.out_grid

    def __call__(self, x_q: jax.Array) -> jax.Array:
        return fused_basicblock_ds(
            x_q,
            self.w1.get_value(), self.w2.get_value(), self.wd.get_value(),
            self.a1.get_value(), self.b1.get_value(),
            self.a2.get_value(), self.b2.get_value(),
            self.ad.get_value(), self.bd.get_value(),
            stride=self.stride,
            lo1=self.lo1, shift=self.shift,
            zp1_stored=self.zp1_stored, zp2_stored=self.zp2_stored,
            ds_fine=S16_FINE,  # mirror the unfused s16 identity leg
        )


def fusable(blk) -> bool:
    if isinstance(blk, Int8Bottleneck):
        if blk.downsample is not None:
            if blk.out_grid is None or not _is_1x1_s1(blk.conv1) or not _is_1x1_s1(blk.conv3):
                return False
            s = blk.conv2.stride[0]
            return (
                s in (1, 2)
                and _is_3x3_s(blk.conv2, s)
                and _is_1x1_s(blk.downsample, s)
            )
        return (
            blk.out_grid is not None
            and _is_1x1_s1(blk.conv1)
            and _is_3x3_s1(blk.conv2)
            and _is_1x1_s1(blk.conv3)
        )
    if isinstance(blk, Int8BasicBlock):
        if blk.out_grid is None or not _is_3x3_s1(blk.conv2):
            return False
        if blk.downsample is None:
            return _is_3x3_s1(blk.conv1)
        s = blk.conv1.stride[0]
        return (
            s in (1, 2)
            and _is_3x3_s(blk.conv1, s)
            and _is_1x1_s(blk.downsample, s)
        )
    return False


def fuse_block(blk):
    """Fused twin of an eligible block (``fusable(blk)`` must hold)."""
    if isinstance(blk, Int8Bottleneck):
        if blk.downsample is not None:
            return FusedInt8BottleneckDS(blk)
        return FusedInt8Bottleneck(blk)
    if blk.downsample is not None:
        return FusedInt8BasicBlockDS(blk)
    return FusedInt8BasicBlock(blk)


def fuse_resident_blocks(model: Int8ResNet) -> int:
    """Replace eligible blocks in place; returns how many were fused."""
    fused = 0
    for i in range(model.num_stages):
        stage: _Int8Stage = getattr(model, f"layer{i + 1}")
        for j in range(stage.num_blocks):
            blk = getattr(stage, str(j))
            if fusable(blk):
                setattr(stage, str(j), fuse_block(blk))
                fused += 1
    return fused


# ---------------------------------------------------------------- mobilenet

class _ConvStage(nnx.Module):
    """Unfused stage of a fused-plan MobileNet: one conv + its output grid."""

    def __init__(self, conv: IntConv2d, out_grid):
        self.conv = conv
        self.stage_out_grid = out_grid

    def __call__(self, x_q: jax.Array) -> jax.Array:
        return self.conv.run_q(x_q, relu=True, out_requant=self.stage_out_grid)


class FusedInt8DwPw(nnx.Module):
    """Single-kernel depthwise-separable pair (3x3 dw / stride s -> 1x1 pw);
    mirrors the two chained IntConv2d.run_q(relu=True, out_requant=...) calls
    of Int8MobileNet._forward_q exactly."""

    def __init__(self, dw: IntConv2d, pw: IntConv2d, dw_out_grid, pw_out_grid):
        s_pw, zp_pw = dw_out_grid  # the pw conv's input grid
        s_nx, zp_nx = pw_out_grid  # the next conv's input grid
        wdw = dw.w_q.get_value()  # (3, 3, 1, C)
        wpw = pw.w_q.get_value()  # (1, 1, C, Cout)
        self.wdw = nnx.Param(wdw.reshape(3, 3, wdw.shape[-1]))
        self.wpw = nnx.Param(wpw.reshape(wpw.shape[2], wpw.shape[3]))
        self.a1 = nnx.Param(dw.alpha.get_value() / jnp.float32(s_pw))
        self.b1 = nnx.Param(dw.beta.get_value() / jnp.float32(s_pw) + jnp.float32(zp_pw - 128))
        self.a2 = nnx.Param(pw.alpha.get_value() / jnp.float32(s_nx))
        self.b2 = nnx.Param(pw.beta.get_value() / jnp.float32(s_nx) + jnp.float32(zp_nx - 128))
        self.stride = int(dw.stride[0])
        self.lo1 = float(zp_pw - 128)
        self.lo2 = float(zp_nx - 128)
        self.zp1_stored = int(dw.act_zero_point - 128)
        self.in_grid = dw.grid
        self.stage_out_grid = pw_out_grid

    def __call__(self, x_q: jax.Array) -> jax.Array:
        return fused_dw_pw(
            x_q,
            self.wdw.get_value(), self.wpw.get_value(),
            self.a1.get_value(), self.b1.get_value(),
            self.a2.get_value(), self.b2.get_value(),
            stride=self.stride,
            lo1=self.lo1, lo2=self.lo2,
            zp1_stored=self.zp1_stored,
        )


def _is_dw3x3(conv: IntConv2d) -> bool:
    w = conv.w_q.get_value()
    return (
        conv.int4_shape is None
        and conv.groups == w.shape[-1]
        and w.shape[:3] == (3, 3, 1)
        and conv.stride[0] in (1, 2)
        and conv.stride[0] == conv.stride[1]
        and conv.padding == (1, 1)
    )


def pair_fusable(dw, pw, dw_grid, pw_grid) -> bool:
    return (
        isinstance(dw, IntConv2d)
        and isinstance(pw, IntConv2d)
        and dw_grid is not None
        and pw_grid is not None
        and _is_dw3x3(dw)
        and _is_1x1_s1(pw)
    )


def fuse_mobilenet_blocks(model, decide=None) -> int:
    """Rebuild an Int8MobileNet's conv chain as stages, fusing every
    depthwise->pointwise pair whose intermediate and output grids are both
    frozen (and, when ``decide(dw, pw)`` is given, only pairs it approves —
    the autotuner's fused-vs-unfused race). Returns how many pairs were
    fused. Idempotent-safe: calling on an already-fused model is a no-op."""
    from quantized_tpu.engine.int8_mobilenet import Int8MobileNet

    if not isinstance(model, Int8MobileNet) or getattr(model, "fused_stages", False):
        return 0
    convs = [getattr(model, f"conv{i}") for i in range(model.num_convs)]
    grids = model.requant_grids
    stages = []
    i = fused = 0
    while i < model.num_convs:
        if (
            i + 1 < model.num_convs
            and pair_fusable(convs[i], convs[i + 1], grids[i], grids[i + 1])
            and (decide is None or decide(convs[i], convs[i + 1]))
        ):
            stages.append(FusedInt8DwPw(convs[i], convs[i + 1], grids[i], grids[i + 1]))
            fused += 1
            i += 2
        else:
            stages.append(_ConvStage(convs[i], grids[i]))
            i += 1
    for j, st in enumerate(stages):
        setattr(model, f"stage{j}", st)
    # Drop the flat conv{i} attributes: every conv now lives either inside a
    # _ConvStage (same object) or as copied Params in a FusedInt8DwPw —
    # keeping them would duplicate weight arrays in model state (pushed to
    # the device twice by put_model) and leave dead modules for
    # _record_shapes to iterate.
    for i in range(model.num_convs):
        delattr(model, f"conv{i}")
    model.num_fused_stages = len(stages)
    model.fused_stages = True
    return fused
