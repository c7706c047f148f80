"""Fused bottleneck kernel: bit-parity with the unfused Int8Bottleneck
composition (same integer accumulators, same epilogue forms, same order)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx

from quantized_tpu.engine import build_int8_resident
from quantized_tpu.engine.fused import (
    FusedInt8Bottleneck,
    fusable,
    fuse_resident_blocks,
)
from quantized_tpu.models import get_model


def _calibrated_resnet50_small():
    """ResNet-50 geometry blocks but on a tiny spatial grid for CPU tests."""
    model = get_model("resnet_quantized_float_bn")(
        dataset="imagenet", depth=50, rngs=nnx.Rngs(0)
    )
    model.train()
    model(jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3)) * 1.5)
    model.eval()
    return model


@pytest.fixture(scope="module")
def resident():
    return build_int8_resident(_calibrated_resnet50_small())


def test_fused_block_bitexact_vs_unfused(resident):
    blk = getattr(resident.layer1, "1")  # identity bottleneck
    assert fusable(blk)
    fused = FusedInt8Bottleneck(blk)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 256))
    from quantized_tpu.engine.int_layers import quantize_input_stored

    x_q = quantize_input_stored(x, *blk.conv1.grid)
    want = np.asarray(blk(x_q), np.int32)
    got = np.asarray(fused(x_q), np.int32)
    # identical integer accumulators; the f32 epilogue can differ by FMA
    # contraction (XLA fuses mul+add, Mosaic may not), flipping rare
    # exact-.5 roundings by one int step
    diff = np.abs(got - want)
    assert diff.max() <= 1, diff.max()
    assert (diff > 0).mean() < 0.01


def test_fuse_resident_blocks_replaces_identity_blocks(resident):
    import copy

    # deep-copy: fuse_resident_blocks mutates in place and the fixture is
    # module-scoped (the DS-parity tests below need the unfused blocks)
    model = copy.deepcopy(resident)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 64, 3))
    want = np.asarray(model(x))
    n = fuse_resident_blocks(model)
    # ResNet-50: 16 blocks - the final block (f32 out) = 15 (identity + ds)
    assert n == 15
    got = np.asarray(model(x))
    # the fused DS kernels mirror the s16 fine-grained leg (ds_fine=
    # S16_FINE), so the only remaining drift is f32-association order in the
    # epilogues flipping exact-.5 roundings by one int step (see the bitexact
    # test); measured propagation through the 15 fused blocks of this config
    # is <=2 int steps on a ~0.03-scale grid = 0.053 max |delta| — bound at
    # 6e-2 (was 8e-2 with a stale f32-leg justification; round-3 advisor)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=6e-2)
    # untrained random logits can be near-tied at the top: require identical
    # argmax OR a sub-tolerance gap between the two competing classes
    for g, wv in zip(got, want):
        if g.argmax() != wv.argmax():
            assert wv[g.argmax()] > wv.max() - 0.06, (g.argmax(), wv.argmax())
    # downsample blocks get the DS kernel, identity blocks the s1 kernel
    from quantized_tpu.engine.fused import FusedInt8BottleneckDS

    assert isinstance(getattr(model.layer1, "0"), FusedInt8BottleneckDS)
    assert isinstance(getattr(model.layer1, "1"), FusedInt8Bottleneck)


def _calibrated_resnet18_small():
    """ResNet-18 geometry (BasicBlocks) on a small spatial grid."""
    model = get_model("resnet_quantized_float_bn")(
        dataset="imagenet", depth=18, rngs=nnx.Rngs(0)
    )
    model.train()
    model(jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3)) * 1.5)
    model.eval()
    return model


def test_fused_basicblock_bitexact_vs_unfused():
    from quantized_tpu.engine.fused import FusedInt8BasicBlock
    from quantized_tpu.engine.int_layers import quantize_input_stored

    res = build_int8_resident(_calibrated_resnet18_small())
    blk = getattr(res.layer1, "1")  # identity BasicBlock
    assert fusable(blk)
    fused = FusedInt8BasicBlock(blk)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 64))
    x_q = quantize_input_stored(x, *blk.conv1.grid)
    want = np.asarray(blk(x_q), np.int32)
    got = np.asarray(fused(x_q), np.int32)
    # same <=1-int-step FMA-contraction bound as the bottleneck test
    diff = np.abs(got - want)
    assert diff.max() <= 1, diff.max()
    assert (diff > 0).mean() < 0.01


def test_fuse_resident_blocks_basicblock_model():
    from quantized_tpu.engine.fused import FusedInt8BasicBlock

    model = build_int8_resident(_calibrated_resnet18_small())
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 64, 3))
    want = np.asarray(model(x))
    n = fuse_resident_blocks(model)
    # ResNet-18: 8 blocks - the final block (f32 out) = 7 (4 identity + 3 ds)
    assert n == 7
    got = np.asarray(model(x))
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=3e-2)
    for i in range(got.shape[0]):  # near-tie argmax flips allowed (see below)
        gi, wi = got[i].argmax(), want[i].argmax()
        assert gi == wi or want[i, wi] - want[i, gi] < 0.05
    assert isinstance(getattr(model.layer1, "1"), FusedInt8BasicBlock)


def test_fused_bottleneck_ds_bitexact_vs_unfused(resident):
    """Downsample (stride-2) bottleneck: fused kernel vs module composition."""
    from quantized_tpu.engine.fused import FusedInt8BottleneckDS
    from quantized_tpu.engine.int_layers import quantize_input_stored

    blk = getattr(resident.layer2, "0")  # stride-2 downsample bottleneck
    assert fusable(blk) and blk.downsample is not None
    fused = FusedInt8BottleneckDS(blk)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 256))
    x_q = quantize_input_stored(x, *blk.conv1.grid)
    want = np.asarray(blk(x_q), np.int32)
    got = np.asarray(fused(x_q), np.int32)
    assert got.shape == want.shape
    diff = np.abs(got - want)
    assert diff.max() <= 1, diff.max()
    assert (diff > 0).mean() < 0.01


def test_fused_bottleneck_ds_stride1_bitexact(resident):
    """layer1's block 0: stride-1 but with a 1x1 projection shortcut."""
    from quantized_tpu.engine.fused import FusedInt8BottleneckDS
    from quantized_tpu.engine.int_layers import quantize_input_stored

    blk = getattr(resident.layer1, "0")
    assert fusable(blk) and blk.downsample is not None
    assert blk.conv2.stride == (1, 1)
    fused = FusedInt8BottleneckDS(blk)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 16, 64))
    x_q = quantize_input_stored(x, *blk.conv1.grid)
    want = np.asarray(blk(x_q), np.int32)
    got = np.asarray(fused(x_q), np.int32)
    diff = np.abs(got - want)
    assert diff.max() <= 1, diff.max()
    assert (diff > 0).mean() < 0.01


def test_fused_basicblock_ds_bitexact_vs_unfused():
    """Stride-2 downsample BasicBlock (ResNet-18 layer2.0 geometry)."""
    from quantized_tpu.engine.fused import FusedInt8BasicBlockDS
    from quantized_tpu.engine.int_layers import quantize_input_stored

    res = build_int8_resident(_calibrated_resnet18_small())
    blk = getattr(res.layer2, "0")
    assert fusable(blk) and blk.downsample is not None
    fused = FusedInt8BasicBlockDS(blk)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 16, 16, 64))
    x_q = quantize_input_stored(x, *blk.conv1.grid)
    want = np.asarray(blk(x_q), np.int32)
    got = np.asarray(fused(x_q), np.int32)
    assert got.shape == want.shape
    diff = np.abs(got - want)
    assert diff.max() <= 1, diff.max()
    assert (diff > 0).mean() < 0.01


def test_fuse_resident_blocks_resnet18_full():
    from quantized_tpu.engine.fused import FusedInt8BasicBlockDS

    model = build_int8_resident(_calibrated_resnet18_small())
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 64, 64, 3))
    want = np.asarray(model(x))
    n = fuse_resident_blocks(model)
    # ResNet-18: 8 blocks - the final block (f32 out) = 7 (4 identity + 3 ds)
    assert n == 7
    got = np.asarray(model(x))
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=3e-2)
    # random-init logits are near-uniform: an argmax flip is fine iff it was
    # a near-tie in the unfused output (<=1-int-step epilogue drift)
    for i in range(got.shape[0]):
        gi, wi = got[i].argmax(), want[i].argmax()
        assert gi == wi or want[i, wi] - want[i, gi] < 0.05
    assert isinstance(getattr(model.layer2, "0"), FusedInt8BasicBlockDS)


def test_fused_dw_pw_mobilenet_bitexact():
    """Fuse all depthwise->pointwise pairs of MobileNet-v1 and compare the
    whole-net forward against the unfused engine."""
    from quantized_tpu.engine import build_int8_mobilenet
    from quantized_tpu.engine.fused import FusedInt8DwPw, fuse_mobilenet_blocks
    from quantized_tpu.models.layers import QuantMeasure

    m = get_model("mobilenet_quantized")(rngs=nnx.Rngs(0))
    for _, mod in nnx.iter_modules(m):
        if isinstance(mod, QuantMeasure):
            mod.running_min.set_value(jnp.full((1,), -4.0, jnp.float32))
            mod.running_max.set_value(jnp.full((1,), 4.0, jnp.float32))
    m.eval()
    eng = build_int8_mobilenet(m)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    want = np.asarray(eng(x))
    n = fuse_mobilenet_blocks(eng)
    # 13 dw->pw pairs; the last pw feeds the f32 head so 12 fuse
    assert n == 12
    got = np.asarray(eng(x))
    np.testing.assert_array_equal(got, want)
    # idempotent
    assert fuse_mobilenet_blocks(eng) == 0
    stages = [getattr(eng, f"stage{j}") for j in range(eng.num_fused_stages)]
    assert sum(isinstance(s, FusedInt8DwPw) for s in stages) == 12
