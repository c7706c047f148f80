"""Int8-resident engine (engine/int8_resident.py): primitive exactness +
whole-net parity against the bit-exact f32-boundary engine after real
calibration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from quantized_tpu.engine import build_int8_resident, convert_to_int
from quantized_tpu.engine.int_layers import (
    dequantize_stored,
    quantize_input_stored,
    requantize_stored,
)
from quantized_tpu.models import get_model


def _np_quant_stored(x, scale, zp):
    q = np.round(x / scale) + zp
    return (np.clip(q, 0, 255) - 128).astype(np.int8)


def test_requantize_stored_matches_numpy(rng):
    x = rng.standard_normal((64, 32)).astype(np.float32)
    g1 = (0.03, 120)
    g2 = (0.05, 140)
    x8 = quantize_input_stored(jnp.asarray(x), *g1)
    got = requantize_stored(x8, g1, g2)
    deq = (np.asarray(x8).astype(np.float32) + (128 - g1[1])) * g1[0]
    want = _np_quant_stored(deq, *g2)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_dequantize_roundtrip(rng):
    x = rng.uniform(-3, 3, (128,)).astype(np.float32)
    g = (6.0 / 255.0, 128)
    x8 = quantize_input_stored(jnp.asarray(x), *g)
    back = dequantize_stored(x8, *g)
    # quantization error bounded by half a step
    assert float(jnp.max(jnp.abs(back - x))) <= g[0] / 2 + 1e-6


def test_int8_maxpool_commutes(rng):
    """max-pooling stored int8 == quantizing the f32 max-pool (monotone map)."""
    x = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    g = (0.04, 128)
    x8 = quantize_input_stored(jnp.asarray(x), *g)
    pooled_q = jax.lax.reduce_window(
        x8, jnp.int8(-128), jax.lax.max,
        window_dimensions=(1, 3, 3, 1), window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    # quantize-then-pool == pool-then-quantize only when padding cannot win
    # the max; stored zp-128 > -128 guards that, and interior pixels dominate
    deq_pool = nnx.max_pool(
        dequantize_stored(x8, *g), (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
    )
    np.testing.assert_array_equal(
        np.asarray(pooled_q), np.asarray(quantize_input_stored(deq_pool, *g))
    )


def test_fast_maxpool_bit_exact_vs_reduce_window(rng):
    """The phase-decomposed pool (engine hot path) == lax.reduce_window,
    including the -128 padding identity on all boundaries."""
    from quantized_tpu.engine.int8_resident import maxpool_3x3_s2_int8

    for shape in [(2, 8, 8, 4), (1, 112, 112, 64), (3, 4, 10, 5)]:
        x8 = jnp.asarray(rng.integers(-128, 128, size=shape, dtype=np.int8))
        ref = jax.lax.reduce_window(
            x8, jnp.int8(-128), jax.lax.max,
            window_dimensions=(1, 3, 3, 1), window_strides=(1, 2, 2, 1),
            padding=((0, 0), (1, 1), (1, 1), (0, 0)),
        )
        np.testing.assert_array_equal(np.asarray(maxpool_3x3_s2_int8(x8)), np.asarray(ref))


@pytest.mark.parametrize("model_name,depth,dataset,shape", [
    ("resnet_quantized_float_bn", 20, "cifar10", (8, 32, 32, 3)),
    # RangeBN flavor: the resident builder folds RangeBN's range-derived
    # scale buffers the same way (ingest/bn_fold.py)
    ("resnet_quantized", 20, "cifar10", (8, 32, 32, 3)),
])
def test_resident_parity_after_calibration(rng, model_name, depth, dataset, shape):
    """Calibrate observers on real data stats, then compare the resident
    engine against the bit-exact f32-boundary engine: same top-1 on most
    samples and bounded logit deviation (<= a few quant steps)."""

    def calibrated():
        m = get_model(model_name)(dataset=dataset, depth=depth, rngs=nnx.Rngs(0))
        m.train()
        calib = nnx.jit(lambda mm, v: mm(v))
        for i in range(3):
            xb = jnp.asarray(rng.standard_normal(shape), jnp.float32)
            calib(m, xb)
        m.eval()
        return m

    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    resident = build_int8_resident(calibrated())
    gd, st = nnx.split(resident)
    y_res = jax.jit(lambda s, v: nnx.merge(gd, s)(v))(st, x)

    exact = convert_to_int(calibrated(), weight_bits=8, backend="xla")
    gd2, st2 = nnx.split(exact)
    y_exact = jax.jit(lambda s, v: nnx.merge(gd2, s)(v))(st2, x)

    maxdiff = float(jnp.max(jnp.abs(y_res - y_exact)))
    assert maxdiff < 1.0, f"logit deviation {maxdiff}"
    # top-1 must agree wherever the exact engine's decision margin clearly
    # exceeds the engines' numeric deviation (untrained nets have near-tied
    # logits, so unconditional agreement is not a sound check)
    top2 = jnp.sort(y_exact, axis=-1)[:, -2:]
    margin = np.asarray(top2[:, 1] - top2[:, 0])
    clear = margin > 2.0 * maxdiff
    agree = np.asarray(jnp.argmax(y_res, -1) == jnp.argmax(y_exact, -1))
    assert agree[clear].all(), f"disagreement on clear-margin samples (margins {margin[clear]})"


def test_space_to_depth_stem_bit_exact(rng):
    """The s2d-rewritten 7x7/s2 stem must produce bit-identical int8 output
    to the direct conv (same taps, permutation-invariant epilogue)."""
    from quantized_tpu.engine.int8_resident import Int8SpaceToDepthStem
    from quantized_tpu.engine.int_layers import IntConv2d

    w_q = rng.integers(-127, 128, (7, 7, 3, 32)).astype(np.int8)
    alpha = rng.uniform(1e-5, 1e-3, 32).astype(np.float32)
    beta = rng.standard_normal(32).astype(np.float32)
    conv = IntConv2d(jnp.asarray(w_q), jnp.asarray(alpha), jnp.asarray(beta),
                     act_scale=0.05, act_zero_point=120,
                     stride=(2, 2), padding=(3, 3))
    s2d = Int8SpaceToDepthStem(conv)
    x_q = jnp.asarray(rng.integers(-128, 128, (2, 64, 64, 3)), np.int8)
    out_grid = (0.07, 130)
    a = conv.run_q(x_q, relu=True, out_requant=out_grid)
    b = s2d.run_q(x_q, relu=True, out_requant=out_grid)
    assert a.shape == b.shape == (2, 32, 32, 32)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resident_imagenet_geometry_builds(rng):
    """ResNet-18 ImageNet geometry (BasicBlock + maxpool path) builds and runs."""
    m = get_model("resnet_quantized_float_bn")(dataset="imagenet", depth=18, rngs=nnx.Rngs(0))
    m.train()
    calib = nnx.jit(lambda mm, v: mm(v))
    calib(m, jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32))
    m.eval()
    resident = build_int8_resident(m)
    gd, st = nnx.split(resident)
    y = jax.jit(lambda s, v: nnx.merge(gd, s)(v))(st, jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32))
    assert y.shape == (2, 1000)
    assert bool(jnp.all(jnp.isfinite(y)))


def test_quantize_u8_matches_normalize_then_quantize(rng):
    """Fused uint8 ingest == normalize (reference preprocess) -> quantize,
    up to 1 int level at round-boundary ties (fp op-order)."""
    from quantized_tpu.data.preprocess import IMAGENET_MEAN, IMAGENET_STD
    from quantized_tpu.engine.int8_resident import quantize_u8_stored
    from quantized_tpu.engine.int_layers import quantize_input_stored

    u8 = jnp.asarray(rng.integers(0, 256, size=(2, 16, 16, 3), dtype=np.uint8))
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    grid = (0.037, 121)
    fused = np.asarray(quantize_u8_stored(u8, grid, mean, std), np.int32)
    x = (u8.astype(jnp.float32) / 255.0 - mean) / std
    ref = np.asarray(quantize_input_stored(x, *grid), np.int32)
    diff = np.abs(fused - ref)
    assert diff.max() <= 1
    assert (diff > 0).mean() < 1e-2


def _build_resident(rng):
    """Calibrated CIFAR-geometry resident model (observers see u8-range data)."""
    m = get_model("resnet_quantized_float_bn")(dataset="cifar10", depth=20, rngs=nnx.Rngs(0))
    m.train()
    calib = nnx.jit(lambda mm, v: mm(v))
    for _ in range(2):
        u8 = rng.integers(0, 256, size=(8, 32, 32, 3)).astype(np.float32)
        x = (u8 / 255.0 - np.asarray([0.485, 0.456, 0.406])) / np.asarray([0.229, 0.224, 0.225])
        calib(m, jnp.asarray(x, jnp.float32))
    m.eval()
    return build_int8_resident(m)


def test_run_u8_matches_f32_path(rng):
    """Engine uint8 ingest vs normalize-then-__call__: same decisions."""
    from quantized_tpu.data.preprocess import IMAGENET_MEAN, IMAGENET_STD

    model = _build_resident(rng)
    u8 = jnp.asarray(rng.integers(0, 256, size=(4, 32, 32, 3), dtype=np.uint8))
    x = (u8.astype(jnp.float32) / 255.0 - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    ref = model(x)
    out = model.run_u8(u8)
    assert jnp.mean((jnp.argmax(out, -1) == jnp.argmax(ref, -1)).astype(jnp.float32)) == 1.0
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.2)


def test_executor_u8_ingest(rng):
    from quantized_tpu.engine.executor import IntExecutor

    model = _build_resident(rng)
    ex = IntExecutor(model, ingest="u8")
    u8 = jnp.asarray(rng.integers(0, 256, size=(2, 32, 32, 3), dtype=np.uint8))
    out = np.asarray(ex(u8))
    assert out.shape == (2, 10) and np.isfinite(out).all()


def test_out_prescale_contract(rng):
    """run_q(out_prescale=(s, shift)) == run_q()/s + shift (f32, both backends)."""
    from quantized_tpu.engine.int_layers import IntConv2d

    w_q = jnp.asarray(rng.integers(-30, 31, (3, 3, 8, 16)), jnp.int8)
    alpha = jnp.asarray(rng.uniform(1e-4, 1e-2, 16), jnp.float32)
    beta = jnp.asarray(rng.standard_normal(16), jnp.float32)
    x_q = jnp.asarray(rng.integers(-128, 128, (2, 10, 10, 8)), jnp.int8)
    s, shift = 0.07, 57.0
    for backend in ("xla", "bf16"):
        conv = IntConv2d(w_q, alpha, beta, act_scale=0.05, act_zero_point=131,
                         stride=(1, 1), padding=(1, 1))
        conv.set_backend(backend)
        base = np.asarray(conv.run_q(x_q, relu=False))
        ps = np.asarray(conv.run_q(x_q, relu=False, out_prescale=(s, shift)))
        np.testing.assert_allclose(ps, base / s + shift, rtol=2e-5, atol=2e-4,
                                   err_msg=backend)


class TestInt8AlexNet:
    """Int8-resident AlexNet (engine/int8_alexnet.py): pool-vs-BN-fold
    ordering makes this architecture the interesting one (module docstring)."""

    @staticmethod
    def _calibrated(flip_gamma: bool):
        m = get_model("alexnet_quantized")(rngs=nnx.Rngs(0))
        if flip_gamma:
            for bn in (m.bn1, m.bn2, m.bn5):
                s = np.array(bn.scale.get_value())
                s[::7] *= -1.0
                bn.scale.set_value(jnp.asarray(s))
        m.train()
        calib = nnx.jit(lambda mm, v: mm(v))
        r = np.random.default_rng(1)
        for _ in range(2):
            calib(m, jnp.asarray(r.standard_normal((2, 224, 224, 3)), jnp.float32))
        m.eval()
        return m

    @pytest.mark.parametrize("flip_gamma", [False, True])
    def test_parity_vs_fakequant(self, rng, flip_gamma):
        from quantized_tpu.engine import build_int8_alexnet

        x = jnp.asarray(rng.standard_normal((4, 224, 224, 3)), jnp.float32)
        ref = np.asarray(self._calibrated(flip_gamma)(x))
        eng = build_int8_alexnet(self._calibrated(flip_gamma))
        masks = (eng.neg1, eng.neg2, eng.neg5)
        if flip_gamma:
            assert all(m is not None for m in masks)  # min-pool dual engaged
        else:
            assert all(m is None for m in masks)  # fast path: no select
        got = np.asarray(eng(x))
        assert (ref.argmax(-1) == got.argmax(-1)).all()
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert rel < 0.2, rel  # per-channel-vs-per-tensor weight-grid drift

    def test_u8_ingest_matches_f32(self, rng):
        from quantized_tpu.data.preprocess import IMAGENET_MEAN, IMAGENET_STD
        from quantized_tpu.engine import build_int8_alexnet

        eng = build_int8_alexnet(self._calibrated(False))
        u8 = jnp.asarray(rng.integers(0, 256, (2, 224, 224, 3)), jnp.uint8)
        f32 = (np.asarray(u8).astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        y_u8 = np.asarray(eng.run_u8(u8))
        y_f32 = np.asarray(eng(jnp.asarray(f32)))
        # both paths quantize onto the same stem grid; tiny f32 rounding only
        np.testing.assert_allclose(y_u8, y_f32, atol=1e-3, rtol=0)


def test_engine_checkpoint_warm_start(rng, tmp_path):
    """Serving warm-start (SURVEY.md section 5 checkpoint row): the built
    engine's array state (packed weights + scale tables) round-trips through
    the native Orbax checkpoint; a rebuilt skeleton restores bit-exactly."""
    from quantized_tpu.models.layers import QuantMeasure
    from quantized_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    def skeleton():
        m = get_model("resnet_quantized_float_bn")(dataset="cifar10", depth=20, rngs=nnx.Rngs(0))
        for _, mod in nnx.iter_modules(m):
            if isinstance(mod, QuantMeasure):
                mod.running_min.set_value(jnp.full((1,), -4.0, jnp.float32))
                mod.running_max.set_value(jnp.full((1,), 4.0, jnp.float32))
        m.eval()
        return build_int8_resident(m)

    eng = skeleton()
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    ref = np.asarray(eng(x))
    save_checkpoint(eng, str(tmp_path), meta={"epoch": 3})

    eng2 = skeleton()
    eng2.fc.w_q.set_value(jnp.zeros_like(eng2.fc.w_q.get_value()))  # prove restore
    meta = load_checkpoint(eng2, str(tmp_path))
    assert int(meta["epoch"]) == 3
    np.testing.assert_array_equal(np.asarray(eng2(x)), ref)


class TestInt8MobileNet:
    """Int8-resident MobileNet-v1 (engine/int8_mobilenet.py): a pure
    conv->BN->ReLU chain, so the resident form must be BIT-identical to the
    f32-boundary exact engine (same quantize/dequantize compositions at every
    layer boundary — no residuals or pools to reassociate)."""

    @staticmethod
    def _calibrated():
        m = get_model("mobilenet_quantized")(rngs=nnx.Rngs(0))
        m.train()
        calib = nnx.jit(lambda mm, v: mm(v))
        r = np.random.default_rng(1)
        for _ in range(2):
            calib(m, jnp.asarray(r.standard_normal((2, 224, 224, 3)), jnp.float32))
        m.eval()
        return m

    def test_bit_exact_vs_exact_engine(self, rng):
        from quantized_tpu.engine import build_int8_mobilenet

        x = jnp.asarray(rng.standard_normal((4, 224, 224, 3)), jnp.float32)
        ex = np.asarray(convert_to_int(self._calibrated())(x))
        res = np.asarray(build_int8_mobilenet(self._calibrated())(x))
        np.testing.assert_array_equal(res, ex)

    def test_u8_ingest(self, rng):
        from quantized_tpu.engine import build_int8_mobilenet

        eng = build_int8_mobilenet(self._calibrated())
        u8 = jnp.asarray(rng.integers(0, 256, (2, 224, 224, 3)), jnp.uint8)
        assert eng.run_u8(u8).shape == (2, 1000)


def test_prescale_s16_matches_f32_within_fine_step(rng):
    """The int16 fine-grained prescale path (downsample residual legs) must
    agree with the f32 prescale path to 1/S16_FINE of an output step, on
    both the xla and bf16 backends."""
    import numpy as np

    from quantized_tpu.engine.int_layers import S16_FINE, IntConv2d

    w = jnp.asarray(rng.integers(-127, 128, (1, 1, 16, 32)), jnp.int8)
    alpha = jnp.asarray(rng.uniform(1e-4, 2e-4, (32,)), jnp.float32)
    beta = jnp.asarray(rng.uniform(-0.5, 0.5, (32,)), jnp.float32)
    x_q = jnp.asarray(rng.integers(-128, 128, (2, 8, 8, 16)), jnp.int8)
    s_out = 0.5  # keeps |y/s_out| within +-~100 steps (engine-realistic)
    for backend in ("xla-split", "bf16-split"):
        conv = IntConv2d(w, alpha, beta, act_scale=0.05, act_zero_point=121,
                         backend=backend)
        f32 = np.asarray(conv.run_q(x_q, relu=False, out_prescale=(s_out, 0.0)))
        s16 = conv.run_q(x_q, relu=False, out_prescale=(s_out, 0.0),
                         prescale_s16=True)
        assert s16.dtype == jnp.int16, backend
        got = np.asarray(s16, np.float32) / S16_FINE
        np.testing.assert_allclose(got, f32, atol=0.5 / S16_FINE + 1e-3)
    # backends that can't honor the flag return f32 (consumer dispatches)
    conv = IntConv2d(w, alpha, beta, act_scale=0.05, act_zero_point=121,
                     backend="gemm")
    out = conv.run_q(x_q, relu=False, out_prescale=(s_out, 0.0), prescale_s16=True)
    assert out.dtype == jnp.float32
