"""Strict-parity engine tests: the per-tensor-affine integer twin must match
fake-quant eval (the reference's --evaluate semantics, SURVEY.md section 3.2)
to f32 summation noise — replacing the loose agree>=0.75 tolerance the
per-channel production engine is held to (different grid by design)."""

import numpy as np
import jax
import jax.numpy as jnp
from flax import nnx

from quantized_tpu.engine import convert_to_int
from quantized_tpu.engine.strict import (
    StrictIntConv2d,
    StrictIntLinear,
    quantize_strict_stored,
    strict_act_qparams,
)
from quantized_tpu.models import get_model
from quantized_tpu.models.layers import QConv2d, QLinear


def _calibrated(name, key=0, shape=(8, 32, 32, 3), x_shift=0.0, **cfg):
    model = get_model(name)(rngs=nnx.Rngs(0), **cfg)
    model.train()
    model(jax.random.normal(jax.random.PRNGKey(key), shape) * 1.5 + x_shift)
    model.eval()
    return model


def test_strict_quantize_matches_fakequant_ints():
    """The strict quantizer must reproduce the reference's integer values
    bit-for-bit (same op order: subtract-min, divide, clip, round)."""
    from quantized_tpu.quantcore.affine import fake_quant_array

    x = jax.random.normal(jax.random.PRNGKey(0), (64, 64)) * 3.0
    rmin, rmax = -2.0, 5.0
    scale, rmin_q = strict_act_qparams(rmin, rmax)
    stored = np.asarray(quantize_strict_stored(x, scale, rmin_q), np.int32)
    ref = np.asarray(fake_quant_array(x, 8, rmin, rmax))
    ref_u = np.round((ref - rmin) / scale)
    np.testing.assert_array_equal(stored + 128, ref_u)


def test_strict_conv_exact_vs_fakequant(rng):
    """Single conv (with padding, bias, and a zero-excluding input range so
    the border map actually matters): strict engine == fake-quant forward."""
    cin, cout = 8, 16
    conv = QConv2d(cin, cout, 3, padding=1, stride=2, use_bias=True, rngs=nnx.Rngs(0))
    conv.bias.value = jax.random.normal(jax.random.PRNGKey(3), (cout,)) * 0.1
    x_cal = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, cin)) + 3.0  # rmin > 0
    conv.train()
    _ = conv(x_cal)
    conv.eval()

    x = jax.random.normal(jax.random.PRNGKey(2), (4, 16, 16, cin)) + 3.0
    ref = np.asarray(conv(x))
    strict = StrictIntConv2d(conv)
    got = np.asarray(strict(x))
    # identical integer math; difference is f32 summation order only
    step = strict.act_scale
    assert np.abs(got - ref).max() < 0.05 * step, (np.abs(got - ref).max(), step)


def test_strict_conv_grouped_exact(rng):
    c = 12
    conv = QConv2d(c, c, 3, padding=1, groups=c, use_bias=False, rngs=nnx.Rngs(0))
    x_cal = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, c)) * 2.0 - 1.0
    conv.train()
    _ = conv(x_cal)
    conv.eval()
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 8, c)) * 2.0 - 1.0
    ref = np.asarray(conv(x))
    strict = StrictIntConv2d(conv)
    got = np.asarray(strict(x))
    assert np.abs(got - ref).max() < 0.05 * strict.act_scale


def test_strict_linear_exact_vs_fakequant():
    lin = QLinear(96, 10, use_bias=True, rngs=nnx.Rngs(0))
    x_cal = jax.random.normal(jax.random.PRNGKey(1), (16, 96)) - 0.5
    lin.train()
    _ = lin(x_cal)
    lin.eval()
    x = jax.random.normal(jax.random.PRNGKey(2), (16, 96)) - 0.5
    ref = np.asarray(lin(x))
    strict = StrictIntLinear(lin)
    got = np.asarray(strict(x))
    assert np.abs(got - ref).max() < 0.05 * strict.act_scale


def test_full_model_strict_twin_float_bn():
    """Whole ResNet-20/CIFAR (float-BN flavor): strict engine logits must
    match fake-quant eval within ~2 steps of the final fc grid (per-LAYER
    exactness is <0.05 step — see the single-layer tests above; across 20
    layers an f32-summation-order delta can cross one quantize bin boundary
    and propagate, so the end-to-end budget is a couple of final-grid steps),
    with 100% top-1 agreement."""
    model = _calibrated("resnet_quantized_float_bn", dataset="cifar10", depth=20)
    x = jax.random.normal(jax.random.PRNGKey(5), (16, 32, 32, 3))
    ref_logits = np.asarray(model(x))

    convert_to_int(model, weight_quant="per_tensor")
    assert isinstance(model.conv1, StrictIntConv2d)
    assert isinstance(model.fc, StrictIntLinear)
    assert isinstance(model.bn1, nnx.BatchNorm)  # NOT folded
    got_logits = np.asarray(model(x))

    fc_step = model.fc.act_scale
    err = np.abs(got_logits - ref_logits).max()
    assert err < 2 * fc_step, (err, fc_step)
    np.testing.assert_array_equal(got_logits.argmax(-1), ref_logits.argmax(-1))


def test_full_model_strict_twin_rangebn():
    """RangeBN flavor: RangeBN modules keep running their own (f32, frozen
    observer) eval path, exactly as the reference composes them."""
    model = _calibrated("resnet_quantized", dataset="cifar10", depth=20)
    x = jax.random.normal(jax.random.PRNGKey(6), (8, 32, 32, 3))
    ref_logits = np.asarray(model(x))
    convert_to_int(model, weight_quant="per_tensor")
    got_logits = np.asarray(model(x))
    fc_step = model.fc.act_scale
    assert np.abs(got_logits - ref_logits).max() < 2 * fc_step
    np.testing.assert_array_equal(got_logits.argmax(-1), ref_logits.argmax(-1))


def test_strict_mode_cli_flag():
    import subprocess, sys

    r = subprocess.run(
        [sys.executable, "-m", "quantized_tpu.cli.main", "--help"],
        capture_output=True, text=True,
    )
    assert "--weight-quant" in r.stdout
