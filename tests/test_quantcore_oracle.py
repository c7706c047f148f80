"""Bit-exactness of the JAX quant core vs the torch oracle (SURVEY.md section 4:
golden-value + cross-framework oracle tests)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from quantized_tpu.quantcore import (
    batch_min_max_stat,
    chunked_min_max,
    ema_update,
    fake_quant,
    fake_quant_array,
    range_bn_apply,
    range_bn_stats,
)
from tests.torch_oracle import (
    oracle_ema,
    oracle_quant_measure_stat,
    oracle_quantize,
    oracle_range_bn_apply,
    oracle_range_bn_stats,
)


def random_tensor(rng, shape, lo=-3.0, hi=3.0):
    return (rng.random(shape, dtype=np.float32) * (hi - lo) + lo).astype(np.float32)


@pytest.mark.parametrize("num_bits", [2, 4, 8])
@pytest.mark.parametrize("shape", [(64, 32), (8, 16, 4, 4), (128,)])
def test_fake_quant_explicit_range_bitexact(rng, num_bits, shape):
    x = random_tensor(rng, shape)
    mn, mx = float(x.min()), float(x.max())
    ours = np.asarray(fake_quant_array(jnp.asarray(x), num_bits, mn, mx))
    ref = oracle_quantize(
        torch.from_numpy(x), num_bits, mn, mx, f32_scalar_params=True
    ).numpy()
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("num_bits", [4, 8])
def test_fake_quant_vs_f64_scalar_reference_within_one_level(rng, num_bits):
    # The reference derives scale in Python float64; the TPU path keeps scalar
    # qparams in f32 (no f64 on TPU). Deviation budget: <=1 integer level on a
    # vanishing fraction of bin-boundary elements (SURVEY.md section 7 step 3's
    # <=1 ULP(int) requantization budget).
    x = random_tensor(rng, (128, 64))
    mn, mx = float(x.min()), float(x.max())
    ours = np.asarray(fake_quant_array(jnp.asarray(x), num_bits, mn, mx))
    ref = oracle_quantize(torch.from_numpy(x), num_bits, mn, mx).numpy()
    scale = max((mx - mn) / (2.0**num_bits - 1.0), 1e-8)
    level_diff = np.abs(ours - ref) / scale
    assert level_diff.max() <= 1.0 + 1e-4
    assert (level_diff > 0.5).mean() < 0.01


def test_fake_quant_derived_range_close(rng):
    # The mean-of-chunk-extrema estimator averages 16 chunk minima; XLA and
    # torch reduce in different orders so min/max can differ by 1 float32 ULP,
    # shifting the grid infinitesimally. This path is dead in the reference's
    # real usage (QuantMeasure/weights always pass explicit min/max), so we
    # assert closeness here and bit-exactness everywhere else.
    x = random_tensor(rng, (64, 33))
    ours = np.asarray(fake_quant_array(jnp.asarray(x), 8, num_chunks=16))
    ref = oracle_quantize(torch.from_numpy(x), 8, num_chunks=16).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=0)


def test_fake_quant_bias_path_global_range(rng):
    # bias path: no min/max, num_chunks=None -> global extrema
    x = random_tensor(rng, (57,))
    ours = np.asarray(fake_quant_array(jnp.asarray(x), 8))
    ref = oracle_quantize(torch.from_numpy(x), 8).numpy()
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("mn,mx", [(-1.0, 1.0), (0.0, 6.0), (-2.5, 0.0)])
def test_fake_quant_enforce_true_zero(rng, mn, mx):
    x = random_tensor(rng, (32, 32), mn, mx)
    ours = np.asarray(fake_quant_array(jnp.asarray(x), 8, mn, mx, enforce_true_zero=True))
    ref = oracle_quantize(
        torch.from_numpy(x), 8, mn, mx, enforce_true_zero=True, f32_scalar_params=True
    ).numpy()
    np.testing.assert_array_equal(ours, ref)


def test_degenerate_range_scale_floor(rng):
    # min == max -> scale floored at 1e-8, output collapses to min
    x = np.full((16, 16), 1.234, np.float32)
    ours = np.asarray(fake_quant_array(jnp.asarray(x), 8, 1.234, 1.234))
    ref = oracle_quantize(torch.from_numpy(x), 8, 1.234, 1.234).numpy()
    np.testing.assert_array_equal(ours, ref)


def test_all_negative_tensor(rng):
    x = random_tensor(rng, (32, 8), -5.0, -1.0)
    mn, mx = float(x.min()), float(x.max())
    ours = np.asarray(fake_quant_array(jnp.asarray(x), 8, mn, mx))
    ref = oracle_quantize(torch.from_numpy(x), 8, mn, mx, f32_scalar_params=True).numpy()
    np.testing.assert_array_equal(ours, ref)


def test_values_on_grid():
    # quantized output must lie on the affine grid {min + k*scale}
    x = np.linspace(-1, 1, 1000, dtype=np.float32)
    mn, mx = -1.0, 1.0
    out = np.asarray(fake_quant_array(jnp.asarray(x), 4, mn, mx))
    scale = (mx - mn) / 15.0
    k = (out - mn) / scale
    np.testing.assert_allclose(k, np.round(k), atol=1e-4)
    assert out.min() >= mn - 1e-6 and out.max() <= mx + 1e-6


def test_quant_measure_stat_and_ema(rng):
    x = random_tensor(rng, (16, 3, 8, 8))
    ours_min, ours_max = batch_min_max_stat(jnp.asarray(x))
    ref_min, ref_max = oracle_quant_measure_stat(torch.from_numpy(x))
    np.testing.assert_allclose(float(ours_min), ref_min, rtol=1e-6)
    np.testing.assert_allclose(float(ours_max), ref_max, rtol=1e-6)
    run = 0.5
    np.testing.assert_allclose(
        float(ema_update(jnp.float32(run), ours_min)), oracle_ema(run, ref_min), rtol=1e-6
    )


def test_range_bn_stats_bitmatch(rng):
    b, c, h, w = 8, 16, 4, 4
    x_nchw = random_tensor(rng, (b, c, h, w))
    x_nhwc = np.transpose(x_nchw, (0, 2, 3, 1))
    mean_ref, scale_ref = oracle_range_bn_stats(torch.from_numpy(x_nchw))
    mean_j, scale_j = range_bn_stats(jnp.asarray(x_nhwc))
    np.testing.assert_allclose(np.asarray(mean_j), mean_ref.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(scale_j), scale_ref.numpy(), rtol=1e-5, atol=1e-6)


def test_range_bn_apply_matches(rng):
    b, c, h, w = 4, 8, 4, 4
    x_nchw = random_tensor(rng, (b, c, h, w))
    x_nhwc = np.transpose(x_nchw, (0, 2, 3, 1))
    gamma = random_tensor(rng, (c,), 0.5, 1.5)
    beta = random_tensor(rng, (c,), -0.5, 0.5)
    mean, scale = oracle_range_bn_stats(torch.from_numpy(x_nchw))
    ref = oracle_range_bn_apply(
        torch.from_numpy(x_nchw), mean, scale, torch.from_numpy(gamma), torch.from_numpy(beta)
    ).numpy()
    ours = range_bn_apply(
        jnp.asarray(x_nhwc),
        jnp.asarray(mean.numpy()),
        jnp.asarray(scale.numpy()),
        jnp.asarray(gamma),
        jnp.asarray(beta),
    )
    ours_nchw = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    np.testing.assert_allclose(ours_nchw, ref, rtol=1e-5, atol=1e-5)


def test_ste_gradient_is_identity(rng):
    x = jnp.asarray(random_tensor(rng, (32,)))

    def f(v):
        return jnp.sum(fake_quant(v, min_value=-3.0, max_value=3.0) * 2.0)

    g = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(g), 2.0 * np.ones_like(x), rtol=1e-6)


def test_quantize_grad_quantizes_cotangent(rng):
    from quantized_tpu.quantcore import quantize_grad

    x = jnp.asarray(random_tensor(rng, (64,)))
    w = jnp.asarray(random_tensor(rng, (64,)))  # constant multiplier
    key = jax.random.PRNGKey(0)

    def f(v):
        return jnp.sum(quantize_grad(v, key, num_bits=2, stochastic=False) * w)

    g = jax.grad(f)(x)
    # the cotangent (= w) quantized to 2 bits -> at most 4 distinct values
    assert len(np.unique(np.asarray(g).round(6))) <= 4


def test_biprec_value_equals_plain(rng):
    from quantized_tpu.quantcore import linear_biprec

    x = jnp.asarray(random_tensor(rng, (4, 8)))
    w = jnp.asarray(random_tensor(rng, (3, 8)))
    b = jnp.asarray(random_tensor(rng, (3,)))
    key = jax.random.PRNGKey(1)
    out = linear_biprec(x, w, b, key)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x @ w.T + b), rtol=1e-5, atol=1e-5)
