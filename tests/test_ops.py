"""Pallas int8 kernel tests (interpret mode on CPU) vs numpy/XLA oracles
(SURVEY.md section 4: interpret-mode differential tests)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quantized_tpu.ops import (
    im2col_int8,
    int8_conv_gemm,
    int8_conv_xla,
    int8_matmul,
    int8_matmul_requant,
    matmul_epilogue_params,
    pack_int4,
    unpack_int4,
    int4_matmul,
)


def _rand_int8(rng, shape, lo=-127, hi=127):
    return rng.integers(lo, hi + 1, size=shape).astype(np.int8)


@pytest.mark.parametrize("m,k,n", [(32, 128, 128), (100, 300, 70), (256, 1024, 256)])
def test_int8_matmul_exact_vs_numpy(rng, m, k, n):
    a = _rand_int8(rng, (m, k), -128)
    b = _rand_int8(rng, (k, n))
    alpha = rng.random(n, dtype=np.float32) * 0.01
    beta = rng.standard_normal(n).astype(np.float32)
    acc = a.astype(np.int32) @ b.astype(np.int32)
    want = acc.astype(np.float32) * alpha + beta
    got = np.asarray(int8_matmul(jnp.asarray(a), jnp.asarray(b), jnp.asarray(alpha), jnp.asarray(beta), interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-4)


def test_int8_matmul_relu(rng):
    a = _rand_int8(rng, (64, 256), -128)
    b = _rand_int8(rng, (256, 64))
    alpha = np.full(64, 1e-3, np.float32)
    beta = np.zeros(64, np.float32)
    got = np.asarray(int8_matmul(jnp.asarray(a), jnp.asarray(b), jnp.asarray(alpha), jnp.asarray(beta), relu=True, interpret=True))
    assert got.min() >= 0.0


def test_int8_matmul_requant_one_ulp(rng):
    m, k, n = 64, 512, 96
    a = _rand_int8(rng, (m, k), -128)
    b = _rand_int8(rng, (k, n))
    alpha = rng.random(n, dtype=np.float32) * 1e-3
    beta = rng.standard_normal(n).astype(np.float32) * 0.1
    out_scale, out_zp = 0.05, 17
    acc = a.astype(np.int32) @ b.astype(np.int32)
    y = np.maximum(acc.astype(np.float32) * alpha + beta, 0.0)
    want = np.clip(np.round(y / out_scale) + out_zp, 0, 255) - 128
    got = np.asarray(
        int8_matmul_requant(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(alpha), jnp.asarray(beta),
            out_scale, out_zp, relu=True, interpret=True,
        )
    ).astype(np.int32)
    # allow 1 int ULP on round boundaries (f32 reciprocal vs division)
    assert np.abs(got - want.astype(np.int32)).max() <= 1
    assert (got != want).mean() < 0.01


def test_epilogue_params_zero_point_math(rng):
    """End-to-end integer contract: real conv == int math + epilogue."""
    k, n = 64, 32
    s_a, zp = 0.04, 13
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.1
    s_w = np.max(np.abs(w), axis=0) / 127.0
    w_q = np.clip(np.round(w / s_w), -127, 127).astype(np.int8)
    bias = rng.standard_normal(n).astype(np.float32) * 0.1

    x = rng.random((8, k), dtype=np.float32) * 8 * s_a  # representable range
    u = np.clip(np.round(x / s_a) + zp, 0, 255)
    a = (u - 128).astype(np.int8)

    alpha, beta = matmul_epilogue_params(
        s_a, zp, jnp.asarray(s_w), jnp.asarray(w_q.astype(np.int32).sum(axis=0)), jnp.asarray(bias)
    )
    got = np.asarray(int8_matmul(jnp.asarray(a), jnp.asarray(w_q), alpha, beta, interpret=True))
    # reference: dequantized x times dequantized w + bias
    x_hat = (u - zp) * s_a
    w_hat = w_q.astype(np.float32) * s_w
    want = x_hat @ w_hat + bias
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_im2col_matches_xla_conv(rng):
    n, h, w, cin, cout = 2, 8, 8, 16, 8
    x = _rand_int8(rng, (n, h, w, cin), -128)
    k = _rand_int8(rng, (3, 3, cin, cout))
    patches = im2col_int8(jnp.asarray(x), (3, 3), stride=2)
    a = np.asarray(patches).reshape(-1, 3 * 3 * cin).astype(np.int32)
    b = np.asarray(k).reshape(-1, cout).astype(np.int32)
    want = jax.lax.conv_general_dilated(
        jnp.asarray(x, jnp.int32), jnp.asarray(k, jnp.int32), (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    got = (a @ b).reshape(np.asarray(want).shape)
    np.testing.assert_array_equal(got, np.asarray(want))


@pytest.mark.parametrize("stride,padding", [(1, 1), (2, 3), (1, 0)])
def test_int8_conv_gemm_vs_xla(rng, stride, padding):
    n, h, w_, cin, cout = 2, 10, 10, 8, 16
    x = _rand_int8(rng, (n, h, w_, cin), -128)
    k = _rand_int8(rng, (3, 3, cin, cout))
    alpha = jnp.asarray(rng.random(cout, dtype=np.float32) * 1e-3)
    beta = jnp.asarray(rng.standard_normal(cout).astype(np.float32) * 0.1)
    stored_zp = -101  # logical zp 27
    got = np.asarray(
        int8_conv_gemm(jnp.asarray(x), jnp.asarray(k), alpha, beta, stride, padding, stored_zp, relu=True, interpret=True)
    )
    want = np.asarray(
        int8_conv_xla(jnp.asarray(x), jnp.asarray(k), alpha, beta, stride, padding, stored_zp, relu=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_int4_pack_roundtrip(rng):
    q = rng.integers(-7, 8, size=(128, 32)).astype(np.int8)
    packed = pack_int4(jnp.asarray(q))
    assert packed.shape == (64, 32)
    back = np.asarray(unpack_int4(packed))
    np.testing.assert_array_equal(back, q)


def test_int4_matmul_matches_unpacked(rng):
    from quantized_tpu.ops.int4 import int4_weight_qparams, quantize_int4

    m, k, n = 32, 128, 64
    a = _rand_int8(rng, (m, k), -128)
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    scale = int4_weight_qparams(w)
    q = quantize_int4(w, scale)
    alpha = jnp.asarray(scale * 0.02)
    beta = jnp.zeros(n, jnp.float32)
    got = np.asarray(int4_matmul(jnp.asarray(a), pack_int4(jnp.asarray(q)), alpha, beta, interpret=True))
    want = np.asarray(int8_matmul(jnp.asarray(a), jnp.asarray(q), alpha, beta, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_int4_matmul_s4_matches_unpacked(rng):
    """Native-S4 path (bitcast inside the jit): integer-exact vs the plain
    s8 GEMM on the unpacked weights, both epilogue forms."""
    from quantized_tpu.ops.int4 import int4_matmul_s4

    m, k, n = 16, 256, 128
    a = _rand_int8(rng, (m, k), -128)
    q = rng.integers(-7, 8, (k, n)).astype(np.int8)
    alpha = jnp.full((n,), 3e-4, jnp.float32)
    beta = jnp.linspace(-0.1, 0.1, n).astype(jnp.float32)
    packed = pack_int4(jnp.asarray(q))
    got = np.asarray(int4_matmul_s4(jnp.asarray(a), packed, alpha, beta))
    want = np.asarray(int8_matmul(jnp.asarray(a), jnp.asarray(q), alpha, beta, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    # fused requant epilogue
    got_q = np.asarray(int4_matmul_s4(jnp.asarray(a), packed, alpha, beta,
                                      relu=True, out_scale=0.02, out_zp=30))
    y = np.maximum(want, 0.0)
    want_q = np.clip(np.round(y / 0.02 + (30 - 128)), 30 - 128, 127).astype(np.int8)
    np.testing.assert_array_equal(got_q, want_q)


def test_int4_conv_s4_matches_unpacked(rng):
    """Channel-split-half conv packing + two-half-conv execution: exact vs
    the s8 conv on the unpacked weights (incl. stored-zp padding + groups)."""
    from quantized_tpu.ops.int4 import (
        int4_conv_s4,
        pack_int4_conv_channels,
        unpack_int4_conv_channels,
    )
    from quantized_tpu.ops.int8_conv import int8_conv_xla

    for groups, cin, cout in ((1, 8, 16), (2, 8, 16)):
        q = rng.integers(-7, 8, (3, 3, cin // groups, cout)).astype(np.int8)
        packed = pack_int4_conv_channels(jnp.asarray(q))
        np.testing.assert_array_equal(np.asarray(unpack_int4_conv_channels(packed)), q)
        x = _rand_int8(rng, (2, 8, 8, cin), -128)
        alpha = jnp.full((cout,), 1e-3, jnp.float32)
        beta = jnp.linspace(-0.2, 0.2, cout).astype(jnp.float32)
        got = np.asarray(int4_conv_s4(jnp.asarray(x), packed, alpha, beta,
                                      stride=(1, 1), padding=(1, 1), stored_zp=-100,
                                      relu=True, groups=groups))
        want = np.asarray(int8_conv_xla(jnp.asarray(x), jnp.asarray(q), alpha, beta,
                                        stride=(1, 1), padding=(1, 1), stored_zp=-100,
                                        relu=True, groups=groups))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_s16_saturation_guard(rng, monkeypatch):
    """Debug-mode s16 clip telemetry (round-3 advisor): a residual leg whose
    fine-grained values exceed +-32767 must be *counted*, not silently
    saturated; in-range emissions must report nothing."""
    from quantized_tpu.ops import int8_conv as m

    monkeypatch.setenv("QTPU_DEBUG_S16", "1")
    x = _rand_int8(rng, (1, 4, 4, 8), -128)
    w = rng.integers(-7, 8, (1, 1, 8, 8)).astype(np.int8)
    alpha = jnp.full((8,), 1.0, jnp.float32)

    before = m.s16_saturated_total()
    # tame epilogue: values well inside +-32767 -> no events
    y = m.int8_conv_xla(jnp.asarray(x), jnp.asarray(w), alpha * 1e-3,
                        jnp.zeros((8,), jnp.float32), 1, 0, -128, round_s16=True)
    jax.block_until_ready(y)
    assert m.s16_saturated_total() == before
    # huge beta pushes every element past the clip -> events counted
    y = m.int8_conv_xla(jnp.asarray(x), jnp.asarray(w), alpha,
                        jnp.full((8,), 1e6, jnp.float32), 1, 0, -128, round_s16=True)
    jax.block_until_ready(y)
    assert m.s16_saturated_total() > before
