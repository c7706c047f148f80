"""Interpret-mode differential tests for the direct Pallas conv kernels
(quantized_tpu/ops/int8_conv_pallas.py) against the XLA-native reference path
(int8_conv_xla) — SURVEY.md section 4 'Pallas kernels get interpret-mode
differential tests'."""

import numpy as np
import jax.numpy as jnp
import pytest

from quantized_tpu.ops.int8_conv import int8_conv_xla
from quantized_tpu.ops.int8_conv_pallas import int8_conv_direct, int8_conv_flat


def _rand_case(rng, n, h, cin, cout, k):
    x = jnp.asarray(rng.integers(-128, 128, (n, h, h, cin)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 128, (k, k, cin, cout)), jnp.int8)
    alpha = jnp.asarray(rng.uniform(1e-4, 3e-4, (cout,)), jnp.float32)
    beta = jnp.asarray(rng.uniform(-0.1, 0.1, (cout,)), jnp.float32)
    return x, w, alpha, beta


CASES = [
    # n, h, cin, cout, k, stride, out_requant
    (4, 14, 256, 256, 3, 1, None),
    (4, 14, 256, 256, 3, 1, (0.07, 113)),
    (2, 28, 128, 128, 3, 2, (0.05, 120)),
    (4, 8, 64, 96, 1, 1, (0.05, 128)),
    (2, 15, 32, 64, 3, 2, None),
    (2, 9, 512, 512, 3, 1, (0.04, 99)),
]


@pytest.mark.parametrize("n,h,cin,cout,k,s,req", CASES)
def test_direct_matches_xla(rng, n, h, cin, cout, k, s, req):
    x, w, alpha, beta = _rand_case(rng, n, h, cin, cout, k)
    pad = k // 2
    ref = int8_conv_xla(x, w, alpha, beta, s, pad, -5, relu=True, out_requant=req)
    got = int8_conv_direct(
        x, w, alpha, beta, stride=s, padding=pad, stored_zp=-5,
        relu=True, out_requant=req, interpret=True,
    )
    if req is not None:
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    else:
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-3)


@pytest.mark.parametrize(
    "n,h,cin,cout,k,req,gather_k",
    [
        (4, 14, 64, 64, 3, (0.07, 113), None),     # auto gather-K (small Cin)
        (2, 28, 128, 128, 3, (0.05, 120), None),   # per-tap dots
        (4, 8, 64, 96, 1, (0.05, 128), None),      # 1x1 = plain matmul
        (2, 9, 512, 512, 3, None, False),          # f32 out, multi-Cout-tile
        (2, 7, 64, 512, 3, (0.06, 77), None),      # Cout tiles > 1, int8 out
        (2, 12, 32, 64, 5, (0.04, 99), True),      # 5x5, forced gather-K
    ],
)
def test_flat_matches_xla(rng, n, h, cin, cout, k, req, gather_k):
    x, w, alpha, beta = _rand_case(rng, n, h, cin, cout, k)
    pad = k // 2
    ref = int8_conv_xla(x, w, alpha, beta, 1, pad, -5, relu=True, out_requant=req)
    got = int8_conv_flat(
        x, w, alpha, beta, stride=1, padding=pad, stored_zp=-5,
        relu=True, out_requant=req, gather_k=gather_k, interpret=True,
    )
    if req is not None:
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    else:
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-3)


def test_direct_fused_residual_within_one_step(rng):
    """The fused residual path may differ from the unfused reference by at
    most 1 int8 step (f32 accumulation-order at round boundaries)."""
    n, h, c = 2, 14, 128
    x, w, alpha, beta = _rand_case(rng, n, h, c, c, 3)
    r = jnp.asarray(rng.integers(-128, 128, (n, h, h, c)), jnp.int8)
    res_grid, req = (0.03, 117), (0.06, 105)

    acc = int8_conv_xla(x, w, alpha, beta, 1, 1, -5, relu=False, out_requant=None)
    r_deq = (r.astype(jnp.float32) + jnp.float32(128 - res_grid[1])) * jnp.float32(res_grid[0])
    y = jnp.maximum(acc + r_deq, 0.0)
    q_ref = (
        jnp.clip(jnp.round(y * (1.0 / req[0])) + req[1], 0, 255) - 128
    ).astype(jnp.int8)

    got = int8_conv_direct(
        x, w, alpha, beta, residual=r, stride=1, padding=1, stored_zp=-5,
        relu=True, out_requant=req, res_grid=res_grid, interpret=True,
    )
    d = np.abs(np.asarray(q_ref, np.int32) - np.asarray(got, np.int32))
    assert d.max() <= 1
    assert (d > 0).mean() < 1e-3
