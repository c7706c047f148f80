"""Micro-benchmarks that decide the int8 engine's kernel strategy.

1. Pure-GEMM ceiling: XLA s8xs8->s32 dot vs Pallas int8_matmul vs bf16 at
   4096^3 — is the 394-TOPS s8 MXU path reachable, and through which lane?
2. Conv I/O dtype: the same lax int8 conv with (f32 in, f32 out) vs
   (int8 in, int8 out via fused requant) vs (int8 in, f32 out) — how much of
   the engine's deficit is activation HBM traffic vs compute?
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit('/', 2)[0])

import functools

import jax
import jax.numpy as jnp
import numpy as np

from quantized_tpu.engine.int_layers import quantize_input_stored
from quantized_tpu.ops.int8_conv import int8_conv_xla
from quantized_tpu.ops.int8_matmul import int8_matmul
from quantized_tpu.utils.timing import per_iter_time

B = 64


def gemm_ceiling():
    N = 4096
    flops = 2 * N**3
    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-127, 128, (N, N)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 128, (N, N)), jnp.int8)
    alpha = jnp.full((N,), 1e-4, jnp.float32)
    beta = jnp.zeros((N,), jnp.float32)

    def xla_s8(c, a, b):
        aa = (a + c.astype(jnp.int8)).astype(jnp.int8)
        y = jax.lax.dot_general(aa, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        return jnp.float32(jnp.max(y)) * 1e-12

    def pallas_s8(c, a, b):
        aa = (a + c.astype(jnp.int8)).astype(jnp.int8)
        y = int8_matmul(aa, b, alpha, beta, interpret=False)
        return jnp.float32(jnp.max(y)) * 1e-12

    for name, fn in (("xla-s8-dot", xla_s8), ("pallas-int8_matmul", pallas_s8)):
        try:
            dt = per_iter_time(fn, a8, b8)
            print(f"{name:>20}: {dt*1e3:7.3f} ms  {flops/dt/1e12:6.1f} TOPS  ({100*flops/dt/1e12/394:.0f}% of s8 peak)", flush=True)
        except Exception as e:
            print(f"{name:>20}: FAIL {type(e).__name__}: {e}", flush=True)


def conv_io_dtype():
    # two representative bandwidth-bound shapes + one compute-bound
    shapes = [
        ("l1_1x1c", 56, 256, 64, 1, 1),
        ("l2_ds", 56, 256, 512, 1, 2),
        ("l3_3x3", 14, 256, 256, 3, 1),
    ]
    rng = np.random.default_rng(0)
    for name, h, cin, cout, k, s in shapes:
        pad = k // 2
        gops = 2.0 * B * (h // s) ** 2 * k * k * cin * cout / 1e9
        x_f = jnp.asarray(rng.standard_normal((B, h, h, cin)), jnp.float32)
        x_q = jnp.asarray(rng.integers(-128, 128, (B, h, h, cin)), jnp.int8)
        w_q = jnp.asarray(rng.integers(-127, 128, (k, k, cin, cout)), jnp.int8)
        alpha = jnp.full((cout,), 1e-4, jnp.float32)
        beta = jnp.zeros((cout,), jnp.float32)

        def f32_in_f32_out(c, x, w):
            xq = quantize_input_stored(x + c, 0.05, 128)
            y = int8_conv_xla(xq, w, alpha, beta, s, pad, 0, relu=True)
            return jnp.float32(jnp.max(y)) * 1e-9

        def i8_in_i8_out(c, x, w):
            xq = (x + c.astype(jnp.int8)).astype(jnp.int8)
            y = int8_conv_xla(xq, w, alpha, beta, s, pad, 0, relu=True, out_requant=(0.05, 128))
            return jnp.float32(jnp.max(y)) * 1e-9

        def i8_in_f32_out(c, x, w):
            xq = (x + c.astype(jnp.int8)).astype(jnp.int8)
            y = int8_conv_xla(xq, w, alpha, beta, s, pad, 0, relu=True)
            return jnp.float32(jnp.max(y)) * 1e-9

        row = [f"{name:>8} ({gops:5.2f} GOPs)"]
        for label, fn, xx in (
            ("f32->f32", f32_in_f32_out, x_f),
            ("i8->i8", i8_in_i8_out, x_q),
            ("i8->f32", i8_in_f32_out, x_q),
        ):
            dt = per_iter_time(fn, xx, w_q)
            row.append(f"{label}: {dt*1e3:6.3f} ms {gops/dt/1e3:6.1f} TOPS")
        print(" | ".join(row), flush=True)


if __name__ == "__main__":
    print(f"device={jax.devices()[0].device_kind}", flush=True)
    gemm_ceiling()
    conv_io_dtype()
