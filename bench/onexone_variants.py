"""Alternative formulations of the 1x1 "reduce" convs (the worst shapes in
bench/sweep_conv.py: 20-43 TOPS vs 120-300 for 3x3 convs).

A 1x1/s1 conv is exactly a GEMM (N*H*W, Cin) @ (Cin, Cout). XLA's conv
emitter and its dot emitter take different code paths on TPU; this measures
whether spelling the op as dot_general (plus the same fused int8-resident
requant epilogue) beats lax.conv_general_dilated per shape.

Usage: python bench/onexone_variants.py [B] [variants]
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from quantized_tpu.ops.int8_conv import int8_conv_xla
from quantized_tpu.ops.int8_matmul import int8_matmul_requant
from quantized_tpu.utils.timing import per_iter_time

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
VARIANTS = sys.argv[2].split(",") if len(sys.argv) > 2 else ["conv", "dot", "pallas"]

# (name, H, Cin, Cout) — stride-1 1x1 shapes, worst first
SHAPES = [
    ("l1_1x1c", 56, 256, 64),
    ("l2_1x1a", 56, 256, 128),
    ("l2_1x1c", 28, 512, 128),
    ("l3_1x1c", 14, 1024, 256),
    ("l1_1x1b", 56, 64, 256),
    ("l4_1x1a", 14, 1024, 512),
]

OUT_RQ = (0.05, 128)


def _requant_s32(acc, alpha, beta):
    out_scale, out_zp = OUT_RQ
    inv = jnp.float32(1.0 / out_scale)
    q = jnp.round(acc.astype(jnp.float32) * (alpha * inv)
                  + (beta * inv + jnp.float32(out_zp - 128)))
    return jnp.clip(q, jnp.float32(OUT_RQ[1] - 128), 127.0).astype(jnp.int8)


def conv_step(c, x_q, w_q, alpha, beta):
    xq = (x_q + c.astype(jnp.int8)).astype(jnp.int8)
    y = int8_conv_xla(xq, w_q, alpha, beta, 1, 0, 0, relu=True, out_requant=OUT_RQ)
    return jnp.float32(jnp.max(y)) * 1e-9


def dot_step(c, x_q, w_q, alpha, beta):
    xq = (x_q + c.astype(jnp.int8)).astype(jnp.int8)
    n, h, w, cin = xq.shape
    a = xq.reshape(n * h * w, cin)
    bmat = w_q.reshape(cin, -1)
    acc = jax.lax.dot_general(
        a, bmat, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    y = _requant_s32(acc, alpha, beta).reshape(n, h, w, -1)
    return jnp.float32(jnp.max(y)) * 1e-9


def pallas_step(c, x_q, w_q, alpha, beta):
    xq = (x_q + c.astype(jnp.int8)).astype(jnp.int8)
    n, h, w, cin = xq.shape
    a = xq.reshape(n * h * w, cin)
    bmat = w_q.reshape(cin, -1)
    y = int8_matmul_requant(a, bmat, alpha, beta, OUT_RQ[0], OUT_RQ[1],
                            relu=True, interpret=False)
    return jnp.float32(jnp.max(y)) * 1e-9


STEPS = {"conv": conv_step, "dot": dot_step, "pallas": pallas_step}


def main():
    dev = jax.devices()[0]
    print(f"device={dev.device_kind} batch={B} variants={VARIANTS}")
    rng = np.random.default_rng(0)
    print(f"{'shape':>9s} {'HxCinxCout':>14s} {'GOPs':>7s} |"
          + "".join(f" {v+': ms':>10s} {'TOPS':>6s}" for v in VARIANTS))
    for name, h, cin, cout, in SHAPES:
        x_q = jnp.asarray(rng.integers(-128, 128, (B, h, h, cin)), jnp.int8)
        w_q = jnp.asarray(rng.integers(-127, 128, (1, 1, cin, cout)), jnp.int8)
        alpha = jnp.asarray(rng.uniform(1e-4, 2e-4, (cout,)), jnp.float32)
        beta = jnp.asarray(rng.uniform(-0.1, 0.1, (cout,)), jnp.float32)
        gop = 2.0 * B * h * h * cin * cout / 1e9
        row = f"{name:>9s} {h:>4d}x{cin:>4d}x{cout:>4d} {gop:7.2f} |"
        for v in VARIANTS:
            t = per_iter_time(STEPS[v], x_q, w_q, alpha, beta, target_secs=0.6)
            row += f" {t*1e3:9.3f} {gop/t/1e3:6.1f}"
        print(row)


if __name__ == "__main__":
    main()
