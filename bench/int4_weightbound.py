"""Int4 weight paths vs int8 in the weight-bound regime (B<=8 serving).

VERDICT r1 missing #2: packed int4 must beat int8 where weights dominate HBM
traffic. Contenders:
  int8        Pallas s8 GEMM (weights 1 B/elem)
  int4-pl     Pallas in-kernel nibble unpack (VPU i32 unpack per block)
  int4-s4     XLA native S4 dot: packed bytes bitcast to int4 INSIDE the jit
              (S4 arrays can't cross the axon-tunnel jit boundary), two dots
              against the nibble planes — HBM reads the packed bytes only
  int4-unp    round-1 form (unpack outside, s8 GEMM) — no HBM win, baseline

The scan body perturbs A with the carry so XLA cannot hoist the computation
out of the timing loop (utils/timing.py contract).
Usage: python bench/int4_weightbound.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from quantized_tpu.ops.int4 import (
    int4_matmul,
    int4_matmul_s4,
    int4_matmul_unpacked_xla,
    pack_int4,
)
from quantized_tpu.ops.int8_matmul import int8_matmul
from quantized_tpu.utils.timing import per_iter_time

# (label, M, K, N)
SHAPES = [
    ("alexnet-fc1 B8", 8, 9216, 4096),
    ("alexnet-fc2 B8", 8, 4096, 4096),
    ("r50-fc B8", 8, 2048, 1000),
    ("r50-l4 1x1 B8", 8 * 49, 2048, 512),
    ("r50-l4 1x1exp B8", 8 * 49, 512, 2048),
    ("r50-l3 1x1 B8", 8 * 196, 1024, 256),
    ("alexnet-fc1 B1", 1, 9216, 4096),
    ("alexnet-fc1 B128", 128, 9216, 4096),
]


def bench_one(m, k, n):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(-100, 100, (m, k)), jnp.int8)
    q = jnp.asarray(rng.integers(-7, 8, (k, n)), jnp.int8)
    packed = pack_int4(q)
    alpha = jnp.full((n,), 1e-4, jnp.float32)
    beta = jnp.zeros((n,), jnp.float32)

    def perturb(c, a):
        return (a + c.astype(jnp.int8)).astype(jnp.int8)

    def step8(c, a, w):
        y = int8_matmul(perturb(c, a), w, alpha, beta)
        return jnp.float32(jnp.max(y)) * 1e-6

    def step4(c, a, p):
        y = int4_matmul(perturb(c, a), p, alpha, beta)
        return jnp.float32(jnp.max(y)) * 1e-6

    def step4s(c, a, p):
        y = int4_matmul_s4(perturb(c, a), p, alpha, beta)
        return jnp.float32(jnp.max(y)) * 1e-6

    def step4u(c, a, p):
        y = int4_matmul_unpacked_xla(perturb(c, a), p, alpha, beta)
        return jnp.float32(jnp.max(y)) * 1e-6

    out = {}
    out["int8"] = per_iter_time(step8, a, q, target_secs=0.5)
    out["int4-pl"] = per_iter_time(step4, a, packed, target_secs=0.5)
    out["int4-s4"] = per_iter_time(step4s, a, packed, target_secs=0.5)
    out["int4-unp"] = per_iter_time(step4u, a, packed, target_secs=0.5)
    return out


# conv rows (VERDICT r2 missing #8 / weak #3): does weight-HBM halving show
# up at the CONV level with the s4/s4-split backends, as ops/int4.py asserts?
# (label, B, H, Cin, Cout, kh, stride)
CONV_SHAPES = [
    ("r50-l4 3x3 B8", 8, 7, 512, 512, 3, 1),
    ("r50-l4 1x1exp B8", 8, 7, 512, 2048, 1, 1),
    ("r50-l3 3x3 B8", 8, 14, 256, 256, 3, 1),
    ("r50-l4 3x3 B1", 1, 7, 512, 512, 3, 1),
]


def bench_conv(b, h, cin, cout, kh, stride):
    from quantized_tpu.ops.int4 import int4_conv_s4, pack_int4_conv_channels
    from quantized_tpu.ops.int8_conv import int8_conv_xla

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-128, 128, (b, h, h, cin)), jnp.int8)
    q = jnp.asarray(rng.integers(-7, 8, (kh, kh, cin, cout)), jnp.int8)
    packed = pack_int4_conv_channels(q)
    alpha = jnp.full((cout,), 1e-4, jnp.float32)
    beta = jnp.zeros((cout,), jnp.float32)
    pad = (kh // 2, kh // 2)

    def perturb(c, a):
        return (a + c.astype(jnp.int8)).astype(jnp.int8)

    def step8(c, x, w):
        y = int8_conv_xla(perturb(c, x), w, alpha, beta, (stride, stride), pad, -128)
        return jnp.float32(jnp.max(y)) * 1e-6

    def step4(c, x, p):
        y = int4_conv_s4(perturb(c, x), p, alpha, beta, (stride, stride), pad, -128)
        return jnp.float32(jnp.max(y)) * 1e-6

    return {
        "int8": per_iter_time(step8, x, q, target_secs=0.5),
        "int4-s4": per_iter_time(step4, x, packed, target_secs=0.5),
    }


def bench_resident(b):
    """Whole-net ResNet-50-resident at serving batch: int8 vs int4-W."""
    from flax import nnx

    from __graft_entry__ import _calibrated_model
    from quantized_tpu.engine import apply_cached_backends, build_int8_resident
    from quantized_tpu.utils.hostbuild import host_build, put_model

    out = {}
    for bits in (8, 4):
        with host_build():
            q = _calibrated_model("resnet_quantized_float_bn", dataset="imagenet", depth=50)
            eng = build_int8_resident(q, weight_bits=bits)
            apply_cached_backends(eng, jnp.zeros((b, 224, 224, 3), jnp.float32))
        put_model(eng)
        gd, st = nnx.split(eng)
        x = jnp.zeros((b, 224, 224, 3), jnp.float32)

        def step(c, st, x):
            y = nnx.merge(gd, st)(x + c)
            return jnp.float32(jnp.max(y)) * 1e-6

        out[f"int{bits}"] = per_iter_time(step, st, x, target_secs=0.5)
    return out


def main():
    hbm = 646e9  # measured s8 stream rate (RESULTS.md)
    cols = ["int8", "int4-pl", "int4-s4", "int4-unp"]
    print(f"{'shape':>18} " + " ".join(f"{c:>9}" for c in cols)
          + f" {'best4/8':>8} {'w8 floor':>9}")
    for label, m, k, n in SHAPES:
        r = bench_one(m, k, n)
        floor8 = k * n / hbm * 1e6
        best4 = min(r["int4-pl"], r["int4-s4"])
        print(f"{label:>18} " + " ".join(f"{r[c]*1e6:9.1f}" for c in cols)
              + f" {r['int8']/best4:8.2f} {floor8:9.1f}", flush=True)

    print(f"\nconv (us): {'shape':>18} {'int8':>9} {'int4-s4':>9} {'4/8':>6} {'w8 floor':>9}")
    for label, b, h, cin, cout, kh, stride in CONV_SHAPES:
        r = bench_conv(b, h, cin, cout, kh, stride)
        floor8 = kh * kh * cin * cout / hbm * 1e6
        print(f"{'':>11}{label:>18} {r['int8']*1e6:9.1f} {r['int4-s4']*1e6:9.1f}"
              f" {r['int8']/r['int4-s4']:6.2f} {floor8:9.1f}", flush=True)

    for b in (1, 8):
        r = bench_resident(b)
        print(f"resnet50-resident B={b}: int8 {r['int8']*1e3:.3f} ms  "
              f"int4-W {r['int4']*1e3:.3f} ms  ({r['int8']/r['int4']:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
