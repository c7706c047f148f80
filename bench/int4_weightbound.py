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


if __name__ == "__main__":
    main()
