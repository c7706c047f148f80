"""Autotune Pallas int8_matmul_requant block sizes on the live chip.

The resident engine's 1x1 convs are exactly these GEMMs (M = B*H*W); the
Pallas kernel requants in-register, so a tuned kernel does the whole layer in
one int8-in/int8-out pass — the traffic XLA refuses to fuse. Prints the best
(bm, bn, bk) per shape and a suggested default.

Usage: python bench/tune_pallas_matmul.py [batch]
"""

from __future__ import annotations

import functools
import sys

sys.path.insert(0, __file__.rsplit('/', 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from quantized_tpu.ops.int8_matmul import int8_matmul_requant
from quantized_tpu.utils.timing import per_iter_time

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64

# (name, M, K, N) — every distinct 1x1 GEMM in ResNet-50 at batch B + ceiling
SHAPES = [
    ("l1_1x1a", 56 * 56 * B, 64, 64),
    ("l1_1x1b", 56 * 56 * B, 64, 256),
    ("l1_1x1c", 56 * 56 * B, 256, 64),
    ("l2_1x1a", 56 * 56 * B, 256, 128),
    ("l2_1x1b", 28 * 28 * B, 128, 512),
    ("l2_1x1c", 28 * 28 * B, 512, 128),
    ("l3_1x1b", 14 * 14 * B, 256, 1024),
    ("l3_1x1c", 14 * 14 * B, 1024, 256),
    ("l4_1x1b", 7 * 7 * B, 512, 2048),
    ("l4_1x1c", 7 * 7 * B, 2048, 512),
    ("ceiling", 4096, 4096, 4096),
]

CANDIDATES = [
    (256, 256, 512),   # current default
    (512, 256, 256),
    (1024, 256, 256),
    (2048, 256, 256),
    (1024, 512, 256),
    (512, 512, 512),
    (1024, 128, 512),
    (2048, 128, 256),
    (512, 256, 1024),
    (256, 512, 2048),
]


def step(bm, bn, bk, c, a, b, alpha, beta):
    aa = (a + c.astype(jnp.int8)).astype(jnp.int8)
    y = int8_matmul_requant(aa, b, alpha, beta, 0.05, 128, relu=True,
                            block_m=bm, block_n=bn, block_k=bk, interpret=False)
    return jnp.float32(jnp.max(y)) * 1e-9


def vmem_bytes(bm, bn, bk):
    # double-buffered in blocks + acc + out
    return 2 * (bm * bk + bk * bn) + 4 * bm * bn + bm * bn


def main():
    print(f"device={jax.devices()[0].device_kind} batch={B}", flush=True)
    rng = np.random.default_rng(0)
    wins = {}
    for name, m, k, n in SHAPES:
        gops = 2.0 * m * k * n / 1e9
        bytes_opt = (m * k + k * n + m * n) / 1e6
        a = jnp.asarray(rng.integers(-128, 128, (m, k)), jnp.int8)
        b = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
        alpha = jnp.full((n,), 1e-4, jnp.float32)
        beta = jnp.zeros((n,), jnp.float32)
        best = None
        for bm, bn, bk in CANDIDATES:
            if vmem_bytes(min(bm, m), min(bn, n), min(bk, k)) > 14e6:
                continue
            try:
                dt = per_iter_time(functools.partial(step, bm, bn, bk),
                                   a, b, alpha, beta, target_secs=0.5, reps=2)
            except Exception as e:
                print(f"  {name} ({bm},{bn},{bk}): FAIL {type(e).__name__}", flush=True)
                continue
            line = (f"  {name} ({bm:4d},{bn:4d},{bk:4d}): {dt*1e3:7.3f} ms "
                    f"{gops/dt/1e3:6.1f} TOPS  {bytes_opt/1e3/dt:6.0f} GB/s-equiv")
            print(line, flush=True)
            if best is None or dt < best[0]:
                best = (dt, (bm, bn, bk))
        if best:
            wins[name] = best
            print(f"  -> best {name}: {best[1]} at {best[0]*1e3:.3f} ms", flush=True)
    print("\nsummary:", {k: v[1] for k, v in wins.items()})


if __name__ == "__main__":
    main()
