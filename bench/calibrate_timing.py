"""Timing-harness calibration on the live TPU.

A bf16 matmul of known FLOP cost, measured with the in-jit scan trick at two
loop counts. If the harness is sound: time scales linearly with loops and
implied TOPS <= ~197 (v5e bf16 peak). Also cross-checks that a data-dependent
scan cannot be collapsed: each iteration's input depends on the previous
output tile.
"""

import sys

sys.path.insert(0, __file__.rsplit('/', 2)[0])
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 4096
FLOPS = 2 * N * N * N  # 137 GFLOP


def run(loops):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((N, N)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((N, N)), jnp.bfloat16)

    @jax.jit
    def f(a, b):
        def body(c, _):
            y = (a + c.astype(jnp.bfloat16)) @ b
            return jnp.float32(y[0, 0]) * 1e-12, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=loops)
        return c

    jax.block_until_ready(f(a, b))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(f(a, b))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    dt = ts[len(ts) // 2]
    print(
        f"loops={loops:4d} total={dt*1e3:9.3f} ms per-iter={dt/loops*1e6:9.1f} us "
        f"-> {FLOPS * loops / dt / 1e12:7.1f} TOPS (bf16 peak ~197)"
    )
    return dt


if __name__ == "__main__":
    print(f"device={jax.devices()[0].device_kind}  matmul {N}^3 bf16 = {FLOPS/1e9:.0f} GFLOP/iter")
    d1 = run(10)
    d2 = run(40)
    print(f"linearity: t(40)/t(10) = {d2/d1:.2f} (expect ~4.0 if harness is sound)")
