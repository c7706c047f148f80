"""Layer1 interior-unit (c2 3x3 + c3 1x1 + residual) form race.

After the s16 ds fix, the biggest remaining bucket is layer1's three
c2+c3+residual units (~0.64 ms each at ~340 GB/s vs a ~0.43 ms
max(io,compute) floor — bench/xprof_mxu.json). Forms raced here (chained,
(B,56,56,256) s8 in/out, h1 = x[..., :64] stand-in):

  current     c2 s8-out fused conv; c3 + prescaled residual + requant fused
  csplit      c3 split into two 64->128 convs, each with its own half tail
              (different fusion shapes; io identical)
  kpad        h2 zero-padded to C=128 before c3 (full-K MXU passes;
              +26 MB io)
  c2bf16      c2 runs in bf16 (s8 c3 unchanged)

Usage: python bench/c3_unit_probe.py [batch]
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from quantized_tpu.ops.int8_conv import int8_conv_xla
from quantized_tpu.utils.timing import chain_time

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
H = 56
C, CM = 256, 64
SHIFT = 3.0
REQ = (0.07, 131)  # h2 grid stand-in


def tail(acc_ps, id_ps):
    q = jnp.round(acc_ps + id_ps)
    return jnp.clip(q, jnp.float32(SHIFT), 127.0).astype(jnp.int8)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-128, 128, (B, H, H, C)), jnp.int8)
    w2 = jnp.asarray(rng.integers(-127, 128, (3, 3, CM, CM)), jnp.int8)
    w3 = jnp.asarray(rng.integers(-127, 128, (1, 1, CM, C)), jnp.int8)
    a2 = jnp.asarray(rng.uniform(1e-4, 2e-4, (CM,)), jnp.float32)
    b2 = jnp.asarray(rng.uniform(-0.5, 0.5, (CM,)), jnp.float32)
    a3 = jnp.asarray(rng.uniform(1e-4, 2e-4, (C,)), jnp.float32)
    b3 = jnp.asarray(rng.uniform(-0.5, 0.5, (C,)), jnp.float32)
    k_id, b_id = jnp.float32(0.7), jnp.float32(1.3)

    def c2(h1):
        return int8_conv_xla(h1, w2, a2, b2, (1, 1), (1, 1), -128, relu=True,
                             out_requant=REQ)

    def current(x):
        h2 = c2(x[..., :CM])
        acc = int8_conv_xla(h2, w3, a3, b3 + SHIFT)
        idq = x.astype(jnp.float32) * k_id + b_id
        return tail(acc, idq)

    def csplit(x):
        h2 = c2(x[..., :CM])
        outs = []
        for half in range(2):
            acc = int8_conv_xla(h2, w3[..., half * 128:(half + 1) * 128],
                                a3[half * 128:(half + 1) * 128],
                                b3[half * 128:(half + 1) * 128] + SHIFT)
            idq = x[..., half * 128:(half + 1) * 128].astype(jnp.float32) * k_id + b_id
            outs.append(tail(acc, idq))
        return jnp.concatenate(outs, axis=-1)

    w3p = jnp.zeros((1, 1, 2 * CM, C), jnp.int8).at[:, :, :CM].set(w3)

    def kpad(x):
        h2 = c2(x[..., :CM])
        h2p = jnp.pad(h2, ((0, 0), (0, 0), (0, 0), (0, CM)), constant_values=-128)
        # padded channels hit zero weights: contribute 0 to the accumulator
        acc = int8_conv_xla(h2p, w3p, a3, b3 + SHIFT)
        idq = x.astype(jnp.float32) * k_id + b_id
        return tail(acc, idq)

    w2bf = jnp.asarray(np.asarray(w2, np.float32) * 1e-2, jnp.bfloat16)

    def c2bf16(x):
        h1 = x[..., :CM]
        xb = (h1.astype(jnp.float32) * jnp.float32(0.05)).astype(jnp.bfloat16)
        y = jax.lax.conv_general_dilated(
            xb, w2bf, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        yq = jnp.clip(jnp.round(y * (a2 / jnp.float32(5e-4)) + b2), -128, 127).astype(jnp.int8)
        acc = int8_conv_xla(yq, w3, a3, b3 + SHIFT)
        idq = x.astype(jnp.float32) * k_id + b_id
        return tail(acc, idq)

    forms = {"current": current, "csplit": csplit, "kpad": kpad, "c2bf16": c2bf16}
    ref = np.asarray(jax.jit(current)(x))
    for name in ("csplit", "kpad"):
        got = np.asarray(jax.jit(forms[name])(x))
        assert (got == ref).all(), f"{name} != current"
    base = None
    for name, fn in forms.items():
        dt = chain_time(fn, x)
        base = base or dt
        print(f"{name:>8}: {dt*1e3:7.3f} ms ({base/dt:4.2f}x)", flush=True)


if __name__ == "__main__":
    main()
