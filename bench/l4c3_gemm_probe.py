"""layer4-c3 int8 lowering race (round-4 floor decomposition follow-up).

The 1x1 512->2048 conv at 7x7/B=128 is the one stage-floor row with a
nameable mechanism gap: it autotunes onto bf16-split (compute floor
0.069 ms) while a hypothetical int8 form would be io-bound at 0.046 ms —
i.e. XLA's int8 *conv* emitter loses to its bf16 one for this shape. This
probe races the obvious dodge: flatten the spatial dims and run the same
math as an explicit s8xs8->s32 ``dot_general`` GEMM (M=B*49, K=512,
N=2048) with the engine's requant epilogue, split and fused, against the
tuned conv forms — all with the honest chained harness.

Usage: python bench/l4c3_gemm_probe.py [batch]
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from quantized_tpu.utils.timing import chain_time

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
H = 7
CIN, COUT = 512, 2048


def main():
    rng = np.random.default_rng(0)
    x_q = jnp.asarray(rng.integers(-128, 128, (B, H, H, CIN)), jnp.int8)
    w_q = jnp.asarray(rng.integers(-127, 128, (1, 1, CIN, COUT)), jnp.int8)
    w_mat = w_q.reshape(CIN, COUT)
    alpha = jnp.asarray(rng.uniform(1e-4, 2e-4, COUT), jnp.float32)
    beta = jnp.asarray(rng.uniform(-0.1, 0.1, COUT), jnp.float32)
    out_scale, out_zp = 0.05, 128
    w_bf16 = (w_q.astype(jnp.float32) * 1e-2).astype(jnp.bfloat16)

    def requant(y):  # shared minimal-op epilogue -> stored int8
        inv = jnp.float32(1.0 / out_scale)
        q = jnp.round(y * inv + jnp.float32(out_zp - 128))
        return jnp.clip(q, -128.0, 127.0).astype(jnp.int8)

    def conv_s8(x):
        acc = jax.lax.conv_general_dilated(
            x, w_q, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return requant(acc.astype(jnp.float32) * alpha + beta)

    def conv_bf16_split(x):
        xb = (x.astype(jnp.float32) * 0.02).astype(jnp.bfloat16)
        y = jax.lax.conv_general_dilated(
            xb, w_bf16, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return requant(y)

    def gemm_s8(x):
        xm = x.reshape(B * H * H, CIN)
        acc = jax.lax.dot_general(xm, w_mat, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        y = requant(acc.astype(jnp.float32) * alpha + beta)
        return y.reshape(B, H, H, COUT)

    def gemm_s8_batched(x):  # keep a leading dim: (B, 49, K) x (K, N)
        xm = x.reshape(B, H * H, CIN)
        acc = jax.lax.dot_general(xm, w_mat, (((2,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        y = requant(acc.astype(jnp.float32) * alpha + beta)
        return y.reshape(B, H, H, COUT)

    # chain fixup: out (B,7,7,2048) -> max-fold channels by 4 -> (B,7,7,512)
    def chained(fn):
        def run(x):
            y = fn(x)
            return jnp.max(
                y.reshape(B, H, H, CIN, COUT // CIN), axis=-1)
        return run

    fix_io = (B * H * H * COUT + B * H * H * CIN) / 657e9
    print(f"B={B} {H}x{H} {CIN}->{COUT}; chain fixup io floor {fix_io*1e3:.3f} ms")
    for name, fn in [("conv-s8-fused", conv_s8),
                     ("conv-bf16-split(prod)", conv_bf16_split),
                     ("gemm-s8-flat", gemm_s8),
                     ("gemm-s8-batched", gemm_s8_batched)]:
        t = chain_time(chained(fn), x_q)
        print(f"  {name:>22}: {t*1e3:7.3f} ms (incl. fixup; conv floor io "
              f"0.046 / bf16 comp 0.069)", flush=True)


if __name__ == "__main__":
    main()
