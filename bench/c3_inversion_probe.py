"""layer4-c3 context-inversion mechanism hunt (VERDICT r4 weak #1c /
next-step #4c).

The standing puzzle: for the 1x1 512->2048 @7x7/B=128 conv, a minimal-
epilogue s8 conv beats bf16-split under `chain_time` (0.159 vs 0.179 ms,
bench/l4c3_gemm_probe.py), yet the production autotune race (`_time_backend`,
a `per_iter_time` scan with carry-feedback and the REAL IntConv2d epilogue)
picked bf16-split, and a whole-net flip to s8 measured slower (round-3
backend_context_race). Two variables differ between those experiments:

  harness:  chain_time (output feeds next input via channel-fold fixup)
            vs per_iter_time (scan; carry is a scalar added to the input)
  epilogue: minimal requant (scale+round+clip) vs the production run_q
            epilogue (alpha/beta per-channel, stored-zp offset, relu,
            split-requant variants)

This probe completes the 2x2(x3 backends): the PRODUCTION layer (pulled
from the tuned flagship engine, real weights/epilogue) and the MINIMAL
twin, each timed under BOTH harnesses, for backends xla / xla-split /
bf16-split. Whichever cell flips sign names the mechanism.

Usage: python bench/c3_inversion_probe.py [batch]
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from __graft_entry__ import _calibrated_model
from quantized_tpu.engine import apply_cached_backends, build_int8_resident
from quantized_tpu.utils.timing import chain_time, per_iter_time

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
H, CIN, COUT = 7, 512, 2048


def main():
    from quantized_tpu.utils.hostbuild import host_build, put_model

    with host_build():
        res = build_int8_resident(
            _calibrated_model("resnet_quantized_float_bn", dataset="imagenet", depth=50))
        apply_cached_backends(res, jnp.zeros((B, 224, 224, 3), jnp.float32))
    put_model(res)
    conv = getattr(res.layer4, "1").conv3  # production c3, tuned weights
    rng = np.random.default_rng(0)
    x_q = jnp.asarray(rng.integers(-128, 128, (B, H, H, CIN)), jnp.int8)
    requant = (0.05, 128)

    def fold(y):  # (B,7,7,2048) -> (B,7,7,512) int8 carry, reads all of y
        return jnp.max(y.reshape(B, H, H, CIN, COUT // CIN), axis=-1)

    print(f"production c3 (real epilogue) B={B}, tuned backend = {conv.backend}")
    gd, st = nnx.split(conv)
    for backend in ("xla", "xla-split", "bf16-split"):
        conv.set_backend(backend)
        gd, st = nnx.split(conv)

        # harness A: chain_time (chained, channel-fold fixup)
        def run_chain(x, s):
            m = nnx.merge(gd, s)
            return fold(m.run_q(x, relu=True, out_requant=requant))

        t_chain = chain_time(run_chain, x_q, st)

        # harness B: per_iter_time (scan, scalar carry added to input)
        def step(carry, s, x):
            m = nnx.merge(gd, s)
            y = m.run_q((x + carry.astype(jnp.int8)).astype(jnp.int8),
                        relu=True, out_requant=requant)
            return jnp.max(y).astype(jnp.float32) * 1e-9

        t_scan = per_iter_time(step, st, x_q, target_secs=0.4)
        print(f"  {backend:>10}: chain {t_chain*1e3:7.3f} ms   scan {t_scan*1e3:7.3f} ms",
              flush=True)

    # minimal twin (l4c3_gemm_probe's epilogue) under both harnesses
    w_q = jnp.asarray(rng.integers(-127, 128, (1, 1, CIN, COUT)), jnp.int8)
    alpha = jnp.asarray(rng.uniform(1e-4, 2e-4, COUT), jnp.float32)
    beta = jnp.asarray(rng.uniform(-0.1, 0.1, COUT), jnp.float32)
    w_bf16 = (w_q.astype(jnp.float32) * 1e-2).astype(jnp.bfloat16)

    def mini_requant(y):
        q = jnp.round(y * jnp.float32(20.0) + jnp.float32(0.0))
        return jnp.clip(q, -128.0, 127.0).astype(jnp.int8)

    def mini(backend, x):
        if backend == "bf16-split":
            xb = (x.astype(jnp.float32) * 0.02).astype(jnp.bfloat16)
            y = jax.lax.conv_general_dilated(
                xb, w_bf16, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            return mini_requant(y)
        acc = jax.lax.conv_general_dilated(
            x, w_q, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return mini_requant(acc.astype(jnp.float32) * alpha + beta)

    print(f"minimal twin (l4c3_gemm_probe epilogue):")
    for backend in ("xla", "bf16-split"):
        t_chain = chain_time(lambda x, _b=backend: fold(mini(_b, x)), x_q)

        def step(carry, x, _b=backend):
            y = mini(_b, (x + carry.astype(jnp.int8)).astype(jnp.int8))
            return jnp.max(y).astype(jnp.float32) * 1e-9

        t_scan = per_iter_time(step, x_q, target_secs=0.4)
        print(f"  {backend:>10}: chain {t_chain*1e3:7.3f} ms   scan {t_scan*1e3:7.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
