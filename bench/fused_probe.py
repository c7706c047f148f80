"""Isolate where the fused-bottleneck kernel's time goes (layer1 geometry).

Times, on the same (B,56,56,256)-int8 in/out, grid-over-batch shape as
fused_bottleneck_s1:
  copy       in->out DMA only (pure pipeline/DMA cost of the grid)
  conv1      conv1 GEMM + requant + out write (no conv2/conv3)
  conv12     + halo-padded conv2 (concat-K)
  full       the production fused_bottleneck_s1
  xla-block  the unfused Int8-composition (reference point)

Usage: python bench/fused_probe.py [batch]
"""

from __future__ import annotations

import functools
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quantized_tpu.ops.int8_matmul import resolve_interpret
from quantized_tpu.utils.timing import per_iter_time

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
H = W = 56
C, CM = 256, 64

import os
SEM = os.environ.get("PROBE_SEMANTICS", "arbitrary")
CP = dict(
    compiler_params=pltpu.CompilerParams(
        dimension_semantics=(SEM,),
        vmem_limit_bytes=100 * 1024 * 1024,
    ),
)


def _mk(kernel, scratch, n, bi=1):
    return pl.pallas_call(
        kernel,
        grid=(n // bi,),
        in_specs=[
            pl.BlockSpec((bi, H, W, C), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, CM), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, CM, CM), lambda b: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CM), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bi, H, W, C), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, H, W, C), jnp.int8),
        scratch_shapes=scratch,
        interpret=resolve_interpret(None),
        **CP,
    )


def k_copy(x_ref, w1_ref, w2_ref, a_ref, out_ref):
    out_ref[...] = x_ref[...]


def k_conv1(x_ref, w1_ref, w2_ref, a_ref, out_ref):
    m = H * W
    xb = x_ref[...].reshape(m, C)
    acc = jnp.dot(xb, w1_ref[...], preferred_element_type=jnp.int32)
    h1 = jnp.clip(jnp.round(acc.astype(jnp.float32) * a_ref[...]), -128, 127).astype(jnp.int8)
    # broadcast back out to C channels so the out block shape matches
    out_ref[...] = jnp.tile(h1, (1, C // CM)).reshape(1, H, W, C)


def k_conv12(x_ref, w1_ref, w2_ref, a_ref, out_ref, h1p_ref):
    m = H * W
    xb = x_ref[...].reshape(m, C)
    acc = jnp.dot(xb, w1_ref[...], preferred_element_type=jnp.int32)
    h1 = jnp.clip(jnp.round(acc.astype(jnp.float32) * a_ref[...]), -128, 127).astype(jnp.int8)
    h1p_ref[0, 0, :, :] = jnp.zeros((W + 2, CM), jnp.int8)
    h1p_ref[0, H + 1, :, :] = jnp.zeros((W + 2, CM), jnp.int8)
    h1p_ref[0, :, 0, :] = jnp.zeros((H + 2, CM), jnp.int8)
    h1p_ref[0, :, W + 1, :] = jnp.zeros((H + 2, CM), jnp.int8)
    h1p_ref[0, 1 : H + 1, 1 : W + 1, :] = h1.reshape(H, W, CM)
    taps = [
        h1p_ref[0, dy : dy + H, dx : dx + W, :].reshape(m, CM)
        for dy in range(3)
        for dx in range(3)
    ]
    acc2 = jnp.dot(
        jnp.concatenate(taps, axis=1), w2_ref[...].reshape(9 * CM, CM),
        preferred_element_type=jnp.int32,
    )
    h2 = jnp.clip(jnp.round(acc2.astype(jnp.float32) * a_ref[...]), -128, 127).astype(jnp.int8)
    out_ref[...] = jnp.tile(h2, (1, C // CM)).reshape(1, H, W, C)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-128, 128, (B, H, W, C)), jnp.int8)
    w1 = jnp.asarray(rng.integers(-127, 128, (C, CM)), jnp.int8)
    w2 = jnp.asarray(rng.integers(-127, 128, (3, 3, CM, CM)), jnp.int8)
    a = jnp.full((1, CM), 0.01, jnp.float32)

    variants = {
        "copy-bi1": _mk(k_copy, [], B),
        "copy-bi2": _mk(k_copy, [], B, bi=2),
        "copy-bi4": _mk(k_copy, [], B, bi=4),
        "copy-bi8": _mk(k_copy, [], B, bi=8),
        "copy-bi16": _mk(k_copy, [], B, bi=16),
    }
    for name, fn in variants.items():
        def step(ca, x, w1, w2, a, _fn=fn):
            y = _fn((x + ca.astype(jnp.int8)).astype(jnp.int8), w1, w2, a)
            return jnp.max(y.astype(jnp.int32)).astype(jnp.float32) * 1e-9

        dt = per_iter_time(step, x, w1, w2, a, target_secs=0.5)
        print(f"{name:>8}: {dt*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
