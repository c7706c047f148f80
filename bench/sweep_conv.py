"""Per-shape conv sweep on the live TPU: where does ResNet-50's time go?

Times every distinct conv shape in ResNet-50 (ImageNet geometry, NHWC,
batch B) on three engine paths using the overhead-cancelling scan harness
(quantized_tpu/utils/timing.py — see its docstring for why naive timing lies
on this sandbox):

  - bf16     : lax conv in bf16 (MXU bf16 path; the fp baseline cost model)
  - xla      : quantize + lax conv s8xs8->s32 + fused epilogue (engine 'xla')
  - gemm     : quantize + Pallas im2col GEMM (engine 'gemm')

Prints ms/iter, effective TOP/s and % of v5e peak (bf16 197 / int8 394 TOPS),
plus the shape-count-weighted whole-net conv-only bound.
"""

from __future__ import annotations

import functools
import sys

sys.path.insert(0, __file__.rsplit('/', 2)[0])
import time

import jax
import jax.numpy as jnp
import numpy as np

from quantized_tpu.engine.int_layers import quantize_input_stored
from quantized_tpu.ops.int8_conv import int8_conv_gemm, int8_conv_xla
from quantized_tpu.utils.timing import per_iter_time

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
MODES = sys.argv[2].split(",") if len(sys.argv) > 2 else ["bf16", "xla", "gemm"]

# (name, H, Cin, Cout, k, stride, count_in_resnet50)
SHAPES = [
    ("stem7x7", 224, 3, 64, 7, 2, 1),
    ("l1_1x1a", 56, 64, 64, 1, 1, 2),
    ("l1_3x3", 56, 64, 64, 3, 1, 3),
    ("l1_1x1b", 56, 64, 256, 1, 1, 3),
    ("l1_1x1c", 56, 256, 64, 1, 1, 2),
    ("l1_ds", 56, 64, 256, 1, 1, 1),
    ("l2_1x1a", 56, 256, 128, 1, 1, 1),
    ("l2_3x3s2", 56, 128, 128, 3, 2, 1),
    ("l2_1x1b", 28, 128, 512, 1, 1, 4),
    ("l2_1x1c", 28, 512, 128, 1, 1, 3),
    ("l2_3x3", 28, 128, 128, 3, 1, 3),
    ("l2_ds", 56, 256, 512, 1, 2, 1),
    ("l3_1x1a", 28, 512, 256, 1, 1, 1),
    ("l3_3x3s2", 28, 256, 256, 3, 2, 1),
    ("l3_1x1b", 14, 256, 1024, 1, 1, 6),
    ("l3_1x1c", 14, 1024, 256, 1, 1, 5),
    ("l3_3x3", 14, 256, 256, 3, 1, 5),
    ("l3_ds", 28, 512, 1024, 1, 2, 1),
    ("l4_1x1a", 14, 1024, 512, 1, 1, 1),
    ("l4_3x3s2", 14, 512, 512, 3, 2, 1),
    ("l4_1x1b", 7, 512, 2048, 1, 1, 3),
    ("l4_1x1c", 7, 2048, 512, 1, 1, 2),
    ("l4_3x3", 7, 512, 512, 3, 1, 2),
    ("l4_ds", 14, 1024, 2048, 1, 2, 1),
]


def bf16_step(pad, stride, c, x, w):
    y = jax.lax.conv_general_dilated(
        (x + c).astype(jnp.bfloat16),
        w.astype(jnp.bfloat16),
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jnp.float32(jnp.max(y)) * 1e-9


def int8_step(pad, stride, mode, c, x, w_q, alpha, beta):
    f = int8_conv_xla if mode == "xla" else functools.partial(int8_conv_gemm, interpret=False)
    x_q = quantize_input_stored(x + c, 0.05, 128)
    y = f(x_q, w_q, alpha, beta, stride, pad, 0, relu=True)
    return jnp.float32(jnp.max(y)) * 1e-9


def i8io_step(pad, stride, c, x_q, w_q, alpha, beta):
    """int8-resident cost model: int8 in, requant epilogue, int8 out."""
    xq = (x_q + c.astype(jnp.int8)).astype(jnp.int8)
    y = int8_conv_xla(xq, w_q, alpha, beta, stride, pad, 0, relu=True, out_requant=(0.05, 128))
    return jnp.float32(jnp.max(y)) * 1e-9


def b16io_step(pad, stride, c, x_q, w_f, alpha, beta):
    """bf16-resident cost model: int8 in, dequant, bf16 conv, requant, int8
    out — the honest per-layer alternative for a mixed-precision engine."""
    xq = (x_q + c.astype(jnp.int8)).astype(jnp.int8)
    xb = ((xq.astype(jnp.float32) + 118.0) * 0.05).astype(jnp.bfloat16)
    y = jax.lax.conv_general_dilated(
        xb, w_f.astype(jnp.bfloat16),
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    y = jnp.maximum(y + beta, 0.0)
    q = jnp.round(y * 20.0) + 128.0
    q = (jnp.clip(q, 0.0, 255.0) - 128.0).astype(jnp.int8)
    return jnp.float32(jnp.max(q)) * 1e-9


def flat_step(pad, stride, c, x_q, w_q, alpha, beta):
    """Pallas flat-row conv (stride-1 only), int8 in -> int8 out."""
    from quantized_tpu.ops.int8_conv_pallas import int8_conv_flat

    xq = (x_q + c.astype(jnp.int8)).astype(jnp.int8)
    y = int8_conv_flat(
        xq, w_q, alpha, beta, stride=stride, padding=pad, stored_zp=0,
        relu=True, out_requant=(0.05, 128), interpret=False,
    )
    return jnp.float32(jnp.max(y)) * 1e-9


def direct_step(pad, stride, c, x_q, w_q, alpha, beta):
    """Pallas direct conv, int8 in -> int8 out, fused requant epilogue."""
    from quantized_tpu.ops.int8_conv_pallas import int8_conv_direct

    xq = (x_q + c.astype(jnp.int8)).astype(jnp.int8)
    y = int8_conv_direct(
        xq, w_q, alpha, beta, stride=stride, padding=pad, stored_zp=0,
        relu=True, out_requant=(0.05, 128), interpret=False,
    )
    return jnp.float32(jnp.max(y)) * 1e-9


def main():
    print(f"device={jax.devices()[0].device_kind} batch={B} modes={MODES}", flush=True)
    rng = np.random.default_rng(0)
    total = {m: 0.0 for m in MODES}
    print(f"{'shape':>9} {'HxCinxCout':>14} {'GOPs':>7} | " + " | ".join(f"{m:>5}: ms TOPS %pk" for m in MODES), flush=True)
    for name, h, cin, cout, k, s, cnt in SHAPES:
        pad = k // 2 if k > 1 else 0
        ho = h // s
        gops = 2.0 * B * ho * ho * k * k * cin * cout / 1e9
        x = jnp.asarray(rng.standard_normal((B, h, h, cin)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.05, jnp.float32)
        w_q = jnp.asarray(rng.integers(-127, 128, (k, k, cin, cout)), jnp.int8)
        alpha = jnp.full((cout,), 1e-4, jnp.float32)
        beta = jnp.zeros((cout,), jnp.float32)

        x_q8 = jnp.asarray(rng.integers(-128, 128, (B, h, h, cin)), jnp.int8)
        cells = []
        for mode in MODES:
            try:
                if mode == "bf16":
                    dt = per_iter_time(functools.partial(bf16_step, pad, s), x, w)
                elif mode == "i8io":
                    dt = per_iter_time(functools.partial(i8io_step, pad, s), x_q8, w_q, alpha, beta)
                elif mode == "direct":
                    dt = per_iter_time(functools.partial(direct_step, pad, s), x_q8, w_q, alpha, beta)
                elif mode == "flat":
                    dt = per_iter_time(functools.partial(flat_step, pad, s), x_q8, w_q, alpha, beta)
                elif mode == "b16io":
                    dt = per_iter_time(functools.partial(b16io_step, pad, s), x_q8, w, alpha, beta)
                else:
                    dt = per_iter_time(functools.partial(int8_step, pad, s, mode), x, w_q, alpha, beta)
                tops = gops / dt / 1e3
                peak = 197.0 if mode == "bf16" else 394.0
                cells.append(f"{dt*1e3:>7.3f} {tops:>5.1f} {100*tops/peak:>3.0f}%")
                total[mode] += dt * cnt
            except Exception as e:
                cells.append(f"FAIL:{type(e).__name__[:12]}")
                total[mode] = float("nan")
        print(f"{name:>9} {h:>4}x{cin:>4}x{cout:>4} {gops:>7.2f} | " + " | ".join(cells), flush=True)

    print(f"\nwhole-ResNet50 conv time (sum of shape x count), ms/batch of {B}:", flush=True)
    for m, t in total.items():
        print(f"  {m:>5}: {t*1e3:8.3f} ms  -> {B/t:9.0f} img/s (conv-only bound)")


if __name__ == "__main__":
    main()
