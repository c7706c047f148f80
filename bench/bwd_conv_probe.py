"""Per-shape backward-conv decomposition (train-step floor follow-up).

The train-step profile (bench/train_profile.py) shows backward convs at
62.6 ms/step — 5.8x the 10.7 ms forward where ~2x is structural. This probe
times each ResNet-50 conv shape's three ops separately in bf16 at B=128:

  fwd : y  = conv(x, w)
  dx  : dx = grad_x  <conv(x, w), g>   (conv is linear: XLA DCEs the fwd,
  dw  : dw = grad_w  <conv(x, w), g>    leaving exactly the transpose op)

and compares each against max(io @ 657 GB/s, flops @ 191 bf16-TOPS
measured). The carry perturbs ``g`` by a broadcast scalar, which fuses into
the operand load (no extra HBM pass), so the chained scan stays honest
(utils/timing.py).

Usage: python bench/bwd_conv_probe.py [B]
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from quantized_tpu.models.layers import conv2d_nhwc
from quantized_tpu.utils.timing import per_iter_time

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
IO_GBPS = 657.0
BF16_TOPS = 191.0

# (name, HxW, Cin, Cout, k, stride, pad) — one row per distinct ResNet-50
# conv geometry (identity-block c1/c2/c3 per stage + stem; downsample legs
# share c3-like geometry)
SHAPES = [
    ("stem 7x7/2", 224, 3, 64, 7, 2, 3),
    ("l1 c1 1x1", 56, 64, 64, 1, 1, 0),
    ("l1 c2 3x3", 56, 64, 64, 3, 1, 1),
    ("l1 c3 1x1", 56, 64, 256, 1, 1, 0),
    ("l2 c2 3x3", 28, 128, 128, 3, 1, 1),
    ("l2 c3 1x1", 28, 128, 512, 1, 1, 0),
    ("l3 c2 3x3", 14, 256, 256, 3, 1, 1),
    ("l3 c3 1x1", 14, 256, 1024, 1, 1, 0),
    ("l4 c2 3x3", 7, 512, 512, 3, 1, 1),
    ("l4 c3 1x1", 7, 512, 2048, 1, 1, 0),
]


def main():
    from quantized_tpu.engine.executor import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    total = {"fwd": 0.0, "dx": 0.0, "dw": 0.0}
    floors = {"fwd": 0.0, "dx": 0.0, "dw": 0.0}
    print(f"B={B} bf16; per-op ms vs max(io@{IO_GBPS:.0f} GB/s, fl@{BF16_TOPS:.0f} TOPS)")
    print(f"{'shape':>12} | {'fwd':>14} | {'dx':>14} | {'dw':>14}")
    for name, hw, cin, cout, k, s, p in SHAPES:
        oh = hw // s
        x = jnp.asarray(rng.standard_normal((B, hw, hw, cin)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.05, jnp.bfloat16)
        g = jnp.asarray(rng.standard_normal((B, oh, oh, cout)), jnp.bfloat16)
        conv = lambda x_, w_: conv2d_nhwc(x_, w_, s, p)

        flops = 2.0 * B * oh * oh * k * k * cin * cout
        bx, bw, bg = x.size * 2, w.size * 2, g.size * 2
        fl = {  # max(io, compute) per op, seconds
            "fwd": max((bx + bw + bg) / (IO_GBPS * 1e9), flops / (BF16_TOPS * 1e12)),
            "dx": max((bg + bw + bx) / (IO_GBPS * 1e9), flops / (BF16_TOPS * 1e12)),
            "dw": max((bx + bg + bw) / (IO_GBPS * 1e9), flops / (BF16_TOPS * 1e12)),
        }

        def t_fwd(c, x, w, g):
            return jnp.max(conv(x + c.astype(x.dtype), w)).astype(jnp.float32) * 1e-20

        def t_dx(c, x, w, g):
            dx = jax.grad(lambda x_: jnp.vdot(conv(x_, w), g + c.astype(g.dtype)).astype(jnp.float32))(x)
            return jnp.max(dx).astype(jnp.float32) * 1e-20

        def t_dw(c, x, w, g):
            dw = jax.grad(lambda w_: jnp.vdot(conv(x, w_), g + c.astype(g.dtype)).astype(jnp.float32))(w)
            return jnp.max(dw).astype(jnp.float32) * 1e-20

        row = {}
        for key, fn in (("fwd", t_fwd), ("dx", t_dx), ("dw", t_dw)):
            dt = per_iter_time(fn, x, w, g, target_secs=0.4)
            row[key] = dt
            total[key] += dt
            floors[key] += fl[key]
        print(f"{name:>12} | " + " | ".join(
            f"{row[k]*1e3:6.3f} ({100*fl[k]/row[k]:3.0f}%)" for k in ("fwd", "dx", "dw")))
    print(f"{'TOTAL':>12} | " + " | ".join(
        f"{total[k]*1e3:6.3f} ({100*floors[k]/total[k]:3.0f}%)" for k in ("fwd", "dx", "dw")))


if __name__ == "__main__":
    main()
