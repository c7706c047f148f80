"""Is an explicit s8 dot_general faster than XLA's s8 conv for 1x1 convs?

XLA s8 matmul reaches 337 TOPS on this chip while s8 conv_general_dilated
tops out near the bf16 rate (~190) — if reshaping the 1x1 conv to an explicit
(N*H*W, Cin) x (Cin, Cout) dot keeps that rate, most of ResNet-50's FLOPs can
ride the fast path. Also checks 3x3 via XLA-materialized im2col patches.
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit('/', 2)[0])

import functools

import jax
import jax.numpy as jnp
import numpy as np

from quantized_tpu.ops.int8_conv import im2col_int8, pad_stored_zp
from quantized_tpu.utils.timing import per_iter_time

B = 64

SHAPES = [
    ("l1_1x1c", 56, 256, 64, 1, 1),
    ("l2_1x1b", 28, 128, 512, 1, 1),
    ("l3_1x1b", 14, 256, 1024, 1, 1),
    ("l3_1x1c", 14, 1024, 256, 1, 1),
    ("l4_1x1c", 7, 2048, 512, 1, 1),
    ("l1_3x3", 56, 64, 64, 3, 1),
    ("l3_3x3", 14, 256, 256, 3, 1),
]


def conv_step(stride, pad, c, x, w, alpha, beta):
    xq = (x + c.astype(jnp.int8)).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        pad_stored_zp(xq, (pad, pad), 0), w, (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * alpha + beta
    q = jnp.clip(jnp.round(y * 20.0) + 128.0, 0., 255.) - 128.
    return jnp.float32(jnp.max(q)) * 1e-9


def dot_step(k, stride, pad, c, x, w, alpha, beta):
    xq = (x + c.astype(jnp.int8)).astype(jnp.int8)
    n, h, _, cin = x.shape
    cout = w.shape[-1]
    if k == 1 and stride == 1:
        a = xq.reshape(-1, cin)
    else:
        a = im2col_int8(pad_stored_zp(xq, (pad, pad), 0), (k, k), stride).reshape(-1, k * k * cin)
    acc = jax.lax.dot_general(a, w.reshape(-1, cout), (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * alpha + beta
    q = jnp.clip(jnp.round(y * 20.0) + 128.0, 0., 255.) - 128.
    return jnp.float32(jnp.max(q)) * 1e-9


def main():
    print(f"device={jax.devices()[0].device_kind} batch={B}", flush=True)
    rng = np.random.default_rng(0)
    for name, h, cin, cout, k, s in SHAPES:
        pad = k // 2
        gops = 2.0 * B * (h // s) ** 2 * k * k * cin * cout / 1e9
        x = jnp.asarray(rng.integers(-128, 128, (B, h, h, cin)), jnp.int8)
        w = jnp.asarray(rng.integers(-127, 128, (k, k, cin, cout)), jnp.int8)
        alpha = jnp.full((cout,), 1e-4, jnp.float32)
        beta = jnp.zeros((cout,), jnp.float32)
        dt_c = per_iter_time(functools.partial(conv_step, s, pad), x, w, alpha, beta)
        dt_d = per_iter_time(functools.partial(dot_step, k, s, pad), x, w, alpha, beta)
        print(f"{name:>8} ({gops:5.2f} GOPs): conv {dt_c*1e3:7.3f} ms {gops/dt_c/1e3:6.1f} TOPS"
              f" | dot {dt_d*1e3:7.3f} ms {gops/dt_d/1e3:6.1f} TOPS"
              f" | dot speedup {dt_c/dt_d:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
