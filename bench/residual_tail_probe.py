"""Residual-tail forms race (round-3 headline hunt).

The per-conv XProf table (bench/xprof_mxu.json) puts ~3.3 ms of the 7.7 ms
forward in the c3+residual tails of layers 1-3, running at ~337-376 GB/s —
roughly HALF the 657 GB/s stream rate — and shows the downsample blocks
materializing their prescaled f32 identity (411 MB at layer1). Two
hypotheses, raced here at layer1 geometry with the honest chain harness:

identity-block tail (in/out (B,56,56,256) s8, h2 = x[...,:64]):
  engine   the production dataflow (out_prescale f32 conv + fused residual)
  pack2    lane-packing: h2 (M,64)->(M/2,128) and x (M,256)->(M/2,512) are
           free row-major reshapes; w3 becomes block-diagonal (128,512), so
           every minor dim fills the 128-wide lane tiles (2x the MACs on a
           tiny conv, full-rate io if the half-lane hypothesis holds)
  bf16     dequantized-weights bf16 conv + f32 prescale epilogue + residual

downsample tail (x64 (B,56,56,64) -> y (B,56,56,256), two convs):
  ds-f32     production: both convs emit prescaled f32; one must materialize
  ds-s8      ds conv emits s8 on a fine grid (fused epilogue), residual
             dequantizes — io for the identity leg drops 4x (numerics: adds
             <=0.5 fine-step error BEFORE the final round; measured apart)
  ds-bf16    ds conv emits bf16 (2x io drop, <=bf16-eps error)

Usage: python bench/residual_tail_probe.py [batch]
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
SHIFT = 3.0  # zp_out - 128 stand-in


def tail(acc_ps, id_ps):
    q = jnp.round(acc_ps + id_ps)
    return jnp.clip(q, jnp.float32(SHIFT), 127.0).astype(jnp.int8)


def make_identity_forms(rng):
    w3 = jnp.asarray(rng.integers(-127, 128, (1, 1, CM, C)), jnp.int8)
    alpha = jnp.asarray(rng.uniform(1e-4, 2e-4, (C,)), jnp.float32)
    beta = jnp.asarray(rng.uniform(-0.5, 0.5, (C,)), jnp.float32)
    k_id = jnp.float32(0.7)
    b_id = jnp.float32(1.3)

    def engine(x):
        h2 = x[..., :CM]
        acc = int8_conv_xla(h2, w3, alpha, beta + SHIFT)
        idq = x.astype(jnp.float32) * k_id + b_id
        return tail(acc, idq)

    w2 = np.zeros((1, 1, 2 * CM, 2 * C), np.int8)
    w2[0, 0, :CM, :C] = np.asarray(w3)[0, 0]
    w2[0, 0, CM:, C:] = np.asarray(w3)[0, 0]
    w2 = jnp.asarray(w2)
    alpha2 = jnp.concatenate([alpha, alpha])
    beta2 = jnp.concatenate([beta, beta])

    def pack2(x):
        h2 = x[..., :CM]
        h2p = h2.reshape(B, H, H // 2, 2 * CM)
        acc = int8_conv_xla(h2p, w2, alpha2, beta2 + SHIFT)
        xp = x.reshape(B, H, H // 2, 2 * C)
        idq = xp.astype(jnp.float32) * k_id + b_id
        return tail(acc, idq).reshape(B, H, H, C)

    w_bf = (np.asarray(w3).astype(np.float32) * 1e-2).astype(np.float32)
    w_bf16 = jnp.asarray(w_bf, jnp.bfloat16)
    a_bf = alpha / jnp.float32(1e-2)

    def bf16(x):
        h2 = x[..., :CM]
        xb = (h2.astype(jnp.float32) * jnp.float32(0.05)).astype(jnp.bfloat16)
        y = jax.lax.conv_general_dilated(
            xb, w_bf16, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        acc = y * (a_bf / jnp.float32(0.05)) + (beta + SHIFT)
        idq = x.astype(jnp.float32) * k_id + b_id
        return tail(acc, idq)

    return {"engine": engine, "pack2": pack2, "bf16": bf16}


def make_ds_forms(rng):
    w3 = jnp.asarray(rng.integers(-127, 128, (1, 1, CM, C)), jnp.int8)
    wds = jnp.asarray(rng.integers(-127, 128, (1, 1, CM, C)), jnp.int8)
    alpha = jnp.asarray(rng.uniform(1e-4, 2e-4, (C,)), jnp.float32)
    beta = jnp.asarray(rng.uniform(-0.5, 0.5, (C,)), jnp.float32)

    def slice64(y):
        return y[..., :CM]

    def ds_f32(y):
        x64 = slice64(y)
        acc = int8_conv_xla(x64, w3, alpha, beta + SHIFT)
        ids = int8_conv_xla(x64, wds, alpha, beta)
        return tail(acc, ids)

    fine = (0.05, 128)  # fine requant grid for the identity leg

    def ds_s8(y):
        x64 = slice64(y)
        acc = int8_conv_xla(x64, w3, alpha, beta + SHIFT)
        ids_q = int8_conv_xla(x64, wds, alpha, beta, out_requant=fine)
        ids = (ids_q.astype(jnp.float32) + jnp.float32(128 - fine[1])) * jnp.float32(fine[0])
        return tail(acc, ids)

    def ds_bf16(y):
        x64 = slice64(y)
        acc = int8_conv_xla(x64, w3, alpha, beta + SHIFT)
        ids = int8_conv_xla(x64, wds, alpha, beta).astype(jnp.bfloat16)
        return tail(acc, ids.astype(jnp.float32))

    return {"ds-f32": ds_f32, "ds-s8": ds_s8, "ds-bf16": ds_bf16}


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-128, 128, (B, H, H, C)), jnp.int8)

    forms = make_identity_forms(rng)
    base = None
    for name, fn in forms.items():
        # correctness cross-check: pack2 must equal engine bit-for-bit
        if name == "pack2":
            a = np.asarray(jax.jit(forms["engine"])(x))
            b = np.asarray(jax.jit(fn)(x))
            assert (a == b).all(), "pack2 != engine"
        dt = chain_time(fn, x)
        base = base or dt
        print(f"identity {name:>7}: {dt*1e3:7.3f} ms ({base/dt:4.2f}x)", flush=True)

    forms = make_ds_forms(rng)
    base = None
    for name, fn in forms.items():
        dt = chain_time(fn, x)
        base = base or dt
        print(f"ds-block {name:>7}: {dt*1e3:7.3f} ms ({base/dt:4.2f}x)", flush=True)


if __name__ == "__main__":
    main()
