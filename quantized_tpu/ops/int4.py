"""Int4 weight-only quantization (BASELINE.json config #4: int4-W / int8-A).

Weights are symmetric int4 on [-7, 7] per output channel, packed two nibbles
per int8 byte along the K axis. The matmul path unpacks to int8 and reuses the
s8 MXU kernel with the int4 scales — weight-only: activations stay int8/f32.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from quantized_tpu.ops.int8_matmul import int8_matmul


def int4_weight_qparams(w_ko: np.ndarray) -> np.ndarray:
    """(K, N) weights -> per-column scales for the [-7,7] grid."""
    absmax = np.max(np.abs(w_ko), axis=0)
    return np.maximum(absmax / 7.0, 1e-12).astype(np.float32)


def quantize_int4(w_ko: np.ndarray, scale: np.ndarray) -> np.ndarray:
    q = np.round(w_ko / scale[None, :])
    return np.clip(q, -7, 7).astype(np.int8)


def pack_int4(q: jax.Array) -> jax.Array:
    """(K, N) int4-valued int8 -> (K//2, N) packed bytes (low nibble = even k,
    high nibble = odd k). K must be even (pad upstream)."""
    k, n = q.shape
    assert k % 2 == 0, "pad K to even before packing"
    lo = (q[0::2] & 0x0F).astype(jnp.uint8)
    hi = (q[1::2] & 0x0F).astype(jnp.uint8)
    return (lo | (hi << 4)).astype(jnp.int8)


def unpack_int4(packed: jax.Array) -> jax.Array:
    """Inverse of pack_int4: (K//2, N) -> (K, N) int8 with sign extension."""
    p = packed.astype(jnp.uint8)
    lo = (p & 0x0F).astype(jnp.int8)
    hi = ((p >> 4) & 0x0F).astype(jnp.int8)
    # sign-extend nibbles: values >= 8 represent negatives
    lo = jnp.where(lo >= 8, lo - 16, lo)
    hi = jnp.where(hi >= 8, hi - 16, hi)
    k2, n = packed.shape
    out = jnp.zeros((k2 * 2, n), jnp.int8)
    out = out.at[0::2].set(lo)
    out = out.at[1::2].set(hi)
    return out


def pack_int4_conv(q_hwio: jax.Array) -> Tuple[jax.Array, Tuple[int, int, int, int]]:
    """(Kh, Kw, Cin, Cout) int4-valued int8 -> packed (ceil(Kh*Kw*Cin/2), Cout)
    bytes + the original shape (HBM halving for conv weights). Packs along the
    flattened contraction axis; odd K is zero-padded."""
    kh, kw, cin, cout = q_hwio.shape
    flat = q_hwio.reshape(kh * kw * cin, cout)
    if flat.shape[0] % 2:
        flat = jnp.pad(flat, ((0, 1), (0, 0)))
    return pack_int4(flat), (kh, kw, cin, cout)


def unpack_int4_conv(packed: jax.Array, shape: Tuple[int, int, int, int]) -> jax.Array:
    """Inverse of pack_int4_conv -> (Kh, Kw, Cin, Cout) int8 (one cheap
    elementwise pass over the weights, fused by XLA into the conv's weight
    read)."""
    kh, kw, cin, cout = shape
    flat = unpack_int4(packed)[: kh * kw * cin]
    return flat.reshape(kh, kw, cin, cout)


def int4_matmul(
    a: jax.Array,  # (M, K) int8 activations (stored u-128)
    w_packed: jax.Array,  # (K//2, N) packed int4
    alpha: jax.Array,
    beta: jax.Array,
    relu: bool = False,
    interpret: bool = None,
) -> jax.Array:
    """Weight-only int4 matmul: unpack -> s8 MXU GEMM with the same fused
    epilogue (alpha already carries the int4 scale)."""
    b = unpack_int4(w_packed)
    return int8_matmul(a, b, alpha, beta, relu=relu, interpret=interpret)
