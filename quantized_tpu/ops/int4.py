"""Int4 weight-only quantization (BASELINE.json config #4: int4-W / int8-A).

Weights are symmetric int4 on [-7, 7] per output channel, packed two nibbles
per int8 byte along the K axis in *split-half* order: byte ``k`` of a packed
(K/2, N) array holds ``w[k]`` (low nibble) and ``w[k + K/2]`` (high nibble).
Split-half packing makes unpacking shuffle-free on TPU — two VPU nibble ops
and a contiguous concat, no sublane interleave — which is what lets the
Pallas matmul unpack *inside the kernel*, in VMEM, after the DMA: the weight
HBM traffic is genuinely halved (the round-1 unpack-then-GEMM form saved
checkpoint bytes but zero bandwidth — VERDICT.md round 1, missing #2).

``int4_matmul`` is that kernel: grid (M/bm, N/bn, Khalf/bk); each step DMAs a
(bk, bn) *packed* block plus the two matching A blocks (rows k and k + K/2 of
the contraction — same array, two BlockSpecs), sign-extends the nibbles with
``(p << 4) >> 4`` / ``p >> 4``, and feeds two MXU dots into the int32
accumulator. The epilogue is the shared alpha/beta fused dequant
(ops/int8_matmul.py contract; alpha carries the int4 scale).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quantized_tpu.ops.int8_matmul import (
    _pad2,
    _round_up,
    int8_matmul,
    resolve_interpret,
)


def int4_weight_qparams(w_ko: np.ndarray) -> np.ndarray:
    """(K, N) weights -> per-column scales for the [-7,7] grid."""
    absmax = np.max(np.abs(w_ko), axis=0)
    return np.maximum(absmax / 7.0, 1e-12).astype(np.float32)


def quantize_int4(w_ko: np.ndarray, scale: np.ndarray) -> np.ndarray:
    q = np.round(w_ko / scale[None, :])
    return np.clip(q, -7, 7).astype(np.int8)


def pack_int4(q: jax.Array) -> jax.Array:
    """(K, N) int4-valued int8 -> (K//2, N) packed bytes, split-half order:
    low nibble = ``q[k]``, high nibble = ``q[k + K//2]``. K must be even
    (pad upstream)."""
    k, n = q.shape
    assert k % 2 == 0, "pad K to even before packing"
    lo = (q[: k // 2] & 0x0F).astype(jnp.uint8)
    hi = (q[k // 2 :] & 0x0F).astype(jnp.uint8)
    return (lo | (hi << 4)).astype(jnp.int8)


def unpack_int4(packed: jax.Array) -> jax.Array:
    """Inverse of pack_int4: (K//2, N) -> (K, N) int8 with sign extension.
    Shuffle-free: nibble ops + one contiguous concat."""
    p = packed
    lo = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(p, jnp.int8(4)), jnp.int8(4)
    )
    hi = jax.lax.shift_right_arithmetic(p, jnp.int8(4))
    return jnp.concatenate([lo, hi], axis=0)


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
    """Inverse of pack_int4_conv -> (Kh, Kw, Cin, Cout) int8."""
    kh, kw, cin, cout = shape
    flat = unpack_int4(packed)[: kh * kw * cin]
    return flat.reshape(kh, kw, cin, cout)


def pack_int4_conv_channels(q_hwio: jax.Array) -> jax.Array:
    """(Kh, Kw, Cg, Cout) int4-valued int8 -> (Kh, Kw, Cg//2, Cout) packed
    bytes, channel-split-half order: byte at channel ``c`` holds ``q[..., c,
    :]`` (low nibble) and ``q[..., c + Cg//2, :]`` (high nibble). Cg must be
    even (callers fall back to unpacked storage for odd Cg — stem/depthwise,
    where weights are tiny anyway).

    This layout makes ``bitcast_convert_type(packed, int4)`` yield the two
    half-Cin weight planes directly (trailing axis [lo, hi]), so the int4
    conv is two native-S4 convs over the input's channel halves — XLA's
    hardware int4 path reads only the packed bytes from HBM."""
    kh, kw, cg, cout = q_hwio.shape
    assert cg % 2 == 0, "channel-split packing needs even Cin-per-group"
    lo = (q_hwio[:, :, : cg // 2, :] & 0x0F).astype(jnp.uint8)
    hi = (q_hwio[:, :, cg // 2 :, :] & 0x0F).astype(jnp.uint8)
    return (lo | (hi << 4)).astype(jnp.int8)


def unpack_int4_conv_channels(packed: jax.Array) -> jax.Array:
    """Inverse of pack_int4_conv_channels -> (Kh, Kw, Cg, Cout) int8."""
    p = packed.astype(jnp.int32)
    lo = ((((p & 0xF) ^ 8) - 8)).astype(jnp.int8)
    hi = (((((p >> 4) & 0xF) ^ 8) - 8)).astype(jnp.int8)
    return jnp.concatenate([lo, hi], axis=2)


def int4_conv_s4(
    x_q: jax.Array,  # (N, H, W, Cin) int8 stored (u-128), unpadded
    w_packed: jax.Array,  # (Kh, Kw, Cg//2, Cout) channel-split packed
    alpha: jax.Array,
    beta: jax.Array,
    stride=(1, 1),
    padding=(0, 0),
    stored_zp: int = -128,
    relu: bool = False,
    out_requant: Optional[Tuple[float, int]] = None,
    groups: int = 1,
) -> jax.Array:
    """Int4-weight conv with native-S4 execution: the packed bytes are
    bitcast to int4 inside the jit and contracted as two convs over the
    input's channel halves (per group). Same epilogue contract as
    ops/int8_conv.int8_conv_xla."""
    from quantized_tpu.ops.int8_conv import pad_stored_zp

    sh, sw = (stride, stride) if isinstance(stride, int) else stride
    ph, pw = (padding, padding) if isinstance(padding, int) else padding
    xp = pad_stored_zp(x_q, (ph, pw), stored_zp)
    kh, kw, cg2, cout = w_packed.shape
    cin = x_q.shape[-1]
    cg = cin // groups
    assert cg == 2 * cg2, (x_q.shape, w_packed.shape, groups)
    w4 = jax.lax.bitcast_convert_type(w_packed, jnp.int4)  # (kh,kw,cg2,cout,2)
    # input channel halves per group: group g owns [g*cg, (g+1)*cg); its low
    # plane is the first cg/2 of those, high plane the rest
    n, hp, wp, _ = xp.shape
    xg = xp.reshape(n, hp, wp, groups, cg)
    x_lo = xg[..., : cg2].reshape(n, hp, wp, groups * cg2)
    x_hi = xg[..., cg2 :].reshape(n, hp, wp, groups * cg2)

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(sh, sw), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
            preferred_element_type=jnp.int32,
        )

    # conv_general_dilated requires matching operand dtypes (unlike
    # dot_general, which accepts s8 x s4) — upcast the nibble planes to int8
    # inside the jit so HBM reads only the packed bytes. Measured round 3
    # (bench/int4_weightbound.py conv rows, RESULTS.md): unlike the GEMM
    # forms (1.5-2.1x wins), the two-half-conv overhead eats the bandwidth
    # saving at conv level — 0.86-1.02x vs int8 at l3/l4 shapes, B<=8. The
    # autotuner races s4/s4-split per signature, so the engine only keeps
    # this form where it measures ahead.
    acc = conv(x_lo, w4[..., 0].astype(jnp.int8)) + conv(x_hi, w4[..., 1].astype(jnp.int8))
    if out_requant is not None:
        out_scale, out_zp = out_requant
        inv = jnp.float32(1.0 / out_scale)
        alpha2 = alpha * inv
        beta2 = beta * inv + jnp.float32(out_zp - 128)
        lo_clip = jnp.float32(out_zp - 128 if relu else -128)
        q = jnp.round(acc.astype(jnp.float32) * alpha2 + beta2)
        return jnp.clip(q, lo_clip, 127.0).astype(jnp.int8)
    y = acc.astype(jnp.float32) * alpha + beta
    if relu:
        y = jnp.maximum(y, 0.0)
    return y


def _int4_matmul_kernel(a_lo_ref, a_hi_ref, bp_ref, alpha_ref, beta_ref,
                        out_ref, acc_ref, *, relu: bool, k_steps: int,
                        out_scale: Optional[float], out_zp: Optional[int]):
    """Int4-weight GEMM step: unpack the packed block in VMEM, two MXU dots.
    int32 scratch accumulator; f32 (or fused-requant int8) epilogue on the
    last K step (K innermost keeps the output block resident)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # Mosaic has no i8 vector shifts — extract nibbles in i32 (32-bit shifts
    # legalize) with xor-sub sign extension, then narrow for the s8 MXU path.
    p32 = bp_ref[...].astype(jnp.int32)
    lo = (((p32 & 0xF) ^ 8) - 8).astype(jnp.int8)
    hi = ((((p32 >> 4) & 0xF) ^ 8) - 8).astype(jnp.int8)
    acc_ref[...] += jnp.dot(a_lo_ref[...], lo, preferred_element_type=jnp.int32)
    acc_ref[...] += jnp.dot(a_hi_ref[...], hi, preferred_element_type=jnp.int32)

    @pl.when(k == k_steps - 1)
    def _epilogue():
        if out_scale is None:
            y = acc_ref[...].astype(jnp.float32) * alpha_ref[...] + beta_ref[...]
            if relu:
                y = jnp.maximum(y, 0.0)
            out_ref[...] = y
        else:
            inv = jnp.float32(1.0 / out_scale)
            alpha2 = alpha_ref[...] * inv
            beta2 = beta_ref[...] * inv + jnp.float32(out_zp - 128)
            lo_clip = jnp.float32(out_zp - 128 if relu else -128)
            q = jnp.round(acc_ref[...].astype(jnp.float32) * alpha2 + beta2)
            out_ref[...] = jnp.clip(q, lo_clip, 127.0).astype(jnp.int8)


@functools.partial(
    jax.jit,
    static_argnames=("relu", "out_scale", "out_zp",
                     "block_m", "block_n", "block_k", "interpret"),
)
def int4_matmul(
    a: jax.Array,  # (M, K) int8 activations (stored u-128)
    w_packed: jax.Array,  # (K//2, N) split-half packed int4
    alpha: jax.Array,  # (N,) f32 — carries the int4 scale
    beta: jax.Array,  # (N,) f32
    relu: bool = False,
    out_scale: Optional[float] = None,
    out_zp: Optional[int] = None,
    block_m: int = 256,
    block_n: int = 256,
    block_k: int = 256,  # packed rows per step (= 512 logical K)
    interpret: bool = None,
) -> jax.Array:
    """Weight-only int4 matmul with in-kernel unpack (see module docstring).
    ``out_scale/out_zp`` switch on the fused int8 requant epilogue."""
    m, k = a.shape
    khalf, n = w_packed.shape
    if k == 2 * khalf - 1:  # odd-K weights were zero-padded before packing
        a = jnp.pad(a, ((0, 0), (0, 1)))
        k += 1
    assert k == 2 * khalf, (a.shape, w_packed.shape)
    bm = min(block_m, _round_up(m, 32))
    bn = min(block_n, _round_up(n, 128))
    bk = min(block_k, _round_up(khalf, 128))
    # pad A so bk divides each half independently: pad khalf up to bk multiple
    khalf_p = _round_up(khalf, bk)
    a_lo = _pad2(a[:, :khalf], bm, bk)  # (mp, khalf_p)
    a_hi = _pad2(a[:, khalf:], bm, bk)
    b_p = _pad2(w_packed, bk, bn)
    mp = a_lo.shape[0]
    np_ = b_p.shape[1]
    alpha_p = jnp.pad(alpha.astype(jnp.float32), (0, np_ - n))[None, :]
    beta_p = jnp.pad(beta.astype(jnp.float32), (0, np_ - n))[None, :]
    k_steps = khalf_p // bk

    out_dtype = jnp.float32 if out_scale is None else jnp.int8
    out = pl.pallas_call(
        functools.partial(
            _int4_matmul_kernel, relu=relu, k_steps=k_steps,
            out_scale=None if out_scale is None else float(out_scale),
            out_zp=None if out_zp is None else int(out_zp),
        ),
        grid=(mp // bm, np_ // bn, k_steps),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * 2 * khalf_p * np_,
            bytes_accessed=2 * mp * khalf_p + khalf_p * np_ + 4 * mp * np_,
            transcendentals=0,
        ),
        interpret=resolve_interpret(interpret),
    )(a_lo, a_hi, b_p, alpha_p, beta_p)
    return out[:m, :n]


@functools.partial(jax.jit, static_argnames=("relu", "out_scale", "out_zp"))
def int4_matmul_s4(
    a: jax.Array,  # (M, K) int8 activations (stored u-128)
    w_packed: jax.Array,  # (K//2, N) split-half packed int4 bytes
    alpha: jax.Array,
    beta: jax.Array,
    relu: bool = False,
    out_scale: Optional[float] = None,
    out_zp: Optional[int] = None,
) -> jax.Array:
    """Native-S4 path: bitcast the packed bytes to ``jnp.int4`` *inside* the
    jit (free reinterpret — S4 arrays cannot cross the axon-tunnel jit
    boundary, so the stored dtype stays int8) and contract the two nibble
    planes with XLA s4 dots. HBM reads exactly the packed bytes; XLA's int4
    MXU path does the unpack in hardware. Bitcast nibble order is [lo, hi],
    matching pack_int4's split-half layout (verified on v5e)."""
    m, k = a.shape
    khalf, n = w_packed.shape
    if k == 2 * khalf - 1:
        a = jnp.pad(a, ((0, 0), (0, 1)))
        k += 1
    w4 = jax.lax.bitcast_convert_type(w_packed, jnp.int4)  # (K//2, N, 2)
    dn = (((1,), (0,)), ((), ()))
    acc = jax.lax.dot_general(a[:, :khalf], w4[:, :, 0], dn,
                              preferred_element_type=jnp.int32)
    acc += jax.lax.dot_general(a[:, khalf:], w4[:, :, 1], dn,
                               preferred_element_type=jnp.int32)
    if out_scale is not None:
        inv = jnp.float32(1.0 / out_scale)
        alpha2 = alpha * inv
        beta2 = beta * inv + jnp.float32(out_zp - 128)
        lo_clip = jnp.float32(out_zp - 128 if relu else -128)
        q = jnp.round(acc.astype(jnp.float32) * alpha2 + beta2)
        return jnp.clip(q, lo_clip, 127.0).astype(jnp.int8)
    y = acc.astype(jnp.float32) * alpha + beta
    if relu:
        y = jnp.maximum(y, 0.0)
    return y


def int4_matmul_unpacked_xla(
    a: jax.Array,
    w_packed: jax.Array,
    alpha: jax.Array,
    beta: jax.Array,
    relu: bool = False,
    interpret: bool = None,
) -> jax.Array:
    """Round-1 form kept as a fallback/cross-check: unpack outside the kernel
    and reuse the s8 GEMM (materializes the int8 weights — no HBM win)."""
    b = unpack_int4(w_packed)
    return int8_matmul(a, b, alpha, beta, relu=relu, interpret=interpret)
