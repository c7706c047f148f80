"""Pallas int8 MXU matmul with fused dequant epilogue.

Integer contract (SURVEY.md section 7 step 4 / hard part #2):

- activations: logical uint8 ``u`` on [0,255] with integer zero-point
  ``zp_a``; stored as int8 ``a = u - 128`` so the MXU's s8 path applies.
- weights: symmetric int8 on [-127,127], per-output-channel scale
  ``s_w[c]``.
- real-valued product: sum_k (u_k - zp_a) * s_a * w_kc * s_wc
  = s_a * s_wc * [ sum_k a_k w_kc + (128 - zp_a) * colsum_c ]
  with ``colsum_c = sum_k w_kc`` precomputed. Folding bias in:

      y_c = acc_c * alpha_c + beta_c
      alpha_c = s_a * s_wc
      beta_c  = alpha_c * (128 - zp_a) * colsum_c + bias_c

  so the epilogue is a single per-channel FMA (+ optional ReLU, + optional
  requantization straight to the next layer's int8 grid).

Zero-padding correctness: padded positions hold ``u = zp_a`` (stored
``zp_a - 128``), making their contribution exactly 0 — the caller pads with
the stored zero-point, never with 0.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def matmul_epilogue_params(
    act_scale: float,
    act_zero_point: int,
    weight_scale: jax.Array,  # (N,) f32 per-channel (or scalar broadcast)
    weight_colsum: jax.Array,  # (N,) int32: sum_k w[k, c]
    bias: Optional[jax.Array] = None,  # (N,) f32
) -> Tuple[jax.Array, jax.Array]:
    """Precompute (alpha, beta) for the fused epilogue."""
    ws = jnp.broadcast_to(jnp.asarray(weight_scale, jnp.float32), weight_colsum.shape)
    alpha = jnp.float32(act_scale) * ws
    beta = alpha * jnp.float32(128 - act_zero_point) * weight_colsum.astype(jnp.float32)
    if bias is not None:
        beta = beta + jnp.asarray(bias, jnp.float32)
    return alpha, beta


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _matmul_kernel(a_ref, b_ref, alpha_ref, beta_ref, out_ref, acc_ref, *, relu: bool, k_steps: int):
    """Grid (M/bm, N/bn, k_steps); int32 scratch accumulator (exact — an f32
    accumulator would lose integer exactness past 2^24), f32 epilogue on the
    last K step. K innermost keeps the output block resident."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jnp.dot(a_ref[...], b_ref[...], preferred_element_type=jnp.int32)

    @pl.when(k == k_steps - 1)
    def _epilogue():
        y = acc_ref[...].astype(jnp.float32) * alpha_ref[...] + beta_ref[...]
        if relu:
            y = jnp.maximum(y, 0.0)
        out_ref[...] = y


def _requant_kernel(a_ref, b_ref, alpha_ref, beta_ref, out_ref, acc_ref, *, relu, k_steps, out_scale, out_zp):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jnp.dot(a_ref[...], b_ref[...], preferred_element_type=jnp.int32)

    @pl.when(k == k_steps - 1)
    def _epilogue():
        # minimal-op fused requant (int8_conv.py): 1/s folds into alpha/beta,
        # the -128 shift into the zero-point, ReLU into the clip floor
        inv = jnp.float32(1.0 / out_scale)
        alpha2 = alpha_ref[...] * inv
        beta2 = beta_ref[...] * inv + jnp.float32(out_zp - 128)
        lo = jnp.float32(out_zp - 128 if relu else -128)
        q = jnp.round(acc_ref[...].astype(jnp.float32) * alpha2 + beta2)
        out_ref[...] = jnp.clip(q, lo, 127.0).astype(jnp.int8)


_INTERPRET_OVERRIDE = None


def set_interpret_default(value):
    """Force Pallas interpret mode process-wide (True/False), or restore the
    backend-derived default (None).  Needed when compiling for an explicit CPU
    device mesh while the *default* backend is a TPU (e.g. the driver's
    virtual-device dryrun under this sandbox's 'axon' platform): inside jit
    there is no way to see the target platform, so the caller must say."""
    global _INTERPRET_OVERRIDE
    _INTERPRET_OVERRIDE = value


def resolve_interpret(interpret):
    """interpret=None -> interpret-mode on CPU (Pallas TPU kernels cannot
    compile there), compiled elsewhere; see set_interpret_default."""
    if interpret is None:
        if _INTERPRET_OVERRIDE is not None:
            return _INTERPRET_OVERRIDE
        return jax.default_backend() == "cpu"
    return interpret


def _pad2(x, m0, m1, fill=0):
    p0 = _round_up(x.shape[0], m0) - x.shape[0]
    p1 = _round_up(x.shape[1], m1) - x.shape[1]
    if p0 or p1:
        x = jnp.pad(x, ((0, p0), (0, p1)), constant_values=fill)
    return x


@functools.partial(
    jax.jit,
    static_argnames=("relu", "block_m", "block_n", "block_k", "interpret"),
)
def int8_matmul(
    a: jax.Array,  # (M, K) int8 (stored u-128)
    b: jax.Array,  # (K, N) int8 symmetric
    alpha: jax.Array,  # (N,) f32
    beta: jax.Array,  # (N,) f32
    relu: bool = False,
    block_m: int = 256,
    block_n: int = 256,
    block_k: int = 512,
    interpret: bool = None,
) -> jax.Array:
    """f32 output: ``relu?(A@B * alpha + beta)``. Pads to tile multiples
    internally (A pads with 0 rows/cols, B with 0 — zero K-padding adds 0 to
    the accumulator)."""
    m, k = a.shape
    k2, n = b.shape
    assert k == k2, (a.shape, b.shape)
    bm = min(block_m, _round_up(m, 32))
    bn = min(block_n, _round_up(n, 128))
    bk = min(block_k, _round_up(k, 128))
    a_p = _pad2(a, bm, bk)
    b_p = _pad2(b, bk, bn)
    mp, kp = a_p.shape
    _, np_ = b_p.shape
    alpha_p = jnp.pad(alpha.astype(jnp.float32), (0, np_ - n))[None, :]
    beta_p = jnp.pad(beta.astype(jnp.float32), (0, np_ - n))[None, :]
    k_steps = kp // bk

    out = pl.pallas_call(
        functools.partial(_matmul_kernel, relu=relu, k_steps=k_steps),
        grid=(mp // bm, np_ // bn, k_steps),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp + kp * np_ + 4 * mp * np_,
            transcendentals=0,
        ),
        interpret=resolve_interpret(interpret),
    )(a_p, b_p, alpha_p, beta_p)
    return out[:m, :n]


@functools.partial(
    jax.jit,
    static_argnames=("relu", "out_scale", "out_zp", "block_m", "block_n", "block_k", "interpret"),
)
def int8_matmul_requant(
    a: jax.Array,
    b: jax.Array,
    alpha: jax.Array,
    beta: jax.Array,
    out_scale: float,
    out_zp: int,
    relu: bool = True,
    block_m: int = 256,
    block_n: int = 256,
    block_k: int = 512,
    interpret: bool = None,
) -> jax.Array:
    """int8 output (stored u-128): fused requant to the next layer's grid."""
    m, k = a.shape
    _, n = b.shape
    bm = min(block_m, _round_up(m, 32))
    bn = min(block_n, _round_up(n, 128))
    bk = min(block_k, _round_up(k, 128))
    a_p = _pad2(a, bm, bk)
    b_p = _pad2(b, bk, bn)
    mp, kp = a_p.shape
    _, np_ = b_p.shape
    alpha_p = jnp.pad(alpha.astype(jnp.float32), (0, np_ - n))[None, :]
    beta_p = jnp.pad(beta.astype(jnp.float32), (0, np_ - n))[None, :]
    k_steps = kp // bk

    out = pl.pallas_call(
        functools.partial(
            _requant_kernel,
            relu=relu,
            k_steps=k_steps,
            out_scale=float(out_scale),
            out_zp=int(out_zp),
        ),
        grid=(mp // bm, np_ // bn, k_steps),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.int8),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp + kp * np_ + mp * np_,
            transcendentals=0,
        ),
        interpret=resolve_interpret(interpret),
    )(a_p, b_p, alpha_p, beta_p)
    return out[:m, :n]


@functools.partial(jax.jit, static_argnames=("relu",))
def int8_matmul_xla(
    a: jax.Array,  # (M, K) int8 (stored u-128)
    b: jax.Array,  # (K, N) int8 symmetric
    alpha: jax.Array,  # (N,) f32
    beta: jax.Array,  # (N,) f32
    relu: bool = False,
) -> jax.Array:
    """XLA s8 dot + fused f32 epilogue — integer-exact alternative to the
    Pallas kernel (same int32 accumulation); raced by the fc autotuner
    (engine/autotune.py) since small-M classifier-head GEMMs can prefer
    XLA's own tiling over any fixed Pallas block shape."""
    acc = jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    y = acc.astype(jnp.float32) * alpha.astype(jnp.float32)[None, :] + beta.astype(
        jnp.float32
    )[None, :]
    if relu:
        y = jnp.maximum(y, 0.0)
    return y
