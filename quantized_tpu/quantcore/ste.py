"""Straight-through estimators and gradient quantization.

Reference semantics (SURVEY.md section 2 #1-#3):

- ``UniformQuantize.backward`` = identity (straight-through estimator,
  quantize.py ~L92-95): gradients pass through the quantize-dequantize as if
  it were the identity. Min/max/num_bits receive no gradient.
- ``UniformQuantizeGrad`` / ``quantize_grad`` (~L115-150): identity in the
  forward pass; the *incoming cotangent* is quantized in the backward pass
  with stochastic rounding, range taken from the cotangent itself.
- ``conv2d_biprec`` / ``linear_biprec`` (~L155-195): run the op twice with
  ``stop_gradient`` on complementary arguments and recombine
  ``out1 + out2 - stop_grad(out2)`` so the value equals ``out1`` numerically
  while the two backward paths see different gradient precisions (the
  input-gradient path through ``out2`` is gradient-quantized).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from quantized_tpu.quantcore.affine import fake_quant_array


@functools.partial(
    jax.custom_vjp,
    nondiff_argnames=("num_bits", "num_chunks", "stochastic", "enforce_true_zero", "out_half"),
)
def fake_quant(
    x: jax.Array,
    min_value=None,
    max_value=None,
    key=None,
    num_bits: int = 8,
    num_chunks: Optional[int] = None,
    stochastic: bool = False,
    enforce_true_zero: bool = False,
    out_half: bool = False,
) -> jax.Array:
    """Quantize-dequantize with a straight-through gradient (reference
    ``quantize()``, quantize.py ~L100-110)."""
    return fake_quant_array(
        x,
        num_bits=num_bits,
        min_value=min_value,
        max_value=max_value,
        num_chunks=num_chunks,
        stochastic=stochastic,
        enforce_true_zero=enforce_true_zero,
        key=key,
        out_half=out_half,
    )


def _fake_quant_fwd(x, min_value, max_value, key, num_bits, num_chunks, stochastic, enforce_true_zero, out_half):
    y = fake_quant_array(
        x,
        num_bits=num_bits,
        min_value=min_value,
        max_value=max_value,
        num_chunks=num_chunks,
        stochastic=stochastic,
        enforce_true_zero=enforce_true_zero,
        key=key,
        out_half=out_half,
    )
    return y, (min_value, max_value, key)


def _fake_quant_bwd(num_bits, num_chunks, stochastic, enforce_true_zero, out_half, res, g):
    min_value, max_value, key = res
    zero = lambda v: None if v is None else jnp.zeros_like(jnp.asarray(v))
    # Straight-through: dx = g; no gradient to range or key.
    return (g, zero(min_value), zero(max_value), zero(key))


fake_quant.defvjp(_fake_quant_fwd, _fake_quant_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnames=("num_bits", "stochastic"))
def quantize_grad(x: jax.Array, key: jax.Array, num_bits: int = 8, stochastic: bool = True) -> jax.Array:
    """Identity forward; quantizes the incoming cotangent in backward with
    stochastic rounding and range derived from the cotangent (reference
    ``UniformQuantizeGrad``, quantize.py ~L115-150)."""
    return x


def _quantize_grad_fwd(x, key, num_bits, stochastic):
    return x, key


def _quantize_grad_bwd(num_bits, stochastic, key, g):
    gmin = jnp.min(g)
    gmax = jnp.max(g)
    gq = fake_quant_array(
        g,
        num_bits=num_bits,
        min_value=gmin,
        max_value=gmax,
        stochastic=stochastic,
        key=key,
    )
    return (gq, None)


quantize_grad.defvjp(_quantize_grad_fwd, _quantize_grad_bwd)


def biprec(
    op: Callable[[jax.Array, jax.Array, Optional[jax.Array]], jax.Array],
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array],
    key: jax.Array,
    num_bits_grad: int = 8,
) -> jax.Array:
    """Generic bi-precision recombination (reference ``conv2d_biprec`` /
    ``linear_biprec``, quantize.py ~L155-195).

    ``out1`` carries the weight/bias gradient at full precision;
    ``out2`` carries the input gradient through ``quantize_grad``.
    Value: ``out1 + out2 - stop_grad(out2) == out1`` numerically.
    """
    sg = jax.lax.stop_gradient
    out1 = op(sg(x), w, b)
    out2 = op(x, sg(w), None if b is None else sg(b))
    out2 = quantize_grad(out2, key, num_bits=num_bits_grad)
    return out1 + out2 - sg(out2)


def conv_biprec(conv_fn, x, w, b, key, num_bits_grad: int = 8):
    """Bi-precision conv; ``conv_fn(x, w, b)`` performs the convolution."""
    return biprec(conv_fn, x, w, b, key, num_bits_grad)


def linear_biprec(x, w, b, key, num_bits_grad: int = 8):
    """Bi-precision dense layer: ``y = x @ w.T + b`` (reference linear)."""

    def op(xx, ww, bb):
        y = xx @ ww.T
        if bb is not None:
            y = y + bb
        return y

    return biprec(op, x, w, b, key, num_bits_grad)
