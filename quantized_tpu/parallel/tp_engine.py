"""Explicit-collective TP execution for the integer engine (shard_map).

GSPMD remains the default whole-model path (parallel/sharding.py rules);
this module is the hand-placed alternative (SURVEY.md section 7 step 5,
"explicit reduce_scatter/all_gather placement") selectable with the CLI's
``--tp-explicit``:

- ``tp_int8_conv``: conv weights OUT-CHANNEL-sharded over 'model'; each
  device runs the s8 conv + its epilogue shard, one tiled ``all_gather``
  reassembles channels. The collective moves int8 (requantized) bytes, not
  f32 — 4x less ICI traffic than gathering the f32 conv output.
- ``tp_int8_linear_rs``: fc CONTRACTION-sharded; devices hold x[:, K/d] and
  w[K/d, :], compute int32 partial GEMMs, and one ``psum_scatter`` leaves
  each device a balanced output shard (the reduce-scatter form XLA overlaps
  with subsequent compute). The int32 partials must be reduced BEFORE the
  f32 epilogue, so alpha/beta apply after the collective on each shard.

Both are integer-exact vs the single-device engine (tests assert equality
AND the expected collective op counts in the lowered HLO).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from quantized_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def tp_int8_conv(
    mesh: Mesh,
    x_q: jax.Array,  # (N, H, W, Cin) int8 stored, replicated over 'model'
    w_q: jax.Array,  # (Kh, Kw, Cin, Cout) int8
    alpha: jax.Array,
    beta: jax.Array,
    stride: Tuple[int, int] = (1, 1),
    padding: Tuple[int, int] = (0, 0),
    stored_zp: int = -128,
    relu: bool = False,
    out_requant: Optional[Tuple[float, int]] = None,
) -> jax.Array:
    """Out-channel TP conv with an explicit int8 all_gather epilogue."""
    from quantized_tpu.ops.int8_conv import int8_conv_xla

    def kernel(xb, wb, ab, bb):
        y = int8_conv_xla(xb, wb, ab, bb, stride, padding, stored_zp,
                          relu=relu, out_requant=out_requant)
        return jax.lax.all_gather(y, MODEL_AXIS, axis=3, tiled=True)

    return shard_map(
        kernel, mesh=mesh,
        in_specs=(P(DATA_AXIS, None, None, None),
                  P(None, None, None, MODEL_AXIS),
                  P(MODEL_AXIS), P(MODEL_AXIS)),
        out_specs=P(DATA_AXIS, None, None, None),
        check_vma=False,
    )(x_q, w_q, alpha, beta)


def tp_int8_linear_rs(
    mesh: Mesh,
    x_q: jax.Array,  # (M, K) int8 stored, K sharded over 'model'
    w_kn: jax.Array,  # (K, N) int8
    alpha: jax.Array,
    beta: jax.Array,
    relu: bool = False,
) -> jax.Array:
    """Contraction-sharded int8 GEMM; psum_scatter reduces the int32
    partials, then each device applies its f32 epilogue shard. Output is
    (M, N) with columns sharded over 'model' (batch over 'data')."""

    def kernel(xb, wb, ab, bb):
        acc = jax.lax.dot_general(
            xb, wb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        acc = jax.lax.psum_scatter(acc, MODEL_AXIS, scatter_dimension=1, tiled=True)
        y = acc.astype(jnp.float32) * ab + bb
        if relu:
            y = jnp.maximum(y, 0.0)
        return y

    return shard_map(
        kernel, mesh=mesh,
        in_specs=(P(DATA_AXIS, MODEL_AXIS), P(MODEL_AXIS, None),
                  P(MODEL_AXIS), P(MODEL_AXIS)),
        out_specs=P(DATA_AXIS, MODEL_AXIS),
        check_vma=False,
    )(x_q, w_kn, alpha, beta)


class ExplicitTPFc:
    """Drop-in replacement for an engine model's ``fc`` attribute that routes
    the classifier head through the explicit reduce-scatter TP form
    (CLI ``--tp-explicit``). Plain object (the mesh is not pytree state)."""

    def __init__(self, fc, mesh: Mesh):
        self.fc = fc
        self.mesh = mesh

    def __call__(self, h: jax.Array) -> jax.Array:
        return tp_explicit_head(self.mesh, self.fc, h)


def tp_explicit_head(mesh: Mesh, fc, h: jax.Array) -> jax.Array:
    """Run an ``IntLinear`` classifier head through the explicit
    reduce-scatter TP form (f32 input -> f32 logits, gathered full)."""
    from quantized_tpu.engine.int_layers import quantize_input_stored

    x_q = quantize_input_stored(h, fc.act_scale, fc.act_zero_point)
    w = fc.w_q.get_value()
    if fc.int4:
        from quantized_tpu.ops.int4 import unpack_int4

        w = unpack_int4(w)
    k, n = w.shape
    d = mesh.shape[MODEL_AXIS]
    pad_n = (-n) % d
    alpha = jnp.pad(fc.alpha.get_value(), (0, pad_n))
    beta = jnp.pad(fc.beta.get_value(), (0, pad_n))
    pad_k = (-k) % d
    if pad_n or pad_k:
        w = jnp.pad(w, ((0, pad_k), (0, pad_n)))
    if pad_k:
        x_q = jnp.pad(x_q, ((0, 0), (0, pad_k)))
    y = tp_int8_linear_rs(mesh, x_q, w, alpha, beta, relu=fc.relu)
    return y[:, :n]
