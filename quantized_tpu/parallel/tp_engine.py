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
from flax import nnx
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
    round_s16: bool = False,
) -> jax.Array:
    """Out-channel TP conv with an explicit int8 all_gather epilogue.
    ``round_s16`` gathers fine-grained int16 (downsample residual legs) —
    half the ICI bytes of the f32 form."""
    from quantized_tpu.ops.int8_conv import int8_conv_xla

    def kernel(xb, wb, ab, bb):
        y = int8_conv_xla(xb, wb, ab, bb, stride, padding, stored_zp,
                          relu=relu, out_requant=out_requant,
                          round_s16=round_s16)
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


class ExplicitTPConv(nnx.Module):
    """Routes one ``IntConv2d`` through the explicit all-gather TP form
    (out-channel sharding over 'model'). Supports the three epilogue call
    forms the resident blocks use (relu, ``out_requant``, ``out_prescale``)
    by folding the prescale into alpha/beta before the sharded conv — the
    same algebra as ``IntConv2d.run_q``. The inner conv stays an nnx
    submodule so its weights remain engine state (shardable, not jit
    constants); the mesh is static graphdef metadata."""

    def __init__(self, conv, mesh: Mesh):
        self.conv = conv
        self.mesh = mesh

    @property
    def grid(self):
        return self.conv.grid

    @property
    def stride(self):
        return self.conv.stride

    def __call__(self, x: jax.Array) -> jax.Array:
        from quantized_tpu.engine.int_layers import quantize_input_stored

        x_q = quantize_input_stored(x, self.conv.act_scale, self.conv.act_zero_point)
        return self.run_q(x_q, relu=self.conv.relu)

    def run_q(self, x_q, relu=None, out_requant=None, out_prescale=None,
              prescale_s16=False):
        from quantized_tpu.engine.int_layers import S16_FINE

        conv = self.conv
        relu = conv.relu if relu is None else relu
        alpha, beta = conv.alpha.get_value(), conv.beta.get_value()
        round_s16 = False
        if out_prescale is not None:
            assert out_requant is None and not relu
            scale, shift = out_prescale
            inv = jnp.float32(1.0 / scale)
            if prescale_s16:
                # same fine-grained int16 leg as the single-device engine
                # (bit-identical epilogue math), gathered as s16 — half the
                # ICI bytes of the f32 form
                inv = inv * jnp.float32(S16_FINE)
                shift = shift * S16_FINE
                round_s16 = True
            alpha = alpha * inv
            beta = beta * inv + jnp.float32(shift)
        w = conv.weights()
        d = self.mesh.shape[MODEL_AXIS]
        cout = w.shape[-1]
        assert cout % d == 0, f"Cout {cout} not divisible by model axis {d}"
        return tp_int8_conv(
            self.mesh, x_q, w, alpha, beta, conv.stride, conv.padding,
            conv.stored_zp, relu=relu, out_requant=out_requant,
            round_s16=round_s16,
        )


def apply_explicit_tp(model, mesh: Mesh, conv_stage: str = "last") -> int:
    """Wire the explicit-collective TP path into a resident engine model:
    the fc head (reduce-scatter form) plus every conv of one stage
    (all-gather form; default: the last stage — smallest activations,
    biggest channels, so the int8 gather is cheapest relative to compute).
    Returns the number of convs wrapped. CLI: ``--tp-explicit``."""
    from quantized_tpu.engine.int_layers import IntConv2d, IntLinear

    wrapped = 0
    num_stages = getattr(model, "num_stages", 0)
    stage = None
    if num_stages and conv_stage is not None:
        idx = num_stages if conv_stage == "last" else int(conv_stage)
        stage = getattr(model, f"layer{idx}", None)
    if stage is not None and hasattr(stage, "num_blocks"):
        for j in range(stage.num_blocks):
            blk = getattr(stage, str(j))
            for name in ("conv1", "conv2", "conv3", "downsample"):
                conv = getattr(blk, name, None)
                if isinstance(conv, IntConv2d) and conv.groups == 1:
                    setattr(blk, name, ExplicitTPConv(conv, mesh))
                    wrapped += 1
    if isinstance(getattr(model, "fc", None), IntLinear):
        model.fc = ExplicitTPFc(model.fc, mesh)
    return wrapped


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
