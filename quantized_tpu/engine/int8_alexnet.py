"""Int8-resident AlexNet-OWT-BN execution (BASELINE config #2's model,
reference models/alexnet.py — SURVEY.md #11).

Activations stay stored-int8 from the input quantize to the classifier head,
like Int8ResNet (int8_resident.py). One structural subtlety is specific to
this architecture: the reference order is ``conv -> maxpool -> BN -> ReLU``
(pool BEFORE the BN that gets folded into the conv epilogue). Folding moves
the per-channel affine ``bn`` to the other side of the pool, which is exact
iff the composed per-channel map ``requant ∘ relu ∘ bn`` is monotone
NON-DECREASING — true exactly when the BN factor gamma/sqrt(var+eps) >= 0.
(Note: the epilogue's own alpha is always positive; the factor's sign moves
into the quantized weights, so the mask is read off the BN module —
``convert.bn_factor``.) For negative-factor channels the composition is
non-increasing, so ``h(max(x)) == min(h(x))``: those channels need a
MIN-pool of the epilogue output instead. The builder records that channel
mask per pooled conv at conversion time; when no negative channels exist
(the common trained-network case) the fast single-maxpool path compiles
with no select.

(The f32-boundary exact engine, convert_to_int, folds BN across the pool
unconditionally and is thus exact only for non-negative factors — this
module is the semantically complete path.)
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from quantized_tpu.engine.convert import _convert_conv, _convert_linear
from quantized_tpu.engine.int_layers import IntConv2d, IntLinear, quantize_input_stored
from quantized_tpu.models.layers import QConv2d, QLinear

Grid = Tuple[float, int]


def pool_3x3_s2_valid_int8(x_q: jax.Array, reduce: str = "max") -> jax.Array:
    """3x3/stride-2 VALID pool on stored int8 (AlexNet geometry: 55->27,
    27->13, 13->6). ``reduce='min'`` is the negative-alpha dual."""
    if reduce == "max":
        init, fn = jnp.int8(-128), jax.lax.max
    else:
        init, fn = jnp.int8(127), jax.lax.min
    return jax.lax.reduce_window(
        x_q, init, fn,
        window_dimensions=(1, 3, 3, 1), window_strides=(1, 2, 2, 1),
        padding="VALID",
    )


def _pool_dual(x_q: jax.Array, neg_channels: Optional[jax.Array]) -> jax.Array:
    """Per-channel max/min pool: channels whose folded BN scale is negative
    take the min-pool (see module docstring). ``neg_channels=None`` (no
    negative scales, decided statically at build time) compiles to a single
    reduce_window."""
    pooled = pool_3x3_s2_valid_int8(x_q, "max")
    if neg_channels is None:
        return pooled
    return jnp.where(neg_channels, pool_3x3_s2_valid_int8(x_q, "min"), pooled)


class Int8AlexNet(nnx.Module):
    """Int8-resident AlexNet-OWT-BN. Forward takes f32 NHWC images and
    returns f32 logits; everything between the input quantize and fc3 flows
    as stored int8. Built via :func:`build_int8_alexnet`."""

    def __init__(self, convs: List[IntConv2d], fcs: List[IntLinear],
                 requant_grids: List[Grid], neg_masks: List[Optional[jax.Array]]):
        assert len(convs) == 5 and len(fcs) == 3 and len(requant_grids) == 7
        self.conv1, self.conv2, self.conv3, self.conv4, self.conv5 = convs
        self.fc1, self.fc2, self.fc3 = fcs
        # grids[i] = the NEXT consumer's observer grid for each requant point
        self.requant_grids = requant_grids
        self.neg1, self.neg2, self.neg5 = (
            nnx.Variable(m) if m is not None else None for m in neg_masks
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        return self._forward_q(quantize_input_stored(x, *self.conv1.grid))

    def run_u8(self, u8: jax.Array, mean=None, std=None) -> jax.Array:
        """Raw uint8 NHWC ingest with normalize folded into the quantize
        (same contract as Int8ResNet.run_u8)."""
        from quantized_tpu.engine.int8_resident import u8_to_stored

        return self._forward_q(u8_to_stored(u8, self.conv1.grid, mean, std))

    def _forward_q(self, x_q: jax.Array) -> jax.Array:
        g = self.requant_grids
        h = self.conv1.run_q(x_q, relu=True, out_requant=g[0])
        h = _pool_dual(h, None if self.neg1 is None else self.neg1.get_value())
        h = self.conv2.run_q(h, relu=True, out_requant=g[1])
        h = _pool_dual(h, None if self.neg2 is None else self.neg2.get_value())
        h = self.conv3.run_q(h, relu=True, out_requant=g[2])
        h = self.conv4.run_q(h, relu=True, out_requant=g[3])
        h = self.conv5.run_q(h, relu=True, out_requant=g[4])
        h = _pool_dual(h, None if self.neg5 is None else self.neg5.get_value())
        h = h.reshape(h.shape[0], -1)  # NHWC 6x6x256 flatten, int8
        h = self.fc1.run_q(h, relu=True, out_requant=g[5])
        h = self.fc2.run_q(h, relu=True, out_requant=g[6])
        return self.fc3.run_q(h)  # f32 logits


def _grid_of(q) -> Grid:
    from quantized_tpu.engine.convert import observer_grid

    return observer_grid(q)


def build_int8_alexnet(model: nnx.Module, weight_bits: int = 8,
                       backend: str = "xla") -> Int8AlexNet:
    """Convert a calibrated quantized AlexNet (``alexnet_quantized`` with
    frozen observers, the reference eval artifact) to :class:`Int8AlexNet`."""
    conv_bns = [("conv1", "bn1"), ("conv2", "bn2"), ("conv3", "bn3"),
                ("conv4", "bn4"), ("conv5", "bn5")]
    convs: List[IntConv2d] = []
    for cn, bn in conv_bns:
        conv = getattr(model, cn)
        if not isinstance(conv, QConv2d):
            raise TypeError(f"{cn} is {type(conv).__name__}, expected QConv2d "
                            "(build_int8_alexnet needs the quantized flavor)")
        convs.append(_convert_conv(conv, getattr(model, bn), weight_bits, backend,
                                   int4_pack=weight_bits == 4))

    for fn_ in ("fc1", "fc2", "fc3"):
        if not isinstance(getattr(model, fn_), QLinear):
            raise TypeError(f"{fn_} must be QLinear")
    fcs = [
        # fc weights are 54.6 MB of AlexNet's 61 MB — the int4 native-S4 GEMM
        # halves their HBM read (2.1x at B<=8, bench/int4_weightbound.py)
        _convert_linear(model.fc1, model.bnf1, weight_bits, int4_pack=weight_bits == 4),
        _convert_linear(model.fc2, model.bnf2, weight_bits, int4_pack=weight_bits == 4),
        _convert_linear(model.fc3, None, weight_bits, int4_pack=weight_bits == 4),
    ]

    # requant targets: each layer emits int8 on its next consumer's grid
    grids = [
        _grid_of(model.conv2), _grid_of(model.conv3), _grid_of(model.conv4),
        _grid_of(model.conv5), _grid_of(model.fc1), _grid_of(model.fc2),
        _grid_of(model.fc3),
    ]

    # negative BN-factor channel masks for the pooled convs (1/2/5). The
    # sign of the folded per-channel factor gamma/sqrt(var+eps) lives in the
    # quantized WEIGHTS after folding (the epilogue alpha is always > 0), so
    # the mask must be read off the BN module itself. Staticized to None
    # when empty so the fast path compiles with no select.
    def neg_mask(bn) -> Optional[jax.Array]:
        from quantized_tpu.engine.convert import bn_factor

        factor = bn_factor(bn)
        return jnp.asarray(factor < 0) if (factor < 0).any() else None

    neg_masks = [neg_mask(model.bn1), neg_mask(model.bn2), neg_mask(model.bn5)]
    eng = Int8AlexNet(convs, fcs, grids, neg_masks)
    eng.input_size = getattr(model, "input_size", 224)
    return eng
