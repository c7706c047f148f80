"""Int8-resident MobileNet-v1 execution (reference models/mobilenet.py,
SURVEY.md #12).

The architecture is a pure conv->BN->ReLU chain (stem + 13 depthwise-
separable blocks), so the resident form is the simple one: every conv's
epilogue folds its BN, applies ReLU, and requantizes onto the next conv's
frozen observer grid; activations stay stored-int8 from the input quantize
to the global avgpool (which, like Int8ResNet, consumes the last conv's f32
output — mean does not commute with rounding, so the final layer emits f32).
Depthwise convs run through the same IntConv2d with ``groups=cin`` (XLA's
grouped s8 conv path)."""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from quantized_tpu.engine.convert import _convert_conv, _convert_linear
from quantized_tpu.engine.int_layers import IntConv2d, IntLinear, quantize_input_stored
from quantized_tpu.models.layers import QConv2d, QLinear

Grid = Tuple[float, int]


class Int8MobileNet(nnx.Module):
    """Int8-resident MobileNet-v1: f32 NHWC images in, f32 logits out,
    stored-int8 activations throughout. Built via :func:`build_int8_mobilenet`."""

    def __init__(self, convs: List[IntConv2d], grids: List[Optional[Grid]],
                 fc: IntLinear):
        assert len(grids) == len(convs)
        for i, c in enumerate(convs):
            setattr(self, f"conv{i}", c)
        self.num_convs = len(convs)
        self.requant_grids = grids  # grids[i] = conv i's output grid (None -> f32)
        self.input_grid = convs[0].grid  # survives fuse_mobilenet_blocks
        self.fc = fc

    def __call__(self, x: jax.Array) -> jax.Array:
        return self._forward_q(quantize_input_stored(x, *self.input_grid))

    def run_u8(self, u8: jax.Array, mean=None, std=None) -> jax.Array:
        from quantized_tpu.engine.int8_resident import u8_to_stored

        return self._forward_q(u8_to_stored(u8, self.input_grid, mean, std))

    def _forward_q(self, x_q: jax.Array) -> jax.Array:
        h = x_q
        if getattr(self, "fused_stages", False):
            # fused plan (engine/fused.py fuse_mobilenet_blocks): each stage
            # is a FusedInt8DwPw pair or a _ConvStage wrapper
            for j in range(self.num_fused_stages):
                h = getattr(self, f"stage{j}")(h)
        else:
            for i in range(self.num_convs):
                h = getattr(self, f"conv{i}").run_q(
                    h, relu=True, out_requant=self.requant_grids[i]
                )
        h = jnp.mean(h, axis=(1, 2))  # f32 from the last conv
        return self.fc(h)


def _grid_of(q) -> Grid:
    from quantized_tpu.engine.convert import observer_grid

    return observer_grid(q)


def build_int8_mobilenet(model: nnx.Module, weight_bits: int = 8,
                         backend: str = "xla") -> Int8MobileNet:
    """Convert a calibrated ``mobilenet_quantized`` (frozen observers) to
    :class:`Int8MobileNet`."""
    seq = [(model.conv1, model.bn1)]
    for i in range(model.num_blocks):
        b = getattr(model, f"block{i}")
        seq += [(b.dw, b.bn1), (b.pw, b.bn2)]

    convs: List[IntConv2d] = []
    for conv, bn in seq:
        if not isinstance(conv, QConv2d):
            raise TypeError(f"{type(conv).__name__}: build_int8_mobilenet needs "
                            "the quantized flavor (mobilenet_quantized)")
        convs.append(_convert_conv(conv, bn, weight_bits, backend,
                                   int4_pack=weight_bits == 4))
    # conv i requants onto conv i+1's observer grid; the last conv emits f32
    grids: List[Optional[Grid]] = [_grid_of(c) for c, _ in seq[1:]] + [None]

    if not isinstance(model.fc, QLinear):
        raise TypeError("model.fc must be QLinear")
    fc = _convert_linear(model.fc, None, weight_bits, int4_pack=False)
    eng = Int8MobileNet(convs, grids, fc)
    eng.input_size = getattr(model, "input_size", 224)
    return eng
