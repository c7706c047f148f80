"""Quantized AlexNet-OWT-BN (BASELINE.json config #2: "alexnet int8 quantized
eval"). Same skeleton as alexnet.py with QConv2d/QLinear around float BN —
the reference fork's quantized-AlexNet capability (presence upstream is
[FORK-UNKNOWN], SURVEY.md #11; built here via the standard wrappers either
way). Factory: ``alexnet_quantized``."""

from __future__ import annotations

import functools
from typing import Optional

from flax import nnx

from quantized_tpu.models import layers
from quantized_tpu.models.alexnet import ALEXNET_REGIME, AlexNetOWTBN

NUM_BITS = 8
NUM_BITS_WEIGHT = 8
NUM_BITS_GRAD = 8


def _qconv(cin, cout, k, stride=1, padding=0, use_bias=True, *, rngs):
    return layers.QConv2d(
        cin,
        cout,
        k,
        stride=stride,
        padding=padding,
        use_bias=use_bias,
        num_bits=NUM_BITS,
        num_bits_weight=NUM_BITS_WEIGHT,
        num_bits_grad=NUM_BITS_GRAD,
        rngs=rngs,
    )


def _qlinear(cin, cout, use_bias=True, *, rngs):
    return layers.QLinear(
        cin,
        cout,
        use_bias=use_bias,
        num_bits=NUM_BITS,
        num_bits_weight=NUM_BITS_WEIGHT,
        num_bits_grad=NUM_BITS_GRAD,
        rngs=rngs,
    )


def alexnet_quantized(num_classes: int = 1000, rngs: Optional[nnx.Rngs] = None, **_):
    model = AlexNetOWTBN(
        num_classes,
        conv=_qconv,
        linear=_qlinear,
        rngs=rngs if rngs is not None else nnx.Rngs(0),
    )
    model.regime = ALEXNET_REGIME
    model.input_size = 224
    model.input_transform = "imagenet"
    return model
