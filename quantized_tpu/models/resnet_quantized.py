"""Quantized ResNet, RangeBN flavor (reference ``models/resnet_quantized.py``,
SURVEY.md #8). Module-level bit-width constants match the reference (~L10-15).
Factory: ``resnet_quantized``."""

from __future__ import annotations

import functools

from quantized_tpu.models import layers
from quantized_tpu.models.resnet_common import LayerKit, build_resnet

NUM_BITS = 8
NUM_BITS_WEIGHT = 8
NUM_BITS_GRAD = 8
BIPRECISION = True


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
        biprecision=BIPRECISION,
        rngs=rngs,
    )


def _qlinear(cin, cout, *, rngs):
    return layers.QLinear(
        cin,
        cout,
        num_bits=NUM_BITS,
        num_bits_weight=NUM_BITS_WEIGHT,
        num_bits_grad=NUM_BITS_GRAD,
        biprecision=BIPRECISION,
        rngs=rngs,
    )


def _rangebn(c, *, rngs):
    return layers.RangeBN(c, num_bits=NUM_BITS, num_bits_grad=NUM_BITS_GRAD, rngs=rngs)


RANGEBN_KIT = LayerKit(conv=_qconv, bn=_rangebn, linear=_qlinear)


def resnet_quantized(**config):
    """Reference factory ``resnet_quantized(**model_config)``."""
    return build_resnet(RANGEBN_KIT, **config)
