"""Quantized ResNet, float-BN flavor (reference
``models/resnet_quantized_float_bn.py``, SURVEY.md #9): QConv2d/QLinear around
standard float BatchNorm. This is the primary checkpoint target for the
true-integer engine — standard BN folds exactly into conv weights.
Factory: ``resnet_quantized_float_bn``."""

from __future__ import annotations

from flax import nnx

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


def _bn(c, *, rngs):
    return nnx.BatchNorm(c, momentum=0.9, epsilon=1e-5, rngs=rngs)


FLOATBN_KIT = LayerKit(conv=_qconv, bn=_bn, linear=_qlinear)


def resnet_quantized_float_bn(**config):
    """Reference factory ``resnet_quantized_float_bn(**model_config)``."""
    return build_resnet(FLOATBN_KIT, **config)
