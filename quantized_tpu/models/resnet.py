"""Float ResNet baseline (reference ``models/resnet.py``, SURVEY.md #10).

Provides the fp32 top-1 side of the accuracy-delta metric. Factory: ``resnet``.
"""

from __future__ import annotations

import functools

from flax import nnx

from quantized_tpu.models import layers
from quantized_tpu.models.resnet_common import LayerKit, build_resnet


def _bn(c, *, rngs):
    # torch BN defaults: momentum 0.1 (torch convention) == nnx momentum 0.9
    return nnx.BatchNorm(c, momentum=0.9, epsilon=1e-5, rngs=rngs)


FLOAT_KIT = LayerKit(conv=layers.Conv2d, bn=_bn, linear=layers.Linear)


def resnet(**config):
    """Reference factory ``resnet(**model_config)`` (resnet.py ~L200-210)."""
    return build_resnet(FLOAT_KIT, **config)
