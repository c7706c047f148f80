"""MobileNet-v1 with optional quantized convs (reference ``models/mobilenet.py``,
SURVEY.md #12 — presence [FORK-UNKNOWN]; provided for capability parity).

Standard v1: 3x3/32 s2 stem then 13 depthwise-separable blocks
(dw 3x3 + pw 1x1, BN+ReLU after each), global avgpool, fc 1024 -> classes.
Factories: ``mobilenet`` (float), ``mobilenet_quantized`` (QConv2d/QLinear).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

from quantized_tpu.models import layers

# (out_channels, stride) per separable block
_V1_CONFIG = [
    (64, 1),
    (128, 2),
    (128, 1),
    (256, 2),
    (256, 1),
    (512, 2),
    (512, 1),
    (512, 1),
    (512, 1),
    (512, 1),
    (512, 1),
    (1024, 2),
    (1024, 1),
]

MOBILENET_REGIME = {
    0: {"optimizer": "SGD", "lr": 1e-1, "weight_decay": 1e-4, "momentum": 0.9},
    30: {"lr": 1e-2},
    60: {"lr": 1e-3},
    90: {"lr": 1e-4},
}


class _SeparableBlock(nnx.Module):
    def __init__(self, conv, cin, cout, stride, *, rngs):
        self.dw = conv(cin, cin, 3, stride=stride, padding=1, groups=cin, use_bias=False, rngs=rngs)
        self.bn1 = nnx.BatchNorm(cin, momentum=0.9, rngs=rngs)
        self.pw = conv(cin, cout, 1, stride=1, padding=0, use_bias=False, rngs=rngs)
        self.bn2 = nnx.BatchNorm(cout, momentum=0.9, rngs=rngs)

    def __call__(self, x):
        x = nnx.relu(self.bn1(self.dw(x)))
        return nnx.relu(self.bn2(self.pw(x)))


class MobileNetV1(nnx.Module):
    def __init__(self, num_classes=1000, width_mult=1.0, conv=None, linear=None, *, rngs):
        conv = conv or layers.Conv2d
        linear = linear or layers.Linear
        c = int(32 * width_mult)
        self.conv1 = conv(3, c, 3, stride=2, padding=1, use_bias=False, rngs=rngs)
        self.bn1 = nnx.BatchNorm(c, momentum=0.9, rngs=rngs)
        blocks = []
        for cout_base, stride in _V1_CONFIG:
            cout = int(cout_base * width_mult)
            blocks.append(_SeparableBlock(conv, c, cout, stride, rngs=rngs))
            c = cout
        for i, b in enumerate(blocks):
            setattr(self, f"block{i}", b)
        self.num_blocks = len(blocks)
        self.fc = linear(c, num_classes, rngs=rngs)

    def __call__(self, x):
        x = nnx.relu(self.bn1(self.conv1(x)))
        for i in range(self.num_blocks):
            x = getattr(self, f"block{i}")(x)
        x = jnp.mean(x, axis=(1, 2))
        return self.fc(x)


def _finish(model):
    model.regime = MOBILENET_REGIME
    model.input_size = 224
    model.input_transform = "imagenet"
    return model


def mobilenet(num_classes: int = 1000, width_mult: float = 1.0, rngs: Optional[nnx.Rngs] = None, **_):
    return _finish(MobileNetV1(num_classes, width_mult, rngs=rngs if rngs is not None else nnx.Rngs(0)))


def mobilenet_quantized(
    num_classes: int = 1000,
    width_mult: float = 1.0,
    num_bits: int = 8,
    rngs: Optional[nnx.Rngs] = None,
    **_,
):
    qconv = functools.partial(layers.QConv2d, num_bits=num_bits)
    qlinear = functools.partial(layers.QLinear, num_bits=num_bits)
    return _finish(
        MobileNetV1(
            num_classes,
            width_mult,
            conv=qconv,
            linear=qlinear,
            rngs=rngs if rngs is not None else nnx.Rngs(0),
        )
    )
