"""AlexNet-OWT-BN (reference ``models/alexnet.py``, SURVEY.md #11).

Five conv features with BN+ReLU (+3 maxpools), BN1d classifier with dropout.
Factory: ``alexnet``. The quantized variant lives in ``alexnet_quantized.py``
(the reference fork's quantized-AlexNet path — SURVEY.md marks its presence
[FORK-UNKNOWN]; BASELINE.json config #2 requires quantized AlexNet eval either
way, so we provide it via the same QConv2d/QLinear wrappers).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

from quantized_tpu.models import layers

ALEXNET_REGIME = {
    0: {"optimizer": "SGD", "lr": 1e-2, "weight_decay": 5e-4, "momentum": 0.9},
    10: {"lr": 5e-3},
    15: {"lr": 1e-3, "weight_decay": 0},
    20: {"lr": 5e-4},
    25: {"lr": 1e-4},
}


def _maxpool(x):
    return nnx.max_pool(x, (3, 3), strides=(2, 2))


class AlexNetOWTBN(nnx.Module):
    """Reference class AlexNetOWT_BN. ``kit`` selects float vs quantized
    conv/linear constructors (same LayerKit contract as resnet_common)."""

    def __init__(
        self,
        num_classes: int = 1000,
        conv=layers.Conv2d,
        linear=layers.Linear,
        dropout: float = 0.5,
        *,
        rngs: nnx.Rngs,
    ):
        bn = lambda c: nnx.BatchNorm(c, momentum=0.9, epsilon=1e-5, rngs=rngs)
        self.conv1 = conv(3, 64, 11, stride=4, padding=2, use_bias=False, rngs=rngs)
        self.bn1 = bn(64)
        self.conv2 = conv(64, 192, 5, stride=1, padding=2, use_bias=False, rngs=rngs)
        self.bn2 = bn(192)
        self.conv3 = conv(192, 384, 3, stride=1, padding=1, use_bias=False, rngs=rngs)
        self.bn3 = bn(384)
        self.conv4 = conv(384, 256, 3, stride=1, padding=1, use_bias=False, rngs=rngs)
        self.bn4 = bn(256)
        self.conv5 = conv(256, 256, 3, stride=1, padding=1, use_bias=False, rngs=rngs)
        self.bn5 = bn(256)
        # checkpoint-interop marker: fc1's input is a flattened conv map —
        # the reference flattens NCHW (torch), this model flattens NHWC, so
        # ingest/export must permute fc1's weight columns (C,H,W) <-> (H,W,C)
        self.flatten_linear = ("fc1", (256, 6, 6))
        self.fc1 = linear(256 * 6 * 6, 4096, use_bias=False, rngs=rngs)
        self.bnf1 = bn(4096)
        self.fc2 = linear(4096, 4096, use_bias=False, rngs=rngs)
        self.bnf2 = bn(4096)
        self.fc3 = linear(4096, num_classes, rngs=rngs)
        self.dropout = nnx.Dropout(dropout, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        x = nnx.relu(self.bn1(_maxpool(self.conv1(x))))
        x = nnx.relu(self.bn2(_maxpool(self.conv2(x))))
        x = nnx.relu(self.bn3(self.conv3(x)))
        x = nnx.relu(self.bn4(self.conv4(x)))
        x = nnx.relu(self.bn5(_maxpool(self.conv5(x))))
        x = x.reshape(x.shape[0], -1)  # NHWC 6x6x256 flatten
        x = self.dropout(nnx.relu(self.bnf1(self.fc1(x))))
        x = self.dropout(nnx.relu(self.bnf2(self.fc2(x))))
        return self.fc3(x)


def alexnet(num_classes: int = 1000, rngs: Optional[nnx.Rngs] = None, **_):
    """Reference factory ``alexnet(**model_config)``."""
    model = AlexNetOWTBN(num_classes, rngs=rngs if rngs is not None else nnx.Rngs(0))
    model.regime = ALEXNET_REGIME
    model.input_size = 224
    model.input_transform = "imagenet"
    return model
