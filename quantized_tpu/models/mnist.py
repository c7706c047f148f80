"""Toy MNIST net (reference ``models/mnist.py``, SURVEY.md #12 — presence
[FORK-UNKNOWN]; provided for capability parity). LeNet-style:
conv(1->10,k5) -> pool -> conv(10->20,k5) -> pool -> fc 320->50 -> fc 50->10.
Factory: ``mnist``."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import nnx

from quantized_tpu.models import layers


class MnistNet(nnx.Module):
    def __init__(self, num_classes=10, *, rngs):
        self.conv1 = layers.Conv2d(1, 10, 5, rngs=rngs)
        self.conv2 = layers.Conv2d(10, 20, 5, rngs=rngs)
        # fc1 consumes a flattened conv map: reference flattens NCHW, this
        # model NHWC — ingest/export permute its columns (see torch_loader)
        self.flatten_linear = ("fc1", (20, 4, 4))
        self.fc1 = layers.Linear(320, 50, rngs=rngs)
        self.fc2 = layers.Linear(50, num_classes, rngs=rngs)
        self.dropout = nnx.Dropout(0.5, rngs=rngs)

    def __call__(self, x):
        x = nnx.relu(nnx.max_pool(self.conv1(x), (2, 2), strides=(2, 2)))
        x = nnx.relu(nnx.max_pool(self.conv2(x), (2, 2), strides=(2, 2)))
        x = x.reshape(x.shape[0], -1)
        x = self.dropout(nnx.relu(self.fc1(x)))
        return self.fc2(x)


def mnist(num_classes: int = 10, rngs: Optional[nnx.Rngs] = None, **_):
    model = MnistNet(num_classes, rngs=rngs if rngs is not None else nnx.Rngs(0))
    model.regime = {0: {"optimizer": "SGD", "lr": 1e-2, "momentum": 0.5}}
    model.input_size = 28
    model.input_transform = "mnist"
    return model
