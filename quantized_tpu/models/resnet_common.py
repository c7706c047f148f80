"""Shared ResNet skeleton for the float / RangeBN-quantized / float-BN-quantized
flavors.

Reference: ``models/resnet.py``, ``models/resnet_quantized.py``,
``models/resnet_quantized_float_bn.py`` (SURVEY.md section 2 #8-#10) — three
near-identical ~230-LoC files differing only in which conv/linear/BN classes
they instantiate. Here the skeleton is written once and parameterized by a
``LayerKit`` of constructors; each flavor module provides its kit and the
reference's factory names.

Geometries (reference parity):
- ImageNet: 7x7/64 s2 stem + maxpool 3x3 s2, 4 stages, avgpool 7, fc.
  Depths 18/34 (BasicBlock) and 50/101/152 (Bottleneck) with layer configs
  [2,2,2,2] / [3,4,6,3] / [3,4,6,3] / [3,4,23,3] / [3,8,36,3].
- CIFAR-10: 3x3/16 stem, 3 stages of n=(depth-2)/6 blocks x {16,32,64},
  avgpool 8, fc 64 -> 10.

Layout is NHWC (TPU-native); weights HWIO.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import nnx


@dataclasses.dataclass(frozen=True)
class LayerKit:
    """Constructors used by the skeleton. Signatures:
    conv(cin, cout, kernel_size, stride, padding, use_bias, rngs=...),
    bn(c, rngs=...), linear(cin, cout, rngs=...)."""

    conv: Callable[..., nnx.Module]
    bn: Callable[..., nnx.Module]
    linear: Callable[..., nnx.Module]


def _conv3x3(kit: LayerKit, cin: int, cout: int, stride: int, rngs: nnx.Rngs) -> nnx.Module:
    return kit.conv(cin, cout, 3, stride=stride, padding=1, use_bias=False, rngs=rngs)


class Downsample(nnx.Module):
    """1x1 strided conv + BN on the shortcut path."""

    def __init__(self, kit: LayerKit, cin: int, cout: int, stride: int, *, rngs: nnx.Rngs):
        self.conv = kit.conv(cin, cout, 1, stride=stride, padding=0, use_bias=False, rngs=rngs)
        self.bn = kit.bn(cout, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.bn(self.conv(x))


class BasicBlock(nnx.Module):
    expansion = 1

    def __init__(
        self,
        kit: LayerKit,
        inplanes: int,
        planes: int,
        stride: int = 1,
        downsample: Optional[Downsample] = None,
        *,
        rngs: nnx.Rngs,
    ):
        self.conv1 = _conv3x3(kit, inplanes, planes, stride, rngs)
        self.bn1 = kit.bn(planes, rngs=rngs)
        self.conv2 = _conv3x3(kit, planes, planes, 1, rngs)
        self.bn2 = kit.bn(planes, rngs=rngs)
        self.downsample = downsample

    def __call__(self, x: jax.Array) -> jax.Array:
        residual = x if self.downsample is None else self.downsample(x)
        out = nnx.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return nnx.relu(out + residual)


class Bottleneck(nnx.Module):
    expansion = 4

    def __init__(
        self,
        kit: LayerKit,
        inplanes: int,
        planes: int,
        stride: int = 1,
        downsample: Optional[Downsample] = None,
        *,
        rngs: nnx.Rngs,
    ):
        self.conv1 = kit.conv(inplanes, planes, 1, stride=1, padding=0, use_bias=False, rngs=rngs)
        self.bn1 = kit.bn(planes, rngs=rngs)
        self.conv2 = _conv3x3(kit, planes, planes, stride, rngs)
        self.bn2 = kit.bn(planes, rngs=rngs)
        self.conv3 = kit.conv(planes, planes * 4, 1, stride=1, padding=0, use_bias=False, rngs=rngs)
        self.bn3 = kit.bn(planes * 4, rngs=rngs)
        self.downsample = downsample

    def __call__(self, x: jax.Array) -> jax.Array:
        residual = x if self.downsample is None else self.downsample(x)
        out = nnx.relu(self.bn1(self.conv1(x)))
        out = nnx.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return nnx.relu(out + residual)


class _Stage(nnx.Module):
    def __init__(self, blocks: List[nnx.Module]):
        for i, b in enumerate(blocks):
            setattr(self, str(i), b)
        self.num_blocks = len(blocks)

    def __call__(self, x: jax.Array) -> jax.Array:
        for i in range(self.num_blocks):
            x = getattr(self, str(i))(x)
        return x


def _make_stage(
    kit: LayerKit,
    block_cls,
    inplanes: int,
    planes: int,
    num_blocks: int,
    stride: int,
    rngs: nnx.Rngs,
):
    downsample = None
    if stride != 1 or inplanes != planes * block_cls.expansion:
        downsample = Downsample(kit, inplanes, planes * block_cls.expansion, stride, rngs=rngs)
    blocks = [block_cls(kit, inplanes, planes, stride, downsample, rngs=rngs)]
    inplanes = planes * block_cls.expansion
    for _ in range(1, num_blocks):
        blocks.append(block_cls(kit, inplanes, planes, rngs=rngs))
    return _Stage(blocks), inplanes


class ResNetImageNet(nnx.Module):
    """ImageNet geometry (reference ResNet_imagenet, resnet*.py ~L143-185)."""

    def __init__(
        self,
        kit: LayerKit,
        block_cls,
        layers: Sequence[int],
        num_classes: int = 1000,
        *,
        rngs: nnx.Rngs,
    ):
        self.conv1 = kit.conv(3, 64, 7, stride=2, padding=3, use_bias=False, rngs=rngs)
        self.bn1 = kit.bn(64, rngs=rngs)
        inplanes = 64
        self.layer1, inplanes = _make_stage(kit, block_cls, inplanes, 64, layers[0], 1, rngs)
        self.layer2, inplanes = _make_stage(kit, block_cls, inplanes, 128, layers[1], 2, rngs)
        self.layer3, inplanes = _make_stage(kit, block_cls, inplanes, 256, layers[2], 2, rngs)
        self.layer4, inplanes = _make_stage(kit, block_cls, inplanes, 512, layers[3], 2, rngs)
        self.fc = kit.linear(512 * block_cls.expansion, num_classes, rngs=rngs)
        self.num_features = 512 * block_cls.expansion

    def __call__(self, x: jax.Array) -> jax.Array:
        x = nnx.relu(self.bn1(self.conv1(x)))
        x = nnx.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        x = self.layer4(x)
        x = jnp.mean(x, axis=(1, 2))  # global avgpool (7x7 at 224 input)
        return self.fc(x)


class ResNetCifar(nnx.Module):
    """CIFAR-10 geometry (reference ResNet_cifar10, resnet*.py ~L188-215)."""

    def __init__(self, kit: LayerKit, depth: int = 18, num_classes: int = 10, *, rngs: nnx.Rngs):
        # reference: n = (depth - 2) // 6 BasicBlocks per stage
        n = (depth - 2) // 6
        self.conv1 = kit.conv(3, 16, 3, stride=1, padding=1, use_bias=False, rngs=rngs)
        self.bn1 = kit.bn(16, rngs=rngs)
        inplanes = 16
        self.layer1, inplanes = _make_stage(kit, BasicBlock, inplanes, 16, n, 1, rngs)
        self.layer2, inplanes = _make_stage(kit, BasicBlock, inplanes, 32, n, 2, rngs)
        self.layer3, inplanes = _make_stage(kit, BasicBlock, inplanes, 64, n, 2, rngs)
        self.fc = kit.linear(64, num_classes, rngs=rngs)
        self.num_features = 64

    def __call__(self, x: jax.Array) -> jax.Array:
        x = nnx.relu(self.bn1(self.conv1(x)))
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        x = jnp.mean(x, axis=(1, 2))  # global avgpool (8x8 at 32 input)
        return self.fc(x)


IMAGENET_DEPTH_CONFIGS = {
    18: (BasicBlock, [2, 2, 2, 2]),
    34: (BasicBlock, [3, 4, 6, 3]),
    50: (Bottleneck, [3, 4, 6, 3]),
    101: (Bottleneck, [3, 4, 23, 3]),
    152: (Bottleneck, [3, 8, 36, 3]),
}


# Reference optimizer regimes (resnet*.py: ResNet_imagenet / ResNet_cifar10)
IMAGENET_REGIME = {
    0: {"optimizer": "SGD", "lr": 1e-1, "weight_decay": 1e-4, "momentum": 0.9},
    30: {"lr": 1e-2},
    60: {"lr": 1e-3, "weight_decay": 0},
    90: {"lr": 1e-4},
}
CIFAR_REGIME = {
    0: {"optimizer": "SGD", "lr": 1e-1, "weight_decay": 1e-4, "momentum": 0.9},
    81: {"lr": 1e-2},
    122: {"lr": 1e-3, "weight_decay": 0},
    164: {"lr": 1e-4},
}


def build_resnet(
    kit: LayerKit,
    dataset: str = "imagenet",
    depth: int = 18,
    num_classes: Optional[int] = None,
    rngs: Optional[nnx.Rngs] = None,
) -> nnx.Module:
    """Dataset/depth dispatch shared by the reference's three factory
    functions (resnet*.py ~L218-232)."""
    rngs = rngs if rngs is not None else nnx.Rngs(0)
    if dataset == "imagenet":
        block_cls, layers = IMAGENET_DEPTH_CONFIGS[depth]
        model = ResNetImageNet(kit, block_cls, layers, num_classes or 1000, rngs=rngs)
        model.regime = IMAGENET_REGIME
        model.input_size = 224
        model.input_transform = "imagenet"
    elif dataset in ("cifar10", "cifar100"):
        model = ResNetCifar(kit, depth, num_classes or (10 if dataset == "cifar10" else 100), rngs=rngs)
        model.regime = CIFAR_REGIME
        model.input_size = 32
        model.input_transform = dataset
    else:
        raise ValueError(f"unknown dataset {dataset!r}")
    return model
