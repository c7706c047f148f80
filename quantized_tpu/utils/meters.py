"""Meters & metrics (reference utils.py ~L120-150)."""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np


class AverageMeter:
    """Running average (reference AverageMeter)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


def accuracy(output, target, topk: Sequence[int] = (1,)) -> Tuple[float, ...]:
    """Top-k accuracy in percent (reference ``accuracy``)."""
    output = np.asarray(output)
    target = np.asarray(target)
    maxk = max(topk)
    pred = np.argsort(-output, axis=-1)[:, :maxk]
    correct = pred == target[:, None]
    return tuple(100.0 * correct[:, :k].any(axis=1).mean() for k in topk)
