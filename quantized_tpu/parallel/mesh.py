"""Device mesh construction.

Axes: ``data`` (batch/DP) x ``model`` (tensor parallel over conv out-channels
and fc columns). On a pod slice the mesh is laid out so ``model`` rides ICI
(fast, intra-host contiguous devices) and ``data`` spans hosts over DCN —
``mesh_utils.create_device_mesh`` handles the physical assignment.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def infer_mesh_shape(num_devices: int, model_parallel: Optional[int] = None) -> Tuple[int, int]:
    """(data, model) shape. Default: TP degree = min(num_devices, 4) for CNN
    channel dims (64..2048 divide 4 cleanly); DP takes the rest."""
    if model_parallel is None:
        model_parallel = 1
        for cand in (4, 2, 1):
            if num_devices % cand == 0:
                model_parallel = cand
                break
        model_parallel = min(model_parallel, num_devices)
    assert num_devices % model_parallel == 0
    return num_devices // model_parallel, model_parallel


def create_mesh(
    num_devices: Optional[int] = None,
    model_parallel: Optional[int] = None,
    devices=None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = num_devices or len(devices)
    dp, tp = infer_mesh_shape(n, model_parallel)
    try:
        dev_array = mesh_utils.create_device_mesh((dp, tp), devices=devices[:n])
    except Exception:
        dev_array = np.asarray(devices[:n]).reshape(dp, tp)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def local_mesh() -> Mesh:
    """Single-process mesh over all visible devices."""
    return create_mesh()
