"""PartitionSpec rules for CNN parameter trees.

TP strategy (SURVEY.md #22, scaling-book recipe): shard the *output channel*
dimension of every conv kernel and the *row* (output) dimension of fc weights
over the ``model`` axis; per-channel vectors (BN scale/bias/stats, conv bias)
follow their channel dim; scalar observer buffers replicate. Activations are
batch-sharded over ``data`` and channel-sharded over ``model`` (GSPMD resolves
layer-boundary resharding; the engine's shard_map path places collectives
explicitly instead).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from quantized_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def param_partition_spec(path: tuple, value: Any) -> P:
    """Rule: HWIO conv kernels shard out-channels; (out,in) fc weights shard
    rows; per-channel 1-D vectors shard; scalars/observer buffers replicate."""
    ndim = getattr(value, "ndim", 0)
    if ndim == 4:  # HWIO conv kernel -> out channels on model axis
        return P(None, None, None, MODEL_AXIS)
    if ndim == 2:  # (out, in) linear weight -> rows on model axis
        return P(MODEL_AXIS, None)
    if ndim == 1:
        # The rule is purely structural (no name matching — renames must not
        # silently change shardings): observer buffers are (1,)-shaped by the
        # reference checkpoint contract (models/layers.py QuantMeasure) and
        # replicate; longer 1-D vectors are per-channel quantities (bias, BN
        # gamma/beta/mean/var) and follow the channel shard. Non-divisible
        # lengths fall back to replication in shard_model_state.
        if value.shape[0] == 1:
            return P(None)
        return P(MODEL_AXIS)
    return P()


def activation_spec(rank: int) -> P:
    """NHWC activations: batch over data, channels over model."""
    if rank == 4:
        return P(DATA_AXIS, None, None, MODEL_AXIS)
    if rank == 2:
        return P(DATA_AXIS, MODEL_AXIS)
    return P(DATA_AXIS)


def shard_model_state(state, mesh: Mesh):
    """device_put every leaf of an nnx State according to the partition rule.
    Leaves whose sharded dim does not divide the mesh axis fall back to
    replication (e.g. 10-class fc rows on a 4-way model axis)."""

    def put(path, leaf):
        arr = leaf
        spec = param_partition_spec(path, arr)
        # divisibility check: GSPMD requires even shards for device_put
        for dim, axis in enumerate(spec):
            if axis is None:
                continue
            size = mesh.shape[axis] if isinstance(axis, str) else 1
            if arr.shape[dim] % size != 0:
                spec = P()
                break
        return jax.device_put(arr, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: put(tuple(getattr(p, "key", getattr(p, "idx", p)) for p in path), leaf),
        state,
    )


def int_engine_partition_spec(path: tuple, value: Any) -> P:
    """Partition rule for the *integer engine* parameter tree (BASELINE
    config #5: int8 weights tensor-sharded over the model axis).

    Int engine conventions differ from the fake-quant tree: IntConv2d holds
    HWIO int8 kernels plus per-out-channel (alpha, beta) f32 vectors;
    IntLinear stores its weight (in, out) — so 2-D weights shard COLUMNS
    (out) rather than rows. Epilogues/requant are elementwise per out-channel
    and follow the channel shard; GSPMD inserts the boundary collectives."""
    ndim = getattr(value, "ndim", 0)
    if ndim == 4:  # HWIO int8 conv kernel -> out channels
        return P(None, None, None, MODEL_AXIS)
    if ndim == 2:  # (in, out) int linear weight -> out columns
        return P(None, MODEL_AXIS)
    if ndim == 1 and getattr(value, "shape", (1,))[0] > 1:
        return P(MODEL_AXIS)  # alpha / beta / bias per-channel vectors
    return P()


def shard_int_engine_state(state, mesh: Mesh):
    """device_put an Int8ResNet/IntConv tree per ``int_engine_partition_spec``
    (same divisibility fallback as ``shard_model_state``)."""

    def put(path, leaf):
        arr = leaf
        spec = int_engine_partition_spec(path, arr)
        for dim, axis in enumerate(spec):
            if axis is None:
                continue
            size = mesh.shape[axis] if isinstance(axis, str) else 1
            if arr.shape[dim] % size != 0:
                spec = P()
                break
        return jax.device_put(arr, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: put(tuple(getattr(p, "key", getattr(p, "idx", p)) for p in path), leaf),
        state,
    )
