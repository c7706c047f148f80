"""Explicit-collective building blocks (shard_map) for the TP hot path.

GSPMD/pjit inserts collectives automatically for the whole-model path
(parallel.sharding rules); these shard_map kernels are the hand-placed
equivalents used where collective/compute overlap must be controlled
explicitly (SURVEY.md section 7 step 5):

- ``tp_linear``: weights column-sharded over 'model'; each device computes its
  output shard; ``all_gather`` over ICI reassembles channels.
- ``tp_linear_reduce_scatter``: weights ROW-sharded (input dim); partial sums
  ``psum_scatter``-ed so each device keeps a balanced output shard — the
  reduce-scatter form that overlaps with the next layer's compute.
- ``dp_psum_grads``: gradient all-reduce over 'data' for the QAT trainer.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from quantized_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def tp_linear(mesh: Mesh, x: jax.Array, w_oi: jax.Array, b: Optional[jax.Array] = None) -> jax.Array:
    """y = x @ w.T + b with w rows (output features) sharded over 'model'.
    Output gathered to full width on every device (all_gather over ICI)."""

    def kernel(x_blk, w_blk, b_blk):
        y = x_blk @ w_blk.T
        if b_blk is not None:
            y = y + b_blk
        return jax.lax.all_gather(y, MODEL_AXIS, axis=1, tiled=True)

    in_specs = (P(DATA_AXIS, None), P(MODEL_AXIS, None), P(MODEL_AXIS) if b is not None else P())
    args = (x, w_oi, b if b is not None else jnp.zeros((0,), x.dtype))
    if b is None:
        kernel_b = lambda xb, wb, _: kernel(xb, wb, None)
    else:
        kernel_b = kernel
    return shard_map(
        kernel_b, mesh=mesh, in_specs=in_specs, out_specs=P(DATA_AXIS, None), check_vma=False
    )(*args)


def tp_linear_reduce_scatter(mesh: Mesh, x: jax.Array, w_oi: jax.Array) -> jax.Array:
    """y = x @ w.T with the CONTRACTION dim sharded over 'model': every device
    holds x[:, k_shard] and w[:, k_shard], computes a partial product, and
    ``psum_scatter`` leaves each device its row shard of y (batch-sharded out).
    This is the TP form whose reduce-scatter XLA overlaps with subsequent
    compute."""

    def kernel(x_blk, w_blk):
        partial = x_blk @ w_blk.T  # full (b_local, out) partial sum
        return jax.lax.psum_scatter(partial, MODEL_AXIS, scatter_dimension=1, tiled=True)

    return shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P(DATA_AXIS, MODEL_AXIS), P(None, MODEL_AXIS)),
        out_specs=P(DATA_AXIS, MODEL_AXIS),
        check_vma=False,
    )(x, w_oi)


def dp_psum_grads(mesh: Mesh, grads):
    """All-reduce a gradient pytree over the data axis (explicit DP reduce;
    the nnx trainer path relies on GSPMD instead)."""

    def kernel(g):
        return jax.tree.map(lambda t: jax.lax.pmean(t, DATA_AXIS), g)

    specs = jax.tree.map(lambda _: P(), grads)
    return shard_map(kernel, mesh=mesh, in_specs=(specs,), out_specs=specs, check_vma=False)(grads)
