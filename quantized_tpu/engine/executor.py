"""Jitted executor around converted integer models (single-chip and sharded).

Hides the NNX split/merge plumbing and enables the persistent compilation
cache (TPU compiles of the full net take minutes over this sandbox's tunnel;
cached recompiles are near-instant).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

_CACHE_ENABLED = False


def enable_compilation_cache(path: str = os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")):
    global _CACHE_ENABLED
    if not _CACHE_ENABLED:
        try:
            jax.config.update("jax_compilation_cache_dir", os.path.abspath(path))
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
            _CACHE_ENABLED = True
        except Exception:
            pass


class IntExecutor:
    """Compile-once forward executor for a converted model.

    With a mesh, parameters are sharded per the TP rules and inputs
    batch-sharded (pjit/GSPMD inserts the collectives).
    """

    def __init__(self, model: nnx.Module, mesh=None, donate_input: bool = False,
                 ingest: str = "f32"):
        """``ingest='u8'`` accepts raw uint8 images and uses the model's
        fused normalize+quantize path (Int8ResNet.run_u8)."""
        enable_compilation_cache()
        self.mesh = mesh
        self.ingest = ingest
        if ingest == "u8" and not hasattr(model, "run_u8"):
            raise ValueError(f"{type(model).__name__} has no uint8 ingest path")
        if mesh is not None:
            from quantized_tpu.parallel.sharding import shard_model_state

            state = nnx.state(model)
            nnx.update(model, shard_model_state(state, mesh))
        self._graphdef, self._state = nnx.split(model)

        def forward(state, x):
            m = nnx.merge(self._graphdef, state)
            return m.run_u8(x) if ingest == "u8" else m(x)

        self._forward = jax.jit(forward, donate_argnums=(1,) if donate_input else ())

    def __call__(self, x: jax.Array) -> jax.Array:
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from quantized_tpu.parallel.mesh import DATA_AXIS

            x = jax.device_put(x, NamedSharding(self.mesh, P(DATA_AXIS, None, None, None)))
        return self._forward(self._state, x)

    def warmup(self, example: jax.Array):
        jax.block_until_ready(self(example))
        return self
