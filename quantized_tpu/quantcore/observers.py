"""Running-range activation observers (reference ``QuantMeasure``).

Reference semantics (SURVEY.md section 2 #4, quantize.py ~L200-235):

- batch statistic = mean over the batch of per-sample min (resp. max):
  ``input.view(B, -1).min(-1)[0].mean()``.
- EMA with the *inverted* convention vs torch BN:
  ``running = momentum * running + (1 - momentum) * new`` with
  ``momentum = 0.1`` (new value gets weight 0.9).
- training mode quantizes with the *current batch* statistic (not the updated
  running buffer); eval mode uses the frozen running buffers.
- the quantize call always passes ``num_chunks=16`` (dead for the explicit
  min/max path but kept for parity).

State is a pytree threaded functionally; in the NNX model zoo it lives in
``nnx.BatchStat`` variables so ``.train()``/``.eval()`` mirror the reference's
``module.training`` flag.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from quantized_tpu.quantcore.ste import fake_quant

DEFAULT_MOMENTUM = 0.1
QUANT_MEASURE_NUM_CHUNKS = 16


class QuantMeasureState(NamedTuple):
    """running_min / running_max buffers (scalars, stored shape ``(1,)`` to
    match the reference checkpoint layout)."""

    running_min: jax.Array
    running_max: jax.Array

    @classmethod
    def init(cls) -> "QuantMeasureState":
        return cls(jnp.zeros((1,), jnp.float32), jnp.zeros((1,), jnp.float32))


def batch_min_max_stat(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Mean over batch of per-sample extrema (quantize.py ~L205-210)."""
    b = x.shape[0]
    y = jnp.reshape(x, (b, -1))
    return jnp.mean(jnp.min(y, axis=-1)), jnp.mean(jnp.max(y, axis=-1))


def ema_update(running: jax.Array, new: jax.Array, momentum: float = DEFAULT_MOMENTUM) -> jax.Array:
    """Inverted-EMA: ``running*momentum + new*(1-momentum)``."""
    return running * momentum + new * (1.0 - momentum)


def quant_measure(
    x: jax.Array,
    state: QuantMeasureState,
    training: bool,
    num_bits: int = 8,
    momentum: float = DEFAULT_MOMENTUM,
    fake_quant_fn=fake_quant,
) -> Tuple[jax.Array, QuantMeasureState]:
    """Observe + fake-quantize. Returns (quantized x, new state).

    Default quantizer is the straight-through ``ste.fake_quant`` so gradients
    pass through unchanged in training mode, matching the reference's
    ``UniformQuantize.backward`` (probe-verified: the raw ``fake_quant_array``
    would zero gradients through ``round``).
    """
    if training:
        min_value, max_value = batch_min_max_stat(jax.lax.stop_gradient(x))
        new_state = QuantMeasureState(
            running_min=ema_update(state.running_min, min_value, momentum),
            running_max=ema_update(state.running_max, max_value, momentum),
        )
    else:
        min_value = state.running_min[0]
        max_value = state.running_max[0]
        new_state = state
    y = fake_quant_fn(
        x,
        num_bits=num_bits,
        min_value=min_value,
        max_value=max_value,
        num_chunks=QUANT_MEASURE_NUM_CHUNKS,
    )
    return y, new_state
