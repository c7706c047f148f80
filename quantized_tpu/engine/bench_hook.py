"""bench.py hook: ResNet-50 int8 engine throughput vs fp32 twin.

Uses the overhead-cancelling scan harness (utils/timing.py) — naive per-call
wall timing over the axon tunnel measures dispatch, not the chip.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import nnx

from quantized_tpu.utils.timing import per_iter_time


def model_throughput(model, x) -> float:
    """Images/sec of ``model(x)`` with jit-scan timing."""
    graphdef, state = nnx.split(model)

    def step(c, state, x):
        m = nnx.merge(graphdef, state)
        y = m(x + (c * 1e-6).astype(x.dtype))  # keep the input dtype (bf16 twins)
        return jnp.max(y).astype(jnp.float32) * 1e-9

    dt = per_iter_time(step, state, x)
    return x.shape[0] / dt


def resnet50_int8_throughput(batch: int = 64, backend: str = "xla"):
    from __graft_entry__ import _calibrated_model
    from quantized_tpu.engine import convert_to_int
    from quantized_tpu.engine.executor import enable_compilation_cache
    from quantized_tpu.models import get_model

    enable_compilation_cache()
    x = jnp.ones((batch, 224, 224, 3), jnp.float32)

    qmodel = _calibrated_model("resnet_quantized_float_bn", dataset="imagenet", depth=50)
    int_model = convert_to_int(qmodel, weight_bits=8, backend=backend)
    ips = model_throughput(int_model, x)

    fmodel = get_model("resnet")(dataset="imagenet", depth=50, rngs=nnx.Rngs(0))
    fmodel.eval()
    ips_f = model_throughput(fmodel, x)

    return ips, ips / ips_f, f"int8-engine-{backend}"
