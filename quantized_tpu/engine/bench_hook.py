"""bench.py hook: ResNet-50 int8 engine throughput vs fp32 twin."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
from flax import nnx


def _median_time(fn, x, warmup, iters):
    jax.block_until_ready(fn(x))
    for _ in range(warmup):
        jax.block_until_ready(fn(x))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(x))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def resnet50_int8_throughput(batch: int = 64, warmup: int = 3, iters: int = 10, backend: str = "xla"):
    from __graft_entry__ import _calibrated_model
    from quantized_tpu.engine import IntExecutor, convert_to_int
    from quantized_tpu.engine.executor import enable_compilation_cache
    from quantized_tpu.models import get_model

    enable_compilation_cache()
    x = jnp.ones((batch, 224, 224, 3), jnp.float32)

    qmodel = _calibrated_model("resnet_quantized_float_bn", dataset="imagenet", depth=50)
    int_model = convert_to_int(qmodel, weight_bits=8, backend=backend)
    int_exec = IntExecutor(int_model)
    t_int = _median_time(int_exec, x, warmup, iters)

    fmodel = get_model("resnet")(dataset="imagenet", depth=50, rngs=nnx.Rngs(0))
    fmodel.eval()
    fexec = IntExecutor(fmodel)
    t_f = _median_time(fexec, x, warmup, iters)

    ips = batch / t_int
    return ips, (batch / t_int) / (batch / t_f), f"int8-engine-{backend}"
