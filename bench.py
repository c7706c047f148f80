"""Benchmark entry point (driver contract): prints ONE JSON line
``{"metric", "value", "unit", "vs_baseline"}``.

Metric: ResNet-50 ImageNet images/sec/chip in the framework's best available
execution mode, measured on the real TPU chip. ``vs_baseline`` is the speedup
over the reference-equivalent execution: the same fp32 float model (the
reference runs fake-quant *in fp32 cuDNN* — SURVEY.md section 0 — so the fp32
twin is the faithful baseline cost model).

Modes (auto-selected):
- "int8-engine": true-integer Pallas/XLA path (once quantized_tpu.engine lands)
- "fake-quant": reference-semantics fp32 fake-quant eval (fallback)
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

BATCH = 64
WARMUP = 3
ITERS = 10


def _timeit(fn, x) -> float:
    """Median seconds/iter of a jitted callable."""
    fn(x).block_until_ready()  # compile
    for _ in range(WARMUP):
        fn(x).block_until_ready()
    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        fn(x).block_until_ready()
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def _fake_quant_mode():
    from flax import nnx

    from __graft_entry__ import _calibrated_model
    from quantized_tpu.models import get_model

    x = jnp.ones((BATCH, 224, 224, 3), jnp.float32)

    qmodel = _calibrated_model("resnet_quantized_float_bn", dataset="imagenet", depth=50)
    gq, sq = nnx.split(qmodel)
    qfwd = jax.jit(lambda v: nnx.merge(gq, sq)(v))

    fmodel = get_model("resnet")(dataset="imagenet", depth=50, rngs=nnx.Rngs(0))
    fmodel.eval()
    gf, sf = nnx.split(fmodel)
    ffwd = jax.jit(lambda v: nnx.merge(gf, sf)(v))

    t_q = _timeit(qfwd, x)
    t_f = _timeit(ffwd, x)
    return BATCH / t_q, (BATCH / t_q) / (BATCH / t_f), "fake-quant"


def _int8_engine_mode():
    from quantized_tpu.engine.bench_hook import resnet50_int8_throughput

    return resnet50_int8_throughput(batch=BATCH, warmup=WARMUP, iters=ITERS)


def main():
    try:
        ips, vs_baseline, mode = _int8_engine_mode()
    except Exception:
        ips, vs_baseline, mode = _fake_quant_mode()
    print(
        json.dumps(
            {
                "metric": f"resnet50_imagenet_images_per_sec_per_chip[{mode}]",
                "value": round(ips, 2),
                "unit": "images/sec",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
