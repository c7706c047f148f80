"""Benchmark entry point (driver contract): prints ONE JSON line
``{"metric", "value", "unit", "vs_baseline"}``.

Metric: ResNet-50 ImageNet images/sec/chip on the int8 engine, measured with
an in-jit scan loop (the sandbox TPU tunnel adds ~30 ms per host dispatch, so
per-call wall timing measures the tunnel, not the chip). ``vs_baseline`` is
the speedup over the reference-equivalent execution: the same model in fp32
(the reference runs its fake-quant in fp32 cuDNN — SURVEY.md section 0 — so
the fp32 twin is the faithful baseline cost model), measured the same way.
"""

from __future__ import annotations

import json
import sys
import time

BATCH = 64
LOOPS = 20


def _scan_throughput(model, x, loops=LOOPS):
    import jax
    import jax.numpy as jnp
    from flax import nnx

    graphdef, state = nnx.split(model)

    @jax.jit
    def run(state, x):
        def body(c, _):
            m = nnx.merge(graphdef, state)
            y = m(x + c * 1e-6)  # tiny dependence defeats CSE across steps
            return jnp.float32(jnp.max(y)), None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=loops)
        return c

    jax.block_until_ready(run(state, x))  # compile + warm
    t0 = time.perf_counter()
    jax.block_until_ready(run(state, x))
    dt = (time.perf_counter() - t0) / loops
    return x.shape[0] / dt


def main():
    import jax
    import jax.numpy as jnp
    from flax import nnx

    from quantized_tpu.engine.executor import enable_compilation_cache

    enable_compilation_cache()
    from __graft_entry__ import _calibrated_model
    from quantized_tpu.engine import convert_to_int
    from quantized_tpu.models import get_model

    x = jnp.ones((BATCH, 224, 224, 3), jnp.float32)

    mode = "int8-engine-xla"
    try:
        q = _calibrated_model("resnet_quantized_float_bn", dataset="imagenet", depth=50)
        int_model = convert_to_int(q, weight_bits=8, backend="xla")
        ips = _scan_throughput(int_model, x)
    except Exception as e:  # pragma: no cover
        print(f"int8 engine failed ({type(e).__name__}: {e}); fake-quant fallback", file=sys.stderr)
        mode = "fake-quant"
        int_model = _calibrated_model("resnet_quantized_float_bn", dataset="imagenet", depth=50)
        ips = _scan_throughput(int_model, x)

    fmodel = get_model("resnet")(dataset="imagenet", depth=50, rngs=nnx.Rngs(0))
    fmodel.eval()
    ips_f = _scan_throughput(fmodel, x)

    print(
        json.dumps(
            {
                "metric": f"resnet50_imagenet_images_per_sec_per_chip[{mode}]",
                "value": round(ips, 2),
                "unit": "images/sec",
                "vs_baseline": round(ips / ips_f, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
