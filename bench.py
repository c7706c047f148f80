"""Benchmark entry point (driver contract): prints ONE JSON line
``{"metric", "value", "unit", "vs_baseline"}``.

Metric: ResNet-50 ImageNet images/sec/chip on the int8 engine. ``vs_baseline``
is the speedup over the reference-equivalent execution: the same model in fp32
(the reference runs its fake-quant in fp32 cuDNN — SURVEY.md section 0 — so
the fp32 twin is the faithful baseline cost model).

Timing uses the in-jit scan harness (quantized_tpu/utils/timing.py): the axon
tunnel adds ~29 ms per dispatch and ``block_until_ready`` does not synchronize
through it, so each measurement scans the model enough times inside one jit
that dispatch overhead is noise, ending in a value fetch (the only real
barrier).
"""

from __future__ import annotations

import json
import sys

BATCH = 128  # measured best (RESULTS.md batch sweep, tuned at each size).
# Round-4 re-race on the s16-leg engine: 18.7k @128, 14.7k @160, 15.6k
# @192, 17.3k @256 — the VMEM-pressure optimum stays at 128 (v5e)


def _model_throughput(model, x):
    import jax.numpy as jnp
    from flax import nnx

    from quantized_tpu.utils.timing import per_iter_time

    graphdef, state = nnx.split(model)

    # Input delivery raced 2026-08-21 (round 3): the loop-carried perturbation
    # costs ~0.1 ms less than pre-staged batches + dynamic-slice (the gather
    # does NOT fuse into the quantize consumer), and a loop-invariant input
    # lets XLA hoist the entire model out of the scan (measured 95M img/s).
    # This form stays the contract.
    def step(c, state, x):
        m = nnx.merge(graphdef, state)
        y = m(x + c * 1e-6)  # loop-carried perturbation defeats CSE/hoisting
        return jnp.max(y) * 1e-9  # full-output reduction defeats slicing

    dt = per_iter_time(step, state, x)
    return x.shape[0] / dt


def main():
    import jax.numpy as jnp
    from flax import nnx

    from quantized_tpu.engine.executor import enable_compilation_cache

    enable_compilation_cache()
    from __graft_entry__ import _calibrated_model
    from quantized_tpu.engine import convert_to_int
    from quantized_tpu.models import get_model

    x = jnp.ones((BATCH, 224, 224, 3), jnp.float32)

    mode = "int8-resident"
    try:
        from quantized_tpu.engine import build_int8_resident
        from quantized_tpu.utils.hostbuild import host_build, put_model

        # build host-side, push once: bulk D2H pulls through the axon tunnel
        # are slow and can wedge its device->host stream (hostbuild.py)
        with host_build():
            q = _calibrated_model("resnet_quantized_float_bn", dataset="imagenet", depth=50)
            int_model = build_int8_resident(q)
        put_model(int_model)
        try:
            # per-layer backend + pool-impl selection; all-cached after the
            # first run on a given device kind (autotune_cache.json)
            from quantized_tpu.engine import autotune_resident

            autotune_resident(int_model, x, verbose=False)
        except Exception as e:
            print(f"autotune skipped ({type(e).__name__}: {e})", file=sys.stderr)
        ips = _model_throughput(int_model, x)
    except Exception as e:  # pragma: no cover
        print(f"resident engine failed ({type(e).__name__}: {e}); exact fallback", file=sys.stderr)
        mode = "int8-engine-xla"
        q = _calibrated_model("resnet_quantized_float_bn", dataset="imagenet", depth=50)
        int_model = convert_to_int(q, weight_bits=8, backend="xla")
        ips = _model_throughput(int_model, x)

    from quantized_tpu.utils.hostbuild import host_build, put_model

    with host_build():
        fmodel = get_model("resnet")(dataset="imagenet", depth=50, rngs=nnx.Rngs(0))
        fmodel.eval()
    put_model(fmodel)
    ips_f = _model_throughput(fmodel, x)

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
