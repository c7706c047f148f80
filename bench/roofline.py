"""Int8 MXU roofline metric (BASELINE.md north star: >=90% of peak).

Measures (a) the chip's achievable s8xs8->s32 dot rate on a large square
matmul (the practical int8 roofline — v5e datasheet peak is 394 TOPS), and
(b) the int8-resident ResNet-50 engine's end-to-end effective TOPS, reporting
both as fractions of datasheet peak and of the measured dot ceiling.

Usage: python bench/roofline.py [batch]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

V5E_INT8_PEAK_TOPS = 394.0
RESNET50_GMACS = 4.09  # conv+fc multiply-accumulates per 224x224 image

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256


def measured_dot_ceiling(n: int = 8192) -> float:
    """Best-case s8 MXU rate (TOPS) on an n^3 dot with int32 accumulation."""
    from quantized_tpu.utils.timing import per_iter_time

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(-127, 128, (n, n)), jnp.int8)
    b = jnp.asarray(rng.integers(-127, 128, (n, n)), jnp.int8)

    def step(c, a, b):
        acc = jax.lax.dot_general(
            (a + c.astype(jnp.int8)).astype(jnp.int8), b,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
        )
        return jnp.max(acc).astype(jnp.float32) * 1e-9

    dt = per_iter_time(step, a, b)
    return 2.0 * n * n * n / dt / 1e12


def engine_tops(batch: int) -> float:
    from flax import nnx

    from __graft_entry__ import _calibrated_model
    from quantized_tpu.engine import build_int8_resident
    from quantized_tpu.utils.timing import per_iter_time

    from quantized_tpu.utils.hostbuild import host_build, put_model

    with host_build():  # bulk D2H pulls wedge the tunnel — build host-side
        q = _calibrated_model("resnet_quantized_float_bn", dataset="imagenet", depth=50)
        model = build_int8_resident(q)
    put_model(model)
    graphdef, state = nnx.split(model)

    def step(c, state, x):
        m = nnx.merge(graphdef, state)
        return jnp.max(m(x + c * 1e-6)) * 1e-9

    x = jnp.ones((batch, 224, 224, 3), jnp.float32)
    dt = per_iter_time(step, state, x)
    return 2.0 * RESNET50_GMACS * 1e9 * batch / dt / 1e12, batch / dt


def main():
    from quantized_tpu.engine.executor import enable_compilation_cache

    enable_compilation_cache()
    ceiling = measured_dot_ceiling()
    eng, ips = engine_tops(B)
    print(json.dumps({
        "device": jax.devices()[0].device_kind,
        "int8_dot_ceiling_tops": round(ceiling, 1),
        "ceiling_vs_datasheet": round(ceiling / V5E_INT8_PEAK_TOPS, 3),
        "resnet50_engine_tops": round(eng, 1),
        "engine_images_per_sec": round(ips, 0),
        "engine_vs_datasheet": round(eng / V5E_INT8_PEAK_TOPS, 3),
        "engine_vs_measured_ceiling": round(eng / ceiling, 3),
        "batch": B,
    }))


if __name__ == "__main__":
    main()
