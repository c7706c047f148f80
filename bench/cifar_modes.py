"""CIFAR-geometry throughput rows (BASELINE config: resnet int8 CIFAR-10).

The depth table and mode table are ImageNet-geometry; this bench covers the
reference's other geometry (32x32 CIFAR, n=(depth-2)/6 blocks) end-to-end on
the chip: fp32 twin vs int8-resident, B configurable.

Usage: python bench/cifar_modes.py [B] [depth]
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
DEPTH = int(sys.argv[2]) if len(sys.argv) > 2 else 20


def main():
    from __graft_entry__ import _calibrated_model
    from quantized_tpu.engine import apply_cached_backends, build_int8_resident
    from quantized_tpu.engine.autotune import autotune_resident
    from quantized_tpu.engine.executor import enable_compilation_cache
    from quantized_tpu.models import get_model
    from quantized_tpu.utils.timing import per_iter_time

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, 32, 32, 3)), jnp.float32)

    rows = []
    fp32 = get_model("resnet")(dataset="cifar10", depth=DEPTH, rngs=nnx.Rngs(0))
    fp32.eval()
    q = _calibrated_model("resnet_quantized_float_bn", dataset="cifar10", depth=DEPTH)
    eng = build_int8_resident(q)
    autotune_resident(eng, jnp.zeros((B, 32, 32, 3), jnp.float32), verbose=False)
    for tag, model in (("fp32", fp32), ("int8-resident (tuned)", eng)):
        gd, st = nnx.split(model)

        def step(c, st, x):
            y = nnx.merge(gd, st)(x + c.astype(x.dtype))
            return jnp.max(y).astype(jnp.float32) * 1e-9

        dt = per_iter_time(step, st, x, target_secs=0.5)
        rows.append((tag, B / dt))
        print(f"resnet{DEPTH}-cifar10 B={B} {tag}: {dt*1e3:.3f} ms -> {B/dt:,.0f} img/s",
              flush=True)
    print(f"speedup: {rows[1][1]/rows[0][1]:.2f}x")


if __name__ == "__main__":
    main()
