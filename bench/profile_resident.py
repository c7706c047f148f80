"""Per-stage profile of the int8-resident ResNet-50 engine on the live TPU.

Times each pipeline stage in isolation (synthetic stored-int8 inputs of the
right shape) with the in-jit scan harness, plus the full model, so the
residual non-conv overhead (stem quant/space-to-depth, maxpool, residual
plumbing, avgpool+fc) is attributable. Isolation misses cross-stage fusion,
so the stage sum can exceed the full-model time; the per-stage ranking is
what matters.

Usage: python bench/profile_resident.py [batch]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from flax import nnx

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64


def main():
    from __graft_entry__ import _calibrated_model
    from quantized_tpu.engine import build_int8_resident
    from quantized_tpu.engine.executor import enable_compilation_cache
    from quantized_tpu.engine.int_layers import quantize_input_stored
    from quantized_tpu.utils.timing import per_iter_time

    enable_compilation_cache()
    from quantized_tpu.engine import apply_cached_backends
    from quantized_tpu.utils.hostbuild import host_build, put_model

    with host_build():  # bulk D2H pulls wedge the tunnel — build host-side
        q = _calibrated_model("resnet_quantized_float_bn", dataset="imagenet", depth=50)
        model = build_int8_resident(q)
        tuned = apply_cached_backends(model, jnp.zeros((B, 224, 224, 3), jnp.float32))
    put_model(model)
    print(f"device={jax.devices()[0].device_kind} batch={B} tuned_cache={tuned}", flush=True)
    rows = []

    def time_stage(name, fn, *args):
        graphdef, state = nnx.split(model)

        def step(c, state, x, *rest):
            m = nnx.merge(graphdef, state)
            return jnp.max(fn(m, (x + c.astype(x.dtype)).astype(x.dtype), *rest)).astype(jnp.float32) * 1e-9

        dt = per_iter_time(step, state, *args)
        rows.append((name, dt))
        print(f"{name:>16}: {dt*1e3:8.3f} ms", flush=True)

    x_img = jnp.ones((B, 224, 224, 3), jnp.float32)

    # full model
    time_stage("full", lambda m, x: m(x), x_img)

    # stem: f32 quantize + (s2d) conv -> int8 on stem_out_grid
    time_stage(
        "stem+quant",
        lambda m, x: m.stem.run_q(
            quantize_input_stored(x, *m.stem.grid), relu=True, out_requant=m.stem_out_grid
        ),
        x_img,
    )

    xq112 = jnp.zeros((B, 112, 112, 64), jnp.int8)
    from quantized_tpu.engine.int8_resident import maxpool_3x3_s2_int8

    time_stage("maxpool", lambda m, x: maxpool_3x3_s2_int8(x), xq112)

    shapes = {"layer1": (56, 64), "layer2": (56, 256), "layer3": (28, 512), "layer4": (14, 1024)}
    for ln, (h, c) in shapes.items():
        xq = jnp.zeros((B, h, h, c), jnp.int8)
        time_stage(ln, lambda m, x, _ln=ln: getattr(m, _ln)(x), xq)

    xf = jnp.zeros((B, 7, 7, 2048), jnp.float32)
    time_stage("avgpool+fc", lambda m, x: m.fc(jnp.mean(x, axis=(1, 2))), xf)

    full = rows[0][1]
    stages = sum(dt for name, dt in rows[1:])
    print(f"\nfull {full*1e3:.3f} ms ({B/full:.0f} img/s); stage-sum {stages*1e3:.3f} ms "
          f"(isolation overhead {100*(stages-full)/full:+.1f}%)")


if __name__ == "__main__":
    main()
