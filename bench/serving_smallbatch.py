"""Small-batch (serving-bucket) throughput: int4-W resident vs int8 resident.

The weight-bound regime (VERDICT r1 next-round #2): at B<=8 the model's HBM
traffic is dominated by weights, where packed int4 + native-S4 execution
halves the read. fc-heavy AlexNet is the showcase (54.6 MB of 61 MB weights
are fc); ResNet-50 at tiny batch is per-op-overhead-bound so int4 is ~neutral
there (measured, not assumed).

Usage: python bench/serving_smallbatch.py [alexnet|resnet50|both] [batches...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from quantized_tpu.models import get_model
from quantized_tpu.utils.timing import per_iter_time

WHICH = sys.argv[1] if len(sys.argv) > 1 else "both"
BATCHES = [int(b) for b in sys.argv[2:]] or [1, 4, 8]


def calibrated(name, **cfg):
    # buffer injection, host-side: an eager train-mode forward is minutes of
    # op-by-op dispatches through the tunnel (see utils/hostbuild.py)
    from quantized_tpu.models.layers import QuantMeasure

    model = get_model(name)(rngs=nnx.Rngs(0), **cfg)
    for _, mod in nnx.iter_modules(model):
        if isinstance(mod, QuantMeasure):
            mod.running_min.set_value(jnp.full((1,), -4.0, jnp.float32))
            mod.running_max.set_value(jnp.full((1,), 4.0, jnp.float32))
    model.eval()
    return model


def build(name, weight_bits):
    from quantized_tpu.utils.hostbuild import host_build, put_model

    with host_build():
        if name == "alexnet":
            from quantized_tpu.engine import build_int8_alexnet

            m = calibrated("alexnet_quantized")
            eng = build_int8_alexnet(m, weight_bits=weight_bits)
        else:
            from quantized_tpu.engine import build_int8_resident

            m = calibrated("resnet_quantized_float_bn", dataset="imagenet", depth=50)
            eng = build_int8_resident(m, weight_bits=weight_bits)
    return put_model(eng)


def run(name):
    print(f"-- {name} --", flush=True)
    for bits in (8, 4):
        eng = build(name, bits)
        gd, st = nnx.split(eng)
        fwd = jax.jit(lambda s, v: nnx.merge(gd, s)(v))
        for b in BATCHES:
            x = jax.random.normal(jax.random.PRNGKey(1), (b, 224, 224, 3))

            def step(c, st, x):
                y = fwd(st, x + c * 1e-6)
                return jnp.float32(jnp.max(y)) * 1e-6

            t = per_iter_time(step, st, x, target_secs=0.5)
            print(f"  int{bits}-resident B={b}: {t*1e6:9.1f} us  "
                  f"{b/t:10.0f} img/s", flush=True)


def main():
    for name in (["alexnet", "resnet50"] if WHICH == "both" else [WHICH]):
        run(name)


if __name__ == "__main__":
    main()
