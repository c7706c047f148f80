"""One-shot extended autotune (VERDICT r2 missing #6): measure and persist
the fc:/block:/dwpw: races so the production engine consumes them.

Runs with QTPU_TUNE_EXTENDED=1 over the flagship ResNet-50 at the headline
batch and the serving buckets, plus MobileNet-v1 (dw->pw pair races) and
AlexNet (fc-heavy) at the headline batch. Entries land in autotune_cache.json.

Usage: python bench/run_extended_tune.py [batches]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

os.environ["QTPU_TUNE_EXTENDED"] = "1"

import jax.numpy as jnp

from __graft_entry__ import _calibrated_model

BATCHES = [int(v) for v in sys.argv[1].split(",")] if len(sys.argv) > 1 else [128, 32, 8, 1]


def main():
    from quantized_tpu.engine import autotune_resident, build_int8_resident
    from quantized_tpu.engine.int8_alexnet import build_int8_alexnet
    from quantized_tpu.engine.int8_mobilenet import build_int8_mobilenet
    from quantized_tpu.utils.hostbuild import host_build, put_model

    for b in BATCHES:
        with host_build():
            eng = build_int8_resident(
                _calibrated_model("resnet_quantized_float_bn", dataset="imagenet", depth=50)
            )
        put_model(eng)
        print(f"=== resnet50 B={b} ===", flush=True)
        autotune_resident(eng, jnp.zeros((b, 224, 224, 3), jnp.float32))

    # int4 engine: its packed-weight conv signatures differ from int8's (the
    # w shape key carries the packed layout) and race the s4/s4-split forms —
    # tune the serving buckets so int4 serving runs raced backends too
    for b in (1, 8):
        with host_build():
            eng = build_int8_resident(
                _calibrated_model("resnet_quantized_float_bn", dataset="imagenet", depth=50),
                weight_bits=4,
            )
        put_model(eng)
        print(f"=== resnet50-int4 B={b} ===", flush=True)
        autotune_resident(eng, jnp.zeros((b, 224, 224, 3), jnp.float32))

    b = BATCHES[0]
    with host_build():
        eng = build_int8_mobilenet(_calibrated_model("mobilenet_quantized"))
    put_model(eng)
    print(f"=== mobilenet B={b} ===", flush=True)
    autotune_resident(eng, jnp.zeros((b, 224, 224, 3), jnp.float32))

    with host_build():
        eng = build_int8_alexnet(_calibrated_model("alexnet_quantized"))
    put_model(eng)
    print(f"=== alexnet B={b} ===", flush=True)
    autotune_resident(eng, jnp.zeros((b, 224, 224, 3), jnp.float32))


if __name__ == "__main__":
    main()
