"""Whole-model ResNet-50 throughput by execution mode on the live TPU.

Modes: fp32 twin (reference cost model), bf16 twin, fake-quant eval,
int8 engine f32-boundary (exact), int8-resident. Usage:
    python bench/model_modes.py [batch] [mode,mode,...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit('/', 2)[0])

import jax
import jax.numpy as jnp
from flax import nnx

from __graft_entry__ import _calibrated_model
from quantized_tpu.engine import build_int8_resident, convert_to_int
from quantized_tpu.engine.bench_hook import model_throughput
from quantized_tpu.models import get_model

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
MODES = sys.argv[2].split(",") if len(sys.argv) > 2 else [
    "fp32", "bf16", "int8-exact", "int8-resident", "int4w-resident"]
# model family: resnet50 (default), resnet18/34/101/152, alexnet, mobilenet
FAMILY = sys.argv[3] if len(sys.argv) > 3 else "resnet50"
RESNET_DEPTH = int(FAMILY[6:]) if FAMILY.startswith("resnet") else 50


def build(mode):
    if FAMILY in ("alexnet", "mobilenet"):
        if mode in ("fp32", "bf16"):
            m = get_model(FAMILY)(rngs=nnx.Rngs(0))
        else:
            m = _calibrated_model(f"{FAMILY}_quantized")
        m.eval()
    elif mode in ("fp32", "bf16"):
        m = get_model("resnet")(dataset="imagenet", depth=RESNET_DEPTH, rngs=nnx.Rngs(0))
        m.eval()
    if mode in ("fp32", "bf16"):
        if mode == "bf16":
            state = nnx.state(m)
            nnx.update(m, jax.tree.map(
                lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, state))
        return m
    q = m if FAMILY in ("alexnet", "mobilenet") else _calibrated_model(
        "resnet_quantized_float_bn", dataset="imagenet", depth=RESNET_DEPTH)
    if mode == "fake-quant":
        return q
    if mode == "int8-exact":
        return convert_to_int(q, weight_bits=8, backend="xla")
    if mode == "int4w-exact":
        return convert_to_int(q, weight_bits=4, backend="xla")
    if mode in ("int8-resident", "int4w-resident"):
        wb = 4 if mode == "int4w-resident" else 8
        if FAMILY == "alexnet":
            from quantized_tpu.engine import build_int8_alexnet

            eng = build_int8_alexnet(q, weight_bits=wb)
        elif FAMILY == "mobilenet":
            from quantized_tpu.engine import build_int8_mobilenet

            eng = build_int8_mobilenet(q, weight_bits=wb)
        else:
            eng = build_int8_resident(q, weight_bits=wb)
        from quantized_tpu.engine import apply_cached_backends

        apply_cached_backends(eng, jnp.zeros((B, 224, 224, 3), jnp.float32))
        return eng
    raise ValueError(mode)


def main():
    print(f"device={jax.devices()[0].device_kind} batch={B}", flush=True)
    base = None
    for mode in MODES:
        x = jnp.ones((B, 224, 224, 3), jnp.bfloat16 if mode == "bf16" else jnp.float32)
        try:
            from quantized_tpu.utils.hostbuild import host_build, put_model

            # build host-side, push once (bulk D2H pulls wedge the tunnel)
            with host_build():
                model = build(mode)
            put_model(model)
            ips = model_throughput(model, x)
            if base is None:
                base = ips
            print(f"{mode:>14}: {ips:9.0f} img/s  ({B*1e6/ips:7.1f} us/img, {ips/base:5.2f}x vs {MODES[0]})", flush=True)
        except Exception as e:
            print(f"{mode:>14}: FAIL {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
