"""Whole-net backend races: do the per-layer autotune winners hold in context?

The per-layer autotuner races each conv signature in ISOLATION; the round-3
XProf per-block table (bench/xprof_mxu.py) shows the two downsample blocks
and the stem running well below the stream rate in the WHOLE-NET context
(layer1/block0 1.26 ms, stem conv 234 GB/s), where fusion scopes, consumer
counts (residual forks), and layout transitions differ from the isolated
measurement. This bench A/Bs whole-net throughput under targeted overrides
of the cached winners.

Usage: python bench/backend_context_race.py [batch]
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
from flax import nnx

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128


def build():
    from __graft_entry__ import _calibrated_model
    from quantized_tpu.engine import apply_cached_backends, build_int8_resident
    from quantized_tpu.utils.hostbuild import host_build, put_model

    with host_build():
        q = _calibrated_model("resnet_quantized_float_bn", dataset="imagenet", depth=50)
        eng = build_int8_resident(q)
        apply_cached_backends(eng, jnp.zeros((B, 224, 224, 3), jnp.float32))
    return put_model(eng)


def throughput(model, x):
    from quantized_tpu.utils.timing import per_iter_time

    graphdef, state = nnx.split(model)

    def step(c, state, x):
        m = nnx.merge(graphdef, state)
        y = m(x + c * 1e-6)
        return jnp.max(y) * 1e-9

    dt = per_iter_time(step, state, x)
    return x.shape[0] / dt


def unsplit(backend: str) -> str:
    return backend[: -len("-split")] if backend.endswith("-split") else backend


def override(model, which: str) -> None:
    """Mutate conv backends in place per the named experiment."""
    from quantized_tpu.engine.int_layers import IntConv2d

    if which == "ds-fused":
        # block0 of every stage: conv3 + downsample lose the split epilogue
        for i in range(model.num_stages):
            blk = getattr(getattr(model, f"layer{i + 1}"), "0")
            for name in ("conv3", "downsample"):
                c = getattr(blk, name, None)
                if isinstance(c, IntConv2d):
                    c.set_backend(unsplit(c.backend))
    elif which == "ds-all-fused":
        for i in range(model.num_stages):
            blk = getattr(getattr(model, f"layer{i + 1}"), "0")
            for name in ("conv1", "conv2", "conv3", "downsample"):
                c = getattr(blk, name, None)
                if isinstance(c, IntConv2d):
                    c.set_backend(unsplit(c.backend))
    elif which == "all-fused":
        for _, m in nnx.iter_modules(model):
            if isinstance(m, IntConv2d):
                m.set_backend(unsplit(m.backend))
    elif which == "stem-bf16":
        model.stem.set_backend("raw-bf16")
    elif which == "stem-xla":
        model.stem.set_backend("raw-xla-split")
    elif which == "stem-s2d-xla":
        model.stem.set_backend("xla")
    elif which in ("layer1-c2-bf16", "layer1-c2-bf16-split"):
        # round-3 c3-unit probe: c2 in bf16 beats the isolated-race winner
        # (xla-split) by ~7% inside the c2+c3+residual fusion context
        target = "bf16" if which.endswith("bf16") else "bf16-split"
        for j in range(model.layer1.num_blocks):
            blk = getattr(model.layer1, str(j))
            blk.conv2.set_backend(target)
    elif which == "layer12-c2-bf16":
        for stage in (model.layer1, model.layer2):
            for j in range(stage.num_blocks):
                getattr(stage, str(j)).conv2.set_backend("bf16")
    elif which == "layer1-fused":
        stage = model.layer1
        for j in range(stage.num_blocks):
            blk = getattr(stage, str(j))
            for name in ("conv1", "conv2", "conv3", "downsample"):
                c = getattr(blk, name, None)
                if isinstance(c, IntConv2d):
                    c.set_backend(unsplit(c.backend))
    else:
        raise SystemExit(f"unknown experiment {which}")


def main():
    x = jnp.ones((B, 224, 224, 3), jnp.float32)
    experiments = sys.argv[2].split(",") if len(sys.argv) > 2 else [
        "tuned", "ds-fused", "ds-all-fused", "layer1-fused", "all-fused",
        "stem-bf16", "stem-xla",
    ]
    base = None
    for which in experiments:
        model = build()
        if which != "tuned":
            try:
                override(model, which)
            except SystemExit:
                raise
            except Exception as e:
                print(f"{which:>14}: override failed: {e}", flush=True)
                continue
        r = throughput(model, x)
        if base is None:
            base = r
        print(f"{which:>14}: {r:8.0f} img/s  ({r/base:5.3f}x vs tuned)", flush=True)


if __name__ == "__main__":
    main()
