"""QAT train-step throughput on the live chip (the reference's training
workload: fake-quant forward + STE backward + SGD, main.py's hot loop
~L215-290).

The step is timed as a ``lax.scan`` whose carry is the *params pytree*: each
iteration consumes the previous SGD update, so the whole fwd+bwd+update is
live (nothing DCE-able) and the tunnel round-trip amortizes over the loop
(see utils/timing.py for why naive timing lies through the axon tunnel).

Usage: python bench/train_step.py [B] [model] [depth] [dtype] [dataset] [variant]
  dtype: f32 (default, reference semantics) | bf16 (mixed: convs/GEMMs in
  bf16, fake-quant boundaries + SGD math in f32 — Trainer compute_dtype);
  append -remat (e.g. bf16-remat) to rematerialize the forward in backward
  variant (for resnet_quantized, the flagship grad-quant config): full
  (default: num_bits_grad=8 + biprecision, the module defaults) | nobiprec
  (grad quantization kept, biprec recombination off — isolates the
  double-conv cost) | nogradq (both off — the pure-RangeBN floor)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from quantized_tpu.models import get_model
from quantized_tpu.utils.timing import MAX_LOOPS, TUNNEL_OVERHEAD_S

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
MODEL = sys.argv[2] if len(sys.argv) > 2 else "resnet_quantized_float_bn"
DEPTH = int(sys.argv[3]) if len(sys.argv) > 3 else 18
DTYPE = sys.argv[4] if len(sys.argv) > 4 else "f32"
DATASET = sys.argv[5] if len(sys.argv) > 5 else "imagenet"
VARIANT = sys.argv[6] if len(sys.argv) > 6 else "full"
REMAT = DTYPE.endswith("-remat")
if REMAT:
    DTYPE = DTYPE[: -len("-remat")]


def main():
    from quantized_tpu.engine.executor import enable_compilation_cache

    enable_compilation_cache()
    cfg = {"dataset": DATASET, "depth": DEPTH} if "resnet" in MODEL else {}
    model = get_model(MODEL)(rngs=nnx.Rngs(0), **cfg)
    if VARIANT != "full":
        from quantized_tpu.models import layers as L

        for _, node in nnx.iter_graph(model):
            if isinstance(node, (L.QConv2d, L.QLinear, L.RangeBN)):
                if hasattr(node, "biprecision"):
                    node.biprecision = False
                if VARIANT == "nogradq":
                    node.num_bits_grad = None
    model.train()
    if DTYPE == "bf16":
        from quantized_tpu.training.qat import set_compute_dtype

        set_compute_dtype(model, jnp.bfloat16)

    size = getattr(model, "input_size", 224)
    chans = 1 if DATASET == "mnist" else 3
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, size, size, chans)), jnp.float32)
    n_cls = 10 if DATASET.startswith("cifar") or DATASET == "mnist" else 1000
    y = jnp.asarray(np.random.default_rng(1).integers(0, n_cls, (B,)), jnp.int32)

    gd, params, rest = nnx.split(model, nnx.Param, ...)

    def apply(p_, r_, xx):
        m = nnx.merge(gd, p_, r_)
        logits = m(xx)
        _, _, r_new = nnx.split(m, nnx.Param, ...)
        return logits, r_new

    if REMAT:
        # rematerialized forward: recompute activations in the backward
        # instead of saving them — trades (cheap, MXU-idle) FLOPs for the
        # HBM traffic the profile shows the backward is bound by
        apply = jax.checkpoint(
            apply, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        )

    def step(carry, xx, yy):
        p, r = carry

        def loss_fn(both):
            # ``r`` rides as a differentiated arg purely to lift its tracers
            # to the grad trace (train-mode forward MUTATES BatchStats —
            # observer EMAs, BN stats); its grads are zero (write-only in
            # train mode) and DCE away.
            p_, r_ = both
            logits, r_new = apply(p_, r_, xx)
            one_hot = jax.nn.one_hot(yy, logits.shape[-1])
            loss = -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * one_hot, -1))
            return loss, r_new

        (gp, _), r_new = jax.grad(loss_fn, has_aux=True, allow_int=True)((p, r))
        return jax.tree.map(lambda pp, g: pp - 0.01 * g, p, gp), r_new

    def make(loops):
        @jax.jit
        def run(p0, r0, xx, yy):
            (p, _), _ = jax.lax.scan(
                lambda c, _: (step(c, xx, yy), None), (p0, r0), None, length=loops
            )
            return jax.tree.reduce(
                lambda a, leaf: a + jnp.max(jnp.abs(leaf)).astype(jnp.float32),
                p,
                jnp.float32(0.0),
            )

        return run

    probe = 8
    run = make(probe)
    float(run(params, rest, x, y))  # compile + warm (value fetch = the only barrier)
    t0 = time.perf_counter()
    float(run(params, rest, x, y))
    est = max((time.perf_counter() - t0 - TUNNEL_OVERHEAD_S) / probe, 1e-7)
    loops = min(max(probe, int(1.5 / est)), MAX_LOOPS)
    if loops > probe * 1.5:
        run = make(loops)
        float(run(params, rest, x, y))
    else:
        loops = probe
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(params, rest, x, y))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    dt = max(ts[len(ts) // 2] - TUNNEL_OVERHEAD_S, 1e-9 * loops) / loops
    print(
        f"device={jax.devices()[0].device_kind} model={MODEL}-{DEPTH} batch={B} "
        f"dtype={DTYPE}{' variant=' + VARIANT if VARIANT != 'full' else ''}"
    )
    print(f"QAT train step: {dt*1e3:.2f} ms -> {B/dt:.0f} img/s")


if __name__ == "__main__":
    main()
