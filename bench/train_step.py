"""QAT train-step throughput on the live chip (the reference's training
workload: fake-quant forward + STE backward + SGD, main.py's hot loop).

Usage: python bench/train_step.py [B] [model] [depth]
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from quantized_tpu.models import get_model
from quantized_tpu.training import Trainer
from quantized_tpu.utils.timing import per_iter_time

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
MODEL = sys.argv[2] if len(sys.argv) > 2 else "resnet_quantized_float_bn"
DEPTH = int(sys.argv[3]) if len(sys.argv) > 3 else 18


def main():
    from quantized_tpu.engine.executor import enable_compilation_cache

    enable_compilation_cache()
    cfg = {"dataset": "imagenet", "depth": DEPTH} if "resnet" in MODEL else {}
    model = get_model(MODEL)(rngs=nnx.Rngs(0), **cfg)
    model.train()
    trainer = Trainer(model, regime={0: {"optimizer": "SGD", "lr": 0.1, "momentum": 0.9}})

    size = getattr(model, "input_size", 224)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, size, size, 3)), jnp.float32)
    y = jnp.asarray(np.random.default_rng(1).integers(0, 1000, (B,)), jnp.int32)

    gd, st = nnx.split((trainer.model, trainer._opt))

    # scan the raw loss+grad+sgd body (the public jitted step re-merges
    # module state per call, which the scan harness cannot thread)
    def raw_step(c, st, x, y):
        m, opt = nnx.merge(gd, st)

        def loss_fn(mm):
            logits = mm((x + c).astype(x.dtype))
            one_hot = jax.nn.one_hot(y, logits.shape[-1])
            return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * one_hot, -1))

        loss, grads = nnx.value_and_grad(loss_fn)(m)
        params = nnx.state(m, nnx.Param)
        jax.tree.map(lambda p, g: p - 0.1 * g, params, grads)  # SGD cost model
        return jnp.float32(loss) * 1e-9

    dt = per_iter_time(raw_step, st, x, y, target_secs=1.0)
    print(f"device={jax.devices()[0].device_kind} model={MODEL}-{DEPTH} batch={B}")
    print(f"QAT train step: {dt*1e3:.2f} ms -> {B/dt:.0f} img/s")


if __name__ == "__main__":
    main()
