"""Where the QAT train step's time goes (XProf framework_op_stats).

Profiles one jitted fake-quant train step (fwd+bwd+SGD, BatchStats threaded)
and prints the top op categories/ops by self time — the measurement behind
the fake-quant-overhead work (QAT bf16 trails the plain-bf16 twin; this
names the f32 passes responsible).

Usage: python bench/train_profile.py [B] [depth] [dtype]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
DEPTH = int(sys.argv[2]) if len(sys.argv) > 2 else 50
DTYPE = sys.argv[3] if len(sys.argv) > 3 else "bf16"


def main():
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from xprof_mxu import _tool_json
    from quantized_tpu.engine.executor import enable_compilation_cache
    from quantized_tpu.models import get_model

    enable_compilation_cache()
    model = get_model("resnet_quantized_float_bn")(rngs=nnx.Rngs(0), dataset="imagenet", depth=DEPTH)
    model.train()
    if DTYPE == "bf16":
        from quantized_tpu.training.qat import set_compute_dtype

        set_compute_dtype(model, jnp.bfloat16)

    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, 224, 224, 3)), jnp.float32)
    y = jnp.asarray(np.random.default_rng(1).integers(0, 1000, (B,)), jnp.int32)
    gd, params, rest = nnx.split(model, nnx.Param, ...)

    @jax.jit
    def step(p, r, xx, yy):
        def loss_fn(both):
            p_, r_ = both
            m = nnx.merge(gd, p_, r_)
            logits = m(xx)
            one_hot = jax.nn.one_hot(yy, logits.shape[-1])
            loss = -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * one_hot, -1))
            _, _, r_new = nnx.split(m, nnx.Param, ...)
            return loss, r_new

        (gp, _), r_new = jax.grad(loss_fn, has_aux=True, allow_int=True)((p, r))
        return jax.tree.map(lambda pp, g: pp - 0.01 * g, p, gp), r_new

    p, r = step(params, rest, x, y)  # compile + warm
    jax.block_until_ready((p, r))

    import tempfile

    logdir = tempfile.mkdtemp(prefix="train_prof_")
    jax.profiler.start_trace(logdir)
    for _ in range(5):
        p, r = step(p, r, x, y)
    jax.block_until_ready((p, r))
    jax.profiler.stop_trace()

    stats = _tool_json(logdir, "framework_op_stats")
    rows = stats if isinstance(stats, list) else stats.get("data", stats)
    # normalize: list of dicts with 'Type'/'Operation'/'Total self-time (us)'-ish keys
    print(f"trace at {logdir}; top rows:")
    if isinstance(rows, list) and rows:
        keys = list(rows[0].keys())
        print("columns:", keys)
        for row in rows[:40]:
            print(row)
    else:
        print(json.dumps(stats)[:4000])


if __name__ == "__main__":
    main()
