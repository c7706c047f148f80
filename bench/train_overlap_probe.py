"""Training-side collective-compute overlap evidence (VERDICT r4 next-step
#8): AOT-compile the sharded DP+TP *train step* of the flagship grad-quant
config for an 8-chip v5e topology and report how the TPU backend schedules
the gradient-reduction collectives.

What to look for in the scheduled HLO (and what this probe reports):

- DP gradient reductions lower as ``all-reduce`` ops. The TPU scheduler
  splits them into native async ``all-reduce-start`` / ``all-reduce-done``
  pairs; compute fusions scheduled inside a start->done window execute
  while the reduction is on the wire (latency hiding: the backward keeps
  computing earlier layers' gradients while later layers' reductions fly).
- TP weight-shard boundary collectives (all-gather / reduce-scatter /
  collective-permute) may additionally appear, sync or async.

This mirrors bench/tp_overlap_probe.py (inference) for the training step.
The CPU backend has no async collective scheduler, so the AOT TPU compile is
the only honest source of this evidence without a multi-chip slice.

Model: ``resnet_quantized`` — the reference's flagship experiment config
(RangeBN + num_bits_grad=8 + biprecision, resnet_quantized.py ~L10-15) —
so the probed backward includes stochastic-rounding gradient quantization.

Usage: python bench/train_overlap_probe.py [depth] [batch]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np


def lower_train_step(mesh, model_name="resnet_quantized", depth=20, batch=64):
    """Build the flagship QAT model, spec its state with the DP+TP partition
    rules, and AOT-lower one full train step (fwd + bwd + SGD) for ``mesh``.
    Returns the scheduled HLO text."""
    import jax
    import jax.numpy as jnp
    from flax import nnx
    from jax.sharding import NamedSharding, PartitionSpec as P

    from quantized_tpu.models import get_model
    from quantized_tpu.parallel.mesh import DATA_AXIS
    from quantized_tpu.parallel.sharding import param_partition_spec

    model = get_model(model_name)(dataset="cifar10", depth=depth, rngs=nnx.Rngs(0))
    model.train()
    gd, params, rest = nnx.split(model, nnx.Param, ...)

    def spec_of(path, leaf):
        spec = param_partition_spec(path, leaf)
        for dim, axis in enumerate(spec):
            if axis is not None and leaf.shape[dim] % mesh.shape[axis] != 0:
                spec = P()
                break
        return jax.ShapeDtypeStruct(leaf.shape, leaf.dtype,
                                    sharding=NamedSharding(mesh, spec))

    def tree_spec(tree):
        return jax.tree_util.tree_map_with_path(
            lambda path, leaf: spec_of(
                tuple(getattr(p, "key", getattr(p, "idx", p)) for p in path), leaf),
            tree,
        )

    p_spec = tree_spec(params)
    r_spec = tree_spec(rest)
    x_spec = jax.ShapeDtypeStruct(
        (batch, 32, 32, 3), jnp.float32,
        sharding=NamedSharding(mesh, P(DATA_AXIS, None, None, None)))
    y_spec = jax.ShapeDtypeStruct(
        (batch,), jnp.int32, sharding=NamedSharding(mesh, P(DATA_AXIS)))

    def step(p, r, xx, yy):
        def loss_fn(both):
            p_, r_ = both
            m = nnx.merge(gd, p_, r_)
            logits = m(xx)
            _, _, r_new = nnx.split(m, nnx.Param, ...)
            one_hot = jax.nn.one_hot(yy, logits.shape[-1])
            loss = -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * one_hot, -1))
            return loss, r_new

        (gp, _), r_new = jax.grad(loss_fn, has_aux=True, allow_int=True)((p, r))
        new_p = jax.tree.map(lambda pp, g: pp - 0.01 * g, p, gp)
        return new_p, r_new

    return jax.jit(step).lower(p_spec, r_spec, x_spec, y_spec).compile().as_text()


def analyze(txt):
    """Count sync/async collectives and compute scheduled inside async
    windows. Returns a dict; printing is the caller's job."""
    lines = txt.splitlines()
    counts = {
        "all-reduce-start": 0, "all-gather-start": 0,
        "collective-permute-start": 0, "reduce-scatter(": 0,
        "async-collective-start": txt.count('custom_call_target="AsyncCollectiveStart"'),
    }
    sync = {"all-reduce(": 0, "all-gather(": 0, "collective-permute(": 0}
    for k in counts:
        if k != "async-collective-start":
            counts[k] = sum(1 for l in lines if re.search(rf"= \S+ {re.escape(k)}", l)) \
                if k.endswith("(") else txt.count(f" {k}(")
    for k in sync:
        sync[k] = txt.count(f" {k}")
    windows = []
    starts, dones = {}, {}
    for i, l in enumerate(lines):
        m = re.search(r"%((?:all-reduce|all-gather|collective-permute|async-collective)-start[.\d]*) = ", l)
        if m:
            starts[m.group(1)] = i
        m = re.search(r"%((?:all-reduce|all-gather|collective-permute|async-collective)-done[.\d]*) = ", l)
        if m:
            dones[m.group(1)] = i
    for s, si in starts.items():
        d = s.replace("start", "done")
        if d not in dones:
            continue
        between = lines[si + 1: dones[d]]
        n_comp = sum(1 for l in between
                     if re.search(r"= .*(fusion|convolution)\(", l)
                     and "async" not in l and "-start" not in l and "-done" not in l)
        windows.append((s, n_comp))
    return {"async": counts, "sync": sync, "windows": windows}


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        from jax.experimental import topologies

        topo = topologies.get_topology_desc(platform="tpu", topology_name="v5e:2x4")
    except Exception as e:
        print(f"AOT topology unavailable ({e}) — no HLO evidence possible here")
        return
    from jax.sharding import Mesh

    from quantized_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    mesh = Mesh(np.array(topo.devices).reshape(2, 4), (DATA_AXIS, MODEL_AXIS))
    txt = lower_train_step(mesh, depth=depth, batch=batch)
    res = analyze(txt)
    print(f"TPU AOT (v5e:2x4) flagship grad-quant train step "
          f"(resnet_quantized-{depth}, B={batch}, DP=2 x TP=4):")
    print(f"  async starts: {res['async']}")
    print(f"  sync (unsplit) collectives: {res['sync']}")
    overlapped = [w for w in res["windows"] if w[1] > 0]
    print(f"  {len(res['windows'])} async start/done pairs, "
          f"{len(overlapped)} with compute inside the window")
    for name, n in sorted(res["windows"], key=lambda w: -w[1])[:12]:
        print(f"    {name}: {n} compute fusions in-window")


if __name__ == "__main__":
    main()
