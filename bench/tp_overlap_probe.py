"""Collective-compute overlap evidence for the explicit-TP path (VERDICT r3
missing #3).

Two measurements, both hardware-honest about what this sandbox can show:

1. **Async form in real TPU HLO (AOT)**: compile the whole-model explicit-TP
   forward for an 8-chip v5e topology via ``jax.experimental.topologies``
   (no hardware needed) and report how many all-gathers the TPU backend's
   async-collective-fusion converted to ``async-collective-start``/``-done``
   kCustom fusion pairs, and how many compute fusions are scheduled inside
   each start->done window (the latency-hiding scheduler's work product).
   The CPU backend emits only synchronous ``all-gather`` (measured here too),
   so this AOT view is the only scheduler evidence available without a
   multi-chip slice.

2. **Explicit-TP vs GSPMD on the 8-virtual-CPU mesh**: relative wall times
   of the two whole-net forms. CAVEAT: 8 virtual devices on 2 physical
   cores measure partitioning/plumbing overhead, not ICI behavior — the
   numbers rank the forms' host-side cost only.

Usage: python bench/tp_overlap_probe.py
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

# must precede the first CPU-client creation (lazy, so before any jax use)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np


def build(model_parallel, mesh, explicit):
    import jax.numpy as jnp
    from flax import nnx

    from __graft_entry__ import _calibrated_model
    from quantized_tpu.engine import build_int8_resident
    from quantized_tpu.parallel import shard_int_engine_state
    from quantized_tpu.parallel.tp_engine import apply_explicit_tp

    model = build_int8_resident(
        _calibrated_model("resnet_quantized_float_bn", dataset="cifar10", depth=20))
    n_wrapped = apply_explicit_tp(model, mesh) if explicit else 0
    graphdef, state = nnx.split(model)
    if not explicit:
        state = shard_int_engine_state(state, mesh)
    return graphdef, state, n_wrapped


def async_evidence():
    import jax
    import jax.numpy as jnp
    from flax import nnx

    try:
        from jax.experimental import topologies

        topo = topologies.get_topology_desc(platform="tpu", topology_name="v5e:2x4")
    except Exception as e:
        print(f"AOT topology unavailable ({e}) — skipping HLO evidence")
        return
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from quantized_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    mesh = Mesh(np.array(topo.devices).reshape(2, 4), (DATA_AXIS, MODEL_AXIS))
    graphdef, state, n_wrapped = build(4, mesh, explicit=True)

    def fwd(state, x):
        return nnx.merge(graphdef, state)(x)

    repl = NamedSharding(mesh, P())
    state_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=repl), state)
    x_spec = jax.ShapeDtypeStruct(
        (64, 32, 32, 3), jnp.float32,
        sharding=NamedSharding(mesh, P(DATA_AXIS, None, None, None)))
    txt = jax.jit(fwd).lower(state_spec, x_spec).compile().as_text()

    n_sync = txt.count("all-gather(")
    n_start = txt.count('custom_call_target="AsyncCollectiveStart"')
    lines = txt.splitlines()
    starts, dones = {}, {}
    for i, l in enumerate(lines):
        m = re.search(r"%(async-collective-start[.\d]*) = ", l)
        if m:
            starts[m.group(1)] = i
        m = re.search(r"%(async-collective-done[.\d]*) = ", l)
        if m:
            dones[m.group(1)] = i
    print(f"TPU AOT (v5e:2x4), explicit-TP whole net ({n_wrapped} wrapped convs):")
    print(f"  all-gathers: {n_sync} total, {n_start} converted to async "
          f"start/done pairs by async-collective-fusion")
    for s, si in starts.items():
        d = s.replace("start", "done")
        if d not in dones:
            continue
        between = lines[si + 1: dones[d]]
        n_comp = sum(1 for l in between
                     if re.search(r"= .*(fusion|convolution)\(", l)
                     and "async-collective" not in l)
        print(f"  {s} -> {d}: {n_comp} compute fusions scheduled inside the "
              f"start->done window")


def cpu_mesh_timing():
    import jax
    import jax.numpy as jnp
    from flax import nnx
    from jax.sharding import NamedSharding, PartitionSpec as P

    from quantized_tpu.parallel import create_mesh
    from quantized_tpu.parallel.mesh import DATA_AXIS

    mesh = create_mesh(num_devices=8, model_parallel=4)
    x = jnp.zeros((64, 32, 32, 3), jnp.float32)
    rows = []
    for name, explicit in (("gspmd", False), ("explicit-tp", True)):
        graphdef, state, _ = build(4, mesh, explicit)

        @jax.jit
        def fwd(state, xx, _g=graphdef):
            return nnx.merge(_g, state)(xx)

        xs = jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS, None, None, None)))
        jax.block_until_ready(fwd(state, xs))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(fwd(state, xs))
            ts.append(time.perf_counter() - t0)
        rows.append((name, sorted(ts)[len(ts) // 2]))
        print(f"  {name:>12}: {rows[-1][1]*1e3:8.2f} ms/fwd (8 virtual CPU devices)")
    g, e = rows[0][1], rows[1][1]
    print(f"  explicit/gspmd = {e/g:.2f}x  (host-plumbing comparison only — "
          f"no ICI on virtual devices)")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    async_evidence()
    print()
    cpu_mesh_timing()


if __name__ == "__main__":
    main()
