"""Data-parallel scaling-efficiency harness (BASELINE.md: >=85% at 2 hosts).

Shards the int8-resident engine's batch over the ``data`` axis of an
N-device mesh and measures throughput at 1 device vs N devices:
``efficiency = T(1)*1 / T(N) / N`` per fixed per-device batch (weak scaling).

On this sandbox only ONE real TPU chip is reachable, so the real-ICI number
cannot be produced here; run with JAX_PLATFORMS=cpu and
--xla_force_host_platform_device_count=8 to validate the measurement path on
a virtual mesh (the reported CPU numbers validate plumbing, not ICI — the
harness is what ships, SURVEY.md section 6). For a real pod slice, run one
process per host with quantized_tpu.parallel.initialize_multihost first.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python bench/scaling.py --cpu [per_device_batch] [n_devices]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import jax.numpy as jnp
from flax import nnx
from jax.sharding import NamedSharding, PartitionSpec as P

PER_DEV_BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
N_DEV = int(sys.argv[2]) if len(sys.argv) > 2 else len(jax.devices())


def build(depth=20):
    from quantized_tpu.engine import build_int8_resident
    from quantized_tpu.models import get_model
    from quantized_tpu.models.layers import QuantMeasure

    m = get_model("resnet_quantized_float_bn")(dataset="cifar10", depth=depth, rngs=nnx.Rngs(0))
    for _, mod in nnx.iter_modules(m):
        if isinstance(mod, QuantMeasure):
            mod.running_min.set_value(jnp.full((1,), -4.0, jnp.float32))
            mod.running_max.set_value(jnp.full((1,), 4.0, jnp.float32))
    m.eval()
    return build_int8_resident(m)


def throughput(n_devices: int) -> float:
    from quantized_tpu.parallel import DATA_AXIS, create_mesh, shard_int_engine_state
    from quantized_tpu.utils.timing import per_iter_time

    mesh = create_mesh(num_devices=n_devices, devices=jax.devices()[:n_devices])
    model = build()
    graphdef, state = nnx.split(model)
    state = shard_int_engine_state(state, mesh)
    batch = PER_DEV_BATCH * n_devices
    x = jax.device_put(
        jnp.ones((batch, 32, 32, 3), jnp.float32),
        NamedSharding(mesh, P(DATA_AXIS, None, None, None)),
    )

    def step(c, state, xx):
        m = nnx.merge(graphdef, state)
        return jnp.max(m(xx + c * 1e-6)) * 1e-9

    dt = per_iter_time(step, state, x, target_secs=0.5)
    return batch / dt


def main():
    t1 = throughput(1)
    tn = throughput(N_DEV)
    eff = tn / (t1 * N_DEV)
    print(json.dumps({
        "device": jax.devices()[0].device_kind,
        "per_device_batch": PER_DEV_BATCH,
        "throughput_1dev_img_s": round(t1, 1),
        f"throughput_{N_DEV}dev_img_s": round(tn, 1),
        "weak_scaling_efficiency": round(eff, 3),
        "n_devices": N_DEV,
    }))


if __name__ == "__main__":
    main()
