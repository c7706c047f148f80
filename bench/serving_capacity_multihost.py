"""Multihost-batcher overhead on the 8-virtual-device mesh (VERDICT r3
missing #2, second half).

The coordinated scheduler adds a per-step count allgather + padded-bucket
agreement on top of the single-host machinery. No multi-chip hardware
exists here, so absolute rates are CPU-bound and meaningless; the measured
quantity is the OVERHEAD FRACTION: MultiHostBatcher req/s (single-process
degenerate form over a (data=2, model=4) virtual mesh, u8 ingest) vs the
same HostShardedExecutor driven directly at the same bucket size.

Usage: python bench/serving_capacity_multihost.py [bucket] [secs]
"""

from __future__ import annotations

import os
import sys
import threading
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np

BUCKET = int(sys.argv[1]) if len(sys.argv) > 1 else 32
SECS = float(sys.argv[2]) if len(sys.argv) > 2 else 8.0


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from flax import nnx

    from __graft_entry__ import _calibrated_model
    from quantized_tpu.engine import build_int8_resident
    from quantized_tpu.engine.multihost import HostShardedExecutor, serve_multihost
    from quantized_tpu.parallel import create_mesh

    mesh = create_mesh(num_devices=8, model_parallel=4)
    model = build_int8_resident(
        _calibrated_model("resnet_quantized_float_bn", dataset="cifar10", depth=20))

    # direct executor rate at the bucket size (same SPMD forward, no batcher)
    ex = HostShardedExecutor(
        build_int8_resident(
            _calibrated_model("resnet_quantized_float_bn", dataset="cifar10", depth=20)),
        mesh, ingest="u8")
    rng = np.random.default_rng(0)
    batch = rng.integers(0, 256, (BUCKET, 32, 32, 3)).astype(np.uint8)
    ex(batch)  # compile
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < SECS / 2:
        ex(batch)
        n += 1
    direct_rate = n * BUCKET / (time.perf_counter() - t0)
    print(f"direct SPMD executor: {direct_rate:,.0f} img/s at bucket {BUCKET}",
          flush=True)

    batcher = serve_multihost(model, mesh, batch_sizes=(BUCKET,),
                              input_shape=(32, 32, 3), ingest="u8")
    img = batch[0]
    stop = threading.Event()
    done = [0]
    lock = threading.Lock()

    def feeder():
        sem = threading.Semaphore(4 * BUCKET)

        def cb(_f):
            with lock:
                done[0] += 1
            sem.release()

        while not stop.is_set():
            sem.acquire()
            if stop.is_set():
                break
            batcher.submit(img).add_done_callback(cb)

    th = threading.Thread(target=feeder, daemon=True)
    th.start()
    time.sleep(1.0)
    with lock:
        n0 = done[0]
    t0 = time.perf_counter()
    time.sleep(SECS)
    with lock:
        n1 = done[0]
    dt = time.perf_counter() - t0
    stop.set()
    batcher.stop()
    th.join(timeout=10)
    rate = (n1 - n0) / dt
    st = batcher.stats()
    print(f"multihost batcher: {rate:,.0f} req/s = {rate/direct_rate:.1%} of the "
          f"direct executor rate (coordination+schedule overhead "
          f"{(1 - rate/direct_rate)*100:.1f}%); p50 {st['latency_p50_ms']:.1f} ms "
          f"occupancy {st['occupancy']:.2f}", flush=True)


if __name__ == "__main__":
    main()
