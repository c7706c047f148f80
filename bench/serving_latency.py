"""Serving bench: continuous-batching throughput + latency percentiles on
the live chip (BASELINE.json config #5's single-host half — the reference has
no serving path at all, SURVEY.md section 1 "nothing sits above L4").

Drives the real ContinuousBatcher + IntExecutor with closed-loop synthetic
traffic at several concurrency levels and reports sustained req/s, batch
occupancy, and p50/p95/p99 request latency (admission -> result).

SANDBOX CAVEAT: every dispatch crosses the axon tunnel (~29 ms round trip,
multi-ms jitter) and host->device payload moves at ~46 MB/s through it
(measured: jax.device_put of a 77 MB f32 batch = 1.66 s steady-state). A
128-image f32 batch is 77 MB, so tunnel-attached serving tops out near
~60 req/s regardless of engine speed (the engine itself runs 16.5k img/s
device-side). ``--u8`` ingest cuts the payload 4x. On production hardware
(PCIe/DMA, GB/s-class H2D) the engine bound applies, not this one.

Usage: python bench/serving_latency.py [concurrency ...] [--u8]
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import time

import numpy as np

ARGS = [a for a in sys.argv[1:] if not a.startswith("--")]
CONCURRENCY = [int(a) for a in ARGS] or [8, 64, 256]
INGEST = "u8" if "--u8" in sys.argv else "f32"
BUCKETS = (8, 32, 64, 128)
WARM_REQS = 64
MEASURE_SECS = 12.0


def main():
    import jax.numpy as jnp

    from __graft_entry__ import _calibrated_model
    from quantized_tpu.engine import apply_cached_backends, build_int8_resident
    from quantized_tpu.engine.batching import ContinuousBatcher
    from quantized_tpu.engine.server import make_executor

    from quantized_tpu.utils.hostbuild import host_build, put_model

    with host_build():  # bulk D2H pulls wedge the tunnel — build host-side
        model = build_int8_resident(
            _calibrated_model("resnet_quantized_float_bn", dataset="imagenet", depth=50)
        )
        apply_cached_backends(model, jnp.zeros((128, 224, 224, 3), jnp.float32))
    put_model(model)
    ex = make_executor(model, ingest=INGEST)
    dtype = np.uint8 if INGEST == "u8" else np.float32
    batcher = ContinuousBatcher(ex, (224, 224, 3), BUCKETS, dtype=dtype).warmup().start()

    rng = np.random.default_rng(0)

    def make_img():
        if INGEST == "u8":
            return rng.integers(0, 256, size=(224, 224, 3), dtype=np.uint8)
        return rng.standard_normal((224, 224, 3)).astype(np.float32)

    img = make_img()  # shared payload; the engine output is not inspected

    try:
        print(f"ingest={INGEST} buckets={BUCKETS}", flush=True)
        print(f"{'conc':>5s} {'req/s':>9s} {'p50 ms':>8s} {'p95 ms':>8s} "
              f"{'p99 ms':>8s} {'occupancy':>9s}")
        for conc in CONCURRENCY:
            # warm all buckets/jit paths and DRAIN before the clock starts —
            # otherwise the warm requests queue ahead of the measured ones
            # and pollute the first level's latency percentiles
            for f in [batcher.submit(img) for _ in range(WARM_REQS)]:
                f.result(timeout=300)
            done0, padded0 = batcher.requests_done, batcher.padded_slots
            # closed loop: keep `conc` requests in flight
            lat: list = []
            inflight: list = []
            t_end = time.time() + MEASURE_SECS
            n_done = 0
            t0 = time.time()
            while time.time() < t_end or inflight:
                while len(inflight) < conc and time.time() < t_end:
                    inflight.append((time.time(), batcher.submit(img)))
                ts, fut = inflight.pop(0)
                fut.result(timeout=300)
                lat.append(time.time() - ts)
                n_done += 1
            dt = time.time() - t0
            lat_ms = np.sort(np.asarray(lat)) * 1e3
            # per-level occupancy from counter deltas (stats() is cumulative)
            d_done = batcher.requests_done - done0
            d_pad = batcher.padded_slots - padded0
            occ = d_done / max(d_done + d_pad, 1)
            print(
                f"{conc:>5d} {n_done/dt:>9.1f} {np.percentile(lat_ms,50):>8.1f} "
                f"{np.percentile(lat_ms,95):>8.1f} {np.percentile(lat_ms,99):>8.1f} "
                f"{occ:>9.2f}",
                flush=True,
            )
    finally:
        batcher.stop()


if __name__ == "__main__":
    main()
