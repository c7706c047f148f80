"""Serving-stack overhead at DEVICE capacity (VERDICT r3 missing #2).

Every prior serving number crossed the sandbox tunnel at 24-46 MB/s, so it
measured the tunnel, not the batcher. This bench removes the tunnel from the
measured path and quantifies the continuous-batching machinery (admission
queue, drain, bucket pick, pad memcpy, dispatch, future fan-out) as a
fraction of the engine's own throughput:

- input side: the executor cycles through PRE-STAGED device-resident uint8
  batches (one pool per bucket size); request payloads still flow through
  submit/queue/pad (their host-side cost is real batcher overhead and is
  kept in the measured path) but no H2D crosses the tunnel per step.
- output side: the jitted forward returns per-image (top1_class, top1_score)
  instead of 1000 logits — the standard classification-serving response —
  so the per-batch D2H fetch is ~1 KB, not 512 KB.
- dispatch side: the batcher's pipeline_depth=4 mode keeps batches in
  flight with their D2H result copies started at dispatch time
  (copy_to_host_async), hiding the ~29 ms tunnel round-trips behind device
  compute (on production hardware this hides the ~10 us dispatch the same
  way). --depth1 measures the unpipelined form for comparison.

Reference rate: the same u8->top1 forward timed with the in-jit scan
harness (pure engine, zero serving machinery).

Usage: python bench/serving_capacity.py [buckets...] [--depth1] [--f32]
"""

from __future__ import annotations

import sys
import threading
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

ARGS = [a for a in sys.argv[1:] if not a.startswith("--")]
FAMILY = "alexnet" if "--alexnet" in sys.argv else "resnet50"
BUCKETS = [int(a) for a in ARGS] or [8, 32, 64, 128]
DEPTH = 1 if "--depth1" in sys.argv else (8 if "--depth8" in sys.argv else 4)
FEEDERS = 2 if "--feeders2" in sys.argv else 1
MEASURE_SECS = 10.0
STAGE_POOL = 4  # staged device batches per bucket (results rotate)


def main():
    import jax
    import jax.numpy as jnp
    from flax import nnx

    from __graft_entry__ import _calibrated_model
    from quantized_tpu.engine import apply_cached_backends, build_int8_resident
    from quantized_tpu.engine.batching import ContinuousBatcher
    from quantized_tpu.utils.hostbuild import host_build, put_model
    from quantized_tpu.utils.timing import per_iter_time

    with host_build():
        if FAMILY == "alexnet":
            from quantized_tpu.engine import build_int8_alexnet

            model = build_int8_alexnet(_calibrated_model("alexnet_quantized"))
        else:
            model = build_int8_resident(
                _calibrated_model("resnet_quantized_float_bn", dataset="imagenet", depth=50)
            )
        apply_cached_backends(model, jnp.zeros((128, 224, 224, 3), jnp.float32))
    put_model(model)
    graphdef, state = nnx.split(model)

    def fwd_top1(state, u8):
        m = nnx.merge(graphdef, state)
        logits = m.run_u8(u8)
        return jnp.stack(
            [jnp.argmax(logits, -1).astype(jnp.float32), jnp.max(logits, -1)], -1
        )

    jfwd = jax.jit(fwd_top1)

    # ---- pure engine rate (no serving machinery), same forward form ----
    rng = np.random.default_rng(0)
    u8_128 = jnp.asarray(rng.integers(0, 256, (128, 224, 224, 3)), jnp.uint8)

    def step(c, state, x):
        y = fwd_top1(state, x + c.astype(jnp.uint8))
        return jnp.max(y).astype(jnp.float32) * 1e-9

    dt = per_iter_time(step, state, u8_128)
    pure_rate = 128 / dt
    print(f"pure engine u8->top1 rate: {pure_rate:,.0f} img/s ({dt*1e3:.3f} ms/128)",
          flush=True)

    # ---- per-dispatch achievable floor: the in-jit scan rate amortizes
    # dispatch over the whole scan, which no per-batch server can do. This
    # times the bare pipelined dispatch+async-fetch loop with ZERO batching
    # machinery — the dispatch-layer floor the batcher should approach
    # (measured ~4 ms/exec of tunnel overhead on this sandbox; ~100 us on
    # direct PJRT hardware).
    from collections import deque

    staged128 = jax.device_put(u8_128)
    o = jfwd(state, staged128)
    np.asarray(o)
    dq = deque()
    n_floor = 40
    t0 = time.perf_counter()
    for _ in range(n_floor):
        o = jfwd(state, staged128)
        if hasattr(o, "copy_to_host_async"):
            o.copy_to_host_async()
        dq.append(o)
        if len(dq) >= DEPTH:
            np.asarray(dq.popleft())
    while dq:
        np.asarray(dq.popleft())
    dt_floor = (time.perf_counter() - t0) / n_floor
    floor_rate = 128 / dt_floor
    print(f"dispatch-layer floor (no batcher): {floor_rate:,.0f} img/s "
          f"({dt_floor*1e3:.3f} ms/128-batch)", flush=True)

    # ---- staged executor: device-resident input pool per bucket ----
    staged = {}
    for b in BUCKETS:
        staged[b] = [
            jax.device_put(jnp.asarray(
                rng.integers(0, 256, (b, 224, 224, 3)), jnp.uint8))
            for _ in range(STAGE_POOL)
        ]

    class StagedExecutor:
        """Runs the jitted forward on a pre-staged device batch of the same
        bucket size; the numpy batch's assembly cost stays in the measured
        path, its bytes do not cross the tunnel."""

        def __init__(self):
            self.i = 0

        def __call__(self, batch_np):
            pool = staged[batch_np.shape[0]]
            self.i += 1
            return jfwd(state, pool[self.i % len(pool)])

    img = rng.integers(0, 256, (224, 224, 3)).astype(np.uint8)
    print(f"pipeline_depth={DEPTH}  buckets={BUCKETS}", flush=True)
    rows = []
    for b in BUCKETS:
        batcher = ContinuousBatcher(
            StagedExecutor(), (224, 224, 3), (b,), dtype=np.uint8,
            pipeline_depth=DEPTH, max_queue=8 * b + 64,
        ).warmup().start()

        stop_flag = threading.Event()
        done_count = [0]
        lock = threading.Lock()

        def feeder():
            # closed loop at 6x bucket concurrency: enough standing requests
            # to fill the dispatch pipeline (depth 4) plus assembly slack
            inflight_sem = threading.Semaphore(max(1, 6 * b // FEEDERS))

            def cb(_fut):
                with lock:
                    done_count[0] += 1
                inflight_sem.release()

            while not stop_flag.is_set():
                inflight_sem.acquire()
                if stop_flag.is_set():
                    break
                try:
                    batcher.submit(img).add_done_callback(cb)
                except Exception:
                    break

        ths = [threading.Thread(target=feeder, daemon=True) for _ in range(FEEDERS)]
        for th in ths:
            th.start()
        time.sleep(2.0)  # warm the loop
        with lock:
            n0 = done_count[0]
        t0 = time.perf_counter()
        time.sleep(MEASURE_SECS)
        with lock:
            n1 = done_count[0]
        t1 = time.perf_counter()
        stop_flag.set()
        batcher.stop()
        for th in ths:
            th.join(timeout=10)
        rate = (n1 - n0) / (t1 - t0)
        st = batcher.stats()
        frac = rate / pure_rate
        frac_floor = rate / floor_rate
        rows.append((b, rate, frac, frac_floor, st))
        print(f"bucket {b:>3}: {rate:8,.0f} req/s = {frac:5.1%} of engine rate, "
              f"{frac_floor:5.1%} of dispatch floor  "
              f"p50 {st['latency_p50_ms']:6.1f} ms  p95 {st['latency_p95_ms']:6.1f} ms  "
              f"occupancy {st['occupancy']:.2f}", flush=True)
        if "stage_drain_ms" in st:
            per_batch = b / rate * 1e3
            print(f"           per-batch stage means: drain {st['stage_drain_ms']:.2f} "
                  f"assemble {st['stage_assemble_ms']:.2f} dispatch {st['stage_dispatch_ms']:.2f} "
                  f"resolve {st['stage_resolve_ms']:.2f} ms  (batch period {per_batch:.2f} ms; "
                  f"assembler-thread load = drain+assemble, dispatcher = dispatch+resolve)",
                  flush=True)

    best = max(rows, key=lambda r: r[1])
    print(f"\nbest: bucket {best[0]} at {best[1]:,.0f} req/s = {best[2]:.1%} of "
          f"in-scan engine rate, {best[3]:.1%} of the dispatch-layer floor "
          f"(batcher overhead proper = {(1 - best[3]) * 100:.1f}%)", flush=True)


if __name__ == "__main__":
    main()
