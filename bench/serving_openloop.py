"""Open-loop serving: latency vs offered load + SLA shedding (VERDICT r4
missing #2).

Every capacity number so far is closed-loop (fixed concurrency: the feeder
waits for completions), which can never show the overload regime — a closed
loop self-throttles at capacity. This bench drives the batcher with an
OPEN-LOOP arrival process (fixed-rate Poisson-like bursts, arrivals never
wait for results), sweeping offered load from ~20% to ~120% of the measured
closed-loop capacity, and records per point:

    goodput (completed req/s), p50/p95/p99 admission->result latency,
    occupancy, timed-out rate, and end-of-window queue backlog.

The expected signatures this makes visible (and the closed loop cannot):
  - below the knee: flat p50/p95, goodput == offered rate
  - at the knee: p99 inflates first (queueing delay), goodput still tracks
  - past capacity without SLA: latency grows without bound with backlog
  - past capacity WITH request_timeout_s (--sla): the batcher sheds expired
    requests at drain time, goodput holds near capacity, latency of the
    *served* requests stays bounded by the deadline — no collapse.

Executor/input setup matches bench/serving_capacity.py (pre-staged
device-resident uint8 batches; the tunnel is out of the measured path; the
submit/drain/pad/dispatch machinery is in it).

Usage: python bench/serving_openloop.py [bucket] [--sla S] [--secs N]
  bucket: batch bucket (default 128)
  --sla S: request_timeout_s for the overload arm (default 0.25 s)
"""

from __future__ import annotations

import sys
import threading
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

ARGS = [a for a in sys.argv[1:] if not a.startswith("--")]
BUCKET = int(ARGS[0]) if ARGS else 128
SLA_S = 0.25
if "--sla" in sys.argv:
    SLA_S = float(sys.argv[sys.argv.index("--sla") + 1])
MEASURE_SECS = 8.0
STAGE_POOL = 4
LOADS = [0.2, 0.5, 0.8, 0.9, 1.0, 1.1, 1.2]


def main():
    import jax
    import jax.numpy as jnp
    from flax import nnx

    from __graft_entry__ import _calibrated_model
    from quantized_tpu.engine import apply_cached_backends, build_int8_resident
    from quantized_tpu.engine.batching import ContinuousBatcher
    from quantized_tpu.engine.executor import enable_compilation_cache
    from quantized_tpu.utils.hostbuild import host_build, put_model

    enable_compilation_cache()
    with host_build():
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
    rng = np.random.default_rng(0)
    ALL_BUCKETS = (8, 32, BUCKET)
    staged = {
        b: [jax.device_put(jnp.asarray(rng.integers(0, 256, (b, 224, 224, 3)), jnp.uint8))
            for _ in range(STAGE_POOL)]
        for b in ALL_BUCKETS
    }

    class StagedExecutor:
        def __init__(self):
            self.i = 0

        def __call__(self, batch_np):
            self.i += 1
            pool = staged[batch_np.shape[0]]
            return jfwd(state, pool[self.i % STAGE_POOL])

    img = rng.integers(0, 256, (224, 224, 3)).astype(np.uint8)
    # BLOCKING warmup: jax dispatch is async, so compile+first-exec must be
    # forced to completion (value fetch) before any timed window opens —
    # otherwise a cold tunnel eats the capacity windows silently
    t0 = time.perf_counter()
    np.asarray(jfwd(state, staged[BUCKET][0]))
    print(f"first exec (compile+fetch): {time.perf_counter()-t0:.1f}s", flush=True)

    def make_batcher(request_timeout_s=None, max_queue=200_000, buckets=(BUCKET,)):
        return ContinuousBatcher(
            StagedExecutor(), (224, 224, 3), buckets, dtype=np.uint8,
            pipeline_depth=4, max_queue=max_queue,
            request_timeout_s=request_timeout_s,
        ).warmup().start()

    # ---- closed-loop capacity (the reference point for the sweep) ----
    b = make_batcher()
    stop_flag = threading.Event()
    done = [0]
    lock = threading.Lock()

    def feeder():
        sem = threading.Semaphore(6 * BUCKET)

        def cb(_):
            with lock:
                done[0] += 1
            sem.release()

        while not stop_flag.is_set():
            sem.acquire()
            if stop_flag.is_set():
                break
            try:
                b.submit(img).add_done_callback(cb)
            except Exception:
                break

    th = threading.Thread(target=feeder, daemon=True)
    th.start()
    capacity = 0.0
    for attempt in range(4):  # ride out a cold/wedged tunnel start
        time.sleep(2.0)
        n0, t0 = done[0], time.perf_counter()
        time.sleep(5.0)
        n1, t1 = done[0], time.perf_counter()
        capacity = (n1 - n0) / (t1 - t0)
        if capacity > 0:
            break
        print(f"  (capacity window {attempt} saw no completions — retrying)", flush=True)
    stop_flag.set()
    b.stop()
    th.join(timeout=10)
    assert capacity > 0, "no completions in any capacity window — executor wedged"
    print(f"closed-loop capacity (bucket {BUCKET}, depth 4): {capacity:,.0f} req/s",
          flush=True)

    # ---- open-loop sweep ----
    def run_point(offered, secs, request_timeout_s=None, buckets=(BUCKET,)):
        """Fixed-rate open-loop arrivals in ~2 ms bursts; never blocks on
        results. The SAME image object is submitted (submit() keeps a
        reference, no copy for matching dtype) so a 100k-deep backlog costs
        references, not gigabytes."""
        bt = make_batcher(request_timeout_s=request_timeout_s, buckets=buckets)
        completed = [0]
        lk = threading.Lock()

        def cb(fut):
            if fut.exception() is None:
                with lk:
                    completed[0] += 1

        chunk = max(1, int(offered * 0.002))
        interval = chunk / offered
        # ramp 1.5 s, then measure over `secs`
        t_start = time.perf_counter()
        t_measure = t_start + 1.5
        t_end = t_measure + secs
        next_t = t_start
        submitted_meas = 0
        n_lat0 = c0 = to0 = None
        while True:
            now = time.perf_counter()
            if now >= t_end:
                break
            if now < next_t:
                time.sleep(min(next_t - now, 0.002))
                continue
            if n_lat0 is None and now >= t_measure:
                with lk:
                    c0 = completed[0]
                n_lat0 = len(bt.latencies_ms)
                to0 = bt.requests_timed_out
                t_meas_actual = now
            try:
                for _ in range(chunk):
                    bt.submit(img).add_done_callback(cb)
            except Exception:
                break  # queue full: backlog beyond max_queue, stop feeding
            if n_lat0 is not None:
                submitted_meas += chunk
            next_t += interval
        t_feed_end = time.perf_counter()
        if n_lat0 is None:  # queue filled during ramp: report the ramp window
            with lk:
                c0 = 0
            n_lat0, to0, t_meas_actual = 0, 0, t_start
        with lk:
            c1 = completed[0]
        goodput = (c1 - c0) / (t_feed_end - t_meas_actual)
        lat = np.asarray(bt.latencies_ms[n_lat0:]) if len(bt.latencies_ms) > n_lat0 else np.zeros(1)
        timed_out = bt.requests_timed_out - to0
        backlog = bt._queue.qsize()
        bt.stop()  # drains/fails the backlog
        st = bt.stats()
        return {
            "offered": offered,
            "goodput": goodput,
            "p50": float(np.percentile(lat, 50)),
            "p95": float(np.percentile(lat, 95)),
            "p99": float(np.percentile(lat, 99)),
            "timed_out": timed_out,
            "submitted": submitted_meas,
            "backlog": backlog,
            "occupancy": st["occupancy"],
        }

    print(f"\nopen-loop sweep (measure {MEASURE_SECS:.0f}s/point, no SLA):", flush=True)
    rows = []

    def sweep_point(rho):
        r = run_point(rho * capacity, MEASURE_SECS)
        rows.append((rho, r))
        print(f"  load {rho:4.0%} ({r['offered']:7,.0f} req/s): goodput {r['goodput']:7,.0f}"
              f"  p50 {r['p50']:7.1f} ms  p95 {r['p95']:7.1f}  p99 {r['p99']:8.1f}"
              f"  backlog {r['backlog']:6d}  occ {r['occupancy']:.2f}", flush=True)
        return r

    for rho in LOADS:
        sweep_point(rho)
    # the closed-loop feeder can under-estimate true capacity (it measures
    # feeder+batcher in series); ESCALATE until goodput actually saturates
    # (goodput < 92% of offered, or the backlog grows) so the knee is real
    rho = LOADS[-1]
    while rho < 3.0:
        r = rows[-1][1]
        if r["goodput"] < 0.92 * r["offered"] or r["backlog"] > 0.5 * r["offered"]:
            break
        rho = round(rho + 0.2, 1)
        sweep_point(rho)

    sat = max(r["goodput"] for _, r in rows)
    p99_ref = next(r["p99"] for rho, r in rows if rho == 0.5)
    knee = next((rho for rho, r in rows
                 if r["p99"] > 3 * p99_ref or r["goodput"] < 0.92 * r["offered"]), None)
    print(f"saturation goodput: {sat:,.0f} req/s "
          f"({sat/capacity:.2f}x the closed-loop estimate)", flush=True)
    print((f"knee (p99 > 3x 50%-load p99 of {p99_ref:.1f} ms, or goodput < 92% "
           f"of offered): {knee:.0%} of closed-loop capacity") if knee
          else "knee: none within sweep", flush=True)

    # ---- overload WITH the SLA: shedding must hold goodput near saturation ----
    over = 1.2 * sat
    print(f"\noverload arm at {over:,.0f} req/s (120% of saturation) "
          f"WITH request_timeout_s={SLA_S}s:", flush=True)
    r = run_point(over, MEASURE_SECS, request_timeout_s=SLA_S)
    shed_rate = r["timed_out"] / max(r["submitted"], 1)
    print(f"  goodput {r['goodput']:7,.0f} req/s ({r['goodput']/sat:.1%} of saturation)"
          f"  shed {r['timed_out']} ({shed_rate:.1%} of submitted)"
          f"  p50 {r['p50']:6.1f} ms  p99 {r['p99']:6.1f} ms"
          f"  backlog {r['backlog']}", flush=True)
    # the deadline bounds QUEUE wait only (checked at drain; in-flight
    # batches always complete — batching.py semantics). What rides on top of
    # it in the served p99 is post-drain pipeline residence: assembly, the
    # bounded dispatch queue (2), in-flight depth (4), and the resolve lag
    # (a full pipeline resolves batch k only as k+depth-1 dispatches).
    svc_ms = BUCKET / max(r["goodput"], 1) * 1e3
    print(f"  served-request p99 decomposition: {r['p99']:.1f} ms total = "
          f"{SLA_S*1e3:.0f} ms deadline-bounded queue wait + "
          f"{r['p99'] - SLA_S*1e3:.1f} ms post-drain pipeline residence "
          f"(~{(r['p99'] - SLA_S*1e3)/svc_ms:.0f} batch times at "
          f"{svc_ms:.1f} ms/batch; structural floor ~7-10)", flush=True)

    # ---- low-load latency with the PRODUCTION multi-bucket config ----
    # the fixed-128-bucket sweep reads ~58 ms p50 even at 20% load (batch-
    # fill time); serve()'s layered buckets let sparse traffic ride small
    # batches instead
    print(f"\nlow-load arm (20% of saturation) with buckets {ALL_BUCKETS}:", flush=True)
    r = run_point(0.2 * sat, MEASURE_SECS, buckets=ALL_BUCKETS)
    print(f"  goodput {r['goodput']:7,.0f} req/s  p50 {r['p50']:6.1f} ms  "
          f"p95 {r['p95']:6.1f}  p99 {r['p99']:6.1f}  occ {r['occupancy']:.2f} "
          f"(vs ~58 ms p50 at the fixed 128 bucket)", flush=True)


if __name__ == "__main__":
    main()
