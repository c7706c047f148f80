"""Sound device timing over the axon TPU tunnel.

Two sandbox-specific hazards make naive timing lie (verified 2026-08-17 on the
live chip, bench/calibrate_timing.py):

1. ``jax.block_until_ready`` does NOT wait for execution through the axon
   tunnel — a 10x137 GFLOP matmul "completed" in 0.1 ms. Only fetching a
   value (D2H) synchronizes. Every measurement here ends in ``float(...)``.
2. Each dispatch pays a ~29 ms tunnel round-trip with multi-ms jitter, so the
   workload must run long enough inside one jitted ``lax.scan`` that the
   round-trip is noise: the loop count is chosen adaptively so one call does
   ~``target_secs`` of device work, and the nominal overhead is subtracted.

The scanned body must return a scalar that depends on its *full* output
(e.g. ``jnp.max(y)``) and feed it back into the next iteration's input;
reducing a slice (``y[0, 0]``) lets XLA shrink the computation itself.
"""

from __future__ import annotations

import time
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

TUNNEL_OVERHEAD_S = 0.029  # measured dispatch round-trip, bench/calibrate_timing.py
PROBE_LOOPS = 64
MAX_LOOPS = 20000


def _make_run(step: Callable, loops: int):
    @jax.jit
    def run(*args):
        def body(c, _):
            return jnp.float32(step(c, *args)), None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=loops)
        return c

    return run


def _time_call(run, args) -> float:
    t0 = time.perf_counter()
    float(run(*args))
    return time.perf_counter() - t0


def per_iter_time(
    step: Callable,
    *args,
    target_secs: float = 1.0,
    reps: int = 3,
    probe_loops: int = PROBE_LOOPS,
) -> float:
    """Seconds per iteration of ``step(carry, *args) -> scalar``.

    Probes at ``probe_loops`` to size the real measurement so one call does
    ~``target_secs`` of device work (tunnel overhead becomes <3% noise and is
    subtracted nominally).
    """
    from quantized_tpu.engine.executor import enable_compilation_cache

    enable_compilation_cache()
    run = _make_run(step, probe_loops)
    float(run(*args))  # compile + warm
    t_probe = min(_time_call(run, args) for _ in range(2))
    iter_est = max((t_probe - TUNNEL_OVERHEAD_S) / probe_loops, 1e-7)

    loops = min(max(probe_loops, int(target_secs / iter_est)), MAX_LOOPS)
    if loops > probe_loops * 1.5:
        run = _make_run(step, loops)
        float(run(*args))
    else:
        loops = probe_loops
    ts = [_time_call(run, args) for _ in range(reps)]
    ts.sort()
    return max(ts[len(ts) // 2] - TUNNEL_OVERHEAD_S, 1e-9 * loops) / loops


def chain_time(
    fn: Callable,
    x,
    *consts,
    target_secs: float = 0.5,
    reps: int = 3,
) -> float:
    """Seconds per application of ``fn`` in the chain x -> fn(x) -> ... .

    For shape-preserving ``fn`` this is the honest form of ``per_iter_time``:
    the output IS the next input, so (a) fn's output must fully materialize
    (no fused-away writes) and (b) no extra perturbation pass exists. The
    round-2 probes' ``x + carry`` trick added a full elementwise pass to
    every measurement and let XLA reduce un-materialized outputs — which is
    how a "1457 GB/s duplex" rate exceeded the chip's HBM (see RESULTS.md
    round-3 DMA study). Extra ``consts`` are passed through unchanged.
    """

    def make(loops):
        @jax.jit
        def run(x0, *cs):
            y, _ = jax.lax.scan(lambda c, _: (fn(c, *cs), None), x0, None, length=loops)
            # full reduction (amortized once per run): a sliced reduce would
            # invite dead-code elimination of the computation itself
            return jnp.max(y).astype(jnp.float32)

        return run

    from quantized_tpu.engine.executor import enable_compilation_cache

    enable_compilation_cache()
    probe = 32
    run = make(probe)
    float(run(x, *consts))  # compile + warm (value fetch = the only barrier)
    t0 = time.perf_counter()
    float(run(x, *consts))
    t_probe = time.perf_counter() - t0
    est = max((t_probe - TUNNEL_OVERHEAD_S) / probe, 1e-7)
    loops = min(max(probe, int(target_secs / est)), MAX_LOOPS)
    if loops > probe * 1.5:
        run = make(loops)
        float(run(x, *consts))
    else:
        loops = probe
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(x, *consts))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return max(ts[len(ts) // 2] - TUNNEL_OVERHEAD_S, 1e-9 * loops) / loops
