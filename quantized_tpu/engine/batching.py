"""Continuous request batching (BASELINE.json north star: "activations
batch-sharded with continuous request batching across hosts").

CNN serving is simpler than LLM serving (no KV cache, fixed shapes — SURVEY.md
section 7 hard part #5) but bucketing + recompile avoidance must be designed
in: requests are admitted to a queue; the scheduler drains it into the
smallest *pre-compiled* batch bucket that covers the pending set (padding the
tail), so XLA compiles exactly ``len(batch_sizes)`` programs total.

Metrics: per-request latency (admission -> result), batch occupancy, and
throughput counters, exported as JSONL-able dicts (SURVEY.md section 5
observability row).
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from concurrent.futures import Future
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass
class _Request:
    rid: int
    image: np.ndarray
    future: Future
    t_submit: float


class ContinuousBatcher:
    """Drains an admission queue into padded fixed-size batches.

    executor: callable (batch_f32 NHWC) -> logits; must be shape-stable per
    bucket size (jitted once per bucket — call ``warmup()`` to precompile).
    """

    def __init__(
        self,
        executor: Callable[[np.ndarray], np.ndarray],
        input_shape: Tuple[int, int, int],
        batch_sizes: Sequence[int] = (1, 8, 32),
        max_wait_ms: float = 2.0,
        max_queue: int = 4096,
    ):
        self.executor = executor
        self.input_shape = tuple(input_shape)
        self.batch_sizes = tuple(sorted(set(batch_sizes)))
        self.max_wait_s = max_wait_ms / 1e3
        self._queue: "queue.Queue[_Request]" = queue.Queue(max_queue)
        self._rid = 0
        self._rid_lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self.latencies_ms: List[float] = []
        self.batches_run = 0
        self.requests_done = 0
        self.padded_slots = 0
        self.steps = 0

    # ------------------------------------------------------------- lifecycle
    def start(self):
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=30)

    def warmup(self):
        """Precompile every bucket (one dummy batch each)."""
        for b in self.batch_sizes:
            self.executor(np.zeros((b, *self.input_shape), np.float32))
        return self

    # ------------------------------------------------------------- client API
    def submit(self, image: np.ndarray) -> Future:
        if tuple(image.shape) != self.input_shape:
            raise ValueError(f"expected image shape {self.input_shape}, got {image.shape}")
        with self._rid_lock:
            self._rid += 1
            rid = self._rid
        fut: Future = Future()
        self._queue.put(_Request(rid, np.asarray(image, np.float32), fut, time.perf_counter()))
        return fut

    # ------------------------------------------------------------- scheduler
    def _drain(self, limit: int) -> List[_Request]:
        out: List[_Request] = []
        deadline = time.perf_counter() + self.max_wait_s
        while len(out) < limit:
            timeout = deadline - time.perf_counter()
            try:
                out.append(self._queue.get(timeout=max(timeout, 0.0005) if out else 0.05))
            except queue.Empty:
                if out or self._stop.is_set():
                    break
        return out

    def _pick_bucket(self, n: int) -> int:
        for b in self.batch_sizes:
            if b >= n:
                return b
        return self.batch_sizes[-1]

    def _loop(self):
        while not self._stop.is_set() or not self._queue.empty():
            reqs = self._drain(self.batch_sizes[-1])
            if not reqs:
                continue
            self.steps += 1
            bucket = self._pick_bucket(len(reqs))
            batch = np.zeros((bucket, *self.input_shape), np.float32)
            for i, r in enumerate(reqs):
                batch[i] = r.image
            try:
                logits = np.asarray(self.executor(batch))
            except Exception as e:  # pragma: no cover
                for r in reqs:
                    r.future.set_exception(e)
                continue
            t_done = time.perf_counter()
            for i, r in enumerate(reqs):
                r.future.set_result(logits[i])
                self.latencies_ms.append((t_done - r.t_submit) * 1e3)
            self.batches_run += 1
            self.requests_done += len(reqs)
            self.padded_slots += bucket - len(reqs)

    # ------------------------------------------------------------- metrics
    def stats(self) -> Dict[str, float]:
        lat = np.asarray(self.latencies_ms) if self.latencies_ms else np.zeros(1)
        total = self.requests_done + self.padded_slots
        return {
            "requests": self.requests_done,
            "batches": self.batches_run,
            "occupancy": self.requests_done / max(total, 1),
            "latency_p50_ms": float(np.percentile(lat, 50)),
            "latency_p95_ms": float(np.percentile(lat, 95)),
            "latency_p99_ms": float(np.percentile(lat, 99)),
        }
