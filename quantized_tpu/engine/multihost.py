"""Multi-host continuous-batching serving (BASELINE config #5).

The reference has no serving or networked runtime at all (SURVEY.md #22/#23:
single-process ``nn.DataParallel`` only), so this is green-field TPU
capability: every host runs its own admission queue and drains it into the
*process-local shard* of one global SPMD forward — activations sharded over
the mesh's ``data`` axis (one shard per host, DP over DCN), weights TP-sharded
over the ``model`` axis (ICI). GSPMD inserts the collectives.

The one genuinely distributed problem continuous batching adds is *step
agreement*: every process must enter the same jitted computation the same
number of times with the same bucket size, while requests arrive at each host
independently. ``MultiHostBatcher`` solves it with a per-step count allgather
(``multihost_utils.process_allgather``): hosts exchange pending counts, take
the max, and all run that bucket (hosts with fewer pending pad — padded rows
never mix into real rows, each image's logits depend only on that image).
Shutdown uses the same channel: the loop exits only when every host reports
stopped-and-drained, so no host leaves a collective hanging.

Host-death bound (SURVEY.md section 5 failure-detection row): every
cross-host wait — the count allgather AND the SPMD step itself — runs under
a ``peer_timeout_s`` watchdog (default 60 s). If a peer process dies
(SIGKILL, OOM, machine loss), the survivor's next collective blocks; the
watchdog converts that into a failure of this step's and all queued futures
within ``peer_timeout_s``, stops the batcher (further submits raise), and
lets the process exit cleanly instead of hanging on DCN. The stuck
collective is abandoned on a daemon thread (JAX's own coordination-service
heartbeat eventually aborts it; we do not wait for that — its default
detection window is ~100 s).
"""

from __future__ import annotations

import logging
import queue
import threading
import time
from typing import Callable, Sequence, Tuple

import jax
import numpy as np

from quantized_tpu.engine.batching import ContinuousBatcher

logger = logging.getLogger(__name__)


class HostShardedExecutor:
    """Global-SPMD forward fed by process-local batches.

    Each process passes its local rows (its ``data``-axis shard); the global
    batch is ``local_batch * process_count``. Weights are TP-sharded over the
    mesh's ``model`` axis at construction (same rules as ``IntExecutor``).
    Returns this host's rows of the logits as numpy.
    """

    def __init__(self, model, mesh, ingest: str = "f32"):
        from flax import nnx
        from jax.sharding import NamedSharding, PartitionSpec as P

        from quantized_tpu.engine.executor import enable_compilation_cache
        from quantized_tpu.parallel.mesh import DATA_AXIS
        from quantized_tpu.parallel.sharding import shard_model_state

        enable_compilation_cache()
        self.mesh = mesh
        self.ingest = ingest
        if ingest == "u8" and not hasattr(model, "run_u8"):
            raise ValueError(f"{type(model).__name__} has no uint8 ingest path")
        state = nnx.state(model)
        nnx.update(model, shard_model_state(state, mesh))
        self._graphdef, self._state = nnx.split(model)
        self._in_spec = P(DATA_AXIS, None, None, None)
        self._out_spec = P(DATA_AXIS, None)
        out_sharding = NamedSharding(mesh, self._out_spec)

        def forward(state, x):
            m = nnx.merge(self._graphdef, state)
            y = m.run_u8(x) if ingest == "u8" else m(x)
            return jax.lax.with_sharding_constraint(y, out_sharding)

        self._forward = jax.jit(forward)

    def __call__(self, local_batch: np.ndarray) -> np.ndarray:
        from jax.experimental import multihost_utils

        if jax.process_count() == 1:
            # degenerate single-host case: plain data-sharded pjit
            from jax.sharding import NamedSharding

            x = jax.device_put(
                local_batch, NamedSharding(self.mesh, self._in_spec)
            )
            return np.asarray(self._forward(self._state, x))
        xg = multihost_utils.host_local_array_to_global_array(
            np.asarray(local_batch), self.mesh, self._in_spec
        )
        out = self._forward(self._state, xg)
        local = multihost_utils.global_array_to_host_local_array(
            out, self.mesh, self._out_spec
        )
        return np.asarray(local)


class MultiHostBatcher(ContinuousBatcher):
    """Per-host continuous batcher over a global SPMD executor.

    ``batch_sizes`` are *per-host* bucket sizes (global batch = bucket x
    process_count). The scheduler loop is the parent's, with two coordinated
    points: bucket agreement before each step and drained agreement before
    shutdown (see module docstring). ``peer_timeout_s`` bounds every
    cross-host wait (see module docstring host-death bound).
    """

    def __init__(self, *args, peer_timeout_s: float = 60.0, **kwargs):
        super().__init__(*args, **kwargs)
        self.peer_timeout_s = peer_timeout_s

    def _bounded(self, what: str, fn: Callable):
        """Run ``fn`` (a cross-host wait) under the peer-death watchdog: raises
        TimeoutError after ``peer_timeout_s`` instead of blocking forever on a
        dead peer. The abandoned call keeps blocking on a daemon thread until
        JAX's coordination service aborts it — harmless, and the process can
        still exit (daemon)."""
        if jax.process_count() == 1 or self.peer_timeout_s is None:
            return fn()
        box = {}
        done = threading.Event()

        def run():
            try:
                box["out"] = fn()
            except Exception as e:  # surfaced below on the scheduler thread
                box["err"] = e
            finally:
                done.set()

        threading.Thread(target=run, daemon=True, name=f"qtpu-{what}").start()
        if not done.wait(self.peer_timeout_s):
            raise TimeoutError(
                f"multihost {what} exceeded peer_timeout_s={self.peer_timeout_s}s "
                "— assuming peer host death"
            )
        if "err" in box:
            raise box["err"]
        return box["out"]

    def warmup(self):
        # every process precompiles every bucket together (collective compiles)
        for b in self.batch_sizes:
            self.executor(np.zeros((b, *self.input_shape), self.dtype))
        return self

    def _drain(self, limit):
        """Bounded drain: unlike the single-host parent (which may wait on an
        empty queue indefinitely), an empty drain here returns ``[]`` after at
        most ``max(max_wait_s, 50ms)`` so every host reaches the ``_coordinate``
        allgather on a fixed heartbeat.  Without this, one idle host would
        never enter the count exchange and requests on every *other* host
        would stall until the idle host got traffic (round-3 advisor, high)."""
        out = []
        deadline = time.perf_counter() + max(self.max_wait_s, 0.05)
        while len(out) < limit:
            timeout = deadline - time.perf_counter()
            if timeout <= 0:
                break
            try:
                r = self._queue.get(timeout=max(timeout, 0.0005))
            except queue.Empty:
                break
            if not self._expired(r, time.perf_counter()):
                out.append(r)
        return out

    def _coordinate(
        self, n_local: int, done_local: bool, err_local: bool = False
    ) -> Tuple[int, bool, bool]:
        from jax.experimental import multihost_utils

        flags = self._bounded(
            "count-allgather",
            lambda: multihost_utils.process_allgather(
                np.asarray([n_local, int(done_local), int(err_local)], np.int32)
            ),
        ).reshape(jax.process_count(), 3)
        return (
            int(flags[:, 0].max()),
            bool(flags[:, 1].min()),
            bool(flags[:, 2].max()),
        )

    def _fail_all(self, reqs, exc) -> None:
        """Executor failure is fatal for the serving loop: fail this step's
        requests plus everything still queued, so no client blocks forever."""
        for r in reqs:
            if not r.future.done():
                self._complete(r.future, exc=exc)
        while True:
            try:
                r = self._queue.get_nowait()
            except queue.Empty:
                break
            if not r.future.done():
                self._complete(r.future, exc=exc)
        self._stop.set()

    def _loop(self):
        err: Exception | None = None
        while True:
            reqs = self._drain(self.batch_sizes[-1])
            done_local = self._stop.is_set() and self._queue.empty() and not reqs
            try:
                n_global, done_all, err_any = self._coordinate(
                    len(reqs), done_local, err_local=err is not None
                )
            except Exception as e:
                # Peer death (watchdog TimeoutError) or a coordination-service
                # abort: no further collective can succeed — fail this step's
                # and every queued future within the bound and stop.
                logger.error("multihost coordination failed: %r — stopping", e)
                self._fail_all(reqs, RuntimeError(f"peer coordination failed: {e!r}"))
                break
            if err_any:
                # Some host's executor raised mid-step. Continuing the
                # per-host loop would desynchronize the allgather counts and
                # leave peers hanging inside the SPMD forward's collectives
                # (round-3 advisor, medium) — treat it as fatal everywhere.
                self._fail_all(
                    reqs, err or RuntimeError("peer host reported executor failure")
                )
                break
            if done_all:
                break
            if n_global == 0:
                continue
            self.steps += 1
            bucket = self._pick_bucket(n_global)
            batch = self._assemble(reqs, bucket)
            try:
                # the SPMD step blocks on DCN collectives too — same bound
                logits = self._bounded(
                    "spmd-step", lambda: np.asarray(self.executor(batch))
                )
            except TimeoutError as e:
                # watchdog fired mid-step: a peer died between the count
                # agreement and the forward — same terminal path as a
                # coordination failure (no collective can complete anymore)
                logger.error("multihost SPMD step timed out: %r — stopping", e)
                self._fail_all(reqs, RuntimeError(f"peer died mid-step: {e!r}"))
                break
            except Exception as e:  # pragma: no cover
                # Hold the error and surface it through the *next* coordinate
                # round so every host exits the loop together.
                err = e
                for r in reqs:
                    self._complete(r.future, exc=e)
                continue
            t_done = time.perf_counter()
            for i, r in enumerate(reqs):
                self._complete(r.future, result=logits[i])
                self.latencies_ms.append((t_done - r.t_submit) * 1e3)
            self.batches_run += 1
            self.requests_done += len(reqs)
            self.padded_slots += bucket - len(reqs)


def serve_multihost(
    model,
    mesh,
    batch_sizes: Sequence[int] = (1, 8, 32),
    input_shape=None,
    ingest: str = "f32",
    peer_timeout_s: float = 60.0,
) -> MultiHostBatcher:
    """Bring up this host's shard of the global serving engine: returns a
    started ``MultiHostBatcher`` whose submit() admits this host's requests.
    Call on every process of an initialized ``jax.distributed`` runtime with
    the same mesh/buckets. ``peer_timeout_s`` bounds how long a dead peer can
    stall this host before pending futures fail (module docstring)."""
    if input_shape is None:
        size = getattr(model, "input_size", 224)
        input_shape = (size, size, 3)
    ex = HostShardedExecutor(model, mesh, ingest=ingest)
    dtype = np.uint8 if ingest == "u8" else np.float32
    batcher = MultiHostBatcher(ex, input_shape, batch_sizes, dtype=dtype,
                               peer_timeout_s=peer_timeout_s)
    batcher.warmup()
    logger.info(
        "multihost server up: process %d/%d buckets=%s input=%s",
        jax.process_index(), jax.process_count(), tuple(batch_sizes), input_shape,
    )
    return batcher.start()
