"""Multi-host runtime (SURVEY.md #23: the reference has NO networked backend —
this is green-field TPU capability).

Bring-up: every host calls ``initialize_multihost`` (jax.distributed over
DCN), builds the same global mesh, and feeds per-host shards of the batch.
Failure detection: ``heartbeat_barrier`` runs a psum over all processes with a
watchdog timeout — a missing host fails fast instead of hanging the slice
(SURVEY.md section 5 failure-detection row).
"""

from __future__ import annotations

import logging
import os
import threading
from typing import Optional

import jax
import numpy as np

logger = logging.getLogger(__name__)


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """jax.distributed.initialize wrapper; env-var driven when args are None
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID). Returns
    True when a multi-process runtime came up, False for single-process."""
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "0") or 0)
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0") or 0)
    if not coordinator_address or num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        "multihost up: process %d/%d, %d local / %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )
    return True


def heartbeat_barrier(timeout_s: float = 60.0, tag: str = "heartbeat") -> None:
    """All-process barrier with fail-fast watchdog: a psum across all devices
    must complete within ``timeout_s`` or the process aborts (rather than
    silently hanging on a dead peer)."""
    import jax.numpy as jnp

    done = threading.Event()

    def watchdog():
        if not done.wait(timeout_s):
            logger.error("heartbeat_barrier(%s) timed out after %.0fs — aborting", tag, timeout_s)
            os._exit(42)

    t = threading.Thread(target=watchdog, daemon=True)
    t.start()
    try:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)
    except Exception:
        # single-process fallback: a trivial computation
        jax.block_until_ready(jnp.zeros(()) + 1)
    done.set()


def local_batch_slice(global_batch: int) -> slice:
    """This host's slice of a globally-ordered batch (per-host request
    ingestion for the serving engine)."""
    per = global_batch // max(jax.process_count(), 1)
    start = jax.process_index() * per
    return slice(start, start + per)
