"""Tracing/profiling (SURVEY.md section 5: the reference has only wall-clock
AverageMeters, main.py ~L220-285; the TPU-native replacement is the XProf
trace machinery + the roofline/per-stage harnesses under bench/).

- ``trace(dir)``: context manager writing an XProf/TensorBoard trace of the
  enclosed device work (view with ``tensorboard --logdir dir`` or xprof).
- ``start_server(port)``: live profiling endpoint for capture-on-demand.
- ``annotate(name)``: named region that shows up on the trace timeline.
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False) -> Iterator[None]:
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def start_server(port: int = 9012):
    """Start the on-demand profiling server (connect with xprof/TensorBoard)."""
    return jax.profiler.start_server(port)


def annotate(name: str):
    """Named trace region: ``with annotate('stem'): ...``."""
    return jax.profiler.TraceAnnotation(name)
