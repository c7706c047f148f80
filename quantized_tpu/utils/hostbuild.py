"""Host-side model/engine construction for the tunneled-TPU sandbox.

``build_int8_resident``/``convert_to_int`` read every weight back to the host
(numpy) while deriving scales and epilogues. When the source model's params
live on the TPU, that is ~100 MB of device->host traffic through the axon
tunnel — slow (24-46 MB/s) and, in this sandbox, the D2H stream can wedge
entirely under bulk transfers (observed 2026-08-20: a killed-mid-pull client
blocked *every* process's fetches for ~50 min).

The fix is structural, not sandbox-specific: build models and convert them
with all arrays on the host CPU backend, then push the finished engine state
to the accelerator in ONE batched ``device_put``. That is also the right
shape for real TPU pods (construct on host, ship once), so the helpers live
in the library, not the bench scripts.

Usage:
    with host_build():                       # arrays land on the CPU backend
        model = _calibrated_model(...)
        eng = build_int8_resident(model)
    put_model(eng)                           # one H2D push, in place
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax
from flax import nnx


@contextlib.contextmanager
def host_build():
    """Run model construction/conversion with the CPU backend as the default
    device, so no intermediate ever crosses the host<->accelerator boundary."""
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        yield


def put_model(model: nnx.Module, device: Optional[jax.Device] = None) -> nnx.Module:
    """Move every array of ``model`` to ``device`` (default: the first
    accelerator) in one batched transfer; mutates in place and returns it."""
    device = device or jax.devices()[0]
    state = nnx.state(model)
    nnx.update(model, jax.device_put(state, device))
    return model
