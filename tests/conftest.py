"""Test config: force the CPU backend with 8 virtual devices so mesh/sharding
tests run without TPU hardware (SURVEY.md section 4 "multi-host without a
cluster").

NOTE (sandbox-specific): a sitecustomize hook registers the 'axon' TPU-tunnel
PJRT backend and calls ``jax.config.update("jax_platforms", "axon,cpu")`` at
interpreter start, which overrides the JAX_PLATFORMS env var. We must therefore
re-update the config here — env vars alone do NOT work. XLA_FLAGS is still
honored because the CPU client is created lazily, after this file runs.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
