"""Test configuration: run everything on a virtual 8-device CPU mesh.

In this environment jax is pre-imported at interpreter startup with a TPU
backend already registered, so JAX_PLATFORMS env vars are too late; instead
we point the config at CPU (lazily initialized, so the host-platform
device-count flag still applies).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
