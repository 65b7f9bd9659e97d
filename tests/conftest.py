"""Test config: force an 8-device virtual CPU platform so sharding tests run
without TPU hardware, per the multi-chip validation contract."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The container's sitecustomize force-registers the TPU ("axon") platform, so
# env vars alone don't pin tests to CPU — override the config before any
# backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
