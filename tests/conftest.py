"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (SURVEY.md §4.5): this validates
the pjit/sharding paths without TPU hardware and keeps unit numerics
deterministic.  Must set the env vars BEFORE jax is imported anywhere.
"""

import os

# Force CPU even though the environment's sitecustomize registers the axon
# TPU plugin and sets JAX_PLATFORMS=axon before we run: overriding the env
# var alone is NOT enough (jax may already be imported by the site hook), so
# also update jax.config after import.  Backends initialize lazily, so the
# XLA_FLAGS device count still takes effect here.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
