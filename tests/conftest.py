"""Test harness configuration.

Runs the whole suite on CPU with 8 virtual devices so multi-chip sharding
paths compile and execute without TPU hardware (SURVEY.md §4: the TPU-native
substitute for fake-backend tests), and so numerical-parity tests see exact
fp32 matmuls (TPU default matmul precision is bf16).

The image's sitecustomize registers the 'axon' TPU plugin and pins
``jax_platforms`` via ``jax.config.update`` at interpreter start, so setting
the env var is not enough — we must update the config after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
