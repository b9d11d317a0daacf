"""Test environment: CPU backend with 8 virtual devices.

Multi-device sharding is tested without a TPU pod by forcing the host
platform to expose 8 fake devices (SURVEY.md §4.6). Must run before jax is
imported anywhere — pytest loads conftest first, so this is the one place.
"""

import os

# Force-set: the container pins JAX_PLATFORMS=axon (TPU) in the environment
# and its sitecustomize imports jax before conftest runs, so the env var
# alone is already consumed — jax.config.update is the authoritative switch.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
