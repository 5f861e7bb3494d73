"""Test configuration: run all tests on CPU with 8 virtual devices so
multi-chip sharding paths compile and execute without TPU hardware
(the standard JAX fake-multidevice trick; see SURVEY.md §4).

Note: this image boots an `axon` TPU plugin from sitecustomize.py (it runs
before conftest and registers the backend + sets jax_platforms), so the env
vars alone are not enough — we must also jax.config.update after import.
"""
import os

# Must be set before jax initializes any backends.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(0)
