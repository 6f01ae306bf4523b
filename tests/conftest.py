"""Test config: force an 8-device virtual CPU mesh so sharding tests run
without TPU hardware (bench.py uses the real chip instead).

NOTE: this environment pins JAX_PLATFORMS=axon (tunneled TPU) and a
sitecustomize that registers the axon PJRT plugin in every interpreter, so
env vars alone cannot force CPU — use jax.config before any backend use.
"""

import os

# probe results must not leak between the CPU-pinned test config and real
# device runs (the cache keys on env, and tests override via jax.config)
os.environ["HIPHASE_TPU_PROBE_CACHE"] = "0"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pathlib

import pytest

REFERENCE_TEST_DATA = pathlib.Path("/root/reference/test_data")


@pytest.fixture(scope="session")
def ref_test_data():
    return REFERENCE_TEST_DATA
