"""Test config: force an 8-device virtual CPU mesh so sharding tests run
without TPU hardware (bench.py uses the real chip instead)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib

import pytest

REFERENCE_TEST_DATA = pathlib.Path("/root/reference/test_data")


@pytest.fixture(scope="session")
def ref_test_data():
    return REFERENCE_TEST_DATA
