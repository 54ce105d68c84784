"""Test configuration: force an 8-fake-device CPU JAX platform.

Per SURVEY.md section 5, all tests run on CPU with
xla_force_host_platform_device_count=8 so the real shard_map / ppermute
code paths execute without TPU hardware.  Must run before jax is imported.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import pytest


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running statistical test")
    config.addinivalue_line("markers", "tpu: requires real TPU hardware")
