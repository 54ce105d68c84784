"""Test configuration: force an 8-fake-device CPU JAX platform.

Per SURVEY.md section 5, all tests run on CPU with
xla_force_host_platform_device_count=8 so the real shard_map / ppermute
code paths execute without TPU hardware.  The environment pins
JAX_PLATFORMS=axon via sitecustomize, so the env var alone is not enough --
we must override through jax.config before any computation runs.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent XLA compile cache: the suite's cost is dominated by XLA:CPU
# compiles of interpret-mode Pallas decode programs (~10-25 s each,
# measured; execution is seconds).  Caching them makes warm reruns of the
# fast tier several times faster; the cache key includes jaxpr + flags,
# so stale hits are not a correctness risk.
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax-turbotpu-tests"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass

import pytest


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running statistical test")
    config.addinivalue_line("markers", "tpu: requires real TPU hardware")
