"""Test harness: 8 virtual CPU devices (the multi-chip stand-in).

Must set env before any jax import (SURVEY.md §4: the TPU-native analog
of testing multi-node without a cluster).
"""

import os
import tempfile

os.environ["JAX_PLATFORMS"] = "cpu"
# Isolate the persistent compile cache per test run: CLI-driving tests
# call setup_compilation_cache(), and sharing ~/.cache/mdd_tpu/xla with
# a concurrently-running TPU job has produced a native crash in the
# cache writer (observed: segfault in put_executable_and_time while the
# bench process wrote the same directory).  A throwaway dir keeps the
# coverage and removes the cross-process collision.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      tempfile.mkdtemp(prefix="mdd_test_xla_cache_"))
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Env alone is not enough on axon-tunnel hosts: the axon sitecustomize
# registers the remote-TPU backend at interpreter boot and pins
# jax_platforms="axon,cpu", silently routing every "CPU" test through the
# tunnel (one remote compile per jit).  Re-pin to cpu programmatically,
# and use jax_num_cpu_devices (the XLA_FLAGS route is ignored once the
# CPU client exists).
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _seed_numpy():
    np.random.seed(0)
