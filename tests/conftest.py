"""Test configuration: run all tests on a virtual 8-device CPU mesh.

This is the JAX analogue of multi-node testing without a cluster
(SURVEY.md §4): xla_force_host_platform_device_count=8 gives eight CPU
devices so mesh/sharding tests exercise real collectives.

Note: this environment's sitecustomize imports jax and pins the platform to
the remote 'axon' TPU at interpreter startup, so env vars alone are too
late — we must override via jax.config before any backend computation runs.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Free compiled executables between modules: the full suite compiles
    thousands of programs (exhaustive oracles compile one per shape) and
    unbounded CPU-JIT code memory eventually segfaults LLVM."""
    yield
    jax.clear_caches()
