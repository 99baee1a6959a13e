"""Test configuration: force the CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a simulated 8-device mesh
(``xla_force_host_platform_device_count``); the real-TPU path is exercised
by bench.py and the driver's graft entry instead.

The environment may pre-register an accelerator PJRT plugin at interpreter
startup (sitecustomize), so setting JAX_PLATFORMS via os.environ alone is
not enough — we also flip the live jax config before any backend
initializes.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_jax_executable_memory():
    """Drop compiled executables after each test module.

    The suite is compile-heavy (64 files, many distinct mesh/shape
    programs); keeping every executable alive in one pytest process grew
    RSS past 50 GB. Per-module clearing bounds the working set — modules
    rarely share programs, so the recompile cost is negligible.
    """
    yield
    jax.clear_caches()
