"""Test configuration: run on a virtual 8-device CPU mesh with x64 available.

The TPU-hardware path is exercised by bench.py / __graft_entry__.py; unit
tests validate math on CPU (fast, deterministic, multi-device via
``--xla_force_host_platform_device_count``), mirroring the reference's
CPU-only unit-test strategy (SURVEY.md §4).
"""

import os

# Must be set before the first jax backend initialization.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment may pre-register an accelerator plugin that overrides
# JAX_PLATFORMS; force the CPU backend programmatically as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Opt-in persistent compilation cache: the suite is XLA-compile-bound, and
# warm-cache runs cut per-test compile time roughly in half. Off by default
# because XLA:CPU AOT reload prints machine-feature warnings; enable with
#   ALIGATOR_TPU_JAX_CACHE=/path/to/cache python -m pytest ...
_cache_dir = os.environ.get("ALIGATOR_TPU_JAX_CACHE")
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled-executable caches between test modules.

    With the full suite in one process (~170 tests, hundreds of compiled
    while_loop programs) the XLA CPU compiler eventually crashes
    (SIGABRT/SIGSEGV inside backend_compile, position-dependent, every test
    passing in isolation) and resident memory grows by gigabytes. Clearing
    per module bounds compiler state; cross-module cache hits are rare, so
    the runtime cost is small."""
    yield
    jax.clear_caches()
