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
