"""Test configuration.

The build environment preimports jax and registers the axon TPU backend in
every python process, so tests would otherwise run every jax op through a
tunneled TPU. Switch the platform to CPU with 8 virtual devices *before the
backend initializes* (jax is imported but no client exists yet at conftest
time): sharding/multi-chip code paths are exercised without TPU round-trips.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (preimported by sitecustomize anyway)

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

assert jax.device_count() == 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()}")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
