"""Test configuration: force JAX onto a virtual 8-device CPU mesh so the
suite is hardware-independent (sharding tests included) and never routes
through a TPU tunnel.  The host environment may preload a TPU PJRT
plugin and pin JAX_PLATFORMS; jax.config.update overrides it."""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
