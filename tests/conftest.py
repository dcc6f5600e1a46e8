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

from svt_av1_tpu.utils.cache import ensure_compile_cache  # noqa: E402

ensure_compile_cache()  # this JAX ignores JAX_COMPILATION_CACHE_DIR env

import pytest  # noqa: E402

_mods_since_clear = [0]


@pytest.fixture(autouse=True, scope="module")
def _bound_xla_compiler_state():
    """XLA's CPU compiler segfaults (SIGSEGV inside
    backend_compile_and_load) after several hundred distinct program
    compilations accumulate in one process — reproducibly at ~90% of a
    full-suite run, never in per-file shards.  Dropping the executable
    caches every few modules keeps the compiler state bounded; shared
    programs recompile, which costs some wall time but keeps one
    `pytest tests/` invocation reliable."""
    yield
    _mods_since_clear[0] += 1
    if _mods_since_clear[0] >= 5:
        _mods_since_clear[0] = 0
        jax.clear_caches()
