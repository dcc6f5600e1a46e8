#!/bin/bash
# Run the test suite on pure CPU (8 virtual devices for sharding tests),
# bypassing any TPU plugin the host environment preloads via PYTHONPATH.
#
#   ./run_tests.sh            full suite
#   ./run_tests.sh --smoke    <5-min gate: driver captures + tiny
#                             round trips (run before EVERY snapshot)
cd "$(dirname "$0")"
ARGS=("$@")
if [ "${1:-}" = "--smoke" ]; then
    shift
    ARGS=(tests/test_smoke.py "$@")
fi
exec env PYTHONPATH= JAX_PLATFORMS=cpu \
    XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}" \
    JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1 \
    python -m pytest -q "${ARGS[@]:-tests/}"
