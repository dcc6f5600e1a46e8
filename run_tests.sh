#!/bin/bash
# Run the test suite on pure CPU (8 virtual devices for sharding tests),
# bypassing any TPU plugin the host environment preloads via PYTHONPATH.
cd "$(dirname "$0")"
exec env PYTHONPATH= JAX_PLATFORMS=cpu \
    XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    python -m pytest tests/ -q "$@"
