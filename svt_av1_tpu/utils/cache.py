"""Persistent XLA compile-cache activation.

The JAX build in this image defines ``jax_compilation_cache_dir`` as a
config state whose default ignores the ``JAX_COMPILATION_CACHE_DIR``
environment variable, so processes that only export the env var get NO
persistent cache -- every process recompiles every program (the TPU
tunnel backend compiles the full preset-6 GOP program set in ~16 min).
``ensure_compile_cache()`` pushes the env values into the live config
(idempotent, safe before or after the first jit).  The backend itself
supports executable serialization (platform reports "tpu"), verified
by a cross-process hit: 6.4 s compile -> 0.86 s load.
"""
from __future__ import annotations

import os


def ensure_compile_cache(default_dir: str | None = None) -> None:
    d = os.environ.get("JAX_COMPILATION_CACHE_DIR", default_dir)
    if not d:
        return
    import jax
    try:
        if jax.config.jax_compilation_cache_dir != d:
            jax.config.update("jax_compilation_cache_dir", d)
        t = float(os.environ.get(
            "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1"))
        if jax.config.jax_persistent_cache_min_compile_time_secs != t:
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", t)
    except (AttributeError, ValueError):
        pass  # future JAX: env vars honored natively / keys renamed
