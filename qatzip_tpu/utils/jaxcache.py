"""Persistent XLA compile-cache setup.

The tokenizer compiles one XLA program per (batch-bucket, chunk-size)
pair; compiles cost 10s-7min depending on backend, so every process must
hit a warm on-disk cache. jax 0.9 only honors ``jax.config.update`` (the
JAX_COMPILATION_CACHE_DIR env var is ignored), and jax may already be
imported by the image's sitecustomize — so this must run config updates,
not env exports.
"""

from __future__ import annotations

import os

_done = False


def ensure_compile_cache() -> None:
    global _done
    if _done or os.environ.get("QZTPU_JAX_CACHE") == "0":
        return
    _done = True
    try:
        import jax

        cache_dir = os.environ.get("QZTPU_JAX_CACHE", "/tmp/qztpu_jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # noqa: BLE001 — cache is an optimization only
        pass
