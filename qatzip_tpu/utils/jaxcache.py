"""Persistent XLA compile-cache setup.

The tokenizer compiles one XLA program per (batch-bucket, chunk-size)
pair; compiles cost 10s-7min depending on backend, so every process must
hit a warm on-disk cache. jax 0.9 only honors ``jax.config.update`` (the
JAX_COMPILATION_CACHE_DIR env var is ignored), and jax may already be
imported by the image's sitecustomize — so this must run config updates,
not env exports.

Note: XLA:CPU logs a scary ``cpu_aot_loader.cc`` "machine type mismatch /
SIGILL" error on EVERY persistent-cache load — the "unsupported features"
are XLA's own injected tuning pseudo-flags (+prefer-no-scatter,
+prefer-no-gather), not real ISA bits; it reproduces with an entry
compiled minutes earlier on the same host. Benign — do not re-chase it
with per-host cache dirs (measured 2026-08-18: /tmp is fresh each round,
entries never cross hosts).
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
