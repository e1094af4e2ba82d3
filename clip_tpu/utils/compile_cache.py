"""Persistent XLA compilation cache.

The reference pays zero compile cost (ggml interprets its graph); our jitted
towers pay a 20-60 s XLA compile per process, which dominates one-shot CLI
latency.  Enabling JAX's persistent compilation cache makes every invocation
after the first load its executables from disk.

Opt-out: set ``CLIP_TPU_NO_COMPILE_CACHE=1``.  A user-provided
``JAX_COMPILATION_CACHE_DIR`` env var is respected as-is.
"""

from __future__ import annotations

import os

_done = False


def enable_compile_cache() -> None:
    """Idempotently point JAX at a persistent on-disk compilation cache."""
    global _done
    if _done or os.environ.get("CLIP_TPU_NO_COMPILE_CACHE"):
        return
    _done = True

    import jax

    path = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "clip_tpu", "xla"
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache even fast compiles (CLI latency is dominated by many ~1s
        # ones) — but never clobber thresholds the user set explicitly
        if not os.environ.get("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"):
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
        if not os.environ.get("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"):
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # unknown config on old jax: fall back silently
        pass
