"""Persistent JAX compilation cache.

A fresh process pays ~3 minutes of XLA compilation for the full pipeline on
TPU; enabling the persistent cache cuts repeat CLI/benchmark invocations to
seconds.  Called by the CLI and bench entry points (a library should not
mutate global JAX config on import).
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    cache_dir = path or os.environ.get(
        "PWICP_JAX_CACHE", os.path.expanduser("~/.cache/pwicp_jax"))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover - older/newer jax flag drift
        pass
