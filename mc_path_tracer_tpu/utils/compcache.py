"""Persistent XLA compilation cache (kills repeat compile latency).

The integrator's block program is compiled once per (config, shape); the
persistent cache makes that a one-time cost across processes -- bench/CLI
cold starts reuse yesterday's executable.  Safe no-op where the backend
does not support it.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/mc_path_tracer_tpu_xla")


def enable_persistent_cache(path: str | None = None) -> bool:
    """Enable the JAX persistent compilation cache; returns success."""
    import jax

    try:
        cache_dir = path or os.environ.get("MCPT_COMPILE_CACHE", _DEFAULT_DIR)
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return True
    except Exception:
        return False
