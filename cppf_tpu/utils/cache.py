"""Persistent XLA compilation cache setup (first compiles are 20-60s via the
remote compiler; caching makes repeat runs of bench/demo/drivers instant)."""
from __future__ import annotations

import os


def enable_compilation_cache(path: str = "/tmp/cppf_jax_cache") -> None:
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
