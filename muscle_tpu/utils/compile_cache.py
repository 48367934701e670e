"""Persistent XLA compilation cache.

On small hosts XLA compiles of the b3/b7 programs take minutes; enabling
the persistent cache makes every process after the first start instantly.
Call :func:`enable` early (bench.py, __graft_entry__.py and the CLIs do).
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")


def enable(cache_dir: str | None = None) -> None:
    import jax

    path = os.path.abspath(cache_dir or os.environ.get("MUSCLE_JAX_CACHE", DEFAULT_DIR))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
