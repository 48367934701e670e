"""Persistent XLA compilation cache.

On small hosts XLA compiles of the b3/b7 programs take minutes; enabling
the persistent cache makes every process after the first start instantly.
Call :func:`enable` early (bench.py, __graft_entry__.py and the CLIs do).
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")


def enable(cache_dir: str | None = None, readonly: bool | None = None) -> None:
    """Point XLA's persistent cache at the repo cache dir.

    ``readonly`` (or env ``MUSCLE_CACHE_READONLY=1``) keeps cache *reads*
    but pushes writes out of reach.  Cache-entry serialization from a
    process with torch co-loaded segfaults jaxlib intermittently (observed
    in the in-process dryrun and a full pytest run), so torch-coloaded
    tools (the gate harness, parity probes) should run readonly once the
    cache is warm.
    """
    import jax

    path = os.path.abspath(cache_dir or os.environ.get("MUSCLE_JAX_CACHE", DEFAULT_DIR))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    if readonly is None:
        readonly = os.environ.get("MUSCLE_CACHE_READONLY", "") == "1"
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", 1e9 if readonly else 1.0
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
