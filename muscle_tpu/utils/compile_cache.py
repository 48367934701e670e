"""Persistent XLA compilation cache.

On small hosts XLA compiles of the b3/b7 programs take minutes; enabling
the persistent cache makes every process after the first start instantly.
Call :func:`enable` early (bench.py, __graft_entry__.py and the CLIs do).
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")

_CODEGEN_FLAG = "--xla_cpu_parallel_codegen_split_count=1"


def serialize_cpu_codegen() -> None:
    """Disable XLA:CPU parallel codegen for this process (must run before
    the first backend touch — XLA parses XLA_FLAGS at client creation).

    XLA:CPU splits each module into parts JIT-compiled on a thread pool.
    In processes that co-load torch, the big-module compile segfaults
    jaxlib intermittently (observed 4x: tests/conftest.py history; the
    latest at tests/test_training.py::test_seg_train_step_runs inside
    `backend.compile_and_load` — torch ships its own LLVM/OpenMP runtimes,
    and parallel codegen multiplies the cross-runtime exposure).  On the
    1-vCPU hosts that run the CPU tiers, parallel codegen buys nothing,
    so the torch-coloaded entry points (pytest, gate harness, A/B tools)
    serialize it.
    """
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_cpu_parallel_codegen_split_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " " + _CODEGEN_FLAG).strip()


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
