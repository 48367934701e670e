"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on CPU with 8 virtual devices so multi-chip sharding logic is
exercised without TPU hardware (the driver separately dry-runs the sharded
path via __graft_entry__.dryrun_multichip).

NOTE: on this box `jax` is already imported at interpreter startup (site
customisation) with JAX_PLATFORMS=axon captured from the environment, so
env vars set here are too late — the platform must be forced through
jax.config *before any backend initialises* (backends are lazy, so this
works as long as nothing touched jax.devices() yet).
"""

import os

# torch + jax/oneDNN on this 1-vCPU box deadlock in OpenMP without this.
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")

# Serialize XLA:CPU codegen BEFORE any backend touch: big-module compiles
# with torch co-loaded segfault jaxlib intermittently (4th observation at
# test_training.py::test_seg_train_step_runs, 2026-08-20, crash INSIDE
# backend.compile_and_load — distinct from the cache-write serialize crash
# handled below).  See utils/compile_cache.serialize_cpu_codegen.
from muscle_tpu.utils.compile_cache import serialize_cpu_codegen

serialize_cpu_codegen()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Parity tests compare against float32 torch; the default (fast) matmul
# precision quantises conv/einsum inputs noticeably on this backend.
jax.config.update("jax_default_matmul_precision", "highest")
# JAX 0.9 enables the persistent compilation cache BY DEFAULT (default dir,
# no repo code involved), and cache-entry *serialization* from a process
# with torch co-loaded segfaults jaxlib intermittently (observed three
# times: twice in the in-process dryrun [put_executable_and_time frame],
# once at 94% of a full-suite run).  Keep cache READS (warm compiles) but
# push writes out of reach for the whole pytest process.  Subprocesses
# started by tests (e.g. the driver-faithful dryrun) are torch-free and
# manage their own cache via muscle_tpu.utils.compile_cache.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)

assert jax.default_backend() == "cpu", (
    "tests must run on the virtual CPU mesh; a backend initialised before "
    f"conftest could force jax_platforms=cpu (backend={jax.default_backend()})."
)
assert jax.device_count() == 8

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
