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

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Parity tests compare against float32 torch; the default (fast) matmul
# precision quantises conv/einsum inputs noticeably on this backend.
jax.config.update("jax_default_matmul_precision", "highest")

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
