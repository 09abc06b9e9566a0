"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the env vars before jax is imported anywhere, so this executes at
conftest import time (pytest loads conftest first).
"""

import os

# Force the CPU mesh even when the ambient environment selects a TPU platform
# (e.g. JAX_PLATFORMS=axon); set ACCBLAS_TEST_TPU=1 to run the suite against
# real hardware instead.
if not os.environ.get("ACCBLAS_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU at default optimization level fuses producers into consumer loops and
# LLVM then contracts mul+add into FMA, which breaks the error-free transforms
# df64 arithmetic relies on (see accblas_tpu/ops/df64.py). Mosaic/TPU — the
# production target — is faithful; for the CPU test mesh we disable backend
# optimization so CPU matches the numerics contract.
if "xla_backend_optimization_level" not in flags:
    flags = (flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = flags

import numpy as np
import pytest

if not os.environ.get("ACCBLAS_TEST_TPU"):
    # the env var alone is not enough: the machine's sitecustomize force-
    # registers the TPU plugin, so override through the config as well
    import jax

    jax.config.update("jax_platforms", "cpu")


@pytest.fixture
def rng():
    return np.random.default_rng(42)
