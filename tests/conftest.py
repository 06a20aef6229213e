"""Test environment: force an 8-device CPU platform before jax import.

Multi-chip sharding tests run on virtual CPU devices
(xla_force_host_platform_device_count), per SURVEY.md §4.
"""

import os

# MSIM_TEST_TPU=1 keeps the real TPU backend so the hardware-only
# Mosaic-lowering tests (tests/test_hw_kernels.py) can run; everything
# else in the suite still works, just slowly
_keep_tpu = os.environ.get("MSIM_TEST_TPU") == "1"

if not _keep_tpu:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The container's sitecustomize registers the axon TPU backend at interpreter
# start and force-sets jax_platforms="axon,cpu"; override it back to pure CPU
# so tests are fast, deterministic, and fp32-exact.
import jax

if not _keep_tpu:
    jax.config.update("jax_platforms", "cpu")
# NO persistent compile cache for the CPU suite: XLA:CPU AOT cache
# entries pin the compile host's CPU feature set, and this container can
# migrate between hosts — loading a mismatched entry warns "could lead
# to execution errors such as SIGILL" and, observed round 4, actually
# aborts the process mid-suite (always in a large dp x tp program).
# Recompiling is slower but deterministic; the TPU-side cache
# (/tmp/jax_cache, used by bench/scripts) is unaffected because TPU
# executables are not host-CPU-feature-sensitive.

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
