"""Test configuration.

Tests run on the CPU backend with 8 virtual devices (sharding tests) and
float64 enabled: with f64 contexts the executor's math matches the C++
reference bit-for-bit, so golden comparisons are exact.  TPU-dtype (f32)
behaviour is covered by tolerance tests.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # force off the TPU for tests
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The container's sitecustomize force-registers the axon TPU backend and
# overrides JAX_PLATFORMS; the config update below wins if done before any
# backend is touched.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from libnativecpurenderer_tpu import config  # noqa: E402

REFERENCE_FILES = "/root/reference/test_files"


@pytest.fixture(autouse=True)
def f64_default():
    """Golden tests run in float64 so device math == C++ double math."""
    prev = config.default_dtype()
    config.set_default_dtype(np.float64)
    yield
    config.set_default_dtype(prev)


@pytest.fixture
def ref_files():
    if not os.path.isdir(REFERENCE_FILES):
        pytest.skip("reference test_files not available")
    return REFERENCE_FILES
