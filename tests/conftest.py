"""Test configuration: force CPU with 8 virtual devices + float64.

Tests run on a virtual 8-device CPU mesh so the distributed (shard_map) path
is testable without a TPU pod (the pattern SURVEY.md §4 prescribes). The axon
TPU plugin is disabled for tests by clearing PALLAS_AXON_POOL_IPS before jax
import.
"""

import os

# The axon sitecustomize imports jax and registers the TPU plugin at
# interpreter start, so env vars alone are too late here; the config update
# below still wins because no backend is initialized until first use.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(12345)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables + traced jaxprs after every test module.

    The suite compiles hundreds of large programs (incl. interpret-mode
    Pallas kernels) in ONE process; letting them accumulate eventually
    crashes XLA's CPU compiler late in the run (observed as a segfault
    inside backend_compile around the 85% mark — the same in-process
    accumulation failure class documented for the Pallas tracing
    recursion limit in .claude/skills/verify/SKILL.md). Within a module
    caches persist, so compile-count/stability tests are unaffected."""
    yield
    jax.clear_caches()
