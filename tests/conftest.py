"""Test harness: force an 8-device virtual CPU platform.

Multi-"chip" behavior (dp sharding, collective loss means) is tested on a
host-platform device mesh, per SURVEY.md section 4 (rebuild implication f).
Must run before jax initializes a backend, hence the env setup at import
time of this conftest.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Most of the suite's wall-clock is XLA compiles of per-test jitted
# steps; persist them so re-runs load instead of recompiling (entries
# are keyed by platform, so TPU bench entries in the same dir do not
# collide).  Tests that re-point the cache restore it themselves.
from pspde.utils import enable_compilation_cache

enable_compilation_cache(min_compile_seconds=0.5)

import pytest


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
