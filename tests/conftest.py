"""Test configuration: run everything on a virtual 8-device CPU platform.

This is the standard JAX trick for exercising multi-chip sharding logic
without hardware: XLA's host platform is split into 8 virtual devices, so
Mesh/pjit/shard_map paths compile and execute exactly as they would across a
TPU slice (SURVEY.md §4.5).

The shell environment pins JAX_PLATFORMS to the remote TPU platform, so env
vars alone are not enough — jax.config.update is authoritative and must run
before any computation.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the e2e smoke tests compile the full DAG, which
# costs minutes of single-core XLA time per program; cached executables make
# repeat tiers fast.  (CPU cache entries are machine-feature pinned — fine
# here, the tier always runs on this host.)
from morig_tpu.core.compile_cache import setup_compile_cache  # noqa: E402

setup_compile_cache()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_collection_modifyitems(config, items):
    """Two test tiers: everything not marked `slow` gets `fast`, so
    `pytest -m fast` is the every-commit tier and `-m slow` the
    training/integration tier."""
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.fast)
