"""TPU-only test tier: runs against the real chip (no CPU pin, unlike tests/).

Usage:  python -m pytest tests_tpu/ -x -q    (on a host with a TPU backend)
Every test skips itself when no TPU platform is available.
"""
import jax
import pytest


@pytest.fixture(scope="session", autouse=True)
def require_tpu():
    if jax.default_backend() in ("cpu",):
        pytest.skip("TPU backend required", allow_module_level=False)
