"""Test configuration.

Runs everything on a virtual 8-device CPU mesh (the standard JAX trick for
testing multi-device sharding without a TPU pod; SURVEY.md §4.6) and enables
x64 so numerical parity checks against float64 numpy oracles are meaningful.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment may pre-register an accelerator platform at interpreter
# startup (sitecustomize); force the CPU backend explicitly so the
# 8-virtual-device flag takes effect and x64 linalg is available.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
assert jax.default_backend() == "cpu", jax.default_backend()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound accumulated XLA-CPU compiler state.

    Full-suite runs (~157 tests, hundreds of compiled programs) have twice
    segfaulted inside `backend_compile_and_load` around the 140th test; the
    same tests pass in isolation and in split runs. Clearing JAX's
    compilation caches at module boundaries bounds the compiler state that
    triggers it. (If a full run still crashes, split it:
    `pytest tests/test_[a-m]*.py` then `pytest tests/test_[n-z]*.py`.)
    """
    yield
    jax.clear_caches()
