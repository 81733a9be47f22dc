"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4 rebuild
implication (d)), and enable x64 before JAX initializes."""

import os

# Force (not setdefault): the shell may carry JAX_PLATFORMS=axon from a
# TPU plugin; tests must run on the virtual-device CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

# The env var alone is not honored once the axon TPU plugin registers;
# the config update reliably pins the CPU backend.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _release_xla_executables():
    """Drop compiled-executable caches after every test module.

    Each XLA:CPU executable pins several mmap regions; with the full
    suite's ~500 jit-heavy tests the process deterministically crosses
    the kernel's default vm.max_map_count (65530) and LLVM's JIT
    segfaults inside a later compile (reproduced at
    test_linsolve_jit.py::test_linsolve_chain_indefinite_operator —
    ~30k maps by 16% of the suite). Per-module clearing keeps the map
    count bounded; cross-module executable reuse is rare, so the
    recompile cost is noise."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    import numpy as np

    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
