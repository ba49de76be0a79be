"""Test harness: force CPU with 8 virtual devices so sharding tests run
anywhere (the driver validates real-TPU paths separately).

Note: jax may already be imported by the interpreter's sitecustomize, so
we cannot rely on env vars alone — ``jax.config.update`` works post-import
as long as no backend has been initialized yet.
"""
import os

import re as _re

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" in flags:
    # an inherited count != 8 would silently break the 8-way mesh tests:
    # override it rather than trusting whatever leaked into the env
    flags = _re.sub(
        r"--xla_force_host_platform_device_count=\d+",
        "--xla_force_host_platform_device_count=8", flags,
    )
    os.environ["XLA_FLAGS"] = flags
else:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _release_jit_mappings():
    """Drop jit caches after each test module.

    Every XLA:CPU compilation mmaps ~7 code/data regions that stay
    mapped while the cached executable is alive. The full suite compiles
    enough distinct programs to hit the kernel's vm.max_map_count
    (65530), at which point the NEXT compile's mmap fails and LLVM
    segfaults (observed at 64.7k maps, ~12 min in). Module-scoped
    teardown keeps within-module cache reuse but bounds the process-wide
    mapping count to one module's working set.
    """
    yield
    jax.clear_caches()
