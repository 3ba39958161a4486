"""Test environment: run on CPU with 8 virtual devices so multi-chip SPMD
logic (mesh shuffles, partial/final aggregation) is exercised without TPU
hardware.

Note: the container's sitecustomize imports jax and registers the 'axon'
TPU backend before this file runs; jax.config.update still wins as long as
no backend has been used yet."""

import os

# mesh runs in tests are STRICT: a distributed operator failing to lower
# raises instead of silently degrading to gather-and-run-local, so a broken
# dist op fails the suite rather than hiding behind the fallback path
os.environ.setdefault("DFTPU_SPMD_STRICT", "1")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Free compiled executables between test modules.

    Every XLA:CPU executable keeps several live memory mappings for its
    JIT'd code; a full-suite run compiles thousands of programs and a
    single pytest process crosses the kernel's default vm.max_map_count
    (65530), at which point LLVM's next mmap fails and the process
    segfaults inside backend_compile_and_load.  Dropping the executable
    caches per module bounds the live-mapping count; modules recompile
    their own programs anyway, so the wall-clock cost is small.
    """
    yield
    jax.clear_caches()
