"""Test configuration: CPU backend with 8 virtual devices, float64 on.

The image's sitecustomize registers the axon TPU plugin at interpreter
boot and presets JAX_PLATFORMS=axon, so the platform switch must happen
via jax.config *after* boot (XLA_FLAGS at process start hangs the plugin
registration). Reference accuracy bounds require complex128.
"""

import os

# must land before the CPU backend is first initialized
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (already imported by sitecustomize; config still open)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

_TESTS_RUN = {"n": 0}


@pytest.fixture(autouse=True)
def _periodic_jit_cache_clear():
    """Drop compiled executables every ~40 tests.

    A full-suite run compiles many hundreds of XLA:CPU programs in one
    process; past ~65% the LLVM JIT deterministically segfaulted inside
    backend_compile (reproduced twice at the same test, which passes in
    isolation). Periodically releasing the executables keeps the JIT's
    code memory bounded at the cost of a few recompiles across files.
    """
    yield
    _TESTS_RUN["n"] += 1
    if _TESTS_RUN["n"] % 40 == 0:
        jax.clear_caches()
