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
