"""Test environment: force an 8-device virtual CPU mesh.

This emulates an 8-chip TPU slice on CPU (SURVEY.md §4: multi-device tests via
--xla_force_host_platform_device_count), so sharding/pjit paths are exercised
without hardware. jax may already be imported by the interpreter's
sitecustomize, so we switch platforms through jax.config (backend init is
lazy) rather than relying on JAX_PLATFORMS alone.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
