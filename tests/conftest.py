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

# Persistent compilation cache: repeated suite runs skip XLA recompiles of the
# heavyweight train/eval steps (VERDICT r1 weakness #5 — suite wall time).
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".cache", "jax_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
