"""Profiling hooks (SURVEY.md §5.1).

The reference's observability is wall-clock Timers and CUDA max-memory logs
(mega_core/utils/timer.py, engine/trainer.py:113-137). The TPU-native
equivalent: `jax.profiler` traces viewable in TensorBoard/Perfetto, plus
device memory stats. Enable in the trainer with --profile or wrap any code
in `trace()`.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up inside profiler traces."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats() -> dict:
    """Best-effort live/peak device memory (replaces cuda.max_memory_allocated)."""
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        return {
            "bytes_in_use": stats.get("bytes_in_use", 0),
            "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
        }
    except Exception:
        return {}
