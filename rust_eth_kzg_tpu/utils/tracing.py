"""Tracing / profiling hooks.

Equivalent of the reference's optional `tracing` feature (spans on hot
functions, see SURVEY.md §5): named profiler scopes around the pipeline stages
plus an opt-in wall-clock span logger. On TPU, wrap a region with
`jax.profiler.trace(logdir)` externally, or use `span(...)` for host timing.
"""

from __future__ import annotations

import contextlib
import os
import time

import jax

TRACE_ENABLED = os.environ.get("KZG_TPU_TRACE", "0") not in ("", "0", "false")


@contextlib.contextmanager
def span(name: str):
    """Named profiler scope + optional host wall-clock log (KZG_TPU_TRACE=1)."""
    with jax.named_scope(name):
        if TRACE_ENABLED:
            t0 = time.perf_counter()
            try:
                yield
            finally:
                print(f"[kzg-tpu] {name}: {(time.perf_counter() - t0) * 1e3:.2f} ms")
        else:
            yield


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture an XLA device profile for a region (view with TensorBoard)."""
    with jax.profiler.trace(logdir):
        yield
