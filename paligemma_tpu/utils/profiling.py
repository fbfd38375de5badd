"""Tracing & timing utilities.

The reference's only instrumentation is perf_counter bracketed by
``torch.cuda.synchronize`` (ablation_study_fixed.py:204-206). The TPU
equivalents here (SURVEY.md §5):
- ``timed``: perf_counter bracketed by a device fence (block_until_ready or,
  on remote backends whose block is advisory, a 1-element host fetch),
- ``trace``: a ``jax.profiler`` context writing a TensorBoard-loadable trace
  (op-level timeline on real TPU),
- ``annotate``: ``jax.profiler.TraceAnnotation`` for named regions.
"""
from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Tuple

import jax
import numpy as np


def fence(x: Any) -> None:
    """Hard device fence: forces completion AND visibility of ``x``.

    ``block_until_ready`` alone is advisory on some remote PJRT backends
    (measured on the tunneled v5e: it returns at enqueue-ack); fetching one
    element is a true data dependency.
    """
    leaves = jax.tree.leaves(x)
    if not leaves:
        return
    jax.block_until_ready(leaves)
    first = leaves[0]
    if hasattr(first, "addressable_shards"):
        np.asarray(jax.device_get(first.ravel()[:1] if first.ndim else first))


def timed(fn: Callable[[], Any]) -> Tuple[Any, float]:
    """Run fn() with fences on both sides; returns (result, seconds).

    The pre-fence drains previously enqueued device work (PJRT executes in
    submission order) so fn's measurement doesn't absorb an earlier async
    tail; the post-fence forces completion of fn's own work.
    """
    import jax.numpy as jnp

    fence(jnp.zeros(()) + 0)  # drain the device stream
    t0 = time.perf_counter()
    out = fn()
    fence(out)
    return out, time.perf_counter() - t0


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace."""
    return jax.profiler.TraceAnnotation(name)
