"""Shared microbenchmark harness for kernel-level timing on the tunneled
TPU backend (used by bench_q8.py and bench_lmhead.py).

Protocol notes (learned the hard way, see REPORT.md):
- A naive pipelined microbenchmark bottoms out at the ~1 ms per-dispatch
  floor and cannot resolve kernel differences — repeat the op INSIDE one
  compiled program instead (``make_looped``).
- The loop body must carry a data dependence on the loop index or XLA CSEs
  the loop-invariant call down to ONE execution.
- ``block_until_ready`` returns at enqueue-ack on this backend; only a host
  fetch is a true fence, so each timed window opens with a hard-fetched
  fresh call and closes with a fetch of the last result.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def make_looped(matmul, loop_n: int):
    """One jitted program running ``matmul(x, w, s)`` ``loop_n`` times with a
    data dependence on the loop index (defeats CSE); the weight streams from
    HBM every iteration, like the decode scan."""

    @jax.jit
    def looped(x, w, s):
        def body(i, acc):
            xi = x * (1.0 + 1e-9 * i.astype(x.dtype))
            y = matmul(xi, w, s)
            return acc + jnp.sum(y[..., :8].astype(jnp.float32))

        return jax.lax.fori_loop(0, loop_n, body, jnp.float32(0.0))

    return looped


def timed_looped(fn, loop_n: int, n: int = 4, repeats: int = 3) -> float:
    """Best-of-repeats ms per LOOP ITERATION of a ``make_looped`` program:
    n dispatches per window, hard-fetch drain before and fence after."""
    best = float("inf")
    for _ in range(repeats):
        float(jnp.sum(fn()))  # true drain: everything enqueued before is done
        t0 = time.time()
        out = None
        for _ in range(n):
            out = fn()
        float(jnp.sum(out))
        best = min(best, (time.time() - t0) * 1000 / (n * loop_n))
    return best
