"""Measured: Pallas int8 GEMV vs XLA einsum on the decode weight streams.

The int8 decode path runs at ~84% of its 3.1 ms/token HBM bound (REPORT.md).
This times the two biggest per-layer GEMVs (gate_up (2048, 32768) and
down (16384, 2048)) plus the fused qkv, each as N pipelined dispatches
against one closing fence, for:
  - XLA einsum (quantization.qproj — the production path)
  - Pallas q8_matmul at a few (block_o, block_d) tilings

Writes q8_bench.json. A negative result retires the kernel; a positive one
motivates wiring it behind a runtime flag.
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from paligemma_tpu.ops.pallas_quant import q8_matmul  # noqa: E402
from paligemma_tpu.quantization import QTensor, qproj, quantize_tensor  # noqa: E402


def log(m):
    print(m, file=sys.stderr, flush=True)


LOOP_N = 64  # matmuls per compiled program: isolates kernel time from the
# ~1 ms/dispatch floor a naive pipelined microbenchmark measures instead


def make_looped(matmul, n=LOOP_N):
    """One jitted program running ``matmul`` n times with a data dependence
    on the loop index (stops XLA from CSE-ing the loop-invariant call) —
    the weight streams from HBM every iteration, like the decode scan."""

    @jax.jit
    def looped(x, q, s):
        def body(i, acc):
            xi = x * (1.0 + 1e-9 * i.astype(x.dtype))
            y = matmul(xi, q, s)
            return acc + jnp.sum(y[..., :8].astype(jnp.float32))

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    return looped


def timed(fn, n=4, repeats=3):
    def fetch(out):
        return float(jnp.sum(out))

    best = float("inf")
    for _ in range(repeats):
        fetch(fn())  # drain
        t0 = time.time()
        out = None
        for _ in range(n):
            out = fn()
        fetch(out)
        best = min(best, (time.time() - t0) * 1000 / (n * LOOP_N))
    return best


def main():
    key = jax.random.PRNGKey(0)
    dtype = jnp.bfloat16
    shapes = {
        "qkv (2048x2560)": (2048, 2560),
        "gate_up (2048x32768)": (2048, 32768),
        "down (16384x2048)": (16384, 2048),
    }
    results = {}
    for name, (d, o) in shapes.items():
        w = jax.random.normal(jax.random.fold_in(key, o), (d, o), jnp.float32)
        qt = quantize_tensor(w, axis=0)
        qt = QTensor(q=qt.q, scale=qt.scale.reshape(1, o))
        x = jax.random.normal(key, (1, 1, d), dtype)
        jax.block_until_ready((qt.q, x))

        xla_fn = make_looped(lambda x, q, s: qproj(x, QTensor(q=q, scale=s)))
        _ = xla_fn(x, qt.q, qt.scale)
        ms_xla = timed(lambda: xla_fn(x, qt.q, qt.scale))
        results[f"{name}/xla"] = round(ms_xla, 4)
        log(f"{name}: XLA {ms_xla:.4f} ms")

        for bo, bd in ((512, 2048), (2048, 2048), (512, 512)):
            if o % bo or d % bd:
                continue
            try:
                pfn = make_looped(
                    lambda x, q, s, bo=bo, bd=bd: q8_matmul(x, q, s, bo, bd)
                )
                _ = pfn(x, qt.q, qt.scale)
                ms = timed(lambda: pfn(x, qt.q, qt.scale))
                results[f"{name}/pallas_o{bo}_d{bd}"] = round(ms, 4)
                log(f"{name}: pallas o{bo} d{bd} {ms:.4f} ms")
            except Exception as e:
                log(f"{name}: pallas o{bo} d{bd} FAILED {e!r}")

    # bandwidth-bound reference points
    for name, (d, o) in shapes.items():
        gb = d * o / 1e9
        results[f"{name}/bound_ms_819GBs"] = round(gb / 819 * 1000, 4)

    with open("q8_bench.json", "w") as f:
        json.dump(results, f, indent=2)
    log(json.dumps(results))


if __name__ == "__main__":
    main()
