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

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from paligemma_tpu.ops.pallas_quant import q8_matmul  # noqa: E402
from paligemma_tpu.quantization import QTensor, qproj, quantize_tensor  # noqa: E402


def log(m):
    print(m, file=sys.stderr, flush=True)


from _bench_util import make_looped as _make_looped  # noqa: E402
from _bench_util import timed_looped  # noqa: E402

LOOP_N = 64  # matmuls per compiled program: isolates kernel time from the
# ~1 ms/dispatch floor a naive pipelined microbenchmark measures instead


def make_looped(matmul):
    return _make_looped(matmul, LOOP_N)


def timed(fn):
    return timed_looped(fn, LOOP_N)


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
