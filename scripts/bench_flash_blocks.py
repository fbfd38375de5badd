"""Flash-attention block/size tuning at the 896-vision shape.

The round-3 trace (trace_vision 896) shows XLA materializes the fp32 score
matrix to HBM at 4096 patches — 2.2 GB/layer, 79 of the tower's 100 ms —
exactly where flash attention should win; yet the r2 measurement had the
Pallas kernel 2.2x SLOWER. Hypotheses this isolates, with the in-program
loop protocol (naive pipelined timing bottoms out at the dispatch floor):

  1. block sizes (default 128x128 -> more grid steps, less VMEM reuse),
  2. head_dim 72 lane misalignment (Mosaic pads the 72-lane axis to 128 on
     every block load AND every MXU op — padding q/k/v to d=128 up front
     costs +78% bytes but makes every op lane-aligned; zeros contribute
     nothing to scores/outputs, scale stays d_orig**-0.5).

Usage: python scripts/bench_flash_blocks.py [--seq 4096]
Writes flash_blocks_bench.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))

from paligemma_tpu.ops.attention import mha  # noqa: E402
from paligemma_tpu.ops.pallas_attention import flash_attention  # noqa: E402


def log(m):
    print(m, file=sys.stderr, flush=True)


def make_looped(fn, loop_n):
    @jax.jit
    def looped(q, k, v):
        def body(i, acc):
            qi = q * (1.0 + 1e-9 * i.astype(q.dtype))
            o = fn(qi, k, v)
            return acc + jnp.sum(o[:, :8, 0, :8].astype(jnp.float32))

        return jax.lax.fori_loop(0, loop_n, body, jnp.float32(0.0))

    return looped


def timed(fn, q, k, v, loop_n, windows=3):
    best = float("inf")
    out = fn(q, k, v)
    _ = float(out)  # compile + fence
    for _ in range(windows):
        t0 = time.time()
        out = fn(q, k, v)
        _ = float(out)
        best = min(best, (time.time() - t0) * 1000 / loop_n)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=4096)
    ap.add_argument("--loop", type=int, default=8)
    ap.add_argument("--out", default="flash_blocks_bench.json")
    args = ap.parse_args()

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    s, h, d = (args.seq, 16, 72) if on_tpu else (256, 4, 8)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    kq = jax.random.PRNGKey(0)
    q = jax.random.normal(kq, (1, s, h, d), dtype)
    k = jax.random.normal(jax.random.fold_in(kq, 1), (1, s, h, d), dtype)
    v = jax.random.normal(jax.random.fold_in(kq, 2), (1, s, h, d), dtype)
    scale = d**-0.5
    results = {"seq": s, "head_dim": d}

    def pad_d(x, dp=128):
        return jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, dp - x.shape[-1])))

    arms = {
        "xla_mha": lambda q, k, v: mha(q, k, v, scale=scale),
    }
    if on_tpu:
        blocks = [(128, 128), (256, 512), (512, 512), (512, 1024)]
    else:
        blocks = [(128, 128)]
    for bq, bk in blocks:
        arms[f"flash_q{bq}k{bk}"] = (
            lambda q, k, v, bq=bq, bk=bk: flash_attention(
                q, k, v, scale=scale, block_q=bq, block_k=bk))
        arms[f"flash_pad128_q{bq}k{bk}"] = (
            lambda q, k, v, bq=bq, bk=bk: flash_attention(
                pad_d(q), pad_d(k), pad_d(v), scale=scale,
                block_q=bq, block_k=bk)[..., :d])

    for name, fn in arms.items():
        try:
            t0 = time.time()
            ms = timed(make_looped(fn, args.loop), q, k, v, args.loop)
            results[name + "_ms"] = round(ms, 3)
            log(f"{name}: {ms:.3f} ms/call  [wall {time.time()-t0:.0f}s]")
        except Exception as e:
            results[name + "_ms"] = None
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    log(json.dumps(results))


if __name__ == "__main__":
    main()
