"""Trace the continuous engine's slot-decode chunk program on TPU.

Names where the serving engine's per-step device time goes — in particular
the int8-KV-cache arm (kv_quant), which measured ~2-5% SLOWER than the bf16
cache despite streaming half the K/V bytes (REPORT.md round 4). The trace
attributes per-op self-time + bytes_accessed so the loss can be pinned
(dequant materialization vs quantize-at-write vs scatter overheads).

Synthetic engine state: 33 rows (32 slots + trash), every slot mid-sequence
at staggered lengths — the steady-state shape of the serving peak.

Usage: python scripts/trace_slot_decode.py [--kv int8|bf16] [--s_len 848]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from trace_decode import analyze, log  # noqa: E402

from paligemma_tpu.config import paligemma_3b_pt_224, tiny_config  # noqa: E402
from paligemma_tpu.continuous import slot_decode_steps  # noqa: E402
from paligemma_tpu.models import gemma, paligemma  # noqa: E402
from paligemma_tpu.quantization import quantize_params  # noqa: E402

CHUNK = 32


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kv", choices=["bf16", "int8"], default="int8")
    ap.add_argument("--n_slots", type=int, default=32)
    ap.add_argument("--s_len", type=int, default=848)
    ap.add_argument("--chunks", type=int, default=2)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out = args.out or f"/tmp/trace_slot_{args.kv}"

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    cfg = paligemma_3b_pt_224() if on_tpu else tiny_config()
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    s_len = args.s_len if on_tpu else 64

    t0 = time.time()
    params = paligemma.init_params(cfg, jax.random.PRNGKey(0), dtype)
    jax.block_until_ready(params)
    params = quantize_params(params, llm_only=True)
    jax.block_until_ready(params)
    log(f"params ready ({time.time() - t0:.0f}s)")

    b = args.n_slots + 1
    kv_dtype = jnp.int8 if args.kv == "int8" else dtype
    cache = gemma.init_cache(cfg.text_config, b, s_len, kv_dtype)
    # Steady-state: slots staggered through their sequences.
    lengths = jnp.asarray(
        [int(s_len * 0.4 + (i * 17) % int(s_len * 0.5)) for i in range(b)],
        jnp.int32)
    token = jnp.full((b, 1), 7, jnp.int32)
    temps = jnp.zeros((b,), jnp.float32)
    topps = jnp.full((b,), 0.9, jnp.float32)
    occupied = jnp.asarray([True] * args.n_slots + [False])
    key = jax.random.PRNGKey(0)

    toks, token, cache, lengths = slot_decode_steps(
        params, cfg, token, cache, lengths, temps, topps, key, CHUNK,
        occupied=occupied)
    _ = int(toks[0, 0])  # warm fence
    log("warm; tracing...")

    t0 = time.time()
    jax.profiler.start_trace(out)
    for _ in range(args.chunks):
        toks, token, cache, lengths = slot_decode_steps(
            params, cfg, token, cache, lengths, temps, topps, key, CHUNK,
            occupied=occupied)
    _ = int(toks[0, 0])
    jax.profiler.stop_trace()
    wall = time.time() - t0
    n_tok = args.chunks * CHUNK
    log(f"traced {args.chunks} chunks of {CHUNK}: wall {wall*1000:.1f} ms = "
        f"{wall*1000/n_tok:.3f} ms/step (incl. ~25 ms fetch)")

    summary = analyze(out, max(n_tok // 64, 1))
    with open(os.path.join(out, "trace_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    for pname, p in summary.get("planes", {}).items():
        if "TPU" not in pname and "Device" not in pname:
            continue
        log(f"\n=== plane: {pname} (span {p['span_ms']:.2f} ms) ===")
        for op in p["top_ops"][:25]:
            st = op.get("stats", {})
            log(f"  {op['total_ms']:9.3f} ms x{op['count']:<6} "
                f"{op['total_ms']/n_tok:.4f} ms/step  {op['name'][:70]}")
            for k in ("source", "bytes_accessed"):
                if k in st:
                    log(f"      {k}: {st[k]}")
    log(f"\nsummary -> {out}/trace_summary.json")


if __name__ == "__main__":
    main()
