"""Per-op profile of the SigLIP vision tower on TPU (VERDICT r2 next-#3).

The tower runs at 3.88 ms (224) vs a ~1.4 ms combined compute+streaming
bound; this captures a jax.profiler trace of N pipelined tower dispatches
and attributes device time to ops with HLO source lines (reusing
scripts/trace_decode.analyze), so the 2.5 ms has a name (suspected:
head_dim-72 layout padding and fp32 softmax traffic, REPORT.md).

Usage: python scripts/trace_vision.py [--res 224] [--n 16]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ".")

from trace_decode import analyze  # noqa: E402

from paligemma_tpu.config import (  # noqa: E402
    paligemma_3b_pt_224, paligemma_3b_pt_448, paligemma_3b_pt_896,
    tiny_config)
from paligemma_tpu.models import siglip  # noqa: E402


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, choices=[224, 448, 896], default=224)
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--out", default=None)
    ap.add_argument("--analyze_only", action="store_true")
    args = ap.parse_args()
    out = args.out or f"/tmp/trace_vision_{args.res}"

    if not args.analyze_only:
        on_tpu = jax.devices()[0].platform not in ("cpu",)
        cfg = ({224: paligemma_3b_pt_224, 448: paligemma_3b_pt_448,
                896: paligemma_3b_pt_896}[args.res]()
               if on_tpu else tiny_config())
        vcfg = cfg.vision_config
        dtype = jnp.bfloat16 if on_tpu else jnp.float32
        params = siglip.init_params(vcfg, jax.random.PRNGKey(0), dtype)
        jax.block_until_ready(params)
        pix = jax.random.normal(
            jax.random.PRNGKey(1), (1, 3, vcfg.image_size, vcfg.image_size),
            dtype)
        apply = jax.jit(lambda p, x: siglip.apply(p, vcfg, x))
        o = apply(params, pix)
        _ = float(jnp.sum(o[:, 0, :8]))  # compile + fence
        log("warm; tracing...")
        t0 = time.time()
        jax.profiler.start_trace(out)
        for _ in range(args.n):
            o = apply(params, pix)
        _ = float(jnp.sum(o[:, 0, :8]))
        jax.profiler.stop_trace()
        wall = time.time() - t0
        log(f"{args.n} towers: {wall*1000/args.n:.2f} ms each "
            "(incl. trace overhead + one 25 ms fence)")

    summary = analyze(out, chunks=1)
    # Re-normalize: analyze() divides by chunks*64 tokens; we want per-call.
    for p in summary.get("planes", {}).values():
        for op in p["top_ops"]:
            op["ms_per_call"] = round(op["total_ms"] / args.n, 4)
            op.pop("ms_per_token", None)
    with open(os.path.join(out, "trace_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    for pname, p in summary.get("planes", {}).items():
        if "TPU" not in pname:
            continue
        log(f"\n=== plane: {pname} (span {p['span_ms']:.2f} ms) ===")
        for op in p["top_ops"][:30]:
            st = op.get("stats", {})
            src = st.get("source", "")
            ba = st.get("bytes_accessed", "")
            log(f"  {op['ms_per_call']:8.4f} ms/call x{op['count']:<6} "
                f"{op['name'][:40]:40s} {ba:>12} B  {src}")
    log(f"\nsummary -> {out}/trace_summary.json")


if __name__ == "__main__":
    main()
