"""Prefill roofline closure: trace one 224 prefill and split the phases.

VERDICT r3 weak-#4: decode got the full trace-to-roofline treatment (97.5-99%
of the streamed-bytes floor) but prefill was only ever reported as a wall
number (12.4-13.4 ms e2e, true ~11.7 after the fetch constant; vision tower
device-busy 1.88 ms). This script closes prefill the same way:

  1. builds the 3B model (bf16 or --quant int8), warms the prefill program;
  2. captures jax.profiler xplane traces around N back-to-back prefill
     dispatches with ONE closing fence (the bench.py protocol — a single
     host fetch costs ~25 ms over the tunnel and would swamp one prefill);
  3. parses the trace, attributes device busy-time to phases by source file
     (siglip.py = vision tower, gemma.py = decoder trunk, paligemma.py =
     merge/projector/logits, quantization/pallas = weight dequant paths),
     and prints per-phase busy vs the analytic floors.

Floors for the 3B-224 geometry at 272 prefill positions (pinned in
REPORT.md round 4):
  - decoder compute floor: 2 * 1.98e9 non-embed params * 272 positions
    = 1.08 TFLOP -> 5.5 ms at the v5e-1 bf16 MXU peak (197 TFLOP/s);
  - decoder weight-stream floor: one full pass over the decoder weights
    (3.96 GB bf16 / 2.0 GB int8) at the measured 750 GB/s achievable rate
    = 5.3 / 2.7 ms; prefill at 272 positions sits right at the
    compute/bandwidth crossover (T* ~ 240), so floor = max(both);
  - vision tower: measured 1.88 ms device-busy (trace_vision_224.json),
    itself ~93% of its own 1.75 ms analytic floor;
  - lm_head (last position only): 0.53 GFLOP + one 1.05 GB / 0.53 GB
    embedding stream -> 1.3 / 0.65 ms (stream-bound).

Usage: python scripts/trace_prefill.py [--quant int8] [--n 8]
Reference protocol: untimed-prefill separation,
/root/reference/ablation_study_fixed.py:193-202.
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

from paligemma_tpu import generation  # noqa: E402
from paligemma_tpu.config import paligemma_3b_pt_224, tiny_config  # noqa: E402
from paligemma_tpu.models import paligemma  # noqa: E402
from paligemma_tpu.quantization import quantize_params  # noqa: E402


def capture(out_dir: str, quant: str, n: int) -> None:
    on_tpu = jax.devices()[0].platform not in ("cpu",)
    cfg = paligemma_3b_pt_224() if on_tpu else tiny_config()
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    log(f"platform={'tpu' if on_tpu else 'cpu'} quant={quant}")

    t0 = time.time()
    params = paligemma.init_params(cfg, jax.random.PRNGKey(0), dtype)
    jax.block_until_ready(params)
    if quant == "int8":
        params = quantize_params(params, llm_only=True)
        jax.block_until_ready(params)
    log(f"params ready ({time.time() - t0:.0f}s)")

    n_img = cfg.vision_config.num_image_tokens
    ids = jnp.concatenate(
        [jnp.full((1, n_img), cfg.image_token_index, jnp.int32),
         jnp.full((1, 16), 7, jnp.int32)], axis=1)
    size = cfg.vision_config.image_size
    pix = jax.random.normal(jax.random.PRNGKey(2), (1, 3, size, size), dtype)
    cache0 = generation.make_cache(cfg, 1, ids.shape[1], 8, dtype)

    logits, _ = generation._prefill_jit(params, cfg, ids, pix, cache0)
    _ = float(logits[0, -1, 0])  # warm fence
    log("warm; tracing...")

    t0 = time.time()
    jax.profiler.start_trace(out_dir)
    for _ in range(n):
        # cache0 is immutable: every dispatch is a fresh, identical prefill.
        logits, _ = generation._prefill_jit(params, cfg, ids, pix, cache0)
    _ = float(logits[0, -1, 0])  # ONE closing fence for the pipeline
    jax.profiler.stop_trace()
    wall = time.time() - t0
    log(f"traced {n} prefills: wall {wall*1000:.1f} ms = "
        f"{wall*1000/n:.2f} ms/prefill (incl. ~25 ms fetch + trace overhead)")


PHASES = {
    "vision": ("siglip.py",),
    "decoder": ("gemma.py", "rope.py", "norms.py", "attention.py"),
    "merge/logits": ("paligemma.py",),
    "quant": ("quantization.py", "pallas_quant.py"),
}


def phase_split(summary: dict, n: int) -> dict:
    """Attribute device-plane op busy-time to phases via source stats."""
    phases = {k: 0.0 for k in PHASES}
    phases["other"] = 0.0
    total = 0.0
    for pname, p in summary.get("planes", {}).items():
        if "TPU" not in pname and "Device" not in pname:
            continue
        for op in p.get("top_ops", []):
            src = op.get("stats", {}).get("source", "") or ""
            ms = op["total_ms"]
            total += ms
            for phase, needles in PHASES.items():
                if any(nd in src for nd in needles):
                    phases[phase] += ms
                    break
            else:
                phases["other"] += ms
    return {
        "per_prefill_ms": {k: round(v / n, 3) for k, v in phases.items()},
        "device_busy_ms_per_prefill": round(total / n, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant", choices=["bf16", "int8"], default="bf16")
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--out", default=None)
    ap.add_argument("--analyze_only", action="store_true")
    args = ap.parse_args()
    out = args.out or f"/tmp/trace_prefill_{args.quant}"

    if not args.analyze_only:
        capture(out, args.quant, args.n)
    summary = analyze(out, max(args.n // 64, 1))  # chunks arg only scales a column
    split = phase_split(summary, args.n)
    summary["phase_split"] = split
    with open(os.path.join(out, "trace_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    log(f"\nphase split (device busy, per prefill): "
        f"{json.dumps(split['per_prefill_ms'])}")
    log(f"device busy per prefill: {split['device_busy_ms_per_prefill']} ms")
    for pname, p in summary.get("planes", {}).items():
        if "TPU" not in pname and "Device" not in pname:
            continue
        log(f"\n=== plane: {pname} (span {p['span_ms']:.2f} ms) ===")
        for op in p["top_ops"][:25]:
            st = op.get("stats", {})
            log(f"  {op['total_ms']:9.3f} ms x{op['count']:<6} "
                f"{op['name'][:70]}")
            for k in ("source", "bytes_accessed"):
                if k in st:
                    log(f"      {k}: {st[k]}")
    log(f"\nsummary -> {out}/trace_summary.json")


if __name__ == "__main__":
    main()
