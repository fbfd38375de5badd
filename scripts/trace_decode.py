"""Capture + analyze a jax.profiler trace of a chunked decode program on TPU.

VERDICT r2 weak-#2: the ~13-15% gap between measured decode (bf16 6.99 /
int8 3.67 ms/token) and the weight-streaming bound (6.1 / 3.1 ms) was a
hypothesis ("protocol overhead plus scan-boundary effects"), not a profile.
This script takes the actual trace and names the stall:

  1. builds the 3B model (bf16 or --quant int8), prefills, warms the
     chunk-64 ``generation.decode_steps`` program;
  2. captures ``jax.profiler`` xplane traces around N back-to-back chunk
     dispatches (one closing fence — same protocol as bench.py);
  3. parses the xplane proto (xprof's xplane_pb2) and reports, per device
     plane: total busy time, per-step time, and the top ops by self-time,
     plus gaps (wall - busy) which are dispatch/scheduling stalls.

Writes <out>/trace_summary.json and prints a table to stderr.

Usage:  python scripts/trace_decode.py [--quant int8] [--chunks 2]
Reference context: the decode hot loop this replaces is
/root/reference/inference.py:55-78 + modeling_gemma.py:231-293.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time
from collections import defaultdict

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from paligemma_tpu import generation  # noqa: E402
from paligemma_tpu.config import paligemma_3b_pt_224, tiny_config  # noqa: E402
from paligemma_tpu.models import paligemma  # noqa: E402
from paligemma_tpu.quantization import quantize_params  # noqa: E402

CHUNK = 64


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def capture(out_dir: str, quant: str, chunks: int) -> None:
    on_tpu = jax.devices()[0].platform not in ("cpu",)
    cfg = paligemma_3b_pt_224() if on_tpu else tiny_config()
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    log(f"platform={'tpu' if on_tpu else 'cpu'} quant={quant}")

    t0 = time.time()
    params = paligemma.init_params(cfg, jax.random.PRNGKey(0), dtype)
    jax.block_until_ready(params)
    if quant != "bf16":
        params = quantize_params(params, llm_only=True, mode=quant)
        jax.block_until_ready(params)
    log(f"params ready ({time.time() - t0:.0f}s)")

    n_img = cfg.vision_config.num_image_tokens
    ids = jnp.concatenate(
        [jnp.full((1, n_img), cfg.image_token_index, jnp.int32),
         jnp.full((1, 16), 7, jnp.int32)], axis=1)
    size = cfg.vision_config.image_size
    pix = jax.random.normal(jax.random.PRNGKey(2), (1, 3, size, size), dtype)

    key = jax.random.PRNGKey(0)
    max_new = CHUNK * (chunks + 2)
    cache = generation.make_cache(cfg, 1, ids.shape[1], max_new, dtype)
    logits, cache = generation._prefill_jit(params, cfg, ids, pix, cache)
    tok = jnp.argmax(logits[:, -1, :], -1).astype(jnp.int32)[:, None]
    # compile + warm one chunk
    _, tok, cache = generation.decode_steps(params, cfg, tok, cache, key, CHUNK)
    _ = int(tok[0, 0])
    log("warm; tracing...")

    t0 = time.time()
    jax.profiler.start_trace(out_dir)
    for _ in range(chunks):
        _, tok, cache = generation.decode_steps(params, cfg, tok, cache, key, CHUNK)
    _ = int(tok[0, 0])  # one closing fence
    jax.profiler.stop_trace()
    wall = time.time() - t0
    log(f"traced {chunks} chunks of {CHUNK}: wall {wall*1000:.1f} ms "
        f"= {wall*1000/(chunks*CHUNK):.3f} ms/token (incl. 25ms fetch + trace overhead)")


def analyze(out_dir: str, chunks: int) -> dict:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: PLC0415

    paths = sorted(glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        log(f"no xplane.pb under {out_dir}")
        return {}
    path = paths[-1]
    log(f"parsing {path} ({os.path.getsize(path)/1e6:.1f} MB)")
    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xspace.ParseFromString(f.read())

    summary = {"planes": {}}
    for plane in xspace.planes:
        stat_names = {sid: sm.name for sid, sm in plane.stat_metadata.items()}

        def meta_stats(meta):
            out = {}
            for st in meta.stats:
                key = stat_names.get(st.metadata_id, str(st.metadata_id))
                val = (st.str_value or st.int64_value or st.uint64_value
                       or st.double_value)
                if st.ref_value:
                    val = stat_names.get(st.ref_value, val)
                out[key] = str(val)[:160]
            return out

        stats = defaultdict(lambda: [0.0, 0])  # name -> [self_ps, count]
        busy_by_line = {}
        span_lo, span_hi = None, None
        for line in plane.lines:
            total_ps = 0
            lo, hi = None, None
            for ev in line.events:
                meta = plane.event_metadata[ev.metadata_id]
                name = meta.display_name or meta.name
                stats[name][0] += ev.duration_ps
                stats[name][1] += 1
                total_ps += ev.duration_ps
                t0 = line.timestamp_ns * 1000 + ev.offset_ps
                t1 = t0 + ev.duration_ps
                lo = t0 if lo is None else min(lo, t0)
                hi = t1 if hi is None else max(hi, t1)
            if lo is not None:
                busy_by_line[line.name or str(line.id)] = {
                    "busy_ms": total_ps / 1e9,
                    "span_ms": (hi - lo) / 1e9,
                    "events": sum(1 for _ in line.events),
                }
                span_lo = lo if span_lo is None else min(span_lo, lo)
                span_hi = hi if span_hi is None else max(span_hi, hi)
        if not busy_by_line:
            continue
        top = sorted(stats.items(), key=lambda kv: -kv[1][0])[:40]
        by_name = {(m.display_name or m.name): m
                   for m in plane.event_metadata.values()}
        # Per-compiled-program decomposition + device-idle accounting from
        # the "XLA Modules" line (one non-overlapping event per executed
        # program — the Ops lines nest fusions and double-count). This is
        # what located the serving engine's 942 ms/run turnaround idle
        # (REPORT.md round-4 host-pipeline section). Each TPU device is
        # its own plane; module_gap_ms is within-line idle, so in the
        # (unobserved) case of several Modules lines on one plane it sums
        # per-line gaps rather than wall-clock idle.
        modules, idle_ms = {}, 0.0
        gap_pairs = defaultdict(lambda: [0.0, 0])  # "prev->next" -> [ms, n]
        gap_top = []  # (ms, prev, next) largest individual idles
        for line in plane.lines:
            if line.name != "XLA Modules":
                continue
            evs = sorted(line.events, key=lambda e: e.offset_ps)
            prev_end, prev_base = None, None
            for ev in evs:
                meta = plane.event_metadata[ev.metadata_id]
                base = (meta.display_name or meta.name).split("(")[0]
                m = modules.setdefault(base, {"total_ms": 0.0, "count": 0})
                m["total_ms"] += ev.duration_ps / 1e9
                m["count"] += 1
                if prev_end is not None and ev.offset_ps > prev_end:
                    g = (ev.offset_ps - prev_end) / 1e9
                    idle_ms += g
                    # Attribution: which program boundary the device idled
                    # at — separates the per-cycle fetch/dispatch turnaround
                    # (chunk->prefill, chunk->chunk) from startup and
                    # weather stalls. Only gaps > 2 ms (the dispatch RPC
                    # floor) are itemized.
                    if g > 2.0:
                        key = f"{prev_base}->{base}"
                        gap_pairs[key][0] += g
                        gap_pairs[key][1] += 1
                        gap_top.append((round(g, 1), key))
                end = ev.offset_ps + ev.duration_ps
                if prev_end is None or end > prev_end:
                    prev_end, prev_base = end, base
        for m in modules.values():
            m["total_ms"] = round(m["total_ms"], 1)
        summary["planes"][plane.name] = {
            "lines": busy_by_line,
            "span_ms": (span_hi - span_lo) / 1e9 if span_lo is not None else 0,
            "modules": dict(sorted(
                modules.items(), key=lambda kv: -kv[1]["total_ms"])),
            "module_gap_ms": round(idle_ms, 1),
            "gap_by_boundary": {
                k: {"total_ms": round(v[0], 1), "count": v[1]}
                for k, v in sorted(gap_pairs.items(),
                                   key=lambda kv: -kv[1][0])},
            "gap_top": sorted(gap_top, reverse=True)[:12],
            "top_ops": [
                {"name": n, "total_ms": round(ps / 1e9, 4), "count": c,
                 "ms_per_token": round(ps / 1e9 / (chunks * CHUNK), 5),
                 "stats": meta_stats(by_name[n]) if n in by_name else {}}
                for n, (ps, c) in top
            ],
        }
    return summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant", choices=["bf16", "int8", "int4", "w4a8"], default="bf16")
    ap.add_argument("--chunks", type=int, default=2)
    ap.add_argument("--out", default=None)
    ap.add_argument("--analyze_only", action="store_true")
    args = ap.parse_args()
    out = args.out or f"/tmp/trace_decode_{args.quant}"

    if not args.analyze_only:
        capture(out, args.quant, args.chunks)
    summary = analyze(out, args.chunks)
    with open(os.path.join(out, "trace_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    for pname, p in summary.get("planes", {}).items():
        log(f"\n=== plane: {pname} (span {p['span_ms']:.2f} ms) ===")
        for lname, li in p["lines"].items():
            log(f"  line {lname}: busy {li['busy_ms']:.2f} ms over "
                f"span {li['span_ms']:.2f} ms ({li['events']} events)")
        for op in p["top_ops"][:25]:
            log(f"  {op['total_ms']:9.3f} ms x{op['count']:<6} "
                f"{op['ms_per_token']:.4f} ms/tok  {op['name'][:90]}")
            for k, v in op.get("stats", {}).items():
                log(f"      {k}: {v}")
    log(f"\nsummary -> {out}/trace_summary.json")


if __name__ == "__main__":
    main()
