"""Measured: continuous (slot-level) batching vs window coalescing on TPU.

Workload: 32 greedy requests with mixed token budgets (16..128), the shape of
real serving traffic. Window coalescing (serving.batch_generate, four windows
of 8) convoys every request behind its window's longest; the continuous
engine (8 slots) backfills freed slots immediately, with joins overlapped
under running decode chunks.

Reports aggregate useful tokens/sec (sum of requested tokens / wall time)
for both, plus the ratio. ``--quant int8`` runs the same workload over the
int8 weight-only decoder (the production serving config; token streams stay
identical to bf16). Writes continuous_bench.json (bf16) /
continuous_bench_int8.json.
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from paligemma_tpu import serving  # noqa: E402
from paligemma_tpu.config import paligemma_3b_pt_224, tiny_config  # noqa: E402
from paligemma_tpu.continuous import ContinuousBatcher  # noqa: E402
from paligemma_tpu.models import paligemma  # noqa: E402
from paligemma_tpu.processing import (  # noqa: E402
    ByteTokenizer,
    PaliGemmaProcessor,
    align_config,
)


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--quant", choices=["none", "int8", "w4a8"],
                    default="none")
    ap.add_argument("--res", type=int, default=224, choices=[224, 448, 896],
                    help="model resolution variant (224/448/896 configs — "
                         "448 quadruples image tokens: serving becomes "
                         "prefill-bound, the regime a8 targets)")
    ap.add_argument("--n_slots", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--n_req", type=int, default=32,
                    help="workload size; raise it to give wide-slot configs "
                         "a real backlog (32 over 16 slots is only ~2 waves)")
    ap.add_argument("--spec_k", type=int, default=0,
                    help=">=2: per-slot n-gram speculative decoding (each "
                         "chunk = `chunk` verify iterations of k tokens)")
    ap.add_argument("--spec_adaptive", action="store_true",
                    help="with --spec_k: per-chunk spec/plain choice from "
                         "occupancy + acceptance EMA")
    ap.add_argument("--spec_ks", type=str, default=None,
                    help="comma-separated draft-depth ladder (e.g. '4,8'); "
                         "requires --spec_adaptive. Mutually exclusive "
                         "with --spec_k (server.py resolves precedence "
                         "differently — refusing both avoids a silently "
                         "divergent deployed config)")
    ap.add_argument("--spec_max_slots", type=int, default=None)
    ap.add_argument("--spec_chunk", type=int, default=None,
                    help="verify iterations per SPECULATIVE chunk (default: "
                         "same as --chunk; adaptive engines want 8 so spec "
                         "chunks run at speculation's winning cadence while "
                         "plain chunks keep --chunk)")
    ap.add_argument("--spec_drafter", choices=["ngram", "longest"],
                    default="ngram",
                    help="draft proposal rule: fixed (n-1)-gram recency "
                         "match, or longest-common-suffix variable-context "
                         "match (capped at generation.LONGEST_NMAX)")
    ap.add_argument("--draft_noise", type=float, default=0.0,
                    help="corrupt this fraction of draft tokens on-device "
                         "(rejected by verification — streams stay exact). "
                         "Emulates low real-text n-gram acceptance to "
                         "measure the adaptive engine's degradation floor")
    ap.add_argument("--prefill_a8", action="store_true",
                    help="both-operands-int8 MXU prefill projections "
                         "(runtime.prefill_a8; int8/w4a8 quant — w4a8's "
                         "qkv/o and its int8 MLP companions all route)")
    ap.add_argument("--lm_head_w4", action="store_true",
                    help="4-bit tied lm_head on decode-shaped logits "
                         "(runtime.lm_head_w4; w4a8 quant only — slot "
                         "decode chunks at bt=32 route, verify stays int8)")
    ap.add_argument("--kv_quant", action="store_true",
                    help="int8 KV cache (per-row scales)")
    ap.add_argument("--kv_window", action="store_true",
                    help="occupancy-bounded cache window")
    ap.add_argument("--budget_set", choices=["std", "long"], default="std",
                    help="std: {16..128} budgets, max_new 128 (the r2/r3 "
                         "table workload). long: {64..512} budgets, max_new "
                         "512 — the K/V-heavy regime where cache streaming "
                         "is a large share of step bytes (the int8-KV / "
                         "window levers' target)")
    ap.add_argument("--skip_coalesced", action="store_true",
                    help="measure only the continuous engine (skip the "
                         "coalescing baseline and its batch-shape compiles "
                         "— the width sweep reuses one baseline)")
    ap.add_argument("--trace", default=None,
                    help="profile the timed continuous run into this dir "
                         "(jax.profiler xplane) and print device-busy vs "
                         "wall — the serving-phase analog of "
                         "trace_decode.py; implies --skip_coalesced")
    args = ap.parse_args()
    if args.spec_ks and args.spec_k:
        ap.error("--spec_ks and --spec_k are mutually exclusive")
    if args.trace:
        args.skip_coalesced = True

    if args.prefill_a8 and args.quant not in ("int8", "w4a8"):
        ap.error("--prefill_a8 requires --quant int8 or w4a8")
    from paligemma_tpu import runtime

    # CLI is authoritative over the PALIGEMMA_PREFILL_A8 env default (a
    # stray env export must not poison un-flagged bench runs); set before
    # the first jit trace.
    runtime.set_prefill_a8(bool(args.prefill_a8))
    if args.lm_head_w4 and args.quant != "w4a8":
        ap.error("--lm_head_w4 requires --quant w4a8")
    runtime.lm_head_w4 = bool(args.lm_head_w4)

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    if on_tpu:
        from paligemma_tpu.config import (
            paligemma_3b_pt_448, paligemma_3b_pt_896)
        cfg = {224: paligemma_3b_pt_224, 448: paligemma_3b_pt_448,
               896: paligemma_3b_pt_896}[args.res]()
    else:
        cfg = tiny_config()
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    tok = ByteTokenizer()
    proc = PaliGemmaProcessor(
        tok, cfg.vision_config.num_image_tokens, cfg.vision_config.image_size
    )
    cfg = align_config(cfg, proc)
    params = paligemma.init_params(cfg, jax.random.PRNGKey(0), dtype)
    jax.block_until_ready(params)
    if args.quant != "none":
        from paligemma_tpu.quantization import quantize_params

        params = quantize_params(params, llm_only=True, mode=args.quant)
        jax.block_until_ready(params)
    log("params ready")

    from PIL import Image

    rng = np.random.RandomState(0)
    n_req = args.n_req
    # Shuffled mixed-length traffic: the arrival order real serving sees.
    # (In-order equal pairs would give coalescing the same critical path —
    # the win comes from backfilling freed slots, measured here.)
    budget_pool = (
        [64, 128, 192, 256, 384, 512] if args.budget_set == "long"
        else [16, 32, 48, 64, 96, 128]
    )
    max_new = 512 if args.budget_set == "long" else 128
    budgets = [int(b) for b in rng.choice(budget_pool, n_req)]
    prompts = [f"describe financial document {i}" for i in range(n_req)]
    images = [
        Image.fromarray(rng.randint(0, 255, (224, 224, 3), np.uint8))
        for _ in range(n_req)
    ]
    useful = sum(budgets)
    n_img = cfg.vision_config.num_image_tokens
    budget_prompt = n_img + 48

    # --- continuous ---
    def run_continuous():
        eng = ContinuousBatcher(
            params, cfg, proc, n_slots=args.n_slots,
            prompt_budget=budget_prompt,
            max_new_tokens=max_new, chunk=args.chunk, cache_dtype=dtype,
            spec_k=0 if args.spec_ks else args.spec_k,
            spec_ks=(tuple(int(x) for x in args.spec_ks.split(","))
                     if args.spec_ks else None),
            spec_adaptive=args.spec_adaptive,
            spec_max_slots=args.spec_max_slots, spec_chunk=args.spec_chunk,
            kv_quant=args.kv_quant, kv_window=args.kv_window,
            draft_noise=args.draft_noise, spec_drafter=args.spec_drafter,
        )
        for p, im, b in zip(prompts, images, budgets):
            eng.submit(p, im, max_new_tokens=b)
        t0 = time.time()
        eng.run()
        return time.time() - t0, eng

    # compile pass (programs: bucketed prefill, insert, slot decode)
    wall_c, _ = run_continuous()
    log(f"continuous compile+run: {wall_c:.1f}s")
    if args.trace:
        with jax.profiler.trace(args.trace):
            wall_c, eng = run_continuous()
    else:
        wall_c, eng = run_continuous()
    agg_c = useful / wall_c
    log(f"continuous: {wall_c:.2f}s -> {agg_c:.1f} useful tok/s aggregate")
    if (args.spec_k or args.spec_ks) and eng.spec_verifies:
        log(f"  spec acceptance: {eng.spec_emitted}/{eng.spec_verifies} = "
            f"{eng.spec_emitted / eng.spec_verifies:.3f} tokens/verify")

    # --- window coalescing, windows of n_slots (server Batcher behavior) ---
    w = args.n_slots

    def run_coalesced():
        t0 = time.time()
        for lo in range(0, n_req, w):
            serving.batch_generate(
                params, cfg, proc, prompts[lo:lo + w], images[lo:lo + w],
                max_new_tokens=max(budgets[lo:lo + w]),
                cache_dtype=dtype, prompt_bucket=budget_prompt,
                return_tokens=True,
            )
        return time.time() - t0

    if args.skip_coalesced:
        wall_w, agg_w = float("nan"), float("nan")
    else:
        wall_w = run_coalesced()  # compile pass
        log(f"coalesced compile+run: {wall_w:.1f}s")
        wall_w = run_coalesced()
        agg_w = useful / wall_w
        log(f"coalesced: {wall_w:.2f}s -> {agg_w:.1f} useful tok/s aggregate")

    out = {
        "quant": args.quant,
        "res": args.res,
        "n_slots": args.n_slots,
        "chunk": args.chunk,
        "n_req": n_req,
        "useful_tokens": useful,
        "continuous_s": round(wall_c, 2),
        "continuous_agg_tok_s": round(agg_c, 1),
        "coalesced_s": round(wall_w, 2) if wall_w == wall_w else None,
        "coalesced_agg_tok_s": round(agg_w, 1) if agg_w == agg_w else None,
        "speedup": round(agg_c / agg_w, 3) if agg_w == agg_w else None,
    }
    out["spec_k"] = eng.spec_k
    # Host-phase wall decomposition (seconds, cumulative over the timed
    # run): names where the engine thread spends time between device work.
    # "fetch" overlaps device execution (it waits out the queued chunk);
    # every other phase is host time the device may be idle for.
    out["host_t"] = {k: round(v, 3) for k, v in sorted(eng.host_t.items())}
    out["chunks_run"] = eng.chunks_run
    out["join_groups"] = eng.join_groups
    out["staged_hits"] = eng.staged_hits
    out["staged_misses"] = eng.staged_misses
    out["pixel_affine"] = eng.pixel_affine
    if args.spec_ks:
        out["spec_ks"] = list(eng.spec_ks)
        out["spec_k_chunks"] = {
            str(k): eng.spec_k_log.count(k) for k in eng.spec_ks}
    if (args.spec_k or args.spec_ks) and eng.spec_verifies:
        out["spec_tokens_per_verify"] = round(
            eng.spec_emitted / eng.spec_verifies, 3)
    if args.spec_adaptive:
        log_m = eng.spec_mode_log
        out["spec_adaptive"] = True
        out["spec_max_slots"] = args.spec_max_slots
        out["spec_chunks"] = sum(log_m)
        out["plain_chunks"] = len(log_m) - sum(log_m)
        if eng.spec_accept_ema is not None:
            out["spec_accept_ema"] = round(eng.spec_accept_ema, 3)
    if args.kv_quant:
        out["kv_quant"] = True
    if args.kv_window:
        out["kv_window"] = True
        out["window_buckets"] = list(eng.window_buckets)
        out["window_resizes"] = eng.window_resizes
    tag = "" if args.quant == "none" else f"_{args.quant}"
    if args.res != 224:
        tag += f"_res{args.res}"
    if (args.n_slots, args.chunk) != (8, 16):
        tag += f"_s{args.n_slots}c{args.chunk}"
    if args.n_req != 32:
        tag += f"_r{args.n_req}"
    if args.spec_ks:
        tag += "_specL" + args.spec_ks.replace(",", "-") + "a"
    elif args.spec_k:
        tag += f"_spec{args.spec_k}"
        if args.spec_adaptive:
            tag += "a"
    if args.spec_ks or args.spec_k:
        if args.spec_drafter != "ngram":
            out["spec_drafter"] = args.spec_drafter
            tag += "_dLM"  # longest-match drafter arm (A/B vs default ngram)
        if args.spec_chunk and args.spec_chunk != args.chunk:
            out["spec_chunk"] = args.spec_chunk
            tag += f"v{args.spec_chunk}"
        if args.draft_noise:
            out["draft_noise"] = args.draft_noise
            tag += f"_dn{int(args.draft_noise * 100)}"
    if args.prefill_a8:
        out["prefill_a8"] = True
        tag += "_a8"
    if args.lm_head_w4:
        out["lm_head_w4"] = True
        tag += "_lmw4"
    if args.kv_quant:
        tag += "_kvq"
    if args.kv_window:
        tag += "_kvw"
    if args.budget_set != "std":
        out["budget_set"] = args.budget_set
        tag += f"_{args.budget_set}"
    if args.trace:
        # Device-busy vs wall for the WHOLE serving run: how much of the
        # engine's wall clock is device work (prefill + decode + inserts)
        # vs host gaps (scheduling, fetches, preprocessing not hidden by
        # the join overlap). Per-op table goes to stderr via analyze().
        import os as _os
        sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
        from trace_decode import analyze  # noqa: PLC0415

        summary = analyze(args.trace, chunks=1)
        tpu_planes = {p: v for p, v in summary.get("planes", {}).items()
                      if "TPU" in p or "tpu" in p}
        # Flat keys describe ONE device; with several TPU planes (multi-
        # chip traces) the per-plane numbers go under device_planes and
        # the flat keys aggregate, instead of silently keeping whichever
        # plane iterated last.
        if len(tpu_planes) > 1:
            out["device_planes"] = {}
        for pname, plane in tpu_planes.items():
            # "XLA Modules" is the one non-overlapping line (one event
            # per executed program); the Ops lines nest fusions and
            # double-count, so summing lines overstates busy ~3x.
            lines = plane["lines"]
            mod = lines.get("XLA Modules")
            busy = (mod["busy_ms"] if mod
                    else max(l["busy_ms"] for l in lines.values()))
            log(f"TRACE {pname}: busy {busy:.0f} ms over span "
                f"{plane['span_ms']:.0f} ms, wall {wall_c*1000:.0f} ms "
                f"-> device idle {wall_c*1000 - busy:.0f} ms")
            # Per-program split (prefill vs decode chunks vs inserts)
            # + inter-program device gaps — the decomposition that
            # located the r4 turnaround idle.
            mods = {k: v for k, v in plane.get("modules", {}).items()
                    if v["total_ms"] >= 1.0}
            for name, m in mods.items():
                log(f"  {m['total_ms']:9.1f} ms  x{m['count']:4d}  "
                    f"{name}")
            log(f"  inter-program device gap: "
                f"{plane.get('module_gap_ms')} ms")
            entry = {
                "device_busy_ms": round(busy, 1),
                "device_span_ms": round(plane["span_ms"], 1),
                "device_modules": mods,
                "device_gap_ms": plane.get("module_gap_ms"),
            }
            if len(tpu_planes) > 1:
                out["device_planes"][pname] = entry
                out["device_busy_ms"] = round(
                    out.get("device_busy_ms", 0.0) + busy, 1)
                out["device_span_ms"] = max(
                    out.get("device_span_ms", 0.0),
                    round(plane["span_ms"], 1))
            else:
                out.update(entry)
            out["wall_ms"] = round(wall_c * 1000, 1)
        tag += "_traced"
    name = f"continuous_bench{tag}.json"
    with open(name, "w") as f:
        json.dump(out, f, indent=2)
    log(json.dumps(out))


if __name__ == "__main__":
    main()
