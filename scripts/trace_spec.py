"""Trace the speculative decode program: where does the verify step's
overhead vs a plain decode step come from?

bench_spec measured verify-step cost ~2x a 1-token decode step (7.2 vs 3.6
ms at k=4 int8) — a fixed per-iteration cost, not per-token compute. This
traces ``decode_steps_spec`` and attributes device time per op (suspects:
the t=k GEMMs falling off the GEMV-optimized streaming path, the dense
per-query mask, while-carry copies).

Usage: python scripts/trace_spec.py [--quant int8] [--k 4]
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

from paligemma_tpu import generation  # noqa: E402
from paligemma_tpu.config import paligemma_3b_pt_224, tiny_config  # noqa: E402
from paligemma_tpu.models import paligemma  # noqa: E402
from paligemma_tpu.quantization import quantize_params  # noqa: E402


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant", choices=["bf16", "int8"], default="int8")
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--out", default=None)
    ap.add_argument("--analyze_only", action="store_true")
    args = ap.parse_args()
    out = args.out or f"/tmp/trace_spec_{args.quant}_k{args.k}"

    if not args.analyze_only:
        on_tpu = jax.devices()[0].platform not in ("cpu",)
        cfg = paligemma_3b_pt_224() if on_tpu else tiny_config()
        dtype = jnp.bfloat16 if on_tpu else jnp.float32
        params = paligemma.init_params(cfg, jax.random.PRNGKey(0), dtype)
        jax.block_until_ready(params)
        if args.quant == "int8":
            params = quantize_params(params, llm_only=True)
            jax.block_until_ready(params)
        log("params ready")

        n_img = cfg.vision_config.num_image_tokens
        phrase = [101, 102, 103, 104, 105, 106, 107, 108]
        text = (phrase + [7, 9]) * 3
        ids = jnp.asarray([[cfg.image_token_index] * n_img + text], jnp.int32)
        size = cfg.vision_config.image_size
        pix = jax.random.normal(jax.random.PRNGKey(2), (1, 3, size, size), dtype)

        t = ids.shape[1]
        alloc = 3 * args.chunk + args.k
        cache = generation.make_cache(cfg, 1, t, alloc, dtype)
        logits, cache = generation._prefill_jit(params, cfg, ids, pix, cache)
        tok = jnp.argmax(logits[:, -1, :], -1).astype(jnp.int32)[:, None]
        L = t + alloc
        ids_buf = jnp.zeros((1, L), jnp.int32)
        ids_buf = jax.lax.dynamic_update_slice(ids_buf, ids, (0, 0))
        ids_buf = ids_buf.at[0, t].set(tok[0, 0])
        buf_len = jnp.asarray(t + 1, jnp.int32)

        run = lambda tok, cache, ids_buf, buf_len: generation.decode_steps_spec(  # noqa: E731
            params, cfg, tok, cache, ids_buf, buf_len, args.chunk, args.k, 3)
        out_buf, produced, iters, tok, cache, ids_buf, buf_len = run(
            tok, cache, ids_buf, buf_len)
        _ = int(produced)  # compile + fence
        log(f"warm: {int(produced)} tokens in {int(iters)} verifies")

        t0 = time.time()
        jax.profiler.start_trace(out)
        out_buf, produced, iters, tok, cache, ids_buf, buf_len = run(
            tok, cache, ids_buf, buf_len)
        n_prod, n_iter = int(produced), int(iters)
        jax.profiler.stop_trace()
        wall = time.time() - t0
        log(f"traced: {n_prod} tokens / {n_iter} verifies, wall "
            f"{wall*1000:.0f} ms = {wall*1000/max(n_iter,1):.2f} ms/verify")
        meta = {"produced": n_prod, "iters": n_iter}
    else:
        meta = {}

    summary = analyze(out, chunks=1)
    iters = meta.get("iters", 1)
    for p in summary.get("planes", {}).values():
        for op in p["top_ops"]:
            op["ms_per_verify"] = round(op["total_ms"] / max(iters, 1), 4)
            op.pop("ms_per_token", None)
    summary["meta"] = meta
    with open(os.path.join(out, "trace_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    for pname, p in summary.get("planes", {}).items():
        if "TPU" not in pname:
            continue
        log(f"\n=== plane: {pname} (span {p['span_ms']:.2f} ms) ===")
        for op in p["top_ops"][:22]:
            st = op.get("stats", {})
            log(f"  {op['ms_per_verify']:8.4f} ms/vfy x{op['count']:<6} "
                f"{op['name'][:36]:36s} {st.get('bytes_accessed',''):>12} B  "
                f"{st.get('source','')}")
    log(f"\nsummary -> {out}/trace_summary.json")


if __name__ == "__main__":
    main()
