"""Speculative (n-gram/prompt-lookup) decode vs plain chunked decode on TPU.

Decode is weight-streaming-bound (3.56 ms device-busy per token at int8,
REPORT.md round 3), so a k-token verify step costs nearly the same HBM
traffic as a 1-token step — speedup ~= tokens accepted per verify. The
draft is checkpoint-free (context n-gram lookup), so acceptance depends
entirely on output repetitiveness; this reports BOTH the timing and the
measured tokens/verify so the speedup can be attributed.

Caveat printed with the results: random-weight greedy text is often
near-cyclic, which flatters acceptance vs real checkpoints; the honest
headline claim is the measured ms/token AT the measured acceptance.

Usage: python scripts/bench_spec.py [--quant int8] [--ks 4,8,16] [--tokens 256]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from paligemma_tpu import generation  # noqa: E402
from paligemma_tpu.config import paligemma_3b_pt_224, tiny_config  # noqa: E402
from paligemma_tpu.models import paligemma  # noqa: E402
from paligemma_tpu.quantization import quantize_params  # noqa: E402


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant", choices=["bf16", "int8"], default="int8")
    ap.add_argument("--ks", default="4,8,16")
    ap.add_argument("--tokens", type=int, default=256)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--sampled", action="store_true",
                    help="measure the SAMPLED speculative path (temperature "
                         "0.8, top-p 0.9) against plain sampled decoding — "
                         "distribution parity, so no token-identity check")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out_name = args.out or (
        f"spec_bench_{args.quant}_sampled.json" if args.sampled
        else f"spec_bench_{args.quant}.json")

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    cfg = paligemma_3b_pt_224() if on_tpu else tiny_config()
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    params = paligemma.init_params(cfg, jax.random.PRNGKey(0), dtype)
    jax.block_until_ready(params)
    if args.quant == "int8":
        params = quantize_params(params, llm_only=True)
        jax.block_until_ready(params)
    log(f"params ready ({args.quant})")

    n_img = cfg.vision_config.num_image_tokens
    # Prompt with some internal structure (repeated phrase), as document VQA
    # prompts have; the generated continuation's repetitiveness is up to the
    # (random) model.
    phrase = [101, 102, 103, 104, 105, 106, 107, 108]
    text = (phrase + [7, 9]) * 3
    ids = jnp.asarray([[cfg.image_token_index] * n_img + text], jnp.int32)
    size = cfg.vision_config.image_size
    pix = jax.random.normal(jax.random.PRNGKey(2), (1, 3, size, size), dtype)

    results = {"quant": args.quant, "tokens": args.tokens,
               "sampled": args.sampled}
    sample_kw = (
        dict(do_sample=True, temperature=0.8, top_p=0.9) if args.sampled
        else {}
    )

    # Baseline: plain chunked decode (chunk 64, the production config).
    import jax as _jax

    def run_plain():
        return generation.generate_chunked(
            params, cfg, ids, pix, max_new_tokens=args.tokens,
            eos_token_id=-1, cache_dtype=dtype, chunk=64,
            key=_jax.random.PRNGKey(0), **sample_kw)

    base = run_plain()  # compile
    best = float("inf")
    for _ in range(args.windows):
        t0 = time.time()
        got = run_plain()
        best = min(best, (time.time() - t0) * 1000 / args.tokens)
    if not args.sampled:
        assert got == base
    results["plain_ms_per_tok"] = round(best, 3)
    log(f"plain chunk64: {best:.3f} ms/token")

    for k in [int(x) for x in args.ks.split(",")]:
        stats = {}

        def run_spec():
            return generation.generate_spec(
                params, cfg, ids, pix, max_new_tokens=args.tokens,
                eos_token_id=-1, cache_dtype=dtype, chunk=64, k=k, n=3,
                key=_jax.random.PRNGKey(0), stats=stats, **sample_kw)

        spec = run_spec()  # compile
        identical = spec == base
        bestk = float("inf")
        for _ in range(args.windows):
            t0 = time.time()
            spec = run_spec()
            bestk = min(bestk, (time.time() - t0) * 1000 / args.tokens)
        results[f"spec_k{k}_ms_per_tok"] = round(bestk, 3)
        results[f"spec_k{k}_tokens_per_verify"] = stats["tokens_per_verify"]
        if not args.sampled:
            results[f"spec_k{k}_identical"] = bool(identical and spec == base)
        log(f"spec k={k}: {bestk:.3f} ms/token, "
            f"{stats['tokens_per_verify']} tok/verify"
            + ("" if args.sampled
               else f", identical={results[f'spec_k{k}_identical']}"))

    with open(out_name, "w") as f:
        json.dump(results, f, indent=2)
    log(json.dumps(results))


if __name__ == "__main__":
    main()
