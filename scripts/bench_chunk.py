"""Decode-chunk-size sweep on TPU: dispatch-tax amortization.

The int8 decode trace (scripts/trace_decode.py, REPORT.md round 3) shows
device-busy time of 3.559 ms/token vs 3.67 measured e2e at chunk 64 — the
difference is exactly the ~7 ms tunnel dispatch per chunk. Chunk 128/256
halves/quarters that tax; this sweep measures where it bottoms out.

Usage: python scripts/bench_chunk.py [--quant int8] [--chunks 64,128,256]
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


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def measure(params, cfg, ids, pix, dtype, chunk, tokens, windows, max_chunk):
    key = jax.random.PRNGKey(0)
    # ONE cache shape across every chunk variant: the prefill (and the cache
    # geometry seen by decode) compiles once for the whole sweep — only the
    # n_steps=chunk decode program is new per variant (compiles dominate the
    # wall clock on the remote-compile backend, CLAUDE.md).
    max_new = tokens * windows + max_chunk
    cache = generation.make_cache(cfg, 1, ids.shape[1], max_new, dtype)
    logits, cache = generation._prefill_jit(params, cfg, ids, pix, cache)
    tok = jnp.argmax(logits[:, -1, :], -1).astype(jnp.int32)[:, None]
    _, tok, cache = generation.decode_steps(params, cfg, tok, cache, key, chunk)
    _ = int(tok[0, 0])
    best = float("inf")
    for _ in range(windows):
        t0 = time.time()
        for _ in range(tokens // chunk):
            _, tok, cache = generation.decode_steps(
                params, cfg, tok, cache, key, chunk)
        _ = int(tok[0, 0])
        best = min(best, (time.time() - t0) / tokens * 1000)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant", choices=["bf16", "int8"], default="int8")
    ap.add_argument("--chunks", default="64,128,256")
    ap.add_argument("--tokens", type=int, default=256)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--out", default="chunk_sweep.json")
    args = ap.parse_args()

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
    ids = jnp.concatenate(
        [jnp.full((1, n_img), cfg.image_token_index, jnp.int32),
         jnp.full((1, 16), 7, jnp.int32)], axis=1)
    size = cfg.vision_config.image_size
    pix = jax.random.normal(jax.random.PRNGKey(2), (1, 3, size, size), dtype)

    results = {}
    chunks = [int(c) for c in args.chunks.split(",")]
    tokens = max(args.tokens, max(chunks))
    for chunk in chunks:
        t0 = time.time()
        ms = measure(params, cfg, ids, pix, dtype, chunk,
                     tokens, args.windows, max(chunks))
        results[f"{args.quant}_chunk{chunk}_ms_per_tok"] = round(ms, 3)
        log(f"chunk {chunk}: {ms:.3f} ms/token ({1000/ms:.1f} tok/s) "
            f"[wall {time.time()-t0:.0f}s]")

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    log(json.dumps(results))


if __name__ == "__main__":
    main()
