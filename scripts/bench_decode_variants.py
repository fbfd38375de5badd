"""Measured pallas-vs-XLA and scan-unroll comparison on real TPU (3B bf16).

Times, per variant (best-of-N windows, same protocol as bench.py):
  - single-stream decode ms/token (the headline path),
  - prefill ms (vision tower + 272-token prefix),
  - batched (B=8) decode ms/step (the serving path).

Writes results to decode_variants.json and prints a table to stderr.
runtime flags are trace-time switches that are NOT part of the jit cache
key, so the process calls jax.clear_caches() between variants.

Usage: python scripts/bench_decode_variants.py [--tokens 128] [--windows 2]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from paligemma_tpu import generation, runtime, serving  # noqa: E402
from paligemma_tpu.config import paligemma_3b_pt_224, tiny_config  # noqa: E402
from paligemma_tpu.models import paligemma  # noqa: E402


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def measure_decode(params, cfg, ids, pix, dtype, tokens, windows, chunk=64):
    key = jax.random.PRNGKey(0)
    max_new = tokens * windows + chunk
    cache = generation.make_cache(cfg, ids.shape[0], ids.shape[1], max_new, dtype)
    logits, cache = generation._prefill_jit(params, cfg, ids, pix, cache)
    tok = jnp.argmax(logits[:, -1, :], -1).astype(jnp.int32)[:, None]
    # compile + warm
    _, tok, cache = generation.decode_steps(params, cfg, tok, cache, key, chunk)
    _ = int(tok[0, 0])
    best = float("inf")
    for _ in range(windows):
        t0 = time.time()
        for _ in range(tokens // chunk):
            _, tok, cache = generation.decode_steps(
                params, cfg, tok, cache, key, chunk
            )
        _ = int(tok[0, 0])
        best = min(best, (time.time() - t0) / tokens * 1000)
    return best


def measure_prefill(params, cfg, ids, pix, dtype, windows):
    cache0 = generation.make_cache(cfg, ids.shape[0], ids.shape[1], 8, dtype)
    logits, _ = generation._prefill_jit(params, cfg, ids, pix, cache0)  # compile
    _ = int(jnp.argmax(logits[:, -1, :], -1)[0])
    best = float("inf")
    for _ in range(max(windows, 3)):
        t0 = time.time()
        logits, _ = generation._prefill_jit(params, cfg, ids, pix, cache0)
        _ = int(jnp.argmax(logits[:, -1, :], -1)[0])
        best = min(best, (time.time() - t0) * 1000)
    return best


def measure_batched(params, cfg, ids1, pix1, dtype, tokens, windows, b=8, chunk=16):
    ids = jnp.tile(ids1, (b, 1))
    pix = jnp.tile(pix1, (b, 1, 1, 1))
    valid = jnp.full((b,), ids.shape[1], jnp.int32)
    t = ids.shape[1]
    max_new = tokens * windows + chunk
    cache = generation.make_cache(cfg, b, t, max_new, dtype)
    logits, cache = serving.batched_prefill(params, cfg, ids, pix, valid, cache)
    tok = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
    key = jax.random.PRNGKey(0)
    _, tok, cache = serving.batched_decode_steps(
        params, cfg, tok, cache, valid, key, chunk, False, 0.0, 0.9, t
    )
    _ = int(tok[0, 0])
    best = float("inf")
    for _ in range(windows):
        t0 = time.time()
        for _ in range(tokens // chunk):
            _, tok, cache = serving.batched_decode_steps(
                params, cfg, tok, cache, valid, key, chunk, False, 0.0, 0.9, t
            )
        _ = int(tok[0, 0])
        best = min(best, (time.time() - t0) / tokens * 1000)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=128)
    ap.add_argument("--windows", type=int, default=2)
    ap.add_argument("--out", type=str, default="decode_variants.json")
    ap.add_argument("--skip_batched", action="store_true")
    args = ap.parse_args()

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    cfg = paligemma_3b_pt_224() if on_tpu else tiny_config()
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    log(f"platform={'tpu' if on_tpu else 'cpu'}")

    params = paligemma.init_params(cfg, jax.random.PRNGKey(0), dtype)
    jax.block_until_ready(params)
    log("params ready")

    n_img = cfg.vision_config.num_image_tokens
    ids = jnp.concatenate(
        [jnp.full((1, n_img), cfg.image_token_index, jnp.int32),
         jnp.full((1, 16), 7, jnp.int32)], axis=1,
    )
    size = cfg.vision_config.image_size
    pix = jax.random.normal(jax.random.PRNGKey(2), (1, 3, size, size), dtype)

    results = {}
    variants = [
        ("xla_u1", False, 1),
        ("xla_u3", False, 3),
        ("xla_u18", False, 18),
        ("pallas_u1", True, 1),
    ]
    for name, pallas, unroll in variants:
        jax.clear_caches()
        runtime.set_pallas_attention(pallas)
        runtime.set_scan_unroll(unroll)
        t0 = time.time()
        ms = measure_decode(
            params, cfg, ids, pix, dtype, args.tokens, args.windows
        )
        results[f"decode_ms_per_tok/{name}"] = round(ms, 3)
        log(f"decode {name}: {ms:.3f} ms/token  (variant wall {time.time()-t0:.0f}s)")

    for name, pallas in [("xla", False), ("pallas", True)]:
        jax.clear_caches()
        runtime.set_pallas_attention(pallas)
        runtime.set_scan_unroll(1)
        ms = measure_prefill(params, cfg, ids, pix, dtype, args.windows)
        results[f"prefill_ms/{name}"] = round(ms, 2)
        log(f"prefill {name}: {ms:.2f} ms")

    if not args.skip_batched:
        for name, pallas in [("xla", False), ("pallas", True)]:
            jax.clear_caches()
            runtime.set_pallas_attention(pallas)
            runtime.set_scan_unroll(1)
            ms = measure_batched(
                params, cfg, ids, pix, dtype, args.tokens, args.windows
            )
            results[f"batched8_decode_ms_per_step/{name}"] = round(ms, 3)
            log(f"batched(8) decode {name}: {ms:.3f} ms/step")

    runtime.set_pallas_attention(False)
    runtime.set_scan_unroll(1)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    log(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
