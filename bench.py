"""Headline benchmark: steady-state greedy decode throughput, 3B-224, one chip.

Protocol mirrors the reference ablation study (reference:
ablation_study_fixed.py:168-287): greedy decoding with KV cache, prefill
excluded from timing, first 32 decode tokens excluded as warm-up, steady-state
tokens/sec over the remaining tokens. Weights are randomly initialized at the
exact paligemma-3b-pt-224 geometry (throughput is weight-value independent).

Prints ONE JSON line:
  {"metric": "decode_tok_s_per_chip", "value": N, "unit": "tok/s",
   "vs_baseline": N / 10.20}
Baseline 10.20 tok/s = the reference's KV-cache 128-token config on its RTX
2060 (BASELINE.md; ablation_results/summary_statistics.json).
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from paligemma_tpu import generation
from paligemma_tpu.config import paligemma_3b_pt_224, tiny_config
from paligemma_tpu.models import paligemma
from paligemma_tpu.utils.memory import peak_memory_mb

WARMUP_TOKENS = 32  # reference: ablation_study_fixed.py:23
MEASURE_TOKENS = 128
BASELINE_TOK_S = 10.20  # reference kv_cache_128 steady-state tok/s


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    platform = jax.devices()[0].platform
    on_tpu = platform not in ("cpu",)
    cfg = paligemma_3b_pt_224() if on_tpu else tiny_config()
    dtype = jnp.bfloat16
    log(f"platform={platform} config={'3b-224' if on_tpu else 'tiny'}")

    t0 = time.time()
    params = paligemma.init_params(cfg, jax.random.PRNGKey(0), dtype)
    jax.block_until_ready(params)
    log(f"init params: {time.time() - t0:.1f}s")

    n_img = cfg.vision_config.num_image_tokens
    prompt_tokens = 16
    ids = jnp.concatenate(
        [
            jnp.full((1, n_img), cfg.image_token_index, jnp.int32),
            jnp.full((1, prompt_tokens), 7, jnp.int32),
        ],
        axis=1,
    )
    size = cfg.vision_config.image_size
    pix = jax.random.normal(jax.random.PRNGKey(2), (1, 3, size, size), dtype)
    t_prompt = ids.shape[1]
    max_new = WARMUP_TOKENS + MEASURE_TOKENS

    key = jax.random.PRNGKey(0)

    def run(n_steps, cache, tok):
        for _ in range(n_steps):
            tok1, cache = generation._decode_and_select(
                params, cfg, tok, cache, key, False, 0.0, 0.9
            )
            tok = tok1[:, None]
        return tok, cache

    # Compile warm-up (reference warm-up run: ablation_study_fixed.py:381-391).
    cache = generation.make_cache(cfg, 1, t_prompt, max_new, dtype)
    logits, cache = generation._prefill_jit(params, cfg, ids, pix, cache)
    tok = jnp.argmax(logits[:, -1, :], -1).astype(jnp.int32)[:, None]
    tok, cache = run(2, cache, tok)
    _ = int(tok[0, 0])
    log("compiled")

    # Timed prefill (reported to stderr; target <100 ms).
    cache = generation.make_cache(cfg, 1, t_prompt, max_new, dtype)
    jax.block_until_ready(cache.k)
    t0 = time.time()
    logits, cache = generation._prefill_jit(params, cfg, ids, pix, cache)
    tok = jnp.argmax(logits[:, -1, :], -1).astype(jnp.int32)[:, None]
    _ = int(tok[0, 0])  # device round-trip fences the measurement
    prefill_ms = (time.time() - t0) * 1000
    log(f"prefill: {prefill_ms:.1f} ms")

    # Warm-up tokens (excluded), then the measured steady-state region.
    tok, cache = run(WARMUP_TOKENS, cache, tok)
    _ = int(tok[0, 0])
    t0 = time.time()
    tok, cache = run(MEASURE_TOKENS, cache, tok)
    _ = int(tok[0, 0])
    dt = time.time() - t0
    tok_s = MEASURE_TOKENS / dt
    ms_per_token = dt * 1000 / MEASURE_TOKENS
    log(
        f"steady-state: {ms_per_token:.2f} ms/token over {MEASURE_TOKENS} tokens"
        f" | peak HBM {peak_memory_mb():.0f} MB"
    )

    print(
        json.dumps(
            {
                "metric": "decode_tok_s_per_chip",
                "value": round(tok_s, 2),
                "unit": "tok/s",
                "vs_baseline": round(tok_s / BASELINE_TOK_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
