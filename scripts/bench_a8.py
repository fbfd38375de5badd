"""a8 prefill at 3B: single-request latency delta + greedy token agreement.

Companion to scripts/bench_mxu_int8.py (the kernel-level gate): this measures
the END-TO-END effect of routing the int8 decoder's prefill projections
through the both-operands-int8 MXU path (runtime.prefill_a8) at the flagship
3B-224 geometry —

  1. prefill latency, weight-only vs a8 (8 dispatches pipelined against ONE
     closing fence, the bench.py protocol — a single host fetch costs ~25 ms
     over the tunnel and would swamp an ~10 ms prefill), and
  2. greedy 64-token streams over N random-image prompts, a8 vs weight-only
     — prefill writes the KV cache through the projections, so a8 error
     propagates to every decoded token; agreement is the quality headline.

Caveat (documented in REPORT.md): random 3B weights give near-Gaussian
activations with no outlier channels, so agreement here is an upper bound —
re-run via scripts/validate_checkpoint.py the day a real checkpoint lands.

Protocol provenance: steady-state phase separation per the reference
ablation harness (/root/reference/ablation_study_fixed.py:168-287).
Prints one JSON dict; progress to stderr.
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax

if "--smoke" in sys.argv:  # force CPU before the package import configures
    jax.config.update("jax_platforms", "cpu")  # the XLA compile cache

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from paligemma_tpu import generation, runtime
from paligemma_tpu.config import paligemma_3b_pt_224, tiny_config
from paligemma_tpu.models import paligemma
from paligemma_tpu.quantization import quantize_params

N_PROMPTS = 8
NEW_TOKENS = 64
PIPELINE_N = 8


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def prefill_ms(params, cfg, ids, pix, dtype, repeats=3):
    t = ids.shape[1]
    cache = generation.make_cache(cfg, 1, t, NEW_TOKENS + 8, dtype)
    logits, _ = generation._prefill_jit(params, cfg, ids, pix, cache)
    _ = int(jnp.argmax(logits[:, -1, :]))  # compile + drain
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        for _i in range(PIPELINE_N):
            logits, _ = generation._prefill_jit(params, cfg, ids, pix, cache)
        _ = int(jnp.argmax(logits[:, -1, :]))  # one fence for the pipeline
        best = min(best, (time.time() - t0) * 1000 / PIPELINE_N)
    return best


def streams(params, cfg, prompts, dtype):
    out = []
    for i, (ids, pix) in enumerate(prompts):
        toks = generation.generate_chunked(
            params, cfg, ids, pix, NEW_TOKENS, eos_token_id=-1,
            cache_dtype=dtype, chunk=32)
        out.append(list(toks))
        log(f"  stream {i}: {len(toks)} tokens")
    return out


def main() -> None:
    smoke = "--smoke" in sys.argv
    on_tpu = jax.devices()[0].platform not in ("cpu",)
    cfg = paligemma_3b_pt_224() if on_tpu else tiny_config()
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    log(f"platform={'tpu' if on_tpu else 'cpu'}")

    params = paligemma.init_params(cfg, jax.random.PRNGKey(0), dtype)
    qp = quantize_params(params, llm_only=True)
    jax.block_until_ready(qp)
    del params
    log("params ready (int8 weight-only)")

    n_img = cfg.vision_config.num_image_tokens
    size = cfg.vision_config.image_size
    n_prompts = 2 if smoke else N_PROMPTS
    prompts = []
    for i in range(n_prompts):
        ids = jnp.concatenate([
            jnp.full((1, n_img), cfg.image_token_index, jnp.int32),
            jax.random.randint(jax.random.PRNGKey(10 + i), (1, 16), 2, 250),
        ], axis=1)
        pix = jax.random.normal(jax.random.PRNGKey(100 + i),
                                (1, 3, size, size), dtype)
        prompts.append((ids, pix))
    ids0, pix0 = prompts[0]

    out = {}
    runtime.set_prefill_a8(False)
    out["prefill_ms_w8"] = round(prefill_ms(qp, cfg, ids0, pix0, dtype), 3)
    log(f"weight-only prefill: {out['prefill_ms_w8']} ms")
    base = streams(qp, cfg, prompts, dtype)

    jax.clear_caches()  # prefill_a8 is trace-time state (runtime.py contract)
    runtime.set_prefill_a8(True)
    try:
        out["prefill_ms_a8"] = round(prefill_ms(qp, cfg, ids0, pix0, dtype), 3)
        log(f"a8 prefill: {out['prefill_ms_a8']} ms")
        a8 = streams(qp, cfg, prompts, dtype)
    finally:
        runtime.set_prefill_a8(False)

    if "--vision" in sys.argv:
        # int8-everything (vision tower quantized too): weight-only int8
        # vision SLOWED prefill (58 vs 39 ms, REPORT r1 — dequant overhead at
        # the bf16 MXU rate); a8 feeds the MXU int8, which may flip the sign.
        params_v = paligemma.init_params(cfg, jax.random.PRNGKey(0), dtype)
        qp_all = quantize_params(params_v, llm_only=False)
        jax.block_until_ready(qp_all)
        del params_v
        jax.clear_caches()
        runtime.set_prefill_a8(True)
        try:
            out["prefill_ms_a8_vision"] = round(
                prefill_ms(qp_all, cfg, ids0, pix0, dtype), 3)
            log(f"a8 prefill incl. vision: {out['prefill_ms_a8_vision']} ms")
        finally:
            runtime.set_prefill_a8(False)
        del qp_all
        jax.clear_caches()

    agree_tok = sum(sum(x == y for x, y in zip(b, a)) for b, a in zip(base, a8))
    total = sum(len(b) for b in base)
    out["streams"] = len(base)
    out["tokens_per_stream"] = NEW_TOKENS
    out["first_token_match"] = sum(b[0] == a[0] for b, a in zip(base, a8))
    out["identical_streams"] = sum(b == a for b, a in zip(base, a8))
    out["token_agreement"] = round(agree_tok / max(total, 1), 4)
    out["speedup"] = round(out["prefill_ms_w8"] / max(out["prefill_ms_a8"], 1e-9), 3)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
