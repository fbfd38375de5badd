"""Measured int4 (packed, in-kernel unpack) decode throughput on real TPU.

jnp.int4 is broken on this backend (CLAUDE.md), so this is the manual-packing
route: decoder kernels at 4 bits (two values per int8 byte, unpacked inside
the Pallas GEMV — ops/pallas_quant.py), embedding/lm_head at int8.

Reports decode ms/token for bf16 / int8 / int4(kernel) / int4(XLA unpack,
which materializes the unpacked tensor — the negative control), plus greedy
token agreement of each quantized arm vs bf16 over the measured window.
Writes int4_bench.json.
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from paligemma_tpu import generation  # noqa: E402
from paligemma_tpu.config import paligemma_3b_pt_224, tiny_config  # noqa: E402
from paligemma_tpu.models import gemma, paligemma  # noqa: E402
from paligemma_tpu.quantization import quantize_params  # noqa: E402

CHUNK = 64
TOKENS = 128
WINDOWS = 2


def log(m):
    print(m, file=sys.stderr, flush=True)


def measure(params, cfg, ids, pix, dtype):
    key = jax.random.PRNGKey(0)
    max_new = TOKENS * WINDOWS + CHUNK
    cache = generation.make_cache(cfg, 1, ids.shape[1], max_new, dtype)
    logits, cache = generation._prefill_jit(params, cfg, ids, pix, cache)
    tok = jnp.argmax(logits[:, -1, :], -1).astype(jnp.int32)[:, None]
    _, tok, cache = generation.decode_steps(params, cfg, tok, cache, key, CHUNK)
    _ = int(tok[0, 0])
    best, toks_all = float("inf"), [int(tok[0, 0])]
    chunks = []
    for _ in range(WINDOWS):
        t0 = time.time()
        for _ in range(TOKENS // CHUNK):
            toks, tok, cache = generation.decode_steps(
                params, cfg, tok, cache, key, CHUNK
            )
            chunks.append(toks)
        _ = int(tok[0, 0])
        best = min(best, (time.time() - t0) / TOKENS * 1000)
    toks_all.extend(jnp.concatenate(chunks, axis=1)[0].tolist())
    return best, toks_all


def main():
    on_tpu = jax.devices()[0].platform not in ("cpu",)
    cfg = paligemma_3b_pt_224() if on_tpu else tiny_config()
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

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
    ms_bf, toks_bf = measure(params, cfg, ids, pix, dtype)
    results["bf16_ms_per_tok"] = round(ms_bf, 3)
    log(f"bf16: {ms_bf:.3f} ms/token")

    modes = ("int8", "int4", "w4a8") if "--w4a8-only" not in sys.argv \
        else ("w4a8",)
    for mode in modes:
        qp = quantize_params(params, llm_only=True, mode=mode)
        jax.block_until_ready(qp)
        ms, toks = measure(qp, cfg, ids, pix, dtype)
        agree = sum(a == b for a, b in zip(toks, toks_bf)) / len(toks_bf)
        results[f"{mode}_ms_per_tok"] = round(ms, 3)
        results[f"{mode}_token_agreement_vs_bf16"] = round(agree, 4)
        log(f"{mode}: {ms:.3f} ms/token, agreement {agree:.3f}")
        if mode == "w4a8":
            # 4-bit tied lm_head arm (runtime.lm_head_w4): halves the
            # 527 MB/token embedding stream; agreement-vs-bf16 is the gate.
            from paligemma_tpu import runtime

            try:
                runtime.lm_head_w4 = True
                jax.clear_caches()
                ms_l, toks_l = measure(qp, cfg, ids, pix, dtype)
                agree_l = sum(
                    a == b for a, b in zip(toks_l, toks_bf)
                ) / len(toks_bf)
                results["w4a8_lmw4_ms_per_tok"] = round(ms_l, 3)
                results["w4a8_lmw4_token_agreement_vs_bf16"] = round(
                    agree_l, 4)
                log(f"w4a8+lmw4: {ms_l:.3f} ms/token, agreement {agree_l:.3f}")
            finally:
                runtime.lm_head_w4 = False
                jax.clear_caches()
        if mode == "int4":
            # Negative control: XLA unpack+einsum materializes the unpacked
            # int8 tensor — quantifies what the in-kernel unpack saves.
            from paligemma_tpu.ops import pallas_quant as pq

            orig = pq.q4_matmul
            try:
                pq.q4_matmul = pq.q4_matmul_xla
                jax.clear_caches()
                ms_x, _ = measure(qp, cfg, ids, pix, dtype)
                results["int4_xla_unpack_ms_per_tok"] = round(ms_x, 3)
                log(f"int4 (XLA unpack): {ms_x:.3f} ms/token")
            finally:
                pq.q4_matmul = orig
                jax.clear_caches()
        del qp

    # Merge with the existing artifact so partial runs (--w4a8-only) refresh
    # their arms without clobbering the full grid's other rows.
    try:
        with open("int4_bench.json") as f:
            merged = json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        merged = {}
    merged.update(results)
    with open("int4_bench.json", "w") as f:
        json.dump(merged, f, indent=2)
    log(json.dumps(results))


if __name__ == "__main__":
    main()
