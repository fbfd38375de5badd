"""Batched multi-image VQA serving.

The reference is strictly batch-1 (its processor asserts one image + one
prompt, processing_paligemma.py:80). This module is the batched TPU serving
path called out in BASELINE.json ("batched multi-image financial-document
VQA inference (batch>=8)"): N images + N prompts -> one padded batch ->
batched prefill -> decode -> N decoded strings.

Batching strategy: prompts are templated exactly like the reference
(``<image>*N + BOS + prompt + \\n``) and *right-padded* to the longest
sequence. PaliGemma's prefix-LM attention is bidirectional over the prefix,
so pad slots must be masked out: each row attends to its own prompt region
``[0, valid_i)`` plus every shared generated slot ``[T_pad, T_pad + g]``;
pad slots (which hold garbage K/V from the padded prefill) stay masked
forever. Per-row RoPE positions are ``valid_i + g`` — each row's generation
continues at its own length, exactly as if it ran unpadded at batch 1
(verified against batch-1 ``generate`` in tests/test_serving.py).
"""
from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from paligemma_tpu import generation
from paligemma_tpu.config import PaliGemmaConfig
from paligemma_tpu.models import gemma, paligemma
from paligemma_tpu.ops.attention import LengthMask
from paligemma_tpu.ops.sampling import greedy, sample_top_p


def pad_batch(
    processor,
    prompts: List[str],
    images: List,
    prompt_bucket: Optional[int] = None,
    batch_bucket: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Per-sample processing + right-padding.

    Default pads to the longest prompt. ``prompt_bucket`` rounds the padded
    length up to a multiple (and ``batch_bucket`` rounds the batch size up by
    repeating the first sample) so serving traffic reuses a small set of
    compiled shapes — one jit shape costs minutes to compile on the
    remote-compile backend (CLAUDE.md).

    Returns (input_ids (B', T), valid_len (B',), pixel_values, real_batch).
    """
    assert len(prompts) == len(images)
    ids_list, pix_list = [], []
    for prompt, image in zip(prompts, images):
        out = processor(text=[prompt], images=[image])
        ids_list.append(np.asarray(out["input_ids"][0], np.int32))
        pix_list.append(out["pixel_values"][0])
    real_b = len(ids_list)
    if batch_bucket:
        while len(ids_list) % batch_bucket:
            ids_list.append(ids_list[0])
            pix_list.append(pix_list[0])
    max_len = max(len(x) for x in ids_list)
    if prompt_bucket:
        max_len = -(-max_len // prompt_bucket) * prompt_bucket
    b = len(ids_list)
    ids = np.zeros((b, max_len), np.int32)
    valid = np.zeros((b,), np.int32)
    for i, row in enumerate(ids_list):
        ids[i, : len(row)] = row
        valid[i] = len(row)
    return ids, valid, np.stack(pix_list, axis=0), real_b


@functools.partial(jax.jit, static_argnames=("cfg",))
def batched_prefill(
    params, cfg: PaliGemmaConfig, input_ids, pixel_values, valid, cache,
    lora=None,
):
    """Prefill a right-padded batch with per-row validity masking.

    Returns (per-row last-valid-position logits (B, V), warm cache). The
    cache's scalar length advances by the padded T; pad slots hold garbage
    K/V that decode keeps masked.

    ``lora``: optional per-row decoder adapters ({q,k,v: {a (L,B,D,r),
    b (L,B,r,out)}}, scale pre-folded into b) — multi-tenant serving where
    each row of a join group carries its own adapter.
    """
    b, t = input_ids.shape
    image_features = paligemma.encode_image(params, cfg, pixel_values)
    embeds = paligemma.merge_prefix(params, cfg, input_ids, image_features)
    positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None, :], (b, t))
    positions = jnp.minimum(positions, jnp.maximum(valid[:, None] - 1, 0))

    from paligemma_tpu.ops.attention import make_length_mask

    mask = make_length_mask(valid, batch=b)

    hidden, new_cache = gemma.forward(
        params["llm"], cfg.text_config, embeds, positions, cache=cache, mask=mask,
        lora=lora,
    )
    last = jnp.take_along_axis(
        hidden, jnp.maximum(valid - 1, 0)[:, None, None].astype(jnp.int32), axis=1
    )
    logits = gemma.logits(params["llm"], last)[:, 0, :]
    return logits, new_cache


def _decode_step_inner(
    params, cfg: PaliGemmaConfig, token, cache, valid, key,
    do_sample: bool, temperature: float, top_p: float, t_prompt: int,
):
    """One decode step for a padded batch (unjitted body).

    ``valid`` (B,): original per-row prompt lengths. Generated count
    g = cache.length - t_prompt; per-row RoPE position = valid + g; rows
    attend to their own prompt ``[0, valid)`` plus all generated slots
    ``[t_prompt, cache.length]`` (inclusive of this step's write).
    """
    g = cache.length - t_prompt
    positions = (valid + g)[:, None].astype(jnp.int32)
    embeds = gemma.embed_tokens(params["llm"], token)
    # Structured mask: each row sees its own prompt [0, valid) plus the shared
    # generated window [t_prompt, cache.length] (inclusive of this step's
    # write); pad holes stay masked. LengthMask routes to the Pallas decode
    # kernel when enabled, else materializes the identical dense mask.
    mask = LengthMask(
        valid=valid.astype(jnp.int32),
        gen_start=jnp.asarray(t_prompt, jnp.int32),
        gen_end=(cache.length + 1).astype(jnp.int32),
    )

    # gemma.forward derives cos/sin from our per-row positions and writes the
    # new KV at cache.length; the mask above overrides its default.
    hidden, new_cache = gemma.forward(
        params["llm"], cfg.text_config, embeds, positions, cache=cache, mask=mask
    )
    logits = gemma.logits(params["llm"], hidden)[:, -1, :]
    if do_sample and temperature > 0.0:
        nxt = sample_top_p(logits, key, temperature, top_p)
    else:
        nxt = greedy(logits)
    return nxt, new_cache


batched_decode_step = jax.jit(
    _decode_step_inner,
    static_argnames=("cfg", "do_sample", "temperature", "top_p", "t_prompt"),
)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "do_sample", "temperature", "top_p", "t_prompt"),
)
def batched_decode_steps(
    params, cfg: PaliGemmaConfig, token, cache, valid, key,
    n_steps: int, do_sample: bool, temperature: float, top_p: float, t_prompt: int,
):
    """``n_steps`` batched decode steps as ONE compiled program (lax.scan) —
    the dispatch-amortized unit for serving/benchmarking on remote backends.

    Returns (tokens (B, n_steps), last token (B, 1), cache).
    """

    def body(carry, step_key):
        tok, cache = carry
        nxt, cache = _decode_step_inner(
            params, cfg, tok, cache, valid, step_key,
            do_sample, temperature, top_p, t_prompt,
        )
        return (nxt[:, None], cache), nxt

    keys = jax.random.split(key, n_steps)
    (tok, cache), toks = jax.lax.scan(body, (token, cache), keys)
    return toks.T, tok, cache


def batch_generate(
    params,
    cfg: PaliGemmaConfig,
    processor,
    prompts: List[str],
    images: List,
    max_new_tokens: int = 100,
    do_sample: bool = False,
    temperature: float = 0.8,
    top_p: float = 0.9,
    eos_token_id: Optional[int] = None,
    key: Optional[jax.Array] = None,
    cache_dtype=jnp.bfloat16,
    prompt_bucket: Optional[int] = None,
    batch_bucket: Optional[int] = None,
    return_tokens: bool = False,
):
    """End-to-end batched VQA: prompts + images -> decoded strings.

    ``return_tokens=True`` returns (texts, token_id_lists) instead. See
    ``pad_batch`` for the shape-bucketing knobs.
    """
    if eos_token_id is None:
        eos_token_id = processor.tokenizer.eos_token_id
    ids_np, valid_np, pix_np, real_b = pad_batch(
        processor, prompts, images, prompt_bucket, batch_bucket
    )
    b, t = ids_np.shape
    ids = jnp.asarray(ids_np)
    valid = jnp.asarray(valid_np)
    pix = jnp.asarray(pix_np, cache_dtype)
    key = key if key is not None else jax.random.PRNGKey(0)

    # Cache is over-allocated to a whole number of chunks so every decode
    # dispatch is the same compiled n_steps program (one jit shape — remote
    # compiles cost minutes, CLAUDE.md); surplus tokens are trimmed below.
    chunk = 16
    alloc = -(-max(max_new_tokens - 1, 1) // chunk) * chunk + 1
    cache = generation.make_cache(cfg, b, t, alloc, cache_dtype)
    logits, cache = batched_prefill(params, cfg, ids, pix, valid, cache)

    key, sub = jax.random.split(key)
    if do_sample and temperature > 0.0:
        tok = sample_top_p(logits, sub, temperature, top_p)
    else:
        tok = greedy(logits)

    # Decode in compiled multi-step chunks (batched_decode_steps) — zero
    # per-token host traffic — checking between chunks whether every row has
    # emitted EOS (stop within one chunk of all-done).
    columns = [np.asarray(tok)[:, None]]
    done = columns[0][:, 0] == eos_token_id
    remaining = max_new_tokens - 1
    tok = tok[:, None]
    while remaining > 0 and not bool(np.all(done)):
        key, sub = jax.random.split(key)
        toks, tok, cache = batched_decode_steps(
            params, cfg, tok, cache, valid, sub,
            chunk, do_sample, float(temperature), float(top_p), t,
        )
        toks_np = np.asarray(toks)  # one host fetch per chunk
        columns.append(toks_np)
        done = done | np.any(toks_np == eos_token_id, axis=1)
        remaining -= chunk

    mat = np.concatenate(columns, axis=1)[:, :max_new_tokens]
    outs, token_rows = [], []
    for i in range(real_b):
        row = mat[i].tolist()
        if eos_token_id in row:
            row = row[: row.index(eos_token_id) + 1]
        token_rows.append(row)
        outs.append(processor.tokenizer.decode(row, skip_special_tokens=True))
    if return_tokens:
        return outs, token_rows
    return outs
