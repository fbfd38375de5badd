"""PaliGemma fusion model: SigLIP vision tower + projector + Gemma decoder.

Capability parity with the reference top model
(reference: modeling_gemma.py:429-617):
- multimodal projector = single biased linear vision_hidden -> projection_dim
  (modeling_gemma.py:429-438),
- image features scaled by 1/sqrt(hidden) to cancel the decoder's sqrt(hidden)
  embedding scaling (modeling_gemma.py:481),
- image/text merge: image features land where input_ids == image_token_index;
  text embeddings elsewhere; pad positions zeroed (modeling_gemma.py:483-500).
  The processor always emits image tokens as a fixed-length *prefix*
  (processing_paligemma.py:10-11), so the jit path uses a structural concat;
  a general where-based merge is kept for arbitrary layouts and exactness
  tests.
- prefix-LM attention semantics: the mask is all-zeros over valid positions
  (full bidirectional attention in prefill; decode attends to every cached
  position) — we implement the *patched* (correct) semantics that produced
  the published numbers (ablation_study_fixed.py:99-142), including position
  ids 0..T-1 for prefill and cache-length for decode.
- optional shifted cross-entropy loss with ignore_index=-100
  (modeling_gemma.py:596-603).

All public functions here are pure and jittable; wrap them in jax.jit with
``cfg`` static (it is hashable).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from paligemma_tpu.config import PaliGemmaConfig
from paligemma_tpu.models import gemma, siglip
from paligemma_tpu.models.gemma import KVCache

Params = Dict[str, Any]


def init_params(
    cfg: PaliGemmaConfig, key: jax.Array, dtype: jnp.dtype = jnp.float32
) -> Params:
    kv, kp, kl = jax.random.split(key, 3)
    vd = cfg.vision_config.hidden_size
    pd = cfg.projection_dim
    return {
        "vision": siglip.init_params(cfg.vision_config, kv, dtype),
        "projector": {
            "kernel": (
                jax.random.normal(kp, (vd, pd), jnp.float32) * vd**-0.5
            ).astype(dtype),
            "bias": jnp.zeros((pd,), dtype),
        },
        "llm": gemma.init_params(cfg.text_config, kl, dtype),
    }


def encode_image(
    params: Params, cfg: PaliGemmaConfig, pixel_values: jnp.ndarray
) -> jnp.ndarray:
    """Vision tower + projector + 1/sqrt(hidden) scaling.

    (B, C, H, W) -> (B, N_img, hidden). The scaling cancels the decoder's
    embedding normalizer (reference: modeling_gemma.py:481,567-574).
    """
    from paligemma_tpu.quantization import QTensor, qproj

    feats = siglip.apply(params["vision"], cfg.vision_config, pixel_values)
    kernel = params["projector"]["kernel"]
    if isinstance(kernel, QTensor):
        proj = qproj(feats, kernel) + params["projector"]["bias"]
    else:
        proj = (
            jnp.einsum(
                "bnd,de->bne", feats, kernel, preferred_element_type=jnp.float32
            ).astype(feats.dtype)
            + params["projector"]["bias"]
        )
    return proj / jnp.asarray(cfg.hidden_size**0.5, proj.dtype)


def merge_prefix(
    params: Params,
    cfg: PaliGemmaConfig,
    input_ids: jnp.ndarray,
    image_features: jnp.ndarray,
) -> jnp.ndarray:
    """Fast structural merge: image tokens are a fixed-length prefix.

    The processor templates prompts as ``<image>*N + BOS + prompt + \\n``
    (reference: processing_paligemma.py:10-11), so positions [0, N_img) are
    image slots. This is a concat — no scatter, fully static under jit.
    """
    n_img = image_features.shape[1]
    text_embeds = gemma.embed_tokens(params["llm"], input_ids[:, n_img:])
    return jnp.concatenate(
        [image_features.astype(text_embeds.dtype), text_embeds], axis=1
    )


def merge_general(
    params: Params,
    cfg: PaliGemmaConfig,
    input_ids: jnp.ndarray,
    image_features: jnp.ndarray,
) -> jnp.ndarray:
    """General merge for arbitrary image-token layouts (masked-scatter parity).

    Equivalent to the reference's masked_scatter merge
    (modeling_gemma.py:483-500): the i-th image feature goes to the i-th
    position whose id equals image_token_index; pad positions are zeroed.
    """
    text_embeds = gemma.embed_tokens(params["llm"], input_ids)
    is_image = input_ids == cfg.image_token_index
    pad_id = cfg.pad_token_id if cfg.pad_token_id is not None else -1
    is_pad = input_ids == pad_id
    # Position of each token among image tokens (0-based); clamp for gather.
    img_rank = jnp.cumsum(is_image.astype(jnp.int32), axis=-1) - 1
    img_rank = jnp.clip(img_rank, 0, image_features.shape[1] - 1)
    gathered = jnp.take_along_axis(
        image_features.astype(text_embeds.dtype), img_rank[..., None], axis=1
    )
    out = jnp.where(is_image[..., None], gathered, text_embeds)
    return jnp.where(is_pad[..., None], jnp.zeros_like(out), out)


def prefill(
    params: Params,
    cfg: PaliGemmaConfig,
    input_ids: jnp.ndarray,
    pixel_values: jnp.ndarray,
    cache: KVCache,
    full_logits: bool = True,
    hidden_sharding=None,
) -> Tuple[jnp.ndarray, KVCache]:
    """Prefill forward: image + templated prompt -> fp32 logits + warm cache.

    Positions are 0..T-1 (patched semantics, ablation_study_fixed.py:134-140);
    attention is fully bidirectional over the T prefix tokens.

    ``full_logits=False`` computes the lm_head only for the last position —
    generation only consumes ``logits[:, -1]`` (reference: inference.py:63),
    and skipping the (T, vocab) fp32 matmul saves ~280 MB of HBM writes per
    prefill at 3B geometry.
    """
    b, t = input_ids.shape
    image_features = encode_image(params, cfg, pixel_values)
    embeds = merge_prefix(params, cfg, input_ids, image_features)
    positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None, :], (b, t))
    hidden, new_cache = gemma.forward(
        params["llm"], cfg.text_config, embeds, positions, cache=cache,
        hidden_sharding=hidden_sharding,
    )
    if not full_logits:
        hidden = hidden[:, -1:, :]
    return gemma.logits(params["llm"], hidden), new_cache


def decode_step(
    params: Params,
    cfg: PaliGemmaConfig,
    token: jnp.ndarray,
    cache: KVCache,
) -> Tuple[jnp.ndarray, KVCache]:
    """One decode step: (B, 1) token -> (B, 1, V) fp32 logits + updated cache.

    Position = cache length, i.e. the first decoded token sits at position T
    (prefix length). This intentionally fixes the reference driver's
    off-by-one — it appends to attention_mask *before* the forward, so its
    cumsum position (modeling_gemma.py:524-528) lands at T+1 — and instead
    matches HF transformers' semantics (pinned by the golden decode-parity
    test). Attention spans all cached positions plus the new one (all-zeros
    mask over valid slots).
    """
    positions = jnp.broadcast_to(
        cache.length.astype(jnp.int32)[None, None], (token.shape[0], 1)
    )
    embeds = gemma.embed_tokens(params["llm"], token)
    hidden, new_cache = gemma.forward(
        params["llm"], cfg.text_config, embeds, positions, cache=cache
    )
    return gemma.logits(params["llm"], hidden), new_cache


def verify_step(
    params: Params,
    cfg: PaliGemmaConfig,
    tokens: jnp.ndarray,
    cache: KVCache,
) -> Tuple[jnp.ndarray, KVCache]:
    """Speculative verify step: (B, k) tokens -> (B, k, V) fp32 logits.

    Feeds k tokens [last_accepted, d1..d_{k-1}] at positions
    length..length+k-1 in ONE forward — decode is weight-streaming-bound
    (REPORT.md), so verifying k tokens costs nearly the same as one. Row i's
    logits predict the token after position length+i under a per-query
    threshold mask (causal among the drafts, full over the accepted prefix),
    so greedy(row i) equals exactly what sequential ``decode_step`` calls
    would produce (pinned by tests/test_speculative.py).

    The returned cache has K/V written for ALL k positions and ``length``
    advanced by k; the caller rolls ``length`` back to the accepted count —
    stale K/V beyond it is masked out by every later step and overwritten
    when those positions are legitimately reached.
    """
    b, k = tokens.shape
    positions = cache.length.astype(jnp.int32) + jnp.broadcast_to(
        jnp.arange(k, dtype=jnp.int32)[None, :], (b, k)
    )
    embeds = gemma.embed_tokens(params["llm"], tokens)
    hidden, new_cache = gemma.forward(
        params["llm"], cfg.text_config, embeds, positions, cache=cache,
        multi_token_decode=True,
    )
    return gemma.logits(params["llm"], hidden), new_cache


def forward_nocache(
    params: Params,
    cfg: PaliGemmaConfig,
    input_ids: jnp.ndarray,
    pixel_values: jnp.ndarray,
    valid_len: Optional[jnp.ndarray] = None,
    lora: Optional[Params] = None,
    lora_scale: float = 1.0,
    lora_dropout: float = 0.0,
    lora_keys: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Cache-free full forward for the KV-cache-off ablation arm.

    Semantically identical to the reference's no-cache loop body
    (ablation_study_fixed.py:244-251): full bidirectional attention over the
    whole (padded) sequence, positions 0..T-1. ``valid_len`` masks padding
    slots so a single padded shape serves every step (jit-stable static
    shapes); positions past valid_len are don't-cares.
    """
    b, t = input_ids.shape
    image_features = encode_image(params, cfg, pixel_values)
    embeds = merge_prefix(params, cfg, input_ids, image_features)
    positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None, :], (b, t))
    mask = None
    if valid_len is not None:
        from paligemma_tpu.ops.attention import make_length_mask

        mask = make_length_mask(valid_len, batch=b)
    hidden, _ = gemma.forward(
        params["llm"], cfg.text_config, embeds, positions, cache=None, mask=mask,
        lora=lora, lora_scale=lora_scale, lora_dropout=lora_dropout,
        lora_keys=lora_keys,
    )
    return gemma.logits(params["llm"], hidden)


def forward(
    params: Params,
    cfg: PaliGemmaConfig,
    input_ids: jnp.ndarray,
    pixel_values: Optional[jnp.ndarray] = None,
    attention_mask: Optional[jnp.ndarray] = None,
    kv_cache: Optional[KVCache] = None,
    labels: Optional[jnp.ndarray] = None,
) -> Dict[str, Any]:
    """Reference-shaped forward (reference: modeling_gemma.py:539-617).

    Returns ``{"logits"[, "loss"][, "kv_cache"]}``. Routing mirrors the
    reference's cache protocol: empty/None cache -> full prefix forward
    (prefill when a cache is supplied); single-token input with a warm cache
    -> decode step. ``attention_mask`` must be all ones (the reference's
    "input cannot be padded" contract, modeling_gemma.py:559) — padded
    batches go through ``paligemma_tpu.serving`` instead.
    """
    # This wrapper routes on *host-side* values (cache fill level, mask
    # content) and therefore cannot run under jit — fail with a clear message
    # instead of a TracerBoolConversionError deep inside.
    if isinstance(input_ids, jax.core.Tracer) or (
        kv_cache is not None and isinstance(kv_cache.length, jax.core.Tracer)
    ):
        raise TypeError(
            "paligemma.forward is a host-side router and cannot be traced "
            "under jax.jit; jit prefill / decode_step / forward_nocache "
            "directly (they are pure and jittable)"
        )
    if attention_mask is not None:
        assert bool(jnp.all(attention_mask == 1)), "The input cannot be padded"

    out: Dict[str, Any] = {}
    if kv_cache is None:
        logits = forward_nocache(params, cfg, input_ids, pixel_values)
    else:
        # Routing on the cache fill level is a host-side decision, exactly as
        # the reference's num_items() branch (modeling_gemma.py:506-511);
        # wrap prefill/decode_step directly when calling under jit.
        if int(kv_cache.length) > 0:
            if input_ids.shape[1] != 1:
                raise ValueError(
                    "warm-cache continuation supports one token per step "
                    f"(got {input_ids.shape[1]}); decode token-by-token like "
                    "the reference driver (inference.py:75), or prefill the "
                    "whole prefix into a fresh cache"
                )
            logits, kv_cache = decode_step(params, cfg, input_ids, kv_cache)
        else:
            logits, kv_cache = prefill(params, cfg, input_ids, pixel_values, kv_cache)
        out["kv_cache"] = kv_cache
    out["logits"] = logits

    if labels is not None:
        shift_logits = logits[:, :-1, :]
        shift_labels = labels[:, 1:]
        valid = shift_labels != cfg.ignore_index
        safe = jnp.where(valid, shift_labels, 0)
        logp = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
        tok_lp = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        out["loss"] = -jnp.sum(jnp.where(valid, tok_lp, 0.0)) / jnp.maximum(
            jnp.sum(valid), 1
        )
    return out


def loss_fn(
    params: Params,
    cfg: PaliGemmaConfig,
    input_ids: jnp.ndarray,
    pixel_values: jnp.ndarray,
    labels: jnp.ndarray,
    valid_len: Optional[jnp.ndarray] = None,
    lora: Optional[Params] = None,
    lora_scale: float = 1.0,
    lora_dropout: float = 0.0,
    lora_keys: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Shifted cross-entropy with ignore_index (reference: modeling_gemma.py:596-603)."""
    logits = forward_nocache(
        params, cfg, input_ids, pixel_values, valid_len,
        lora=lora, lora_scale=lora_scale, lora_dropout=lora_dropout,
        lora_keys=lora_keys,
    )
    shift_logits = logits[:, :-1, :]
    shift_labels = labels[:, 1:]
    valid = shift_labels != cfg.ignore_index
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
    token_logp = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    n_valid = jnp.maximum(jnp.sum(valid), 1)
    return -jnp.sum(jnp.where(valid, token_logp, 0.0)) / n_valid
