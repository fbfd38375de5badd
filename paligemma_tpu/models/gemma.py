"""Gemma decoder (GQA + RoPE + RMSNorm + GeGLU), functional JAX.

Capability parity with the reference decoder (reference: modeling_gemma.py):
token embedding scaled by sqrt(hidden) (modeling_gemma.py:367-368), per-layer
pre-RMSNorm blocks (input_layernorm -> GQA attention -> +res ->
post_attention_layernorm -> GeGLU MLP -> +res, modeling_gemma.py:295-338),
final RMSNorm, fp32 logits through a weight-tied lm_head
(modeling_gemma.py:396-397,417-418).

TPU-first design departures:
- The reference's dynamic ``torch.cat`` KV cache (modeling_gemma.py:10-36,
  O(T) realloc per step) is replaced by a **preallocated HBM cache**
  ``(L, B, max_len, kv_heads, head_dim)`` plus a scalar length; decode writes
  one slot via ``lax.dynamic_update_slice`` and attention masks unwritten
  slots — static shapes, zero reallocation.
- All 18 decoder layers are stacked on a leading axis and traversed with
  ``lax.scan`` (cache slices are scanned xs/ys), compiling one layer body.
- GQA never materializes ``repeat_kv`` (modeling_gemma.py:136-141); queries
  are grouped and broadcast against the single KV head inside the einsum.
- RoPE cos/sin are computed once per forward (fp32) and shared by every
  layer — the reference re-computes them per layer
  (modeling_gemma.py:225-229,254).

Parameter tree:
  embed: (V, D)   (tied lm_head — logits = h @ embed.T, no separate weight)
  layers (stacked, leading axis L):
    input_ln: (L, D)
    qkv: (L, D, (H+2*Hkv)*hd)  — fused [q | k | v] projection, one GEMM/stream
    o: (L, H*hd, D)
    post_ln: (L, D)
    gate_up: (L, D, 2*I)       — fused [gate | up] projection
    down: (L, I, D)
  final_norm: (D,)

The q/k/v and gate/up projections are stored fused (concatenated along the
output dim) so each decode step streams 4 kernels per layer instead of 7 —
the reference keeps 7 separate nn.Linear weights (modeling_gemma.py:220-222,
127-130). Fusion is bitwise-neutral: each output element is the same dot
product either way, so logits are identical to the unfused layout.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from paligemma_tpu.config import GemmaConfig
from paligemma_tpu.ops.attention import LengthMask, gqa_attention, make_length_mask
from paligemma_tpu.ops.norms import rms_norm
from paligemma_tpu.ops.rope import apply_rope, rope_cos_sin

Params = Dict[str, Any]


class KVCache(NamedTuple):
    """Preallocated per-layer KV cache resident in HBM.

    k, v: (num_layers, batch, max_len, kv_heads, head_dim)
    length: () int32 — number of valid cached positions.

    TPU-native replacement for the reference's list-of-concats KVCache
    (modeling_gemma.py:10-36): fixed shapes keep decode jit-stable and writes
    are O(1) dynamic_update_slice instead of O(T) concat.
    """

    k: jnp.ndarray
    v: jnp.ndarray
    length: jnp.ndarray

    @property
    def max_len(self) -> int:
        return self.k.shape[2]

    def num_items(self) -> jnp.ndarray:
        """Valid cached positions (reference: KVCache.num_items)."""
        return self.length


class QuantKVCache(NamedTuple):
    """int8 KV cache: values stored int8 with one fp32 scale per written
    (layer, row, position, kv_head) K row and V row.

    Streamed decode bytes for K/V drop ~2x vs bf16 (the scale planes are
    1/512 of the data); dequantization (``q * scale``) happens inside the
    attention read, fused by XLA into the score/output matmuls. Quantization
    error is bounded per 256-wide head row (amax/127), so scores see
    <=0.8% relative error per element — greedy-stream fidelity is pinned
    empirically (tests + the bench token-identity protocol). The reference's
    cache is dynamic fp16 torch.cat (modeling_gemma.py:10-36).

    k, v: (L, B, S, Hkv, hd) int8; k_scale, v_scale: (L, B, S, Hkv) fp32.
    """

    k: jnp.ndarray
    v: jnp.ndarray
    k_scale: jnp.ndarray
    v_scale: jnp.ndarray
    length: jnp.ndarray

    @property
    def max_len(self) -> int:
        return self.k.shape[2]

    def num_items(self) -> jnp.ndarray:
        return self.length


def quantize_kv_rows(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(..., hd) bf16/f32 -> ((..., hd) int8, (...) fp32 per-row scale)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127
    ).astype(jnp.int8)
    return q, scale


def init_cache(
    cfg: GemmaConfig,
    batch: int,
    max_len: int,
    dtype: jnp.dtype = jnp.bfloat16,
) -> KVCache:
    """Preallocated cache; ``dtype=jnp.int8`` returns a QuantKVCache."""
    shape = (cfg.num_hidden_layers, batch, max_len, cfg.num_key_value_heads, cfg.head_dim)
    if dtype == jnp.int8:
        return QuantKVCache(
            k=jnp.zeros(shape, jnp.int8),
            v=jnp.zeros(shape, jnp.int8),
            k_scale=jnp.zeros(shape[:-1], jnp.float32),
            v_scale=jnp.zeros(shape[:-1], jnp.float32),
            length=jnp.zeros((), jnp.int32),
        )
    return KVCache(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        length=jnp.zeros((), jnp.int32),
    )


def init_params(cfg: GemmaConfig, key: jax.Array, dtype: jnp.dtype = jnp.float32) -> Params:
    d, i, l = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    h, hkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    keys = jax.random.split(key, 5)

    def dense(k, shape, fan_in):
        return (jax.random.normal(k, shape, jnp.float32) * fan_in**-0.5).astype(dtype)

    return {
        "embed": dense(keys[0], (cfg.vocab_size, d), d),
        "layers": {
            "input_ln": jnp.zeros((l, d), dtype),
            "qkv": dense(keys[1], (l, d, (h + 2 * hkv) * hd), d),
            "o": dense(keys[2], (l, h * hd, d), h * hd),
            "post_ln": jnp.zeros((l, d), dtype),
            "gate_up": dense(keys[3], (l, d, 2 * i), d),
            "down": dense(keys[4], (l, i, d), i),
        },
        "final_norm": jnp.zeros((d,), dtype),
    }


def _proj(x: jnp.ndarray, w) -> jnp.ndarray:
    from paligemma_tpu.ops.pallas_quant import (
        Q4A8Tensor, Q4A8TiledTensor, Q4Tensor, q4_matmul, q4a8_matmul,
        q4a8_matmul_tiled,
    )
    from paligemma_tpu.quantization import QTensor, qproj

    if isinstance(w, QTensor):
        return qproj(x, w)
    if isinstance(w, Q4Tensor):
        return q4_matmul(x, w.packed, w.scale)
    if isinstance(w, Q4A8Tensor):
        return q4a8_matmul(x, w.packed, w.scale)
    if isinstance(w, Q4A8TiledTensor):
        return q4a8_matmul_tiled(x, w.packed, w.scale)
    return jnp.einsum(
        "btd,de->bte", x, w, preferred_element_type=jnp.float32
    ).astype(x.dtype)


def _lora_delta(
    x: jnp.ndarray,
    adapter: Params,
    scale: jnp.ndarray,
    dropout_rate: float,
    key: Optional[jax.Array],
) -> jnp.ndarray:
    """LoRA update ``scale * (drop(x) @ A) @ B`` (rank-r bottleneck).

    Matches HF peft's LoraLayer semantics used by the reference finetune
    (SURVEY.md §2.9: r=8, alpha=16, dropout 0.1 on the A-input,
    scale = alpha/r).

    Adapters may be shared across the batch (a: (D, r), b: (r, out)) or
    per-row (a: (B, D, r), b: (B, r, out)) — the latter serves multi-tenant
    continuous batching, where every slot can carry a different adapter
    (paligemma_tpu.continuous). An all-zeros per-row adapter is an exact
    no-op, so mixed adapter/base batches share one program.
    """
    xl = x
    if dropout_rate > 0.0 and key is not None:
        keep = jax.random.bernoulli(key, 1.0 - dropout_rate, x.shape)
        xl = jnp.where(keep, x / (1.0 - dropout_rate), 0.0).astype(x.dtype)
    a = adapter["a"].astype(x.dtype)
    bb = adapter["b"].astype(x.dtype)
    if a.ndim == 3:  # per-row adapters
        low = jnp.einsum(
            "btd,bdr->btr", xl, a, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        out = jnp.einsum(
            "btr,bre->bte", low, bb, preferred_element_type=jnp.float32
        ).astype(x.dtype)
    else:
        low = jnp.einsum(
            "btd,dr->btr", xl, a, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        out = jnp.einsum(
            "btr,re->bte", low, bb, preferred_element_type=jnp.float32
        ).astype(x.dtype)
    return out * jnp.asarray(scale, x.dtype)


def _attention(
    cfg: GemmaConfig,
    lp: Params,
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    cache_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]],
    write_pos: Optional[jnp.ndarray],
    mask: Optional[jnp.ndarray],
    lora: Optional[Params] = None,
    lora_scale: float = 1.0,
    lora_dropout: float = 0.0,
    lora_key: Optional[jax.Array] = None,
    multi_decode: bool = False,
) -> Tuple[jnp.ndarray, Optional[Tuple[jnp.ndarray, jnp.ndarray]]]:
    """GQA attention for one layer (reference: modeling_gemma.py:201-293).

    With a cache: writes this step's K/V at ``write_pos`` and attends over the
    whole preallocated buffer under ``mask``. Without: attends over the
    current sequence only. ``mask`` may be a dense additive array or a
    structured ``LengthMask`` — the latter routes to the Pallas kernels when
    ``runtime.use_pallas_attention`` is set (including batched serving's
    per-row layouts), else materializes the identical dense mask for XLA.
    Optional LoRA adapters on the q/k/v projections (the reference finetune's
    target_modules, SURVEY.md §2.9).
    """
    b, t, _ = x.shape
    h, hkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    q_out, kv_out = h * hd, hkv * hd

    qkv = _proj(x, lp["qkv"])  # one fused GEMM: [q | k | v] along the out dim
    q = qkv[..., :q_out]
    k = qkv[..., q_out : q_out + kv_out]
    v = qkv[..., q_out + kv_out :]
    if lora is not None:
        # Independent dropout masks per adapted module, like peft's LoraLayer.
        kq = kk = kv = None
        if lora_key is not None:
            kq, kk, kv = (jax.random.fold_in(lora_key, i) for i in range(3))
        q = q + _lora_delta(x, lora["q"], lora_scale, lora_dropout, kq)
        k = k + _lora_delta(x, lora["k"], lora_scale, lora_dropout, kk)
        v = v + _lora_delta(x, lora["v"], lora_scale, lora_dropout, kv)
    q = q.reshape(b, t, h, hd)
    k = k.reshape(b, t, hkv, hd)
    v = v.reshape(b, t, hkv, hd)

    # RoPE applied pre-cache, exactly like the reference (modeling_gemma.py:254-259).
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    new_cache_kv = None
    decode_over_cache = False
    if cache_kv is not None:
        # 2-tuple = plain (ck, cv); 4-tuple = int8 QuantKVCache slices
        # (ck, cv, k_scale, v_scale) — values stored int8 with one fp32
        # scale per (row, position, kv_head); dequant happens inside the
        # read below, fused by XLA into the attention matmuls.
        quant = len(cache_kv) == 4
        if quant:
            ck, cv, cks, cvs = cache_kv
            k_st, k_sc = quantize_kv_rows(k)  # (B,t,Hkv,hd) i8, (B,t,Hkv) f32
            v_st, v_sc = quantize_kv_rows(v)
        else:
            ck, cv = cache_kv  # (B, S, Hkv, hd)
            k_st, v_st = k.astype(ck.dtype), v.astype(cv.dtype)
        if write_pos is not None and getattr(write_pos, "ndim", 0) == 1:
            # Per-row write positions (continuous batching: each slot is at
            # its own sequence length) — one scatter instead of a slice.
            rows = jnp.arange(b)
            if t == 1:
                ck = ck.at[rows, write_pos].set(k_st[:, 0])
                cv = cv.at[rows, write_pos].set(v_st[:, 0])
                if quant:
                    cks = cks.at[rows, write_pos].set(k_sc[:, 0])
                    cvs = cvs.at[rows, write_pos].set(v_sc[:, 0])
            else:
                # Per-row speculative verify: row b writes its k fresh
                # entries at write_pos[b]..write_pos[b]+t-1.
                pos = write_pos[:, None] + jnp.arange(t)[None, :]
                ck = ck.at[rows[:, None], pos].set(k_st)
                cv = cv.at[rows[:, None], pos].set(v_st)
                if quant:
                    cks = cks.at[rows[:, None], pos].set(k_sc)
                    cvs = cvs.at[rows[:, None], pos].set(v_sc)
        else:
            ck = jax.lax.dynamic_update_slice(ck, k_st, (0, write_pos, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, v_st, (0, write_pos, 0, 0))
            if quant:
                cks = jax.lax.dynamic_update_slice(
                    cks, k_sc, (0, write_pos, 0))
                cvs = jax.lax.dynamic_update_slice(
                    cvs, v_sc, (0, write_pos, 0))
        new_cache_kv = (ck, cv, cks, cvs) if quant else (ck, cv)
        if t == 1 or multi_decode:
            # Decode: query attends over the whole preallocated buffer
            # (unwritten slots masked out by the validity mask).
            # ``multi_decode`` is the speculative verify step: t > 1 queries
            # over the warm cache under a per-query threshold mask (causal
            # among the fresh tokens, full over the accepted prefix).
            decode_over_cache = True
            if quant:
                k = ck.astype(q.dtype) * cks[..., None].astype(q.dtype)
                v = cv.astype(q.dtype) * cvs[..., None].astype(q.dtype)
            else:
                k, v = ck.astype(q.dtype), cv.astype(q.dtype)
        # Prefill (t > 1, cache starts empty): attend over the fresh K/V only —
        # exact, because prefill is fully bidirectional over these T tokens —
        # instead of paying attention FLOPs over max_len padded slots.

    from paligemma_tpu import runtime

    if isinstance(mask, LengthMask):
        if runtime.use_pallas_attention and decode_over_cache:
            # Decode: the kernel reconstructs per-row visibility
            # [0, valid[b]) ∪ [gen_start, gen_end) from three scalars —
            # covers both single-stream decode and batched serving.
            from paligemma_tpu.ops.pallas_attention import decode_attention

            attn = decode_attention(
                q, k, v, mask.valid, scale=hd**-0.5,
                gen_start=mask.gen_start, gen_end=mask.gen_end,
            )
        elif (
            (runtime.use_pallas_attention
             or (runtime.auto_flash_min_seq
                 and t >= runtime.auto_flash_min_seq))
            and t > 1
        ):
            # Prefill over fresh K/V with per-row right-padding; long
            # sequences auto-route like the unmasked branch below (batched
            # serving prefill at 896-res would otherwise keep the slow
            # score-materializing XLA path).
            from paligemma_tpu.ops.pallas_attention import flash_attention

            attn = flash_attention(
                q, k, v, valid_len=mask.valid, scale=hd**-0.5,
                gen_start=mask.gen_start, gen_end=mask.gen_end,
            )
        else:
            attn = gqa_attention(
                q, k, v, mask=mask.materialize(k.shape[1]), scale=hd**-0.5
            )
    elif (
        (runtime.use_pallas_attention
         or (runtime.auto_flash_min_seq and t >= runtime.auto_flash_min_seq))
        and mask is None and t > 1
    ):
        # Long bidirectional prefill (896-res: 4112 tokens): XLA would
        # materialize the fp32 score matrix to HBM; tuned-block flash is
        # 2.6x faster there (flash_blocks_bench.json, runtime flag docs).
        from paligemma_tpu.ops.pallas_attention import flash_attention

        attn = flash_attention(q, k, v, scale=hd**-0.5)
    else:
        attn = gqa_attention(q, k, v, mask=mask, scale=hd**-0.5)
    attn = attn.reshape(b, t, h * hd)
    out = _proj(attn, lp["o"])
    return out, new_cache_kv


def _mlp(cfg: GemmaConfig, lp: Params, x: jnp.ndarray) -> jnp.ndarray:
    """GeGLU: down(gelu_tanh(gate(x)) * up(x)) (reference: modeling_gemma.py:122-134).

    gate and up are computed with one fused [gate | up] GEMM. In w4a8 mode
    the whole MLP (both GEMVs + gating + requant) is ONE Pallas kernel —
    per-call overhead was eating the 4-bit byte saving (pallas_quant)."""
    from paligemma_tpu.ops.pallas_quant import (
        MLP_FUSED_MAX_ROWS, Q4A8TiledTensor, mlp_w4a8, mlp_w4a8_stacked,
    )

    st = lp.get("_w4a8_stacked") if hasattr(lp, "get") else None
    bt = x.shape[0] * x.shape[1]
    if st is not None and bt <= MLP_FUSED_MAX_ROWS:
        # Scalar-prefetch path: the kernel indexes the FULL (L, ...) packed
        # stack directly, so the layer scan never materializes an HBM copy
        # of the sliced weights in front of the Pallas call (VERDICT r4 #1).
        refs, li = st
        return mlp_w4a8_stacked(
            x, refs["gu_packed"], refs["gu_s2"],
            refs["dn_packed"], refs["dn_s2"], li, cfg.intermediate_size,
        )
    gu_w, dn_w = lp["gate_up"], lp["down"]
    if isinstance(gu_w, Q4A8TiledTensor):
        if bt > MLP_FUSED_MAX_ROWS and "gate_up_i8" in lp:
            # Matrix-shaped calls (prefill, serving verify) take the int8
            # GEMM companions: the w4a8 kernels are GEMV-designs and made
            # serving 27x slower when prefill routed through them
            # (130 vs 3584 useful tok/s, r5 measurement).
            gu_w, dn_w = lp["gate_up_i8"], lp["down_i8"]
        else:
            return mlp_w4a8(x, gu_w, dn_w, cfg.intermediate_size)
    gu = _proj(x, gu_w)
    gate = gu[..., : cfg.intermediate_size]
    up = gu[..., cfg.intermediate_size :]
    act = jax.nn.gelu(gate.astype(jnp.float32), approximate=True).astype(x.dtype)
    return _proj(act * up, dn_w)


def _decoder_layer(
    cfg: GemmaConfig,
    lp: Params,
    h: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    cache_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]],
    write_pos: Optional[jnp.ndarray],
    mask: Optional[jnp.ndarray],
    lora: Optional[Params] = None,
    lora_scale: float = 1.0,
    lora_dropout: float = 0.0,
    lora_key: Optional[jax.Array] = None,
    multi_decode: bool = False,
) -> Tuple[jnp.ndarray, Optional[Tuple[jnp.ndarray, jnp.ndarray]]]:
    """Pre-RMSNorm decoder block (reference: modeling_gemma.py:295-338)."""
    residual = h
    x = rms_norm(h, lp["input_ln"], cfg.rms_norm_eps)
    attn_out, new_kv = _attention(
        cfg, lp, x, cos, sin, cache_kv, write_pos, mask,
        lora, lora_scale, lora_dropout, lora_key, multi_decode,
    )
    h = residual + attn_out
    residual = h
    x = rms_norm(h, lp["post_ln"], cfg.rms_norm_eps)
    h = residual + _mlp(cfg, lp, x)
    return h, new_kv


def forward(
    params: Params,
    cfg: GemmaConfig,
    inputs_embeds: jnp.ndarray,
    positions: jnp.ndarray,
    cache: Optional[KVCache] = None,
    mask: Optional[jnp.ndarray] = None,
    lora: Optional[Params] = None,
    lora_scale: float = 1.0,
    lora_dropout: float = 0.0,
    lora_keys: Optional[jax.Array] = None,
    hidden_sharding=None,
    row_lengths: Optional[jnp.ndarray] = None,
    multi_token_decode: bool = False,
) -> Tuple[jnp.ndarray, Optional[KVCache]]:
    """Decoder trunk: embeds -> hidden states (reference: GemmaModel.forward).

    Args:
      inputs_embeds: (B, T, D) — *unscaled*; scaling by sqrt(D) happens here
        (reference: modeling_gemma.py:367-368).
      positions: (B, T) int32 RoPE positions.
      cache: optional preallocated KVCache; this step's K/V are written at
        ``cache.length`` and attention spans the whole buffer under ``mask``.
      mask: optional — either a dense additive mask broadcastable to
        (B, Hkv, G, T, S) or a structured ``ops.attention.LengthMask`` (the
        Pallas-routable form). When None and cache is set, a validity
        LengthMask over written slots is built automatically. All-zero
        (bidirectional) semantics otherwise, matching PaliGemma's prefix-LM
        mask (reference: modeling_gemma.py:506-514).

    Returns:
      (hidden (B, T, D), updated cache or None)
    """
    dtype = inputs_embeds.dtype
    h = inputs_embeds * jnp.asarray(cfg.hidden_size**0.5, dtype)

    cos, sin = rope_cos_sin(
        positions, cfg.head_dim, cfg.rope_theta, cfg.max_position_embeddings, dtype
    )

    use_cache = cache is not None
    use_lora = lora is not None
    write_pos = cache.length if use_cache else None
    if row_lengths is not None:
        # Continuous batching: each row (slot) writes this step's K/V at its
        # own length and sees exactly its own [0, len_b] prefix.
        t = inputs_embeds.shape[1]
        if not use_cache or (t != 1 and not multi_token_decode):
            raise ValueError(
                "row_lengths requires a cache and single-token decode "
                "(or multi_token_decode for the speculative verify step)")
        write_pos = row_lengths.astype(jnp.int32)
        if mask is None and t == 1:
            mask = make_length_mask(write_pos + 1)
        elif mask is None:
            # Per-row speculative verify: row b's query i sees its accepted
            # prefix [0, len_b) plus this step's fresh tokens len_b..len_b+i
            # (causal among the drafts).
            s_len = cache.k.shape[2]
            allowed = (
                jnp.arange(s_len)[None, None, :]
                <= write_pos[:, None, None] + jnp.arange(t)[None, :, None]
            )
            from paligemma_tpu.ops.attention import MASK_VALUE

            mask = jnp.where(allowed, 0.0, MASK_VALUE).astype(jnp.float32)[
                :, None, None, :, :
            ]
    elif use_cache:
        t = inputs_embeds.shape[1]
        if mask is None and t == 1:
            # Decode: mask unwritten cache slots. Prefill (t > 1) attends over
            # the fresh K/V bidirectionally and needs no mask (all-zeros mask
            # semantics, reference: modeling_gemma.py:506-514).
            mask = make_length_mask(cache.length + t, batch=inputs_embeds.shape[0])
        elif mask is None and multi_token_decode:
            # Speculative verify step: t draft tokens over the warm cache.
            # Query i sees the accepted prefix [0, length) plus this step's
            # fresh tokens at positions length..length+i — causal among the
            # drafts, so a rejected draft can never leak into the logits
            # that judge the ones before it.
            s_len = cache.k.shape[2]
            allowed = (
                jnp.arange(s_len)[None, :]
                <= cache.length + jnp.arange(t)[:, None]
            )
            from paligemma_tpu.ops.attention import MASK_VALUE

            mask = jnp.where(allowed, 0.0, MASK_VALUE).astype(jnp.float32)[
                None, None, None, :, :
            ]

    xs: Dict[str, Any] = {"lp": params["layers"]}
    # w4a8: hoist the tiled-packed MLP stacks out of the scan's xs so the
    # fused kernel can index them by layer via scalar prefetch instead of
    # consuming a per-step dynamic-slice (which XLA must materialize as an
    # HBM copy in front of a custom call — ~48 MB/layer/token at 3B).
    from paligemma_tpu.ops.pallas_quant import (
        Q4A8TiledTensor as _Q4T, regroup_scales_stacked as _regroup,
    )

    w4a8_stacked = None
    if isinstance(params["layers"].get("gate_up"), _Q4T):
        _gu, _dn = params["layers"]["gate_up"], params["layers"]["down"]

        def _s2(qt):
            # Prefer the quantize-time precompute; the fallback regroup is
            # NOT hoisted out of decode_steps' while_loop by XLA (it cost
            # 0.024 ms/token at 3B: trace_decode_w4a8 reduce.99).
            if getattr(qt, "scale2", None) is not None:
                return qt.scale2
            return _regroup(qt.scale, qt.packed.shape[1], qt.packed.shape[4])

        w4a8_stacked = {
            "gu_packed": _gu.packed,
            "gu_s2": _s2(_gu),
            "dn_packed": _dn.packed,
            "dn_s2": _s2(_dn),
        }
        xs["li"] = jnp.arange(
            params["layers"]["input_ln"].shape[0], dtype=jnp.int32
        )
    quant_cache = use_cache and isinstance(cache, QuantKVCache)
    if use_cache:
        xs["ck"], xs["cv"] = cache.k, cache.v
        if quant_cache:
            xs["cks"], xs["cvs"] = cache.k_scale, cache.v_scale
    if use_lora:
        xs["lora"] = lora["layers"] if "layers" in lora else lora
        if lora_keys is not None:
            xs["lkey"] = lora_keys

    def body(carry, x):
        if not use_cache:
            cache_kv = None
        elif quant_cache:
            cache_kv = (x["ck"], x["cv"], x["cks"], x["cvs"])
        else:
            cache_kv = (x["ck"], x["cv"])
        lp = x["lp"]
        if w4a8_stacked is not None:
            lp = dict(lp)
            lp["_w4a8_stacked"] = (w4a8_stacked, x["li"])
        new_h, new_kv = _decoder_layer(
            cfg, lp, carry, cos, sin, cache_kv, write_pos, mask,
            x.get("lora"), lora_scale, lora_dropout, x.get("lkey"),
            multi_decode=multi_token_decode,
        )
        if hidden_sharding is not None:
            # Sequence-parallel residual stream: GSPMD keeps the (B, T, D)
            # activations sharded (e.g. T over the model axis) between
            # blocks, inserting the gather/scatter collectives around the
            # TP matmuls (Megatron-SP layout). No-op on a single device.
            new_h = jax.lax.with_sharding_constraint(new_h, hidden_sharding)
        return new_h, (new_kv if use_cache else None)

    from paligemma_tpu import runtime

    h, ys = jax.lax.scan(body, h, xs, unroll=runtime.scan_unroll)
    if quant_cache:
        nk, nv, nks, nvs = ys
        new_cache = QuantKVCache(
            k=nk, v=nv, k_scale=nks, v_scale=nvs,
            length=cache.length + inputs_embeds.shape[1],
        )
    elif use_cache:
        nk, nv = ys
        new_cache = KVCache(k=nk, v=nv, length=cache.length + inputs_embeds.shape[1])
    else:
        new_cache = None

    h = rms_norm(h, params["final_norm"], cfg.rms_norm_eps)
    return h, new_cache


def logits(params: Params, hidden: jnp.ndarray) -> jnp.ndarray:
    """Weight-tied lm_head, fp32 logits (reference: modeling_gemma.py:396-418).

    w4a8 trees optionally carry a 4-bit transposed copy of the embedding
    (``embed_w4``) for decode-shaped calls — see runtime.lm_head_w4. The
    GEMV kernel emits fp32 directly; pad vocab columns are sliced off."""
    from paligemma_tpu import runtime
    from paligemma_tpu.quantization import QTensor

    emb = params["embed"]
    w4 = params.get("embed_w4") if hasattr(params, "get") else None
    rows = hidden.shape[0] * hidden.shape[1]
    if w4 is not None and runtime.lm_head_w4 and rows <= 64:
        from paligemma_tpu.ops.pallas_quant import q4a8_matmul_tiled

        v = emb.q.shape[0] if isinstance(emb, QTensor) else emb.shape[0]
        lg = q4a8_matmul_tiled(
            hidden, w4.packed, w4.scale, out_dtype=jnp.float32
        )
        return lg[..., :v]
    if isinstance(emb, QTensor):
        lg = jnp.einsum(
            "btd,vd->btv", hidden, emb.q.astype(hidden.dtype),
            preferred_element_type=jnp.float32,
        )
        return lg * emb.scale.reshape(1, 1, -1)
    return jnp.einsum(
        "btd,vd->btv", hidden, emb, preferred_element_type=jnp.float32
    )


def embed_tokens(params: Params, input_ids: jnp.ndarray) -> jnp.ndarray:
    """Token embedding lookup (unscaled)."""
    from paligemma_tpu.quantization import QTensor

    emb = params["embed"]
    if isinstance(emb, QTensor):
        rows = jnp.take(emb.q, input_ids, axis=0).astype(jnp.bfloat16)
        scales = jnp.take(emb.scale[:, 0], input_ids, axis=0).astype(jnp.bfloat16)
        return rows * scales[..., None]
    return jnp.take(emb, input_ids, axis=0)
