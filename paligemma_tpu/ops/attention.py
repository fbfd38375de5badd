"""Attention ops (XLA path).

Numerics preserved from the reference for the fidelity bar:
- scores scaled by ``1/sqrt(head_dim)`` (SigLIP: modeling_siglip.py:89,116;
  Gemma: modeling_gemma.py:266),
- softmax computed in fp32 then cast back to the activation dtype
  (modeling_siglip.py:125, modeling_gemma.py:273),
- additive attention mask (modeling_gemma.py:269). PaliGemma prefix-LM
  semantics use an *all-zeros* mask over valid positions — full bidirectional
  attention — causality enforced operationally by one-token-at-a-time decode
  (modeling_gemma.py:506-514). The only masking we ever apply is over padded /
  not-yet-written KV-cache slots.

GQA is computed by reshaping queries to (..., kv_heads, group, ...) and
broadcasting against un-repeated K/V — no ``repeat_kv`` materialization
(the reference's repeat_kv at modeling_gemma.py:136-141 is a memory-bound
expand we avoid entirely; XLA keeps it as a broadcast inside the einsum).

Fused Pallas flash-attention kernels live in
``paligemma_tpu.ops.pallas_attention``; these functions are the canonical
semantics they are tested against.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

# Large negative additive-mask value, safe in fp32 softmax.
MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)


class LengthMask(NamedTuple):
    """Structured attention mask: row ``b`` sees kv positions
    ``[0, valid[b]) ∪ [gen_start, gen_end)``.

    This covers every mask the model ever needs — contiguous validity windows
    (decode over a warm cache, padded prefill) and batched serving's
    "own prompt + shared generated slots" layout — while staying structured
    enough for the Pallas decode kernel to reconstruct visibility from three
    integers instead of reading a dense (B, S) mask from HBM. The XLA path
    materializes the identical additive mask via ``materialize``.
    """

    valid: jnp.ndarray  # (B,) int32 — per-row visible prefix [0, valid[b])
    gen_start: jnp.ndarray  # () int32 — shared window start (empty if >= end)
    gen_end: jnp.ndarray  # () int32 — shared window end (exclusive)

    def materialize(self, s_len: int) -> jnp.ndarray:
        """Additive fp32 mask (B, 1, 1, 1, S) for the einsum attention path."""
        s = jnp.arange(s_len)
        own = s[None, :] < self.valid[:, None]
        gen = (s[None, :] >= self.gen_start) & (s[None, :] < self.gen_end)
        m = jnp.where(own | gen, 0.0, MASK_VALUE).astype(jnp.float32)
        return m[:, None, None, None, :]


def make_length_mask(valid_len, batch: Optional[int] = None) -> LengthMask:
    """LengthMask with an empty shared window from scalar or (B,) lengths."""
    valid = jnp.asarray(valid_len, jnp.int32).reshape(-1)
    if batch is not None and valid.shape[0] == 1 and batch > 1:
        valid = jnp.broadcast_to(valid, (batch,))
    zero = jnp.zeros((), jnp.int32)
    return LengthMask(valid=valid, gen_start=zero, gen_end=zero)


def mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Full multi-head attention (equal q/k/v head counts).

    Args:
      q, k, v: (B, T, H, D) / (B, S, H, D) / (B, S, H, D).
      mask: optional additive mask broadcastable to (B, H, T, S), fp32.
      scale: score scale; defaults to D ** -0.5.
    Returns:
      (B, T, H, D) in q.dtype.
    """
    d = q.shape[-1]
    scale = d**-0.5 if scale is None else scale
    scores = jnp.einsum(
        "bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32
    )
    scores = scores * scale
    if mask is not None:
        scores = scores + mask.astype(jnp.float32)
    probs = jnp.exp(scores - jnp.max(scores, axis=-1, keepdims=True))
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    probs = probs.astype(q.dtype)
    out = jnp.einsum(
        "bhts,bshd->bthd", probs, v, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)


def gqa_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Grouped-query attention against (possibly cached) K/V.

    Args:
      q: (B, T, H, D) queries, H = kv_heads * group.
      k, v: (B, S, Hkv, D) keys/values (no head repetition needed).
      mask: optional additive mask broadcastable to (B, 1, 1, T, S)
            — typically (B, 1, 1, 1, S) marking valid cache slots.
      scale: score scale; defaults to D ** -0.5.
    Returns:
      (B, T, H, D) in q.dtype.
    """
    b, t, h, d = q.shape
    hkv = k.shape[2]
    g = h // hkv
    scale = d**-0.5 if scale is None else scale

    qg = q.reshape(b, t, hkv, g, d)
    # scores: (B, Hkv, G, T, S) in fp32
    scores = jnp.einsum(
        "btkgd,bskd->bkgts", qg, k, preferred_element_type=jnp.float32
    )
    scores = scores * scale
    if mask is not None:
        scores = scores + mask.astype(jnp.float32)
    probs = jnp.exp(scores - jnp.max(scores, axis=-1, keepdims=True))
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    probs = probs.astype(q.dtype)
    out = jnp.einsum(
        "bkgts,bskd->btkgd", probs, v, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype).reshape(b, t, h, d)


def length_mask(
    valid_len: jnp.ndarray, max_len: int, batch: int = 1
) -> jnp.ndarray:
    """Additive mask over KV positions: 0 where ``s < valid_len`` else MASK_VALUE.

    Shape (B, 1, 1, 1, S) — broadcasts over kv-head, group, and query axes of
    ``gqa_attention`` scores; also broadcasts against the (B, H, T, S) layout
    of ``mha`` if reshaped by the caller.
    """
    s = jnp.arange(max_len)
    valid = jnp.asarray(valid_len).reshape(-1, 1)  # (B, 1)
    m = jnp.where(s[None, :] < valid, 0.0, MASK_VALUE).astype(jnp.float32)
    if m.shape[0] == 1 and batch > 1:
        m = jnp.broadcast_to(m, (batch, max_len))
    return m[:, None, None, None, :]
