"""Rotary position embedding.

Half-rotation formulation ``[-x2, x1]`` with per-position clamping to
``max_position_embeddings - 1``, matching the reference semantics
(reference: modeling_gemma.py:143-199 and the patched rotary in
ablation_study_fixed.py:144-166, which is what produced the published numbers).

Frequencies are always computed in fp32 (the reference disables autocast for
the freq matmul); cos/sin are cast to the activation dtype before applying.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def rope_cos_sin(
    positions: jnp.ndarray,
    head_dim: int,
    theta: float = 10000.0,
    max_position_embeddings: int = 8192,
    dtype: jnp.dtype = jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compute RoPE cos/sin tables for integer positions.

    Args:
      positions: (B, T) int positions.
      head_dim: rotary dimension (= attention head_dim).
    Returns:
      cos, sin of shape (B, T, head_dim), dtype ``dtype``.
    """
    positions = jnp.clip(positions, 0, max_position_embeddings - 1)
    # inv_freq: (head_dim // 2,) fp32 — matches base ** (-2i/d)
    exponent = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
    inv_freq = 1.0 / (theta**exponent)
    # freqs: (B, T, head_dim // 2)
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq[None, None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # (B, T, head_dim)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    x1 = x[..., :half]
    x2 = x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """Apply rotary embedding.

    Args:
      x: (B, T, H, head_dim) query or key states (head axis before head_dim).
      cos, sin: (B, T, head_dim).
    """
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    return x * cos + _rotate_half(x) * sin
