"""Normalization ops.

Numerics match the reference exactly for the 1e-3 logit-fidelity bar:
- RMSNorm computes in fp32 and scales by ``(1 + weight)`` with a
  zero-initialized weight (reference: modeling_gemma.py:107-120).
- LayerNorm computes in fp32 and casts back (torch ``nn.LayerNorm`` semantics,
  reference: modeling_siglip.py:175-177).

These are XLA-path ops on purpose: at decode shapes (B, 1, D) a standalone
norm kernel cannot beat XLA, which fuses the fp32 square-mean/rsqrt/scale
into the neighbouring elementwise work for free. (A standalone Pallas
RMSNorm existed in round 1, was never load-bearing, and was removed.)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Gemma RMSNorm: fp32 compute, ``normed * (1 + w)``, cast back to x.dtype."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    out = normed * (1.0 + weight.astype(jnp.float32))
    return out.astype(x.dtype)


def layer_norm(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """LayerNorm with fp32 statistics, affine, cast back to x.dtype."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    normed = (xf - mean) * (var + eps) ** -0.5
    out = normed * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(x.dtype)
