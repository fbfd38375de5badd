"""Token sampling, jit-compatible.

Greedy argmax and nucleus (top-p) sampling with the exact algorithm of the
reference (reference: inference.py:15-24): sort probabilities descending,
zero everything where ``cumsum - p_i > p``, renormalize, draw, and map back to
the original vocabulary index. Greedy parity is exact; sampled parity is
distributional (torch ``multinomial`` vs JAX PRNG draw different streams).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def greedy(logits: jnp.ndarray) -> jnp.ndarray:
    """Argmax over the vocab axis. logits: (B, V) -> (B,) int32."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def sample_top_p(
    logits: jnp.ndarray,
    key: jax.Array,
    temperature: float = 0.8,
    top_p: float = 0.9,
) -> jnp.ndarray:
    """Temperature + nucleus sampling. logits: (B, V) -> (B,) int32."""
    probs = jax.nn.softmax(
        logits.astype(jnp.float32) / jnp.float32(temperature), axis=-1
    )
    sort_idx = jnp.argsort(-probs, axis=-1)
    probs_sort = jnp.take_along_axis(probs, sort_idx, axis=-1)
    cumsum = jnp.cumsum(probs_sort, axis=-1)
    # Keep tokens while the cumulative mass *before* them is <= p
    # (mask where cumsum - p_i > p), exactly as the reference.
    drop = (cumsum - probs_sort) > top_p
    probs_sort = jnp.where(drop, 0.0, probs_sort)
    probs_sort = probs_sort / jnp.sum(probs_sort, axis=-1, keepdims=True)
    draw = jax.random.categorical(key, jnp.log(probs_sort + 1e-30), axis=-1)
    next_token = jnp.take_along_axis(sort_idx, draw[:, None], axis=-1)[:, 0]
    return next_token.astype(jnp.int32)


def select_token(
    logits: jnp.ndarray,
    key: jax.Array,
    do_sample: bool,
    temperature: float,
    top_p: float,
) -> jnp.ndarray:
    """Greedy or top-p depending on flags (static under jit).

    Matches the reference's driver branch (inference.py:64-68) and the
    benchmark's ``temperature == 0.0 -> greedy`` convention
    (ablation_study_fixed.py:228-232).
    """
    if do_sample and temperature > 0.0:
        return sample_top_p(logits, key, temperature, top_p)
    return greedy(logits)
