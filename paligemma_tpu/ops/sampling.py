"""Token sampling, jit-compatible.

Greedy argmax and nucleus (top-p) sampling with the exact algorithm of the
reference (reference: inference.py:15-24): sort probabilities descending,
zero everything where ``cumsum - p_i > p``, renormalize, draw, and map back to
the original vocabulary index. Greedy parity is exact; sampled parity is
distributional (torch ``multinomial`` vs JAX PRNG draw different streams).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def greedy(logits: jnp.ndarray) -> jnp.ndarray:
    """Argmax over the vocab axis. logits: (B, V) -> (B,) int32."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def _nucleus_threshold(probs: jnp.ndarray, top_p: float, iters: int = 30) -> jnp.ndarray:
    """Binary-search the probability threshold of the top-p nucleus.

    Returns t (B, 1): the largest threshold for which the mass of
    ``probs >= t`` still exceeds p — so ``probs >= t`` is exactly the
    reference's sorted-prefix nucleus (the smallest prefix whose cumulative
    mass crosses p), up to ties at the boundary probability.

    Sort-free: only masked sums, O(V) per iteration on the VPU. (The direct
    routes both misbehave at 257k vocab on TPU: a full argsort costs
    ~4.5 ms/token, and ``lax.top_k`` at k>=1k crashes this libtpu's
    TopkEmitter.)
    """
    lo = jnp.zeros(probs.shape[:-1] + (1,), jnp.float32)
    hi = jnp.max(probs, axis=-1, keepdims=True)

    def body(_, bounds):
        lo, hi = bounds
        mid = (lo + hi) * 0.5
        mass = jnp.sum(jnp.where(probs >= mid, probs, 0.0), axis=-1, keepdims=True)
        feasible = mass > top_p
        return jnp.where(feasible, mid, lo), jnp.where(feasible, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return lo


@functools.partial(jax.jit, static_argnames=("method",))
def sample_top_p(
    logits: jnp.ndarray,
    key: jax.Array,
    temperature: float = 0.8,
    top_p: float = 0.9,
    method: str = "auto",
) -> jnp.ndarray:
    """Temperature + nucleus sampling. logits: (B, V) -> (B,) int32.

    ``method``: "sort" runs the reference's exact sorted-prefix algorithm
    (inference.py:15-24); "threshold" selects the same nucleus by
    binary-searched probability threshold without sorting (4.5 ms/token
    cheaper at 257k vocab); "auto" picks threshold for vocab > 16384.
    Both sample the same renormalized distribution; the drawn stream differs
    per method (parity is distributional — SURVEY.md §7).

    Jitted (temperature/top_p traced, so every value shares one compile):
    the eager form issued ~a dozen 5-7 ms tunnel RPCs per call on the
    first-token path of every driver.
    """
    probs = jax.nn.softmax(
        logits.astype(jnp.float32) / jnp.float32(temperature), axis=-1
    )
    v = probs.shape[-1]
    if method == "auto":
        method = "threshold" if v > 16384 else "sort"

    if method == "threshold":
        t = _nucleus_threshold(probs, top_p)
        kept = jnp.where(probs >= t, probs, 0.0)
        kept = kept / jnp.sum(kept, axis=-1, keepdims=True)
        draw = jax.random.categorical(key, jnp.log(kept + 1e-30), axis=-1)
        return draw.astype(jnp.int32)

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


@jax.jit
def sample_rows(
    logits: jnp.ndarray,
    key: jax.Array,
    temperature: jnp.ndarray,
    top_p: jnp.ndarray,
) -> jnp.ndarray:
    """Per-row temperature + nucleus sampling; rows with temperature <= 0
    decode greedily. logits (B, V); temperature, top_p (B,) -> (B,) int32.

    One compiled program serves mixed greedy/sampled batches — the
    continuous-serving slots, where each request carries its own sampling
    params (threshold nucleus; the 257k-vocab sort/top_k hazards apply,
    see ``_nucleus_threshold``). Jitted: called eagerly it would issue
    dozens of per-op dispatches at ~5-7 ms tunnel RPC each (measured as a
    ~390 ms/join stall in the continuous engine).
    """
    temperature = jnp.asarray(temperature, jnp.float32).reshape(-1, 1)
    top_p = jnp.asarray(top_p, jnp.float32).reshape(-1, 1)
    safe_t = jnp.maximum(temperature, 1e-6)
    probs = jax.nn.softmax(logits.astype(jnp.float32) / safe_t, axis=-1)
    t = _nucleus_threshold(probs, top_p)
    kept = jnp.where(probs >= t, probs, 0.0)
    kept = kept / jnp.sum(kept, axis=-1, keepdims=True)
    draw = jax.random.categorical(key, jnp.log(kept + 1e-30), axis=-1)
    return jnp.where(
        temperature[:, 0] > 0.0, draw.astype(jnp.int32), greedy(logits)
    )


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


def select_token_traced(
    logits: jnp.ndarray,
    key: jax.Array,
    do_sample: bool,
    temperature,
    top_p,
) -> jnp.ndarray:
    """``select_token`` with TRACED temperature/top_p (only ``do_sample``
    stays a trace-time branch).

    Every sampled (temperature, top_p) pair shares ONE compiled program —
    static sampling params would recompile the whole enclosing decode
    program per distinct value (~minutes per shape on the remote-compile
    backend, CLAUDE.md). ``temperature <= 0`` under ``do_sample`` decodes
    greedily at runtime, preserving the reference's convention
    (ablation_study_fixed.py:228-232) without a second trace.
    """
    if not do_sample:
        return greedy(logits)
    temperature = jnp.asarray(temperature, jnp.float32)
    safe_t = jnp.maximum(temperature, jnp.float32(1e-6))
    draw = sample_top_p(logits, key, safe_t, top_p)
    return jnp.where(temperature > 0.0, draw, greedy(logits))
