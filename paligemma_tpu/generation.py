"""Autoregressive generation drivers.

Two paths, both preserving the reference driver's semantics
(reference: inference.py:34-85):

- ``generate``: Python-level loop over a jitted prefill + jitted decode step
  with host-side EOS early exit — the direct analog of ``test_inference``'s
  token loop (inference.py:55-78). Used by the interactive CLI/app and by the
  ablation harness (which, like the reference's run_inference at
  ablation_study_fixed.py:209-251, never early-exits).

- ``generate_scan``: the whole decode loop compiled as one ``lax.scan`` —
  zero host round-trips per token, the TPU-native fast path. EOS is handled
  by a done-flag: the scan runs to max length and tokens after EOS are
  reported via ``num_valid`` (the reference benchmark also always runs to max
  length: ablation_study_fixed.py:209 has no EOS break).

Greedy outputs of the two paths are bit-identical (tested).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from paligemma_tpu.config import PaliGemmaConfig
from paligemma_tpu.models import gemma, paligemma
from paligemma_tpu.models.gemma import KVCache
from paligemma_tpu.ops.sampling import greedy, sample_top_p, select_token_traced


class GenerationResult(NamedTuple):
    tokens: jnp.ndarray  # (B, max_new) int32, padded with EOS/garbage after stop
    num_valid: jnp.ndarray  # (B,) int32 — tokens generated up to and incl. EOS


@functools.partial(jax.jit, static_argnames=("cfg", "full_logits"))
def _prefill_jit(
    params, cfg: PaliGemmaConfig, input_ids, pixel_values, cache, full_logits=False
):
    return paligemma.prefill(
        params, cfg, input_ids, pixel_values, cache, full_logits=full_logits
    )


@functools.partial(jax.jit, static_argnames=("cfg", "do_sample"))
def _decode_and_select(
    params, cfg: PaliGemmaConfig, token, cache, key, do_sample, temperature, top_p
):
    # temperature/top_p are TRACED: every sampled pair shares one compiled
    # program (a static pair would recompile the whole step — see
    # ops.sampling.select_token_traced).
    logits, cache = paligemma.decode_step(params, cfg, token, cache)
    last = logits[:, -1, :]
    nxt = select_token_traced(last, key, do_sample, temperature, top_p)
    return nxt, cache


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "do_sample"),
)
def decode_steps(
    params,
    cfg: PaliGemmaConfig,
    token: jnp.ndarray,
    cache: KVCache,
    key: jax.Array,
    n_steps: int,
    do_sample: bool = False,
    temperature: float = 0.0,
    top_p: float = 0.9,
):
    """Run ``n_steps`` greedy/sampled decode steps as ONE compiled program.

    Returns (tokens (B, n_steps), last token (B, 1), cache). Host round-trips
    amortize over the chunk — the unit of work for serving and benchmarking
    on remote-dispatch backends. temperature/top_p are traced (one compile
    per shape, not per sampling-param value).
    """

    def body(carry, step_key):
        tok, cache = carry
        logits, cache = paligemma.decode_step(params, cfg, tok, cache)
        last = logits[:, -1, :]
        nxt = select_token_traced(last, step_key, do_sample, temperature, top_p)
        return (nxt[:, None], cache), nxt

    keys = jax.random.split(key, n_steps)
    (tok, cache), toks = jax.lax.scan(body, (token, cache), keys)
    return toks.T, tok, cache


def _ngram_propose_row(ids_row, buf_len, token, k: int, n: int):
    """Prompt-lookup draft for ONE row: (k-1,) proposed continuation tokens.

    Finds the most recent earlier occurrence of the last (n-1)-gram in
    ``ids_row[:buf_len]`` and proposes the k-1 tokens that followed it
    (the checkpoint-free draft model of prompt-lookup / n-gram speculative
    decoding — apt for document VQA, where answers quote the prompt). When
    no occurrence exists, proposes the last token repeated; wrong drafts
    cost nothing but their (weight-stream-amortized) verify slot.

    Continuation positions at or past ``buf_len`` are never proposed (they
    would be unwritten zeros or a previous slot occupant's stale tokens —
    near-guaranteed rejects, ADVICE r3); those positions fall back to the
    repeated-token draft.
    """
    L = ids_row.shape[0]
    gram = jax.lax.dynamic_slice(ids_row, (buf_len - (n - 1),), (n - 1,))
    idx = jnp.arange(L)[:, None] + jnp.arange(n - 1)[None, :]
    wins = ids_row[jnp.clip(idx, 0, L - 1)]
    starts = jnp.arange(L)
    valid = jnp.all(wins == gram[None, :], axis=-1) & (starts + n - 1 < buf_len)
    pos = jnp.max(jnp.where(valid, starts, -1))
    # Gather (not dynamic_slice): a slice whose window crosses the buffer end
    # gets its START clamped, silently shifting every proposed token.
    cont_pos = jnp.maximum(pos, 0) + (n - 1) + jnp.arange(k - 1)
    cont = ids_row[jnp.minimum(cont_pos, L - 1)]
    ok = (pos >= 0) & (cont_pos < buf_len)
    return jnp.where(ok, cont, jnp.broadcast_to(token, (k - 1,)))


def _ngram_propose(ids_buf, buf_len, token, k: int, n: int):
    """(1, k-1) draft for the batch-1 driver (see ``_ngram_propose_row``)."""
    return _ngram_propose_row(ids_buf[0], buf_len, token[0, 0], k, n)[None, :]


# Longest-match drafter: context cap and minimum context to draft from.
LONGEST_NMAX = 16
LONGEST_MIN_MATCH = 1


def _longest_match_propose_row(
    ids_row, buf_len, token, k: int,
    n_max: int = LONGEST_NMAX, min_match: int = LONGEST_MIN_MATCH,
):
    """Variable-context prompt-lookup draft for ONE row: (k-1,) tokens.

    Where ``_ngram_propose_row`` keys on a FIXED (n-1)-gram, this picks the
    continuation start whose preceding context has the LONGEST common suffix
    with the current sequence end (capped at ``n_max``, ties broken by
    recency) — the bounded-window form of a suffix-automaton longest-match
    drafter (VERDICT r4 #5: lift acceptance on low-repetition real text).
    A longer matched context is stronger evidence that the model will
    reproduce the continuation, and a 1-token match still beats the
    repeated-token fallback; with n_max = min_match = n-1 this reduces
    exactly to the fixed n-gram drafter (tested).

    Cost: one (L, n_max) int comparison block per proposal — VPU noise next
    to a verify step's weight stream. Same validity rules as the n-gram
    drafter: continuation positions at or past ``buf_len`` fall back to the
    repeated-token draft.
    """
    L = ids_row.shape[0]
    # wins[s] = the n_max tokens ENDING just before continuation start s.
    idx = jnp.arange(L)[:, None] + jnp.arange(n_max)[None, :] - n_max
    wins = ids_row[jnp.clip(idx, 0, L - 1)]
    # The current suffix, gathered (not dynamic_slice — a clamped start
    # would silently misalign short buffers) with per-position validity.
    sidx = buf_len - n_max + jnp.arange(n_max)
    suf = ids_row[jnp.clip(sidx, 0, L - 1)]
    eq = (wins == suf[None, :]) & (idx >= 0) & (sidx >= 0)[None, :]
    # Trailing-run length of the match, per candidate start.
    run = jnp.sum(jnp.cumprod(eq[:, ::-1].astype(jnp.int32), axis=1), axis=1)
    starts = jnp.arange(L)
    cand = (starts < buf_len) & (run >= min_match)
    # Lexicographic (run, start): longest context first, then most recent.
    score = jnp.where(cand, run * L + starts, -1)
    best = jnp.argmax(score)
    has_match = jnp.max(score) >= 0
    cont_pos = best + jnp.arange(k - 1)
    cont = ids_row[jnp.clip(cont_pos, 0, L - 1)]
    ok = has_match & (cont_pos < buf_len)
    return jnp.where(ok, cont, jnp.broadcast_to(token, (k - 1,)))


def propose_row(drafter: str, ids_row, buf_len, token, k: int, n: int):
    """Draft (k-1,) continuation tokens for one row with the chosen drafter
    (static dispatch — ``drafter`` is a trace-time constant)."""
    if drafter == "longest":
        return _longest_match_propose_row(ids_row, buf_len, token, k)
    if drafter != "ngram":
        raise ValueError(f"unknown drafter {drafter!r}")
    return _ngram_propose_row(ids_row, buf_len, token, k, n)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "k", "n", "do_sample", "drafter"),
)
def decode_steps_spec(
    params,
    cfg: PaliGemmaConfig,
    token: jnp.ndarray,  # (1, 1) last emitted token (already in ids_buf)
    cache: KVCache,
    ids_buf: jnp.ndarray,  # (1, L) prompt + emitted tokens
    buf_len: jnp.ndarray,  # () int32 — valid prefix of ids_buf
    n_steps: int,
    k: int = 8,
    n: int = 3,
    do_sample: bool = False,
    temperature: float = 0.0,
    top_p: float = 0.9,
    key: Optional[jax.Array] = None,
    drafter: str = "ngram",
):
    """Speculative decode of AT LEAST ``n_steps`` tokens as ONE compiled
    program (n-gram drafts + k-token verify steps).

    Each verify step feeds [last, d1..d_{k-1}] through ``verify_step`` (one
    weight stream for k positions), draws the model's choice at every
    position, and accepts the longest prefix where the drafts match those
    choices. Greedy: the output is exactly the plain greedy stream (tested).
    Sampled: each position draws from its own top-p distribution, which for
    delta (n-gram) drafts IS exact speculative sampling — the emitted joint
    distribution equals plain per-step sampling (P(d_i) = p_i(d_i),
    P(x != d_i) = p_i(x)); the stream differs from ``generate_chunked``'s
    only in PRNG consumption (distribution parity, SURVEY §7). Returns
    (out_buf (1, n_steps+k), produced, iters, token, cache, ids_buf,
    buf_len); the first ``produced`` columns of out_buf are valid.

    Caller must size ``cache`` and ``ids_buf`` with k tokens of slack past
    the last token it will consume (stale K/V beyond the accepted length is
    masked and overwritten; see ``paligemma.verify_step``).
    """
    from paligemma_tpu import runtime as _rt

    if _rt.prefill_a8 and k + 1 >= _rt.a8_min_seq:
        # Trace-time guard (once per compiled program): a verify this deep
        # has T = k+1 >= a8_min_seq, so its projections would silently route
        # through the non-exact a8 path while plain decode steps (T=1) stay
        # weight-only — breaking speculative exactness mid-stream.
        raise ValueError(
            f"speculative verify depth k+1={k + 1} >= runtime.a8_min_seq="
            f"{_rt.a8_min_seq} with prefill_a8 on; lower k or disable a8")
    out_buf = jnp.zeros((1, n_steps + k), jnp.int32)
    # Only do_sample is static: temperature/top_p are traced so every
    # sampled pair shares one compiled program (ADVICE r3 — static pairs
    # recompiled the whole speculative program per value). temperature <= 0
    # under do_sample falls back to greedy at runtime inside
    # select_token_traced.
    if key is None:
        key = jax.random.PRNGKey(0)

    def cond(c):
        return c[0] < n_steps

    def body(c):
        produced, iters, token, cache, ids_buf, buf_len, out_buf, key = c
        drafts = propose_row(
            drafter, ids_buf[0], buf_len, token[0, 0], k, n
        )[None, :]
        inp = jnp.concatenate([token, drafts], axis=1)  # (1, k)
        logits, vcache = paligemma.verify_step(params, cfg, inp, cache)
        if do_sample:
            # One batched call: k separate nucleus searches would re-read
            # the prob tensor ~30x each (see slot_decode_steps_spec).
            key, sub = jax.random.split(key)
            a = select_token_traced(
                logits[0], sub, True, temperature, top_p
            ).astype(jnp.int32)
        else:
            a = jnp.argmax(
                logits[0].astype(jnp.float32), axis=-1
            ).astype(jnp.int32)
        matched = jnp.sum(jnp.cumprod((drafts[0] == a[:-1]).astype(jnp.int32)))
        accept = matched + 1  # emitted tokens this iteration
        # _replace keeps the verify's written K/V but only advances length by
        # the accepted count (works for KVCache and QuantKVCache alike).
        cache = vcache._replace(length=cache.length + accept)
        # Write all k candidate tokens; columns past ``accept`` are overwritten
        # by the next iteration (and never read beyond ``produced``).
        out_buf = jax.lax.dynamic_update_slice(out_buf, a[None, :], (0, produced))
        ids_buf = jax.lax.dynamic_update_slice(ids_buf, a[None, :], (0, buf_len))
        token = jax.lax.dynamic_slice(a, (matched,), (1,))[None, :]
        return (produced + accept, iters + 1, token, cache,
                ids_buf, buf_len + accept, out_buf, key)

    produced0 = jnp.zeros((), jnp.int32)
    produced, iters, token, cache, ids_buf, buf_len, out_buf, key = (
        jax.lax.while_loop(
            cond, body,
            (produced0, produced0, token, cache, ids_buf,
             buf_len.astype(jnp.int32), out_buf, key),
        )
    )
    return out_buf, produced, iters, token, cache, ids_buf, buf_len


def generate_spec(
    params,
    cfg: PaliGemmaConfig,
    input_ids: jnp.ndarray,
    pixel_values: jnp.ndarray,
    max_new_tokens: int,
    eos_token_id: int,
    cache_dtype=jnp.bfloat16,
    chunk: int = 64,
    k: int = 8,
    n: int = 3,
    do_sample: bool = False,
    temperature: float = 0.0,
    top_p: float = 0.9,
    key: Optional[jax.Array] = None,
    stats: Optional[dict] = None,
    drafter: str = "ngram",
) -> list:
    """Generation via n-gram speculative decoding. Greedy output is
    token-identical to ``generate_chunked``; sampled output (``do_sample``
    + temperature > 0) draws the exact plain-sampling distribution via
    delta-draft speculative sampling (the stream differs from
    ``generate_chunked``'s only in PRNG consumption — distribution parity,
    SURVEY §7). Faster whenever drafts hit.

    ``stats`` (optional dict) receives {"produced", "verify_steps",
    "tokens_per_verify"} for acceptance-rate reporting.
    """
    b, t = input_ids.shape
    if b != 1:
        raise ValueError("generate_spec is batch-1 (like generate)")
    sampling = do_sample and temperature > 0.0
    key = key if key is not None else jax.random.PRNGKey(0)
    n_chunks = -(-max(max_new_tokens - 1, 1) // chunk)
    # Every chunk call produces in [chunk, chunk+k-1] tokens (the final
    # verify may overshoot), and the last call's in-flight verify writes k
    # positions past the accepted length — size cache and ids_buf for the
    # worst case, because dynamic_update_slice CLAMPS out-of-range starts
    # and would silently overwrite earlier cache slots.
    alloc = n_chunks * (chunk + k) + k
    cache = make_cache(cfg, b, t, alloc, cache_dtype)
    logits, cache = _prefill_jit(params, cfg, input_ids, pixel_values, cache)
    key, sub = jax.random.split(key)
    if sampling:
        tok = sample_top_p(logits[:, -1, :], sub, temperature, top_p)
    else:
        tok = greedy(logits[:, -1, :])
    out = [int(tok[0])]
    if out[-1] == eos_token_id or max_new_tokens == 1:
        return out[:max_new_tokens]

    L = t + alloc
    ids_buf = jnp.zeros((1, L), jnp.int32)
    ids_buf = jax.lax.dynamic_update_slice(ids_buf, input_ids.astype(jnp.int32), (0, 0))
    ids_buf = ids_buf.at[0, t].set(tok[0].astype(jnp.int32))
    buf_len = jnp.asarray(t + 1, jnp.int32)
    token = tok[:, None].astype(jnp.int32)

    import numpy as np

    produced_total, verify_total = 0, 0
    while len(out) < max_new_tokens:
        key, sub = jax.random.split(key)
        out_buf, produced, iters, token, cache, ids_buf, buf_len = (
            decode_steps_spec(
                params, cfg, token, cache, ids_buf, buf_len, chunk, k, n,
                do_sample=do_sample, temperature=temperature, top_p=top_p,
                key=sub, drafter=drafter,
            )
        )
        # ONE host fetch per chunk: each fetch costs ~25 ms over the tunnel
        # (CLAUDE.md), and fetching produced/iters/buf_len/tokens separately
        # was measured to double the e2e cost of the whole chunk.
        packed = np.asarray(jnp.concatenate(
            [produced[None], iters[None], buf_len[None], out_buf[0]]))
        n_prod, n_iter, blen = int(packed[0]), int(packed[1]), int(packed[2])
        if n_prod > chunk + k - 1 or blen + k > L:
            raise AssertionError(
                "speculative buffer headroom exhausted "
                f"(produced {n_prod}, buf_len {blen}, L {L}) — "
                "allocation bug; see alloc formula above")
        produced_total += n_prod
        verify_total += n_iter
        new = packed[3 : 3 + n_prod].tolist()
        new = new[: max_new_tokens - len(out)]
        if eos_token_id in new:
            out.extend(new[: new.index(eos_token_id) + 1])
            break
        out.extend(new)
    if stats is not None:
        stats.update(
            produced=produced_total, verify_steps=verify_total,
            tokens_per_verify=round(produced_total / max(verify_total, 1), 3),
        )
    return out


def make_cache(
    cfg: PaliGemmaConfig,
    batch: int,
    prompt_len: int,
    max_new_tokens: int,
    dtype=jnp.bfloat16,
) -> KVCache:
    return gemma.init_cache(
        cfg.text_config, batch, prompt_len + max_new_tokens, dtype
    )


def generate(
    params,
    cfg: PaliGemmaConfig,
    input_ids: jnp.ndarray,
    pixel_values: jnp.ndarray,
    max_new_tokens: int,
    eos_token_id: int,
    do_sample: bool = False,
    temperature: float = 0.8,
    top_p: float = 0.9,
    key: Optional[jax.Array] = None,
    cache_dtype=jnp.bfloat16,
    stop_at_eos: bool = True,
    step_callback=None,
) -> Tuple[list, KVCache]:
    """Python-loop generation with host-side EOS exit (reference: inference.py:55-78).

    ``step_callback(step)`` is invoked after each device-synced step — the
    hook the ablation harness uses for steady-state timing.
    Returns (generated token ids as a Python list, final cache).

    Batch-1 only, like the reference driver (inference.py:69 asserts
    ``(1, 1)`` tokens); use ``paligemma_tpu.serving.batch_generate`` for
    batched decoding.
    """
    b, t = input_ids.shape
    if b != 1:
        raise ValueError(
            f"generate() is batch-1 (got batch {b}); use serving.batch_generate"
        )
    cache = make_cache(cfg, b, t, max_new_tokens, cache_dtype)
    logits, cache = _prefill_jit(params, cfg, input_ids, pixel_values, cache)
    if key is None:
        key = jax.random.PRNGKey(0)

    last = logits[:, -1, :]
    if do_sample and temperature > 0.0:
        key, sub = jax.random.split(key)
        token = sample_top_p(last, sub, temperature, top_p)
    else:
        token = greedy(last)

    out = [int(token[0])]
    if step_callback is not None:
        step_callback(0)
    if stop_at_eos and out[-1] == eos_token_id:
        return out, cache

    for step in range(1, max_new_tokens):
        key, sub = jax.random.split(key)
        token, cache = _decode_and_select(
            params, cfg, token[:, None], cache, sub, do_sample, temperature, top_p
        )
        out.append(int(token[0]))  # host sync, like the reference's .item()
        if step_callback is not None:
            step_callback(step)
        if stop_at_eos and out[-1] == eos_token_id:
            break
    return out, cache


def generate_chunked_stream(
    params,
    cfg: PaliGemmaConfig,
    input_ids: jnp.ndarray,
    pixel_values: jnp.ndarray,
    max_new_tokens: int,
    eos_token_id: int,
    do_sample: bool = False,
    temperature: float = 0.8,
    top_p: float = 0.9,
    key: Optional[jax.Array] = None,
    cache_dtype=jnp.bfloat16,
    chunk: int = 16,
):
    """Streaming chunked generation: yields lists of new token ids per
    compiled ``chunk``-step program (the streaming granularity on a
    remote-dispatch backend). Stops within one chunk of EOS; the final yield
    is trimmed at EOS / max_new_tokens.
    """
    b, t = input_ids.shape
    if b != 1:
        raise ValueError("generate_chunked is batch-1; use serving.batch_generate")
    # Over-allocate to a whole number of chunks so every dispatch reuses ONE
    # compiled n_steps program (a ragged tail would compile a second shape —
    # minutes on the remote-compile backend); surplus tokens are trimmed.
    alloc = -(-max(max_new_tokens - 1, 1) // chunk) * chunk + 1
    cache = make_cache(cfg, b, t, alloc, cache_dtype)
    logits, cache = _prefill_jit(params, cfg, input_ids, pixel_values, cache)
    key = key if key is not None else jax.random.PRNGKey(0)

    key, sub = jax.random.split(key)
    if do_sample and temperature > 0.0:
        tok = sample_top_p(logits[:, -1, :], sub, temperature, top_p)
    else:
        tok = greedy(logits[:, -1, :])
    first = int(tok[0])
    yield [first]
    if first == eos_token_id:
        return

    produced = 1
    tok = tok[:, None]
    while produced < max_new_tokens:
        key, sub = jax.random.split(key)
        toks, tok, cache = decode_steps(
            params, cfg, tok, cache, sub, chunk, do_sample, temperature, top_p
        )
        new = toks[0].tolist()
        # Trim overshoot past max_new, then at EOS.
        new = new[: max_new_tokens - produced]
        if eos_token_id in new:
            yield new[: new.index(eos_token_id) + 1]
            return
        produced += len(new)
        yield new


def generate_chunked(
    params,
    cfg: PaliGemmaConfig,
    input_ids: jnp.ndarray,
    pixel_values: jnp.ndarray,
    max_new_tokens: int,
    eos_token_id: int,
    **kwargs,
) -> list:
    """Chunked generation: decode in compiled chunk-step programs with a host
    EOS check between chunks. ~chunk x fewer host round-trips than
    ``generate`` (decisive on remote-dispatch backends); output trimmed at
    EOS exactly like ``generate``.
    """
    out: list = []
    for piece in generate_chunked_stream(
        params, cfg, input_ids, pixel_values, max_new_tokens, eos_token_id,
        **kwargs,
    ):
        out.extend(piece)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "do_sample", "temperature", "top_p", "eos_token_id"),
)
def generate_scan(
    params,
    cfg: PaliGemmaConfig,
    input_ids: jnp.ndarray,
    pixel_values: jnp.ndarray,
    cache: KVCache,
    key: jax.Array,
    max_new_tokens: int,
    eos_token_id: int,
    do_sample: bool = False,
    temperature: float = 0.8,
    top_p: float = 0.9,
) -> GenerationResult:
    """Fully-jitted prefill + scan decode. One XLA program, no host syncs."""
    b, _ = input_ids.shape
    logits, cache = paligemma.prefill(
        params, cfg, input_ids, pixel_values, cache, full_logits=False
    )

    def select(last, k):
        if do_sample and temperature > 0.0:
            return sample_top_p(last, k, temperature, top_p)
        return greedy(last)

    key, sub = jax.random.split(key)
    first = select(logits[:, -1, :], sub)
    done0 = first == eos_token_id

    def body(carry, step_key):
        token, cache, done = carry
        logits, new_cache = paligemma.decode_step(params, cfg, token[:, None], cache)
        nxt = select(logits[:, -1, :], step_key)
        # Freeze output after EOS (matches list semantics: post-EOS ignored).
        nxt = jnp.where(done, jnp.full_like(nxt, eos_token_id), nxt)
        new_done = done | (nxt == eos_token_id)
        return (nxt, new_cache, new_done), (nxt, done)

    keys = jax.random.split(key, max_new_tokens - 1) if max_new_tokens > 1 else jnp.zeros((0, 2), jnp.uint32)
    (_, cache, _), (rest, was_done) = jax.lax.scan(body, (first, cache, done0), keys)
    tokens = jnp.concatenate([first[None, :], rest], axis=0).T  # (B, max_new)
    alive = jnp.concatenate(
        [jnp.ones((1, b), bool), ~was_done], axis=0
    ).T  # token t is valid if not done *before* t
    num_valid = jnp.sum(alive.astype(jnp.int32), axis=-1)
    return GenerationResult(tokens=tokens.astype(jnp.int32), num_valid=num_valid)
