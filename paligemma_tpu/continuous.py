"""Continuous (slot-level) batching: requests join and leave a running batch.

The window coalescer in ``paligemma_tpu.serving`` runs a fixed batch from
prefill to last-EOS — mixed-length traffic convoys behind the longest
request. This module keeps a fixed set of decode *slots* permanently hot
instead:

- ONE compiled decode program over a static (n_slots, S) cache shape runs
  chunk after chunk (static shapes: one jit shape = one multi-minute remote
  compile, CLAUDE.md);
- a new request joins between chunks: a batch-1 prefill at a fixed prompt
  bucket produces its K/V, which a jitted row-copy drops into a free slot;
- each slot carries its own sequence length: K/V writes scatter at per-row
  positions, RoPE positions are per-row, and visibility is the per-row
  ``LengthMask`` ``[0, len_b]`` (the Pallas decode kernel consumes it
  directly) — so a slot behaves exactly as if it ran alone at batch 1
  (token-identity tested in tests/test_continuous.py);
- a slot is evicted on EOS / its token budget and immediately rejoins with
  the next queued request.

The reference has nothing comparable — it is strictly batch-1
(processing_paligemma.py:80). This is TPU-native serving headroom on top of
SURVEY.md §2's inventory.
"""
from __future__ import annotations

import functools
import itertools
import threading
import time
from collections import defaultdict, deque
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from paligemma_tpu import generation, processing, serving
from paligemma_tpu.config import PaliGemmaConfig
from paligemma_tpu.models import gemma
from paligemma_tpu.models.gemma import KVCache
from paligemma_tpu.ops.sampling import greedy, sample_rows


@functools.partial(jax.jit, static_argnames=("cfg", "n_steps"))
def slot_decode_steps(
    params,
    cfg: PaliGemmaConfig,
    token: jnp.ndarray,  # (B, 1) current token per slot
    cache: KVCache,
    lengths: jnp.ndarray,  # (B,) per-slot sequence length
    temps: jnp.ndarray,  # (B,) per-slot temperature; <= 0 -> greedy
    topps: jnp.ndarray,  # (B,) per-slot nucleus p
    key: jax.Array,
    n_steps: int,
    lora=None,  # optional per-slot adapters {q,k,v: {a (L,B,D,r), b (L,B,r,o)}}
    occupied: Optional[jnp.ndarray] = None,  # (B,) bool — host occupancy truth
    ids_buf: Optional[jnp.ndarray] = None,  # (B, L) token history (adaptive spec)
    buf_lens: Optional[jnp.ndarray] = None,  # (B,)
):
    """``n_steps`` decode steps for all slots as ONE compiled program.

    Every slot advances by n_steps; per-slot positions/writes/visibility are
    driven by ``lengths``; per-slot sampling params are traced (B,) arrays so
    mixed greedy/sampled requests share the one program. An all-greedy batch
    skips the sampling machinery at RUNTIME via ``lax.cond`` — the per-row
    nucleus threshold search costs ~30 full passes over the (B, 257k) fp32
    probs per step (~1 GB at batch 33), pure waste on greedy traffic — with
    no second compiled program and no cross-variant numerics question (the
    greedy branch and sample_rows' internal greedy route are the same
    ``ops.sampling.greedy`` on the same in-program logits). With ``lora``, each
    slot additionally applies its own decoder adapter (scale pre-folded into
    b; an all-zeros adapter row is an exact no-op, so base and adapted
    requests mix freely).

    ``ids_buf``/``buf_lens`` (optional, together): per-slot token history —
    each emitted token is appended so an occupancy-adaptive engine can switch
    to the speculative program with n-gram state current. One extra (B,)
    scatter per step; returns them updated as two extra results.

    Returns (tokens (B, n_steps), last token (B, 1), cache, lengths +
    n_steps[, ids_buf, buf_lens]).
    """

    # Constant across the chunk; ``occupied`` masks STALE temps on freed
    # slots (a finished sampled request must not keep the nucleus branch
    # live for later all-greedy traffic).
    live = temps > 0.0 if occupied is None else (temps > 0.0) & occupied
    any_sampled = jnp.any(live)
    track_ids = ids_buf is not None
    rows = jnp.arange(token.shape[0])

    def body(carry, step_key):
        tok, cache, lens, ibuf, blens = carry
        positions = lens[:, None].astype(jnp.int32)
        embeds = gemma.embed_tokens(params["llm"], tok)
        hidden, cache = gemma.forward(
            params["llm"], cfg.text_config, embeds, positions,
            cache=cache, row_lengths=lens, lora=lora,
        )
        logits = gemma.logits(params["llm"], hidden)[:, -1, :]
        nxt = jax.lax.cond(
            any_sampled,
            lambda lg: sample_rows(lg, step_key, temps, topps),
            greedy,
            logits,
        )
        if track_ids:
            ibuf = ibuf.at[rows, blens].set(nxt)
            blens = blens + 1
        return (nxt[:, None], cache, lens + 1, ibuf, blens), nxt

    keys = jax.random.split(key, n_steps)
    (tok, cache, lengths, ids_buf, buf_lens), toks = jax.lax.scan(
        body, (token, cache, lengths, ids_buf, buf_lens), keys
    )
    if track_ids:
        return toks.T, tok, cache, lengths, ids_buf, buf_lens
    return toks.T, tok, cache, lengths


@functools.partial(
    jax.jit, static_argnames=("cfg", "n_iters", "k", "n", "drafter")
)
def slot_decode_steps_spec(
    params,
    cfg: PaliGemmaConfig,
    token: jnp.ndarray,  # (B, 1) current token per slot
    cache: KVCache,
    lengths: jnp.ndarray,  # (B,) per-slot sequence length
    temps: jnp.ndarray,  # (B,) per-slot temperature; <= 0 -> greedy
    topps: jnp.ndarray,  # (B,) per-slot nucleus p
    key: jax.Array,
    n_iters: int,
    ids_buf: jnp.ndarray,  # (B, L) per-slot prompt+emitted token history
    buf_lens: jnp.ndarray,  # (B,) valid prefix of each ids_buf row
    k: int = 4,
    n: int = 3,
    lora=None,
    occupied: Optional[jnp.ndarray] = None,  # (B,) bool — host occupancy truth
    draft_noise: Optional[jnp.ndarray] = None,  # scalar in [0,1]; see below
    drafter: str = "ngram",
):
    """``n_iters`` speculative verify iterations for all slots as ONE
    compiled program (the spec analog of ``slot_decode_steps``).
    All-greedy batches skip the sampling machinery at runtime via
    ``lax.cond`` — the nucleus search over (B*k, 257k) fp32 probs costs
    ~4 GB of HBM traffic per verify (see ``slot_decode_steps``).

    Each iteration proposes k-1 n-gram drafts PER SLOT from its own token
    history, verifies all slots' [current, drafts] in one k-token forward
    (per-row write positions + per-row per-query threshold masks — see
    gemma.forward(multi_token_decode=True)), and accepts per-row the longest
    prefix where the drafts match that row's own choices. Greedy rows
    (temp <= 0) emit exact-greedy tokens; sampled rows emit draws whose
    joint distribution equals plain per-step sampling (exact speculative
    sampling for delta drafts — see the acceptance comment in the body);
    mixed batches share the one compiled program.

    Returns (toks (B, n_iters*k), counts (B,), last token (B, 1), cache,
    lengths, ids_buf, buf_lens); row b's valid tokens are
    ``toks[b, :counts[b]]``.

    ``draft_noise`` (traced scalar, benchmark-only): replace each draft
    token with a uniform-random vocab id with this probability BEFORE
    verification. Corrupted drafts are simply rejected by the prefix-match
    rule, so emitted streams stay exactly plain-decoding's — the knob
    degrades ACCEPTANCE only, emulating low-n-gram-structure (real-text)
    traffic to measure the adaptive engine's graceful-degradation floor
    without a real checkpoint (VERDICT r3 missing #1).
    """
    b = token.shape[0]
    out0 = jnp.zeros((b, n_iters * k), jnp.int32)
    live = temps > 0.0 if occupied is None else (temps > 0.0) & occupied
    any_sampled = jnp.any(live)  # constant across the whole chunk

    def body(carry, step_key):
        tok, cache, lens, ibuf, blens, out, counts = carry
        drafts = jax.vmap(
            lambda row, bl, t0: generation.propose_row(
                drafter, row, bl, t0, k, n)
        )(ibuf, blens, tok[:, 0])
        if draft_noise is not None:
            flip = jax.random.uniform(
                jax.random.fold_in(step_key, 0x6E6F), drafts.shape
            ) < draft_noise
            junk = jax.random.randint(
                jax.random.fold_in(step_key, 0x6A6B), drafts.shape,
                0, cfg.text_config.vocab_size, jnp.int32,
            )
            drafts = jnp.where(flip, junk, drafts)
        inp = jnp.concatenate([tok, drafts.astype(jnp.int32)], axis=1)  # (B,k)
        positions = (
            lens[:, None].astype(jnp.int32)
            + jnp.arange(k, dtype=jnp.int32)[None, :]
        )
        embeds = gemma.embed_tokens(params["llm"], inp)
        hidden, vcache = gemma.forward(
            params["llm"], cfg.text_config, embeds, positions,
            cache=cache, row_lengths=lens, lora=lora, multi_token_decode=True,
        )
        logits = gemma.logits(params["llm"], hidden)  # (B, k, V) fp32
        # One draw per position per row (rows with temp <= 0 decode greedily
        # inside sample_rows), then ONE prefix-match acceptance rule for all
        # rows. Greedy rows: exact by argmax determinism. Sampled rows:
        # exact speculative SAMPLING for delta (n-gram) drafts — sampling
        # s_i ~ p_i and accepting while s_i == d_i gives marginals identical
        # to plain sampling (P(d_i) = p_i(d_i), P(x != d_i) = p_i(x)), and
        # position i+1's logits are valid exactly when d_i was the emitted
        # token. Draws are independent per position via fold_in.
        bsz = logits.shape[0]
        a = jax.lax.cond(
            any_sampled,
            # ONE batched sample_rows over (B*k, V); rows of the reshaped
            # batch are independent draws under one key.
            lambda lg: sample_rows(
                lg.reshape(bsz * k, -1), step_key,
                jnp.repeat(temps, k), jnp.repeat(topps, k),
            ).reshape(bsz, k),
            lambda lg: greedy(lg.reshape(bsz * k, -1)).reshape(bsz, k),
            logits,
        ).astype(jnp.int32)  # (B, k)
        eq = (inp[:, 1:] == a[:, :-1]).astype(jnp.int32)
        matched = jnp.sum(jnp.cumprod(eq, axis=1), axis=1)
        accept = matched + 1  # (B,)
        cache = vcache._replace(length=cache.length)
        out = jax.vmap(
            lambda row, vals, off: jax.lax.dynamic_update_slice(row, vals, (off,))
        )(out, a, counts)
        ibuf = jax.vmap(
            lambda row, vals, off: jax.lax.dynamic_update_slice(row, vals, (off,))
        )(ibuf, a, blens)
        tok = jnp.take_along_axis(a, (accept - 1)[:, None], axis=1)
        return (tok, cache, lens + accept, ibuf, blens + accept, out,
                counts + accept), None

    keys = jax.random.split(key, n_iters)
    carry0 = (token, cache, lengths, ids_buf, buf_lens.astype(jnp.int32),
              out0, jnp.zeros((b,), jnp.int32))
    (tok, cache, lengths, ids_buf, buf_lens, out, counts), _ = jax.lax.scan(
        body, carry0, keys
    )
    return out, counts, tok, cache, lengths, ids_buf, buf_lens


@functools.partial(jax.jit, static_argnames=("target",))
def _resize_kv(cache, target: int):
    """Pad or slice the cache's position axis (axis 2) to ``target``.

    The occupancy-bounded window: the engine's cache lives at the smallest
    bucket covering every occupied slot's length plus one chunk's worth of
    writes, so decode chunks stop streaming unwritten tail slots
    (VERDICT r3 weak #3 — ~600 MB/step of mostly-unwritten bf16 K/V at the
    32-slot peak). Resizes happen only on bucket transitions (a handful per
    run), never per chunk. Shrinking drops only rows past every occupied
    length (unwritten or freed-slot garbage).
    """
    cur = cache.k.shape[2]
    if target == cur:
        return cache
    if target > cur:
        def fix(x):
            pad = [(0, 0)] * x.ndim
            pad[2] = (0, target - cur)
            return jnp.pad(x, pad)
    else:
        def fix(x):
            return x[:, :, :target]
    new = cache._replace(k=fix(cache.k), v=fix(cache.v))
    if hasattr(cache, "k_scale"):
        new = new._replace(
            k_scale=fix(cache.k_scale), v_scale=fix(cache.v_scale))
    return new


@jax.jit
def _stack_group_adapters(group):
    """Tuple of per-request adapter trees ({q,k,v: {a (L,D,r), b (L,r,o)}})
    -> one group tree with a row axis ({...: a (L, G, D, r)}), ONE dispatch."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=1), *group)




@jax.jit
def _insert_group(
    cache: KVCache,
    temp: KVCache,
    slots: jnp.ndarray,  # (G,) int32 target rows (pad entries -> trash row)
    lengths: jnp.ndarray,  # (B,)
    cur_tok: jnp.ndarray,  # (B, 1)
    temps: jnp.ndarray,  # (B,)
    topps: jnp.ndarray,  # (B,)
    valid: jnp.ndarray,  # (G,) prompt lengths
    logits: jnp.ndarray,  # (G, V) last-position prefill logits per joiner
    key: jax.Array,
    req_temps: jnp.ndarray,  # (G,) per-request temperature (<=0 greedy)
    req_topps: jnp.ndarray,  # (G,)
    slot_lora=None,
    grouped=None,
    ids_buf=None,  # (B, L) per-slot token history (speculative engines)
    buf_lens=None,  # (B,)
    prompt_ids=None,  # (G, t_b) the group's padded prompt ids
):
    """Sample a whole join group's first tokens AND scatter its prefilled K/V
    rows + lengths + tokens + sampling params into their slots in ONE
    dispatch (join overhead is what decides whether continuous batching
    beats window coalescing — measured in REPORT.md; sampling eagerly here
    once cost ~390 ms/join in per-op tunnel RPCs).

    Returns (cache, lengths, cur_tok, temps, topps, first, slot_lora) with
    ``first`` (G,) int32 — the joiners' first decoded tokens, left on device.
    ``slot_lora``/``grouped`` (optional, None passes through): per-slot LoRA
    adapter arrays and the group's stacked adapters — scattered here so a
    lora-enabled join still costs ONE insert dispatch."""
    first = sample_rows(logits, key, req_temps, req_topps)
    t_b = temp.k.shape[2]
    k = cache.k.at[:, slots, :t_b].set(temp.k.astype(cache.k.dtype))
    v = cache.v.at[:, slots, :t_b].set(temp.v.astype(cache.v.dtype))
    new_cache = cache._replace(k=k, v=v)
    if hasattr(cache, "k_scale"):
        # int8 KV engine: the prefill's per-row scales ride along.
        new_cache = new_cache._replace(
            k_scale=cache.k_scale.at[:, slots, :t_b].set(temp.k_scale),
            v_scale=cache.v_scale.at[:, slots, :t_b].set(temp.v_scale),
        )
    lengths = lengths.at[slots].set(valid.astype(jnp.int32))
    cur_tok = cur_tok.at[slots, 0].set(first.astype(jnp.int32))
    temps = temps.at[slots].set(req_temps.astype(jnp.float32))
    topps = topps.at[slots].set(req_topps.astype(jnp.float32))
    if slot_lora is not None:
        slot_lora = jax.tree.map(
            lambda s, g: s.at[:, slots].set(g.astype(s.dtype)),
            slot_lora, grouped,
        )
    if ids_buf is not None:
        # Speculative engines: seed each joiner's token history with its
        # prompt + first token so n-gram drafts can quote the prompt.
        t_p = prompt_ids.shape[1]
        ids_buf = ids_buf.at[slots, :t_p].set(prompt_ids.astype(jnp.int32))
        ids_buf = ids_buf.at[slots, valid].set(first.astype(jnp.int32))
        buf_lens = buf_lens.at[slots].set(valid.astype(jnp.int32) + 1)
    return (
        new_cache,
        lengths, cur_tok, temps, topps, first, slot_lora, ids_buf, buf_lens,
    )


class Request:
    """One submitted generation request and its accumulating result."""

    _ids = itertools.count()  # count().__next__ is atomic in CPython

    def __init__(
        self,
        prompt: str,
        image,
        max_new_tokens: int,
        temperature: float = 0.0,
        top_p: float = 0.9,
        adapter: Optional[str] = None,
    ):
        self.id = next(Request._ids)
        self.prompt = prompt
        self.image = image
        self.max_new_tokens = max_new_tokens
        self.temperature = temperature  # <= 0 -> greedy
        self.top_p = top_p
        self.adapter = adapter  # registered LoRA adapter name, or None
        self.tokens: List[int] = []
        self.done = False
        self.error: Optional[Exception] = None
        # Prefetch pipeline state: (ids (t,), valid, device pixels) once the
        # worker (or an inline fallback) preprocessed this request; _claimed
        # marks in-flight preprocessing so two threads never process one
        # request (guarded by the engine's _prep_cv lock).
        self.prep = None
        self._claimed = False
        # Streaming hook: called from the engine-driving thread with
        # (new_tokens, done) once per chunk that touched this request.
        self.on_tokens = None
        self.notified = 0  # tokens already delivered through on_tokens
        # Set (from any thread) to stop decoding this request at the next
        # chunk boundary — e.g. its streaming client disconnected.
        self.cancelled = False


class ContinuousBatcher:
    """Slot-level continuous batching engine.

    Args:
      n_slots: decode batch width (static — one compiled decode shape).
      prompt_budget: prompt length bucket(s). An int keeps one compiled
        prefill shape (every prompt right-padded to it); a sequence of ints
        buckets each join group to the smallest budget that covers it, so
        short prompts don't pay the longest prompt's prefill and long
        prompts aren't rejected (compiled shapes: budgets x {1, n_slots}).
        Must cover image tokens + BOS + text.
      max_new_tokens: per-slot generation budget (cache sized for it).
      chunk: decode steps per dispatch; joins/evictions happen between chunks.
      spec_k: >= 2 enables per-slot n-gram speculative decoding — each chunk
        runs ``chunk`` verify iterations of k tokens (one weight stream per
        iteration for ALL slots); every slot emits 1..k tokens per iteration
        at the workload's acceptance rate. Greedy slots stay exactly greedy;
        sampled slots sample the exact plain-sampling distribution
        (delta-draft speculative sampling). 0 = plain one-token steps.
      spec_adaptive: with spec_k, choose per CHUNK between the speculative
        and the plain program from host-known state instead of statically.
        Speculation wins at narrow widths (+21% at 16 slots) but loses at
        the 32-slot bandwidth-free peak (REPORT.md r3 serving table) — the
        k-position verify stops being free once batch*k positions leave the
        weight-streaming-bound regime. Policy: run spec when
        occupied-slot count <= spec_max_slots AND the acceptance EMA (when
        known) clears the current rung's break-even; after low-acceptance
        demotion, probe spec again on an exponentially backed-off schedule
        (spec_probe_every .. 8x). All programs are compiled on first use;
        greedy streams are exact across mode switches (every mode emits
        exact greedy tokens).
      spec_drafter: the proposal rule — "ngram" (fixed (n-1)-gram recency
        match, the shipped default) or "longest" (longest-common-suffix
        variable-context match, generation._longest_match_propose_row).
        Exactness is drafter-independent (verification rejects bad drafts);
        the drafter only moves the acceptance rate.
      spec_ks: the adaptive DRAFT-DEPTH LADDER — ascending k rungs (one
        compiled verify program each). The policy climbs a rung when
        acceptance nearly saturates the current k (EMA >= 0.85*k) and
        steps down when EMA is under the rung's break-even. Default: the
        single-rung ladder ``(spec_k,)`` — which is also the SHIPPED
        server config (k=8 alone): the r4 sweep found k=8 dominates k=4
        at every measured acceptance (2165 vs 1944 std / 4647 vs 2453
        long clean; 1486 vs 1285 at degraded acceptance), so the (4,8)
        ladder only added rung-oscillation cost (REPORT.md r4, PARITY
        negatives).
      spec_max_slots: optional occupancy gate for spec_adaptive — chunks
        with more occupied slots run plain. Default None (no gate): the
        r3 crossover at 24 slots was specific to the k=4-at-chunk-cadence
        program; the shipped k=8/cadence-16/window program wins at full
        32-slot width (REPORT.md r4).
      spec_min_accept: tokens/verify EMA below which the current rung
        demotes (a rung down, or to plain from the lowest). Default None =
        2.0 — the measured k=8 SERVING break-even bracket (r4 draft-noise
        curve: wins at EMA 2.2, loses at 1.4; budget overshoot at the
        winning cadence puts it well above the single-stream 1.0, and
        shallower rungs break even HIGHER — k=4 loses even at EMA 2.5).
        An explicit float applies to every rung.
      spec_probe_every: base interval (in plain chunks) between speculative
        re-probes after a full demotion (default 8); failed probes double
        it up to 8x (probe chunks at near-zero acceptance cost real
        throughput — r4 noise-0.9: 1308 vs 1413 tok/s with fixed probes).
      kv_quant: store K/V int8 with per-(row, position, head) scales
        (gemma.QuantKVCache) — halves the per-step cache streaming (~600
        MB/step of bf16 K/V at the 32-slot peak); dequantization fuses into
        the attention read. Greedy fidelity pinned empirically (token
        identity on the test model; bench protocol on the flagship).
      kv_window: occupancy-bounded cache window — the live cache is kept at
        the smallest of 3 static position-budget buckets covering
        max(occupied lengths) + one chunk's writes, so decode chunks stop
        streaming unwritten tail slots; pads/slices only on bucket
        transitions. EXACT: masked attention never read the dropped tail.
      prefetch: run request preprocessing (tokenize + image pipeline +
        host-side cache-dtype pixel convert) on a worker thread while the
        engine thread is blocked in per-chunk fetch RPCs, so joins stack
        ready numpy pixels and ship ONE upload per group instead of paying
        ~140 ms/wave of host preprocess on the critical path (r4 host_t
        decomposition). Numerics identical to inline preprocessing;
        default on.
      lora_rank: enable multi-tenant LoRA serving — every slot can carry a
        different registered adapter (``register_adapter`` + ``submit(...,
        adapter=name)``). Adapters of rank <= lora_rank share one compiled
        program (zero-padded); requests without an adapter ride an all-zeros
        adapter row, an exact no-op. The reference can only serve ONE merged
        adapter per process (peft merge); this serves N concurrently.
    """

    def __init__(
        self,
        params,
        cfg: PaliGemmaConfig,
        processor,
        n_slots: int = 4,
        prompt_budget: Optional[object] = None,  # int | sequence of ints
        max_new_tokens: int = 64,
        chunk: int = 8,
        cache_dtype=jnp.bfloat16,
        kv_quant: bool = False,
        kv_window: bool = False,
        do_sample: bool = False,
        temperature: float = 0.0,
        top_p: float = 0.9,
        eos_token_id: Optional[int] = None,
        seed: int = 0,
        lora_rank: Optional[int] = None,
        prefill_cache_size: int = 0,
        prefetch: bool = True,
        spec_k: int = 0,
        spec_ngram: int = 3,
        spec_chunk: Optional[int] = None,
        spec_adaptive: bool = False,
        spec_max_slots: Optional[int] = None,
        spec_min_accept: Optional[float] = None,
        spec_probe_every: int = 8,
        spec_ks: Optional[Sequence[int]] = None,
        draft_noise: float = 0.0,
        spec_drafter: str = "ngram",
    ):
        self.params, self.cfg, self.processor = params, cfg, processor
        self.n_slots = n_slots
        n_img = cfg.vision_config.num_image_tokens
        if prompt_budget is None:
            prompt_budget = n_img + 32
        buckets = (
            (int(prompt_budget),) if isinstance(prompt_budget, int)
            else tuple(sorted(int(b) for b in prompt_budget))
        )
        if not buckets:
            raise ValueError(
                "prompt_budget must be an int or a non-empty sequence of ints"
            )
        if chunk < 1:
            # chunk 0 would decode zero tokens per step and spin forever;
            # negative values mis-size the cache.
            raise ValueError(f"chunk must be >= 1, got {chunk}")
        self.prompt_budgets = buckets
        self.prompt_budget = buckets[-1]  # largest: sizes the cache
        self.max_new_tokens = max_new_tokens
        self.chunk = chunk
        self.cache_dtype = cache_dtype
        self.do_sample, self.temperature, self.top_p = do_sample, temperature, top_p
        self.eos_token_id = (
            eos_token_id
            if eos_token_id is not None
            else processor.tokenizer.eos_token_id
        )
        self.key = jax.random.PRNGKey(seed)

        # Draft-depth ladder: spec_ks are the k values the adaptive policy
        # may run (ascending rungs, one compiled verify program each);
        # spec_k alone is a single-rung ladder (the pre-r4 surface).
        # spec_k always exposes the DEEPEST rung (it sizes buffers).
        if spec_ks:
            self.spec_ks = tuple(sorted({int(x) for x in spec_ks}))
            if spec_k and int(spec_k) not in self.spec_ks:
                raise ValueError(
                    f"spec_k={spec_k} must be one of spec_ks={spec_ks}")
        else:
            self.spec_ks = (int(spec_k),) if spec_k else ()
        if any(x < 2 for x in self.spec_ks):
            raise ValueError(
                f"speculative k values must be >= 2, got {self.spec_ks}")
        self.spec_k = self.spec_ks[-1] if self.spec_ks else 0
        from paligemma_tpu import runtime as _rt

        if _rt.prefill_a8 and self.spec_k and self.spec_k + 1 >= _rt.a8_min_seq:
            # a8 routes by static T >= a8_min_seq; a verify program that deep
            # would silently take the non-exact a8 path while plain decode
            # chunks stay weight-only — internally inconsistent streams.
            raise ValueError(
                f"spec_k={self.spec_k} verify depth {self.spec_k + 1} >= "
                f"runtime.a8_min_seq={_rt.a8_min_seq} would route verify "
                "through the a8 path; lower spec_k or disable prefill_a8")
        self.spec_ngram = int(spec_ngram)
        if spec_drafter not in ("ngram", "longest"):
            raise ValueError(f"unknown spec_drafter {spec_drafter!r}")
        self.spec_drafter = spec_drafter
        # Verify iterations per SPECULATIVE chunk (plain chunks always run
        # ``chunk`` one-token steps). Decoupled so an adaptive engine can
        # run plain chunks at the peak cadence (32 steps) and spec chunks at
        # speculation's measured winning cadence (8 iterations — REPORT.md
        # r3 spec-serving table); default = ``chunk`` (the r3 behavior).
        self.spec_chunk = int(spec_chunk) if spec_chunk else chunk
        if self.spec_k and self.spec_chunk < 1:
            raise ValueError(f"spec_chunk must be >= 1, got {spec_chunk}")
        self.spec_adaptive = bool(spec_adaptive) and self.spec_k > 0
        if len(self.spec_ks) > 1 and not self.spec_adaptive:
            raise ValueError("a multi-rung spec_ks ladder requires "
                             "spec_adaptive (the policy picks the rung)")
        self.spec_max_slots = (
            int(spec_max_slots) if spec_max_slots is not None else None)
        # Acceptance EMA below which a rung is not worth its verify cost
        # (see _min_accept: measured-flat ~2.0, NOT proportional to k).
        self.spec_min_accept = (
            None if spec_min_accept is None else float(spec_min_accept))
        self.spec_probe_every = int(spec_probe_every)
        # Exponential probe backoff while demoted (failed probes double the
        # interval up to 8x): at near-zero acceptance, probe chunks
        # themselves cost throughput (r4 noise-0.9 run: 1308 vs 1413
        # plain with fixed-interval probes).
        self._probe_interval = self.spec_probe_every
        self._probing = False
        # Current ladder rung (index into spec_ks); starts at the lowest
        # rung and climbs only on measured near-saturated acceptance.
        self._spec_rung = 0
        # Benchmark-only acceptance degrader (see slot_decode_steps_spec):
        # traced scalar so sweeping it never recompiles; None keeps the
        # production program byte-identical (no noise ops traced).
        self.draft_noise = (
            jnp.float32(draft_noise) if draft_noise > 0.0 else None
        )
        # Acceptance EMA (tokens/verify over occupied slots) + demotion state.
        self.spec_accept_ema: Optional[float] = None
        self._chunks_since_spec = 0
        # Per-chunk mode log (True = speculative chunk) + chosen draft depth
        # (0 = plain) for tests/metrics; bounded so a long-running server
        # doesn't grow them without limit.
        self.spec_mode_log: List[bool] = []
        self.spec_k_log: List[int] = []
        # Serving observability (read by the server's /metrics endpoint).
        self.tokens_delivered = 0  # tokens appended to requests, all modes
        self.chunks_run = 0
        # Host-phase wall accounting (seconds, cumulative): where the
        # engine thread spends time BETWEEN device work. The r4 serving
        # trace showed the device idle ~50% of wall at the 32-slot peak
        # (device_busy 3.58 s / wall 7.37 s) — these timers name the gap.
        self.host_t: Dict[str, float] = defaultdict(float)
        self.join_groups = 0
        # Speculative chunks run `spec_chunk` verify iterations, each
        # advancing a row by up to spec_k tokens and writing spec_k entries
        # past its accepted length — size the cache for the worst case of
        # either chunk flavor (dynamic_update_slice clamps out-of-range
        # writes, which would silently corrupt earlier rows' slots).
        slack = (
            max(chunk, self.spec_chunk * self.spec_k) + self.spec_k
            if self.spec_k else chunk
        )
        s_len = self.prompt_budget + max_new_tokens + slack
        # One extra "trash" row absorbs a join group's padding scatters (a
        # group is padded to a bucketed batch so prefill/insert reuse ONE
        # compiled shape each). The decode program carries the extra row;
        # decode is weight-streaming-bound, so it is effectively free.
        b = n_slots + 1
        self.trash_row = n_slots
        self.s_len = s_len
        # Occupancy-bounded cache window (kv_window): the live cache is kept
        # at the smallest bucket covering max(occupied lengths) + THIS
        # chunk's worst-case writes, so chunks never stream unwritten tail
        # slots. Buckets are a static ladder (each a compiled chunk-program
        # shape); _resize_kv pads/slices on transitions only. Speculative
        # engines get a separate PLAIN-advance floor bucket: a plain chunk
        # advances by `chunk` positions, not the spec worst case (`slack`),
        # so a spec engine running plain chunks (adaptive demotion) streams
        # the same floor bucket a plain engine would instead of one
        # inflated by spec slack it isn't using (r4 noise runs: floor 512
        # vs 384 at the std workload).
        self.max_advance = slack
        self.window_buckets: Optional[tuple] = None
        if kv_window:
            def bucket(n):
                return min(-(-n // 128) * 128, s_len)
            b0 = bucket(self.prompt_budget + chunk + 1)
            b1 = bucket(self.prompt_budget + slack + 1)
            mid = bucket(-(-(b1 + s_len) // 2))
            self.window_buckets = tuple(sorted({b0, b1, mid, s_len}))
        self.host_lengths = np.zeros((n_slots,), np.int64)
        self.window_resizes = 0
        # kv_quant: store K/V int8 with per-(row,position,head) scales —
        # halves the per-step cache streaming (~600 MB/step of bf16 K/V at
        # the 32-slot peak, VERDICT r3 weak #3). cache_dtype stays the
        # activation/pixel dtype.
        self.kv_quant = bool(kv_quant)
        self.kv_dtype = jnp.int8 if kv_quant else cache_dtype
        self.window = self.window_buckets[0] if self.window_buckets else s_len
        self.cache = gemma.init_cache(
            cfg.text_config, b, self.window, self.kv_dtype)
        # Per-slot token history for n-gram drafts (speculative only).
        self.ids_buf = (
            jnp.zeros((b, s_len), jnp.int32) if self.spec_k else None
        )
        self.buf_lens = jnp.zeros((b,), jnp.int32) if self.spec_k else None
        # Acceptance diagnostics: emitted tokens / verify iterations over
        # occupied slots (>=1.0; the speedup potential of speculation).
        self.spec_verifies = 0
        self.spec_emitted = 0
        self.lengths = jnp.zeros((b,), jnp.int32)
        self.cur_tok = jnp.zeros((b, 1), jnp.int32)
        self.temps = jnp.zeros((b,), jnp.float32)  # <= 0 -> greedy
        self.topps = jnp.full((b,), 0.9, jnp.float32)
        self.slot_req: List[Optional[Request]] = [None] * n_slots
        self.pending: deque = deque()
        self.completed: List[Request] = []

        # Multi-tenant LoRA: per-slot adapter arrays (leading layer axis so
        # the decode scan slices them like every other stacked layer param).
        self.lora_rank = lora_rank
        self.slot_lora = None
        self._adapters: Dict[str, Any] = {}
        self._zero_adapter = None
        if lora_rank:
            tc = cfg.text_config
            l, d = tc.num_hidden_layers, tc.hidden_size
            outs = {
                "q": tc.num_attention_heads * tc.head_dim,
                "k": tc.num_key_value_heads * tc.head_dim,
                "v": tc.num_key_value_heads * tc.head_dim,
            }
            self.slot_lora = {
                name: {
                    "a": jnp.zeros((l, b, d, lora_rank), jnp.float32),
                    "b": jnp.zeros((l, b, lora_rank, out), jnp.float32),
                }
                for name, out in outs.items()
            }
            self._zero_adapter = {
                name: {
                    "a": jnp.zeros((l, d, lora_rank), jnp.float32),
                    "b": jnp.zeros((l, lora_rank, out), jnp.float32),
                }
                for name, out in outs.items()
            }
        # Join groups whose first tokens are still on device: fetched at the
        # next chunk boundary (a host fetch costs ~25 ms over the tunnel —
        # never pay it per request).
        self._pending_first: List = []

        # Prefix cache: content-keyed prefill results for REPEATED identical
        # (prompt, image, adapter) requests — a hit joins without paying the
        # vision tower + prefill + host preprocessing (LRU of device-resident
        # K/V + last-position logits, ~11 MB/entry at 3B/288; single-joiner
        # groups only). Opt-in via prefill_cache_size.
        from collections import OrderedDict

        self.prefill_cache_size = prefill_cache_size
        self._prefill_cache: "OrderedDict[str, tuple]" = OrderedDict()
        self.prefill_cache_hits = 0

        # Prefetch pipeline: a worker thread preprocesses queued requests
        # (tokenize + PIL resize to uint8) while the engine thread is
        # blocked in the per-chunk fetch RPC, so join groups stack ready
        # uint8 pixels and ship one ~4.8 MB upload per 32-request wave
        # instead of ~50 ms host preprocess + 19 MB fp32 h2d (or 32
        # per-request upload RPCs) on the engine's critical path (the r4
        # host_t decomposition). Numerics are identical to the inline
        # path: the same per-sample processor call; rescale/normalize move
        # on-device via the bit-exact `processing.pixel_lut` gather. The
        # thread starts lazily at first submit.
        self.prefetch = bool(prefetch)
        # (3, 256) rescale/normalize table, pre-cast to cache_dtype and
        # device-resident once — `_join_group` gathers uint8 pixels through
        # it right behind each upload.
        self._pixel_lut = jnp.asarray(
            processing.pixel_lut(), dtype=self.cache_dtype)
        # Elementwise-affine replacement for the LUT gather (the gather runs
        # at ~127M elem/s on the TPU VPU — 302 ms/run in the serving trace).
        # Used ONLY if this backend's fp32 multiply-add reproduces the LUT
        # bit-exactly in cache_dtype over the whole 0..255 ramp (768 values,
        # checked here on device once); any ulp/FMA mismatch keeps the
        # bit-exact-by-construction gather.
        center, mul = processing.pixel_affine_coeffs()
        self._pixel_aff = (jnp.asarray(center), jnp.asarray(mul))
        ramp = jnp.broadcast_to(
            jnp.arange(256, dtype=jnp.uint8)[None, None, None, :],
            (1, 3, 1, 256))
        via_aff = processing.apply_pixel_affine(
            *self._pixel_aff, ramp, self.cache_dtype)
        self.pixel_affine = bool(
            jnp.all(processing.apply_pixel_lut(self._pixel_lut, ramp)
                    == via_aff))
        if not self.pixel_affine:
            self._pixel_aff = None
        # HF fast tokenizers are not re-entrant ("Already borrowed"): the
        # worker and an engine-thread inline preprocess may target different
        # requests concurrently, so the processor call itself is locked.
        self._proc_lock = threading.Lock()
        self._prep_cv = threading.Condition()
        self._prep_stop = False
        self._prefetch_thread: Optional[threading.Thread] = None
        # Bound how far ahead the worker runs (host-resident prepped pixels
        # are ~150 KB each at 224 uint8 — cap the RAM exposure to ~2 waves).
        self._prep_lookahead = 2 * n_slots
        # Staged group upload: once the NEXT n_slots pending requests are all
        # preprocessed, the worker ships their stacked uint8 pixels to the
        # device ahead of the join — the ~107 ms/group tunnel transfer (4.8 MB
        # at ~45 MB/s, scripts/bench_h2d.py) rides the h2d direction while the
        # engine thread blocks in the chunk-fetch d2h, instead of sitting on
        # the join's critical path (r4 host_t: h2d was the largest host cost
        # left after the uint8-LUT fix). A join uses the staged stack iff its
        # joiners are exactly the staged head in order (pad rows beyond g
        # carry other still-pending requests' pixels — discarded with the
        # trash-row scatter, so content there is free); any mismatch
        # (cancellation, reorder, partial group) falls back to the inline
        # upload and restages. Entries are (ids tuple, device uint8 stack)
        # under _prep_cv; uploads run outside the lock on the worker thread.
        # DEPTH 2 (r4 trace finding): with a single staged slot the device
        # idled up to ~740 ms/run at std waiting for wave uploads —
        # per-wave preprocess+upload (~270-370 ms on this 1-core host)
        # jitters against the ~550 ms cycle, and one slot gives the worker
        # no buffer to absorb it. Two-deep staging lets good cycles bank a
        # wave ahead; on any head mismatch or partial-width join the tail
        # is dropped (group boundaries shifted) and restaged — correctness
        # never depends on a hit.
        self._staged: deque = deque()
        self.stage_depth = 2
        self.staged_hits = 0
        self.staged_misses = 0

    # -- request lifecycle ---------------------------------------------------

    def register_adapter(self, name: str, adapter, scale: float = 1.0) -> None:
        """Register a trained LoRA adapter for multi-tenant serving.

        ``adapter``: the pytree produced by paligemma_tpu.lora (``{"layers":
        {q,k,v: {a (L,D,r), b (L,r,out)}}}`` or the bare layers dict);
        ``scale`` = alpha/r (``LoraConfig.scale``). The scale is folded into
        b here so one compiled program serves adapters with different alphas;
        rank r <= the engine's lora_rank is zero-padded to it (exact — padded
        rank channels contribute nothing).
        """
        if not self.lora_rank:
            raise ValueError("engine built without lora_rank")
        layers = adapter["layers"] if "layers" in adapter else adapter
        out = {}
        for tgt in ("q", "k", "v"):
            a = jnp.asarray(layers[tgt]["a"], jnp.float32)
            bb = jnp.asarray(layers[tgt]["b"], jnp.float32) * jnp.float32(scale)
            r = a.shape[-1]
            if r > self.lora_rank:
                raise ValueError(
                    f"adapter rank {r} exceeds engine lora_rank {self.lora_rank}"
                )
            if r < self.lora_rank:
                pad = self.lora_rank - r
                a = jnp.pad(a, ((0, 0), (0, 0), (0, pad)))
                bb = jnp.pad(bb, ((0, 0), (0, pad), (0, 0)))
            out[tgt] = {"a": a, "b": bb}
        self._adapters[name] = out
        # Re-registering a name with new weights must not serve stale K/V.
        self._prefill_cache.clear()

    def _adapter_for(self, req: Optional[Request]):
        if req is None or req.adapter is None:
            return self._zero_adapter
        return self._adapters[req.adapter]

    def submit(
        self,
        prompt: str,
        image,
        max_new_tokens: Optional[int] = None,
        temperature: Optional[float] = None,
        top_p: Optional[float] = None,
        do_sample: Optional[bool] = None,
        adapter: Optional[str] = None,
    ) -> Request:
        """Queue a request. Per-request sampling params ride the slot arrays
        (mixed greedy/sampled batches share one compiled program); defaults
        come from the engine constructor. ``do_sample=False`` (or
        temperature <= 0) means greedy. ``adapter`` selects a registered
        LoRA adapter for this request (engine must have ``lora_rank``)."""
        if adapter is not None and adapter not in self._adapters:
            raise ValueError(
                f"unknown adapter {adapter!r}; register_adapter it first"
            )
        if do_sample is None:
            do_sample = self.do_sample
        if temperature is None:
            temperature = self.temperature
        if top_p is None:
            top_p = self.top_p
        eff_t = float(temperature) if (do_sample and temperature > 0) else 0.0
        if max_new_tokens is None:
            max_new_tokens = self.max_new_tokens
        if max_new_tokens < 1:  # 0 is a request, not "use the default"
            raise ValueError(f"max_new_tokens must be >= 1, got {max_new_tokens}")
        req = Request(
            prompt, image, max_new_tokens,
            temperature=eff_t, top_p=float(top_p), adapter=adapter,
        )
        if req.max_new_tokens > self.max_new_tokens:
            raise ValueError(
                f"max_new_tokens {req.max_new_tokens} exceeds the engine budget "
                f"{self.max_new_tokens} (cache is sized statically)"
            )
        self._ensure_prefetch()
        with self._prep_cv:
            self.pending.append(req)
            self._prep_cv.notify_all()
        return req

    def _finish(self, slot: int) -> None:
        req = self.slot_req[slot]
        req.done = True
        self.completed.append(req)
        self.slot_req[slot] = None
        # No device work here (a dispatch costs 5-7 ms over the tunnel): the
        # freed slot keeps stepping harmlessly — out-of-bounds scatter writes
        # are dropped by JAX semantics, its attention output is discarded, and
        # the next join's scatter resets its length and K/V rows.

    def _prefill_key(self, req: Request) -> str:
        """Content key for the prefix cache: prompt + image pixels + adapter
        (adapters change the prompt K/V, so they key independently)."""
        import hashlib

        h = hashlib.sha1()
        h.update(req.prompt.encode())
        h.update(f"|{req.adapter or ''}|".encode())
        im = req.image
        h.update(f"{getattr(im, 'mode', '')}{getattr(im, 'size', '')}".encode())
        h.update(im.tobytes() if hasattr(im, "tobytes") else np.asarray(im).tobytes())
        return h.hexdigest()

    def _preprocess_one(self, req: Request):
        """Per-request host preprocessing (tokenize + image pipeline).

        Exactly the inline path's work (``serving.pad_batch`` also calls the
        processor once per sample), factored per-request so the prefetch
        worker can run it off the engine thread. The processor call is
        serialized via _prep_cv's claim protocol (HF fast tokenizers are not
        re-entrant). Pixels stay HOST-side as resized UINT8 (raw_uint8=True):
        the join ships ONE stacked 1-byte/pixel array per group and finishes
        rescale/normalize on device (`processing.apply_pixel_lut`,
        bit-identical to the host pipeline). The tunnel moves ~45 MB/s
        end-to-end (scripts/bench_h2d.py) and pixel upload is the engine's
        dominant host cost, so bytes are wall clock: uint8 is 2x under the
        round-4 bf16 host-convert, 4x under fp32. Per-request ``jnp.asarray``
        uploads from the worker were 512 trickling ~6 ms dispatch RPCs per
        256-req run — pure host churn on a 1-core box."""
        with self._proc_lock:
            out = self.processor(
                text=[req.prompt], images=[req.image], raw_uint8=True)
        ids = np.asarray(out["input_ids"][0], np.int32)
        pix = np.asarray(out["pixel_values"][0], np.uint8)
        return ids, len(ids), pix

    def _prefetch_loop(self) -> None:
        while True:
            req = None
            with self._prep_cv:
                if self._prep_stop:
                    return
                ahead = 0
                for r in self.pending:
                    if r.prep is not None or r._claimed:
                        ahead += 1
                        continue
                    if r.cancelled:
                        continue
                    if ahead < self._prep_lookahead:
                        req = r
                        req._claimed = True
                    break
            if req is None:
                # Nothing left to preprocess within the lookahead: stage the
                # next join group's pixel upload if it is complete, then idle.
                self._try_stage()
                with self._prep_cv:
                    if self._prep_stop:
                        return
                    self._prep_cv.wait(timeout=0.05)
                continue
            try:
                prep = self._preprocess_one(req)
            except Exception:
                # A bad image/prompt fails at join time on the engine thread
                # (which owns per-request error handling); never kill the
                # worker.
                prep = None
            with self._prep_cv:
                req.prep = prep
                req._claimed = False
                self._prep_cv.notify_all()
            self._try_stage()

    def _try_stage(self) -> None:
        """Worker-side: upload the next join waves' stacked uint8 pixels
        ahead of their joins, up to ``stage_depth`` waves deep (see the
        staged-upload comment in ``__init__``). A wave stages only when all
        n_slots of its uncancelled pending requests have preps ready;
        single-joiner groups (g_b == 1) never stage."""
        if self.n_slots < 2:
            return
        uploads = []
        with self._prep_cv:
            if self._prep_stop:
                return
            # Partition the preprocessed pending head into consecutive
            # n_slots-sized waves (stop at the first not-yet-ready request).
            groups, cur = [], []
            for r in self.pending:
                if r.cancelled:
                    continue
                if r.prep is None:
                    break
                cur.append(r)
                if len(cur) == self.n_slots:
                    groups.append(cur)
                    cur = []
                    if len(groups) >= self.stage_depth:
                        break
            # Staged entries must prefix-match the wave sequence positionally
            # (the engine pops whole waves from the head); drop the tail from
            # the first mismatch.
            keep = len(self._staged)
            for i, (sids, _) in enumerate(self._staged):
                if (i >= len(groups)
                        or sids != tuple(r.id for r in groups[i])):
                    keep = i
                    break
            while len(self._staged) > keep:
                self._staged.pop()
            for g in groups[len(self._staged):]:
                uploads.append(
                    (tuple(r.id for r in g), [r.prep[2] for r in g]))
        # Stack + upload OUTSIDE the lock: the transfer is the slow part and
        # must not block submit()/_take_prep(). Single worker thread = no
        # concurrent stagers.
        for ids, pix in uploads:
            t0 = time.perf_counter()
            dev = jnp.asarray(np.stack(pix, axis=0))
            self.host_t["h2d_staged"] += time.perf_counter() - t0
            with self._prep_cv:
                # Append only if the wave still sits right after the staged
                # prefix in pending (the engine may have consumed the head
                # or cancelled requests mid-upload; a stale wave is dropped
                # — staging is best-effort, never load-bearing).
                pos = len(self._staged)
                want = []
                for r in self.pending:
                    if r.cancelled:
                        continue
                    want.append(r.id)
                    if len(want) == (pos + 1) * self.n_slots:
                        break
                if (len(want) == (pos + 1) * self.n_slots
                        and tuple(want[pos * self.n_slots:]) == ids
                        and pos < self.stage_depth):
                    self._staged.append((ids, dev))

    def _ensure_prefetch(self) -> None:
        if not self.prefetch or self._prefetch_thread is not None:
            return
        self._prefetch_thread = threading.Thread(
            target=self._prefetch_loop, daemon=True,
            name="paligemma-prefetch",
        )
        self._prefetch_thread.start()

    def close(self) -> None:
        """Stop the prefetch worker (idempotent; daemon thread dies with the
        process anyway — this is for eager cleanup in tests/servers)."""
        with self._prep_cv:
            self._prep_stop = True
            self._prep_cv.notify_all()

    def _take_prep(self, req: Request):
        """The joining thread's view of a request's preprocessing: use the
        worker's result when ready, wait briefly if it is mid-flight, else
        compute inline (also the prefetch=False path)."""
        with self._prep_cv:
            while req._claimed:
                self._prep_cv.wait(timeout=0.05)
            if req.prep is not None:
                return req.prep
            req._claimed = True  # inline: block the worker off this request
        try:
            prep = self._preprocess_one(req)
        finally:
            with self._prep_cv:
                req._claimed = False
                self._prep_cv.notify_all()
        return prep

    def _join_group(self, joiners: List) -> None:
        """One bucketed prefill + ONE scatter insert for a whole join group.

        The group of G<=n_slots requests is padded to a bucketed batch size
        (1 or n_slots — two compiled prefill shapes total); pad rows scatter
        into the trash row. First tokens stay on device until the next chunk
        boundary (``_pending_first``).
        """
        t_join0 = time.perf_counter()
        g = len(joiners)
        g_b = 1 if g == 1 else self.n_slots
        reqs = [r for _, r in joiners]

        grouped = None
        if self.lora_rank:
            # One stacked group tree serves both the per-row prefill adapters
            # and the slot scatter below (pad rows ride the zero adapter).
            group = [self._adapter_for(req) for _, req in joiners]
            group += [self._zero_adapter] * (g_b - g)
            grouped = _stack_group_adapters(tuple(group))

        key_c = self._prefill_key(reqs[0]) if (
            g_b == 1 and self.prefill_cache_size
        ) else None
        hit = self._prefill_cache.get(key_c) if key_c else None
        if hit is not None:
            valid, logits, temp, ids = hit
            self._prefill_cache.move_to_end(key_c)
            self.prefill_cache_hits += 1
        else:
            # Per-request preprocessing (prefetched off-thread when the
            # worker got to it; inline otherwise), then group assembly at
            # the smallest prompt bucket covering the group (compiled
            # shapes stay a small static set: budgets x batch buckets).
            t_pp0 = time.perf_counter()
            preps = [self._take_prep(r) for r in reqs]
            self.host_t["preprocess"] += time.perf_counter() - t_pp0
            # Pad rows repeat sample 0 (their scatter lands in the trash
            # row), matching serving.pad_batch's batch_bucket semantics.
            preps = preps + [preps[0]] * (g_b - g)
            t = max(int(p[0].shape[0]) for p in preps)
            bucket = next((b for b in self.prompt_budgets if b >= t), None)
            if bucket is None:
                raise ValueError(
                    f"prompt of {t} tokens exceeds the largest prompt budget "
                    f"{self.prompt_budget}"
                )
            ids = np.zeros((g_b, bucket), np.int32)
            valid = np.zeros((g_b,), np.int32)
            for i, (row, v, _) in enumerate(preps):
                ids[i, : row.shape[0]] = row
                valid[i] = v
            t_pf0 = time.perf_counter()
            temp = gemma.init_cache(
                self.cfg.text_config, g_b, bucket, self.kv_dtype
            )
            self.host_t["init_cache"] += time.perf_counter() - t_pf0
            t_h2d0 = time.perf_counter()
            # ONE stacked UINT8 upload for the whole group (~4.8 MB at
            # g=32/224px vs 9.6 bf16 / 19.3 fp32), then the rescale/normalize
            # LUT gather dispatched right behind it so it rides the device
            # pipeline. The gather output is cache_dtype (the LUT was
            # pre-cast at __init__) and bit-identical to the host pipeline.
            # When the prefetch worker staged this exact group's stack ahead
            # of time (full-width joins under backlog), the transfer already
            # happened off-thread and the join pays only the LUT dispatch.
            pix_u8 = None
            if g_b > 1:
                with self._prep_cv:
                    if self._staged:
                        sids, sdev = self._staged[0]
                        if sids[:g] == tuple(r.id for r in reqs):
                            pix_u8 = sdev
                            self.staged_hits += 1
                            self._staged.popleft()
                            if g != self.n_slots:
                                # Partial-width join: wave boundaries in
                                # pending shifted by g — deeper staged
                                # entries no longer align. Drop; restage.
                                self._staged.clear()
                        else:
                            self.staged_misses += 1
                            self._staged.clear()
            if pix_u8 is None:
                pix_u8 = jnp.asarray(np.stack([p[2] for p in preps], axis=0))
            if self._pixel_aff is not None:
                pix_dev = processing.apply_pixel_affine(
                    *self._pixel_aff, pix_u8, self.cache_dtype)
            else:
                pix_dev = processing.apply_pixel_lut(self._pixel_lut, pix_u8)
            ids_dev = jnp.asarray(ids)
            valid_dev = jnp.asarray(valid)
            self.host_t["h2d"] += time.perf_counter() - t_h2d0
            t_pf0 = time.perf_counter()
            logits, temp = serving.batched_prefill(
                self.params, self.cfg, ids_dev, pix_dev, valid_dev, temp,
                lora=grouped,
            )
            self.host_t["prefill_dispatch"] += time.perf_counter() - t_pf0
            if key_c is not None:
                # Device-resident entry (temp K/V + last logits); the insert
                # only READS from them, so reuse across joins is safe.
                self._prefill_cache[key_c] = (valid, logits, temp, ids)
                while len(self._prefill_cache) > self.prefill_cache_size:
                    self._prefill_cache.popitem(last=False)
        req_temps = np.zeros((g_b,), np.float32)
        req_topps = np.full((g_b,), 0.9, np.float32)
        for i, (_, req) in enumerate(joiners):
            req_temps[i] = req.temperature
            req_topps[i] = req.top_p
        t_ins0 = time.perf_counter()
        self.key, sub = jax.random.split(self.key)

        slots = np.full((g_b,), self.trash_row, np.int32)
        for i, (slot, req) in enumerate(joiners):
            slots[i] = slot
            self.slot_req[slot] = req
        (
            self.cache, self.lengths, self.cur_tok, self.temps, self.topps,
            first, slot_lora, ids_buf, buf_lens,
        ) = _insert_group(
            self.cache, temp, jnp.asarray(slots), self.lengths, self.cur_tok,
            self.temps, self.topps, jnp.asarray(valid),
            logits, sub, jnp.asarray(req_temps), jnp.asarray(req_topps),
            slot_lora=self.slot_lora, grouped=grouped,
            ids_buf=self.ids_buf, buf_lens=self.buf_lens,
            prompt_ids=jnp.asarray(ids) if self.spec_k else None,
        )
        if slot_lora is not None:
            self.slot_lora = slot_lora
        if ids_buf is not None:
            self.ids_buf, self.buf_lens = ids_buf, buf_lens
        for i, (slot, _) in enumerate(joiners):
            self.host_lengths[slot] = int(valid[i])
        self._pending_first.append((joiners, first))
        self.host_t["insert_dispatch"] += time.perf_counter() - t_ins0
        self.host_t["join_total"] += time.perf_counter() - t_join0
        self.join_groups += 1

    # -- scheduling ----------------------------------------------------------

    def _min_accept(self, k: int) -> float:
        """Acceptance EMA below which rung ``k`` loses to a plain chunk.

        Empirically FLAT in k, not proportional (r4 draft-noise curve at 32
        slots, cadence 16): k=8 wins at EMA 2.2 (1486 vs 1413 plain) and
        loses at 1.4 (1215); k=4 loses even at EMA 2.5 (1285) — the deeper
        verify amortizes the same weight stream over more accepted tokens,
        so SHALLOW rungs have the HIGHER break-even. 2.0 is the shipped
        k=8 bracket midpoint; fixed-k=4 configs want ~2.8 (explicit
        override)."""
        return 2.0 if self.spec_min_accept is None else self.spec_min_accept

    def _decide_spec_mode(self, n_occupied: int) -> int:
        """Per-chunk draft depth for spec_adaptive: the chosen k (0 = plain
        chunk). Host state only (occupancy + acceptance EMA — no device
        fetch). The ladder climbs a rung when acceptance nearly saturates
        the current k (EMA >= 0.85*k: deeper drafts would still be
        accepted), drops a rung when EMA is below the rung's break-even,
        and falls back to plain — with exponentially backed-off probe
        chunks — below the lowest rung's break-even."""
        if not self.spec_k:
            return 0
        if not self.spec_adaptive:
            return self.spec_k
        if (self.spec_max_slots is not None
                and n_occupied > self.spec_max_slots):
            # Optional wide-batch gate. r3 measured the k=4-at-chunk-cadence
            # program losing at 32 occupied slots (hence the old default
            # 24); the r4 k=8/cadence-16/window program WINS at full width
            # (2453 vs 2038 std, 5296 vs 4021 long useful tok/s), so the
            # shipped default is None (no gate) — set a bound only for
            # custom shallow-k or wider-than-32-slot configs.
            self._chunks_since_spec += 1
            self._probing = False
            return 0
        k = self.spec_ks[self._spec_rung]
        ema = self.spec_accept_ema
        if ema is not None and ema < self._min_accept(k):
            if self._spec_rung > 0:
                # Shallower verify has a lower break-even: step down and
                # re-measure (EMA reset — it was measured at the old k).
                self._spec_rung -= 1
                self.spec_accept_ema = None
                return self.spec_ks[self._spec_rung]
            # Below the lowest rung's break-even: plain, probing on a
            # backed-off schedule — the workload's n-gram structure drifts.
            self._chunks_since_spec += 1
            if self._chunks_since_spec >= self._probe_interval:
                self._probing = True
                return k
            return 0
        if (
            ema is not None
            and self._spec_rung + 1 < len(self.spec_ks)
            and ema >= 0.85 * k
        ):
            # Near-saturated: deeper drafts would still be accepted.
            self._spec_rung += 1
            self.spec_accept_ema = None
            return self.spec_ks[self._spec_rung]
        return k

    def _pop_pending(self) -> Optional[Request]:
        # The prefetch worker iterates ``pending`` under _prep_cv; all
        # mutation goes through this lock.
        with self._prep_cv:
            return self.pending.popleft() if self.pending else None

    def _fill_slots(self) -> None:
        joiners = []
        for slot in range(self.n_slots):
            while self.slot_req[slot] is None:
                req = self._pop_pending()
                if req is None:
                    break
                if req.cancelled:  # cancelled while queued: never join
                    req.done = True
                    self.completed.append(req)
                    if req.on_tokens is not None:
                        # Streaming waiters learn about the cancellation (and
                        # any eviction error, e.g. a server-side deadline)
                        # through the hook — otherwise they would hang.
                        req.on_tokens([], True)
                    continue
                joiners.append((slot, req))
                break
        if not joiners:
            return
        try:
            self._join_group(joiners)
        except Exception:
            # One bad request (e.g. a prompt beyond prompt_budget) must not
            # fail its groupmates or kill the engine loop: retry one by one.
            for slot, req in joiners:
                self.slot_req[slot] = None
                try:
                    self._join_group([(slot, req)])
                except Exception as e:
                    req.error = e
                    req.done = True
                    self.completed.append(req)
                    self.slot_req[slot] = None
                    if req.on_tokens is not None:
                        req.on_tokens([], True)

    def step(self) -> bool:
        """Run one decode chunk, join pending requests WHILE it runs on
        device, evict finished slots at the chunk boundary.

        Join overlap: when slots are already decoding, the chunk is
        dispatched FIRST (dispatches are async) and the join work — host-side
        tokenization/image preprocessing plus the prefill / sample / insert
        dispatches — happens while the chunk executes, queueing behind it on
        device. The joiner therefore starts decoding at the NEXT chunk, and
        the engine never sits idle doing host work between chunks (measured
        in REPORT.md). Only when the engine is idle (no active slot) does the
        join run ahead of the chunk, since there is nothing to overlap.

        Returns False when there is nothing left to do."""
        t_step0 = time.perf_counter()
        had_active = any(r is not None for r in self.slot_req)
        if not had_active:
            self._fill_slots()
            if not any(r is not None for r in self.slot_req):
                return bool(self.pending)

        # First tokens whose prefill was enqueued BEFORE this chunk (idle-path
        # joins above, or last step's overlapped joins): ready by the time the
        # chunk fetch returns, so reading them here costs no extra fence.
        ready_first, self._pending_first = self._pending_first, []
        # Whose tokens this chunk carries: slots (re)filled by the overlapped
        # join below get garbage rows this chunk — theirs start next chunk.
        active: List[Optional[Request]] = list(self.slot_req)

        self.key, sub = jax.random.split(self.key)
        # Host occupancy truth ships with the dispatch so a finished sampled
        # request's stale temp cannot keep the (runtime-branched) nucleus
        # machinery live for all-greedy traffic.
        n_occupied = sum(1 for r in self.slot_req if r is not None)
        occupied = jnp.asarray(
            np.array([r is not None for r in self.slot_req] + [False]))
        k_chunk = self._decide_spec_mode(n_occupied)
        use_spec = k_chunk > 0
        if self.spec_k:
            self.spec_mode_log.append(use_spec)
            self.spec_k_log.append(k_chunk)
            if len(self.spec_mode_log) > 8192:
                del self.spec_mode_log[:4096]
                del self.spec_k_log[:4096]
        self.chunks_run += 1

        t_disp0 = time.perf_counter()
        if self.window_buckets:
            # Occupancy-bounded window: smallest bucket covering every
            # occupied slot's (host-tracked) length plus this chunk's worst-
            # case writes. Host state only — no device fetch. Freed slots'
            # stale lengths are excluded; their chunk writes land out of
            # bounds and are dropped by scatter semantics.
            occ = [int(self.host_lengths[i]) for i in range(self.n_slots)
                   if self.slot_req[i] is not None]
            advance = (
                self.spec_chunk * k_chunk + k_chunk if use_spec
                else self.chunk
            )
            need = (max(occ) if occ else 0) + advance + 1
            target = next(b for b in self.window_buckets if b >= need)
            if target != self.window:
                self.cache = _resize_kv(self.cache, target)
                self.window = target
                self.window_resizes += 1
        if use_spec:
            (toks, counts, self.cur_tok, self.cache, self.lengths,
             self.ids_buf, self.buf_lens) = slot_decode_steps_spec(
                self.params, self.cfg, self.cur_tok, self.cache, self.lengths,
                self.temps, self.topps, sub, self.spec_chunk, self.ids_buf,
                self.buf_lens, k_chunk, self.spec_ngram, self.slot_lora,
                occupied=occupied, draft_noise=self.draft_noise,
                drafter=self.spec_drafter,
            )
            packed = jnp.concatenate([counts[:, None], toks], axis=1)
        elif self.spec_k:
            # Adaptive plain chunk: same one-token program, but the token
            # history keeps accumulating so a later spec chunk's n-gram
            # drafts see every emitted token.
            (toks, self.cur_tok, self.cache, self.lengths,
             self.ids_buf, self.buf_lens) = slot_decode_steps(
                self.params, self.cfg, self.cur_tok, self.cache, self.lengths,
                self.temps, self.topps, sub, self.chunk, self.slot_lora,
                occupied=occupied,
                ids_buf=self.ids_buf, buf_lens=self.buf_lens,
            )
            packed = toks
        else:
            toks, self.cur_tok, self.cache, self.lengths = slot_decode_steps(
                self.params, self.cfg, self.cur_tok, self.cache, self.lengths,
                self.temps, self.topps, sub, self.chunk, self.slot_lora,
                occupied=occupied,
            )
            packed = toks
        # ONE host fetch per chunk, carrying the chunk's tokens AND every
        # pending join group's first tokens: a d2h read costs ~25 ms flat
        # over the tunnel even for ready data (CLAUDE.md), so per-group
        # np.asarray(first) reads were ~200 ms/run at the serving peak.
        # The concatenate is enqueued HERE — right behind the chunk —
        # not at fetch time: the overlapped join below dispatches a
        # ~280 ms batch prefill, and a late concat would queue behind it,
        # making the fetch wait out prefill+insert every cycle (the r4
        # serving trace's 942 ms device idle was exactly this turnaround).
        # Enqueued early, the fetch returns at chunk-end while the join's
        # prefill still runs on device, and the next chunk's dispatch
        # lands before the device drains.
        if ready_first:
            flat = [packed.reshape(-1)] + [
                f.astype(jnp.int32).reshape(-1) for _, f in ready_first
            ]
            fetch_arr = jnp.concatenate(flat)
        else:
            fetch_arr = packed
        self.host_t["decode_dispatch"] += time.perf_counter() - t_disp0
        if had_active:
            self._fill_slots()  # overlapped: runs while the chunk decodes
        t_fetch0 = time.perf_counter()
        if ready_first:
            fetched = np.asarray(fetch_arr)
            packed_np = fetched[: packed.size].reshape(packed.shape)
            first_np, off = [], packed.size
            for _, f in ready_first:
                first_np.append(fetched[off: off + f.size])
                off += f.size
        else:
            packed_np = np.asarray(fetch_arr)
            first_np = []
        # NB: "fetch" includes waiting out whatever device work is still
        # queued (the chunk + any overlapped join programs) plus the ~25 ms
        # tunnel round-trip — it is device-overlap time, not pure host time.
        self.host_t["fetch"] += time.perf_counter() - t_fetch0
        t_dist0 = time.perf_counter()
        if use_spec:
            counts_np, toks_np = packed_np[:, 0], packed_np[:, 1:]
            # Useful-acceptance accounting: verifies include every iteration
            # an occupied slot ran (post-EOS/budget iterations are real
            # waste), while emitted counts only tokens actually DELIVERED to
            # requests (incremented in the distribution loop below) — so
            # tokens/verify is the net speedup factor, not a flattered one.
            self.spec_verifies += self.spec_chunk * sum(
                1 for i in range(self.n_slots) if active[i] is not None)
            occ = [i for i in range(self.n_slots) if active[i] is not None]
            if occ:
                rate = float(
                    np.sum(counts_np[occ])) / (self.spec_chunk * len(occ))
                if self._probing:
                    # Probe outcome: resume speculating on success, double
                    # the probe interval (up to 8x) on failure.
                    self._probing = False
                    self._chunks_since_spec = 0
                    self.spec_accept_ema = rate
                    if rate >= self._min_accept(k_chunk):
                        self._probe_interval = self.spec_probe_every
                    else:
                        self._probe_interval = min(
                            self._probe_interval * 2,
                            8 * self.spec_probe_every)
                else:
                    self._chunks_since_spec = 0
                    self.spec_accept_ema = (
                        rate if self.spec_accept_ema is None
                        else 0.7 * self.spec_accept_ema + 0.3 * rate
                    )
        else:
            toks_np = packed_np
            counts_np = np.full((toks_np.shape[0],), self.chunk, np.int32)
        # Host mirror of per-slot lengths (drives the kv_window bound): every
        # slot occupied at dispatch advanced by its accepted count.
        for i in range(self.n_slots):
            if active[i] is not None:
                self.host_lengths[i] += int(counts_np[i])
        touched: List[Request] = []

        # Deferred first tokens: they precede the chunk's tokens in each
        # request's sequence, so process them first. A slot whose first token
        # already finished it (EOS / budget 1) is freed and its chunk tokens
        # discarded.
        for (joiners, _), vals in zip(ready_first, first_np):
            for (slot, req), val in zip(joiners, vals.tolist()):
                if self.slot_req[slot] is not req:
                    continue  # join failed and was retried elsewhere
                req.tokens.append(int(val))
                self.tokens_delivered += 1
                touched.append(req)
                if int(val) == self.eos_token_id or req.max_new_tokens <= 1:
                    self._finish(slot)

        for slot in range(self.n_slots):
            cur = self.slot_req[slot]
            if cur is not None and cur.cancelled:
                # Cancelled (client gone, or a server-side deadline evicted
                # it): free the slot now instead of decoding to
                # max_new_tokens. The request must still reach ``touched`` —
                # a streaming waiter learns about the eviction (and any
                # eviction error) ONLY through its on_tokens hook, and would
                # otherwise block forever.
                self._finish(slot)
                if cur not in touched:
                    touched.append(cur)
            req = active[slot]
            if req is None or self.slot_req[slot] is not req:
                continue  # empty at dispatch, finished above, or re-joined
            if req not in touched:
                touched.append(req)
            # Vectorized take: stop at the first EOS or the request budget
            # (same semantics as appending one token at a time — the EOS
            # token itself is delivered; the r4 host_t decomposition put the
            # per-token Python loop at ~27 ms/chunk at the serving peak).
            vals = toks_np[slot][: counts_np[slot]]
            n_take = min(vals.shape[0], req.max_new_tokens - len(req.tokens))
            eos_idx = np.flatnonzero(vals[:n_take] == self.eos_token_id)
            hit_eos = eos_idx.size > 0
            if hit_eos:
                n_take = int(eos_idx[0]) + 1
            req.tokens.extend(vals[:n_take].tolist())
            self.tokens_delivered += n_take
            if use_spec:
                self.spec_emitted += n_take
            if hit_eos or len(req.tokens) >= req.max_new_tokens:
                self._finish(slot)

        # Streaming hooks: one notification per request per chunk, from the
        # engine-driving thread.
        for req in touched:
            if req.on_tokens is not None:
                n = req.notified
                req.notified = len(req.tokens)
                req.on_tokens(req.tokens[n:], req.done)
        self.host_t["distribute"] += time.perf_counter() - t_dist0
        self.host_t["step_total"] += time.perf_counter() - t_step0
        return True

    def run(self) -> List[Request]:
        """Drive until every submitted request completes; returns them in
        completion order."""
        while self.step():
            pass
        return self.completed

    def decode_text(self, req: Request) -> str:
        return self.processor.tokenizer.decode(
            req.tokens, skip_special_tokens=True
        )
