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
from collections import deque
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from paligemma_tpu import serving
from paligemma_tpu.config import PaliGemmaConfig
from paligemma_tpu.models import gemma
from paligemma_tpu.models.gemma import KVCache
from paligemma_tpu.ops.sampling import greedy, sample_top_p


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "do_sample", "temperature", "top_p"),
)
def slot_decode_steps(
    params,
    cfg: PaliGemmaConfig,
    token: jnp.ndarray,  # (B, 1) current token per slot
    cache: KVCache,
    lengths: jnp.ndarray,  # (B,) per-slot sequence length
    key: jax.Array,
    n_steps: int,
    do_sample: bool = False,
    temperature: float = 0.0,
    top_p: float = 0.9,
):
    """``n_steps`` decode steps for all slots as ONE compiled program.

    Every slot advances by n_steps; per-slot positions/writes/visibility are
    driven by ``lengths``. Returns (tokens (B, n_steps), last token (B, 1),
    cache, lengths + n_steps).
    """

    def body(carry, step_key):
        tok, cache, lens = carry
        positions = lens[:, None].astype(jnp.int32)
        embeds = gemma.embed_tokens(params["llm"], tok)
        hidden, cache = gemma.forward(
            params["llm"], cfg.text_config, embeds, positions,
            cache=cache, row_lengths=lens,
        )
        logits = gemma.logits(params["llm"], hidden)[:, -1, :]
        if do_sample and temperature > 0.0:
            nxt = sample_top_p(logits, step_key, temperature, top_p)
        else:
            nxt = greedy(logits)
        return (nxt[:, None], cache, lens + 1), nxt

    keys = jax.random.split(key, n_steps)
    (tok, cache, lengths), toks = jax.lax.scan(body, (token, cache, lengths), keys)
    return toks.T, tok, cache, lengths


@jax.jit
def _insert_slot(cache: KVCache, temp: KVCache, slot: jnp.ndarray) -> KVCache:
    """Copy a batch-1 prefilled cache's K/V rows into slot ``slot``.

    One compiled program serves every slot (slot is a traced scalar)."""
    k = jax.lax.dynamic_update_slice(
        cache.k, temp.k.astype(cache.k.dtype), (0, slot, 0, 0, 0)
    )
    v = jax.lax.dynamic_update_slice(
        cache.v, temp.v.astype(cache.v.dtype), (0, slot, 0, 0, 0)
    )
    return KVCache(k=k, v=v, length=cache.length)


class Request:
    """One submitted generation request and its accumulating result."""

    _next_id = 0

    def __init__(self, prompt: str, image, max_new_tokens: int):
        self.id = Request._next_id
        Request._next_id += 1
        self.prompt = prompt
        self.image = image
        self.max_new_tokens = max_new_tokens
        self.tokens: List[int] = []
        self.done = False


class ContinuousBatcher:
    """Slot-level continuous batching engine.

    Args:
      n_slots: decode batch width (static — one compiled decode shape).
      prompt_budget: every prompt is right-padded to exactly this many tokens
        (one compiled prefill shape); must cover image tokens + BOS + text.
      max_new_tokens: per-slot generation budget (cache sized for it).
      chunk: decode steps per dispatch; joins/evictions happen between chunks.
    """

    def __init__(
        self,
        params,
        cfg: PaliGemmaConfig,
        processor,
        n_slots: int = 4,
        prompt_budget: Optional[int] = None,
        max_new_tokens: int = 64,
        chunk: int = 8,
        cache_dtype=jnp.bfloat16,
        do_sample: bool = False,
        temperature: float = 0.0,
        top_p: float = 0.9,
        eos_token_id: Optional[int] = None,
        seed: int = 0,
    ):
        self.params, self.cfg, self.processor = params, cfg, processor
        self.n_slots = n_slots
        n_img = cfg.vision_config.num_image_tokens
        self.prompt_budget = prompt_budget or (n_img + 32)
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

        s_len = self.prompt_budget + max_new_tokens + chunk
        self.cache = gemma.init_cache(cfg.text_config, n_slots, s_len, cache_dtype)
        self.lengths = jnp.zeros((n_slots,), jnp.int32)
        self.cur_tok = jnp.zeros((n_slots, 1), jnp.int32)
        self.slot_req: List[Optional[Request]] = [None] * n_slots
        self.pending: deque = deque()
        self.completed: List[Request] = []

    # -- request lifecycle ---------------------------------------------------

    def submit(self, prompt: str, image, max_new_tokens: Optional[int] = None) -> Request:
        req = Request(prompt, image, max_new_tokens or self.max_new_tokens)
        if req.max_new_tokens > self.max_new_tokens:
            raise ValueError(
                f"max_new_tokens {req.max_new_tokens} exceeds the engine budget "
                f"{self.max_new_tokens} (cache is sized statically)"
            )
        self.pending.append(req)
        return req

    def _finish(self, slot: int) -> None:
        req = self.slot_req[slot]
        req.done = True
        self.completed.append(req)
        self.slot_req[slot] = None
        # Idle slots keep stepping inside the shared program; pin their length
        # so scatter writes stay in-bounds until the slot is reused.
        self.lengths = self.lengths.at[slot].set(0)

    def _join(self, slot: int, req: Request) -> None:
        """Batch-1 bucketed prefill, then drop the K/V rows into the slot."""
        ids, valid, pix, _ = serving.pad_batch(
            self.processor, [req.prompt], [req.image],
            prompt_bucket=self.prompt_budget,
        )
        if ids.shape[1] != self.prompt_budget:
            raise ValueError(
                f"prompt of {ids.shape[1]} tokens exceeds prompt_budget "
                f"{self.prompt_budget}"
            )
        temp = gemma.init_cache(
            self.cfg.text_config, 1, self.prompt_budget, self.cache_dtype
        )
        logits, temp = serving.batched_prefill(
            self.params, self.cfg, jnp.asarray(ids),
            jnp.asarray(pix, self.cache_dtype), jnp.asarray(valid), temp,
        )
        self.key, sub = jax.random.split(self.key)
        if self.do_sample and self.temperature > 0.0:
            first = sample_top_p(logits, sub, self.temperature, self.top_p)
        else:
            first = greedy(logits)
        first_id = int(first[0])

        self.cache = _insert_slot(self.cache, temp, jnp.int32(slot))
        self.lengths = self.lengths.at[slot].set(int(valid[0]))
        self.cur_tok = self.cur_tok.at[slot, 0].set(first_id)
        self.slot_req[slot] = req
        req.tokens.append(first_id)
        if first_id == self.eos_token_id or req.max_new_tokens <= 1:
            self._finish(slot)

    # -- scheduling ----------------------------------------------------------

    def _fill_slots(self) -> None:
        for slot in range(self.n_slots):
            if self.slot_req[slot] is None and self.pending:
                self._join(slot, self.pending.popleft())

    def step(self) -> bool:
        """Join pending requests, run one decode chunk, evict finished slots.

        Returns False when there is nothing left to do."""
        self._fill_slots()
        if not any(r is not None for r in self.slot_req):
            return bool(self.pending)

        self.key, sub = jax.random.split(self.key)
        toks, self.cur_tok, self.cache, self.lengths = slot_decode_steps(
            self.params, self.cfg, self.cur_tok, self.cache, self.lengths, sub,
            self.chunk, self.do_sample, float(self.temperature), float(self.top_p),
        )
        toks_np = np.asarray(toks)  # one host fetch per chunk
        for slot in range(self.n_slots):
            req = self.slot_req[slot]
            if req is None:
                continue
            for t in toks_np[slot].tolist():
                req.tokens.append(int(t))
                if t == self.eos_token_id or len(req.tokens) >= req.max_new_tokens:
                    self._finish(slot)
                    break
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
