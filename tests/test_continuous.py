"""Continuous (slot-level) batching: per-request token identity vs batch-1
generate, slot eviction/reuse, and queueing beyond slot capacity.

The oracle is ``generation.generate`` — the reference-shaped batch-1 driver
(reference: inference.py:34-85). Every request routed through the continuous
engine must produce exactly the tokens it would have produced alone.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from paligemma_tpu import generation
from paligemma_tpu.config import tiny_config
from paligemma_tpu.continuous import ContinuousBatcher
from paligemma_tpu.models import paligemma
from paligemma_tpu.processing import ByteTokenizer, PaliGemmaProcessor, align_config


@pytest.fixture(scope="module")
def setup():
    tok = ByteTokenizer()
    cfg = tiny_config()
    proc = PaliGemmaProcessor(
        tok, cfg.vision_config.num_image_tokens, cfg.vision_config.image_size
    )
    cfg = align_config(cfg, proc)
    params = paligemma.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    rng = np.random.RandomState(7)
    images = [
        Image.fromarray(rng.randint(0, 255, (20, 28, 3), np.uint8))
        for _ in range(4)
    ]
    prompts = ["a", "tell me more", "mid", "the longest prompt of them all"]
    return params, cfg, proc, prompts, images


def oracle_tokens(params, cfg, proc, prompt, image, max_new):
    out = proc(text=[prompt], images=[image])
    toks, _ = generation.generate(
        params, cfg,
        jnp.asarray(out["input_ids"]), jnp.asarray(out["pixel_values"]),
        max_new_tokens=max_new, eos_token_id=proc.tokenizer.eos_token_id,
        cache_dtype=jnp.float32,
    )
    return toks


def test_continuous_matches_batch1_with_queueing(setup):
    """4 mixed-length requests through 2 slots (so two must queue and join
    slots mid-flight) == 4 independent batch-1 runs, token for token."""
    params, cfg, proc, prompts, images = setup
    eng = ContinuousBatcher(
        params, cfg, proc, n_slots=2, max_new_tokens=7, chunk=3,
        cache_dtype=jnp.float32,
    )
    reqs = [eng.submit(p, im) for p, im in zip(prompts, images)]
    done = eng.run()
    assert len(done) == 4 and all(r.done for r in reqs)
    for p, im, r in zip(prompts, images, reqs):
        expect = oracle_tokens(params, cfg, proc, p, im, 7)
        assert r.tokens == expect, (p, r.tokens, expect)


def test_single_slot_eviction_and_reuse(setup):
    """n_slots=1: every request serially joins the SAME slot — exercises
    eviction, length reset, and K/V row overwrite."""
    params, cfg, proc, prompts, images = setup
    eng = ContinuousBatcher(
        params, cfg, proc, n_slots=1, max_new_tokens=5, chunk=2,
        cache_dtype=jnp.float32,
    )
    reqs = [eng.submit(p, im) for p, im in zip(prompts[:3], images[:3])]
    eng.run()
    for p, im, r in zip(prompts, images, reqs):
        assert r.tokens == oracle_tokens(params, cfg, proc, p, im, 5)


def test_mid_flight_submit(setup):
    """A request submitted while the engine is already decoding joins a free
    slot between chunks and still matches its batch-1 run."""
    params, cfg, proc, prompts, images = setup
    eng = ContinuousBatcher(
        params, cfg, proc, n_slots=2, max_new_tokens=6, chunk=2,
        cache_dtype=jnp.float32,
    )
    r0 = eng.submit(prompts[0], images[0])
    eng.step()  # r0 in flight
    r1 = eng.submit(prompts[1], images[1])
    eng.run()
    assert r0.tokens == oracle_tokens(params, cfg, proc, prompts[0], images[0], 6)
    assert r1.tokens == oracle_tokens(params, cfg, proc, prompts[1], images[1], 6)


def test_overlapped_join_budget_one(setup):
    """A budget-1 request joining mid-flight (the overlapped join path) is
    finished by its deferred first token alone; the garbage chunk tokens its
    slot decoded before the join must be discarded, and the slot must be
    reusable afterwards."""
    params, cfg, proc, prompts, images = setup
    eng = ContinuousBatcher(
        params, cfg, proc, n_slots=2, max_new_tokens=6, chunk=2,
        cache_dtype=jnp.float32,
    )
    r0 = eng.submit(prompts[0], images[0])
    eng.step()  # r0 in flight -> the next joins overlap a running chunk
    r1 = eng.submit(prompts[1], images[1], max_new_tokens=1)
    r2 = eng.submit(prompts[2], images[2])  # queued behind r1's slot
    eng.run()
    assert r1.done and len(r1.tokens) == 1
    assert r1.tokens == oracle_tokens(params, cfg, proc, prompts[1], images[1], 1)
    assert r0.tokens == oracle_tokens(params, cfg, proc, prompts[0], images[0], 6)
    assert r2.tokens == oracle_tokens(params, cfg, proc, prompts[2], images[2], 6)


def test_budget_guard(setup):
    params, cfg, proc, prompts, images = setup
    eng = ContinuousBatcher(
        params, cfg, proc, n_slots=1, max_new_tokens=4, cache_dtype=jnp.float32
    )
    with pytest.raises(ValueError, match="exceeds the engine budget"):
        eng.submit(prompts[0], images[0], max_new_tokens=99)


def test_mixed_greedy_and_sampled_slots(setup):
    """Per-request sampling params share one compiled program: a greedy
    request decoding NEXT TO a sampled one must still match its batch-1
    greedy oracle; the sampled one must produce in-vocab tokens."""
    params, cfg, proc, prompts, images = setup
    eng = ContinuousBatcher(
        params, cfg, proc, n_slots=2, max_new_tokens=6, chunk=2,
        cache_dtype=jnp.float32,
    )
    r_greedy = eng.submit(prompts[0], images[0])
    r_sampled = eng.submit(
        prompts[1], images[1], temperature=0.9, top_p=0.9, do_sample=True
    )
    eng.run()
    assert r_greedy.tokens == oracle_tokens(params, cfg, proc, prompts[0], images[0], 6)
    assert len(r_sampled.tokens) >= 1
    assert all(0 <= t < cfg.text_config.vocab_size for t in r_sampled.tokens)


def test_streaming_hook_and_cancellation(setup):
    """on_tokens must deliver exactly the request's token stream in order;
    setting .cancelled frees the slot at the next chunk boundary."""
    params, cfg, proc, prompts, images = setup
    eng = ContinuousBatcher(
        params, cfg, proc, n_slots=2, max_new_tokens=8, chunk=2,
        cache_dtype=jnp.float32,
    )
    streamed = []
    dones = []
    r0 = eng.submit(prompts[0], images[0])
    r0.on_tokens = lambda toks, done: (streamed.extend(toks), dones.append(done))
    eng.run()
    assert streamed == r0.tokens
    assert dones[-1] is True

    # Cancellation: a long request is evicted at the next chunk boundary.
    r1 = eng.submit(prompts[1], images[1], max_new_tokens=8)
    eng.step()  # joins + first chunk
    produced = len(r1.tokens)
    r1.cancelled = True
    eng.run()
    assert r1.done
    # At most the already-queued notifications; far fewer than the budget.
    assert len(r1.tokens) <= produced + 1


def test_prompt_buckets(setup):
    """Multi-bucket prompt budgets: a short prompt prefills at the small
    bucket, a long one at the large bucket, both token-identical to batch-1;
    beyond the largest bucket is a clear error."""
    params, cfg, proc, prompts, images = setup
    n_img = cfg.vision_config.num_image_tokens
    long_prompt = "a financial document with many words " * 3
    eng = ContinuousBatcher(
        params, cfg, proc, n_slots=2, max_new_tokens=5, chunk=2,
        cache_dtype=jnp.float32,
        prompt_budget=[n_img + 8, n_img + 160],
    )
    r_short = eng.submit(prompts[0], images[0])      # fits the small bucket
    eng.run()
    r_long = eng.submit(long_prompt, images[1])      # needs the large one
    eng.run()
    assert r_short.tokens == oracle_tokens(
        params, cfg, proc, prompts[0], images[0], 5
    )
    assert r_long.tokens == oracle_tokens(
        params, cfg, proc, long_prompt, images[1], 5
    )

    # Mixed-length join group: the whole group rides the covering bucket.
    r_s2 = eng.submit(prompts[1], images[0])
    r_l2 = eng.submit(long_prompt, images[1])
    eng.run()
    assert r_s2.tokens == oracle_tokens(params, cfg, proc, prompts[1], images[0], 5)
    assert r_l2.tokens == r_long.tokens

    r_huge = eng.submit("x" * 4000, images[0])
    eng.run()
    assert r_huge.error is not None
    assert "exceeds the largest prompt budget" in str(r_huge.error)


def test_prefill_cache_hit_identity_and_eviction(setup):
    """A repeated identical (prompt, image) request joins from the prefix
    cache — same tokens, no second prefill — and LRU eviction works."""
    params, cfg, proc, prompts, images = setup
    eng = ContinuousBatcher(
        params, cfg, proc, n_slots=1, max_new_tokens=5, chunk=2,
        cache_dtype=jnp.float32, prefill_cache_size=1,
    )
    calls = []
    from paligemma_tpu import serving as S
    orig = S.batched_prefill

    def counting(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    S.batched_prefill = counting
    try:
        r1 = eng.submit(prompts[0], images[0])
        eng.run()
        n_first = len(calls)
        r2 = eng.submit(prompts[0], images[0])  # identical -> cache hit
        eng.run()
        assert len(calls) == n_first  # no new prefill
        assert eng.prefill_cache_hits == 1
        assert r2.tokens == r1.tokens == oracle_tokens(
            params, cfg, proc, prompts[0], images[0], 5
        )
        # Different image -> miss; cache_size=1 evicts the old entry.
        eng.submit(prompts[0], images[1])
        eng.run()
        assert len(calls) == n_first + 1
        eng.submit(prompts[0], images[0])  # evicted -> prefills again
        eng.run()
        assert len(calls) == n_first + 2
        assert eng.prefill_cache_hits == 1
    finally:
        S.batched_prefill = orig


def test_prefill_cache_keys_on_adapter(setup):
    """Same prompt+image under different adapters must NOT share cached
    prompt K/V (adapters change the prefill)."""
    params, cfg, proc, prompts, images = setup
    from paligemma_tpu.lora import LoraConfig, init_lora

    lcfg = LoraConfig(r=2, alpha=4, dropout=0.0)
    ad = init_lora(cfg, lcfg, jax.random.PRNGKey(5))
    ad["layers"]["q"]["b"] = (
        jax.random.normal(jax.random.PRNGKey(6), ad["layers"]["q"]["b"].shape)
        * 0.8
    )
    eng = ContinuousBatcher(
        params, cfg, proc, n_slots=1, max_new_tokens=5, chunk=2,
        cache_dtype=jnp.float32, lora_rank=2, prefill_cache_size=4,
    )
    eng.register_adapter("fin", ad, lcfg.scale)
    r_base = eng.submit(prompts[0], images[0])
    eng.run()
    r_ad = eng.submit(prompts[0], images[0], adapter="fin")
    eng.run()
    assert eng.prefill_cache_hits == 0  # different keys, no cross-hit
    # Both decode from their own prefill; base matches the plain oracle.
    assert r_base.tokens == oracle_tokens(params, cfg, proc, prompts[0], images[0], 5)
    assert r_ad.done and len(r_ad.tokens) >= 1


def test_continuous_engine_tp_sharded(setup):
    """The continuous engine over an 8-device TP mesh: GSPMD propagates the
    param/cache shardings through the slot decode, group prefill, and insert
    programs (collectives over the model axis), and every request stays
    token-identical to the unsharded engine."""
    from paligemma_tpu.parallel import sharding as shd
    from paligemma_tpu.parallel.mesh import MODEL_AXIS, make_mesh

    params, cfg, proc, prompts, images = setup

    def run(params_in):
        eng = ContinuousBatcher(
            params_in, cfg, proc, n_slots=2, max_new_tokens=6, chunk=2,
            cache_dtype=jnp.float32,
        )
        reqs = [eng.submit(p, im) for p, im in zip(prompts[:3], images[:3])]
        eng.run()
        return [r.tokens for r in reqs]

    base = run(params)
    mesh = make_mesh(data=1, model=8)
    sparams = jax.device_put(params, shd.param_shardings(cfg, mesh))
    spec = tuple(sparams["llm"]["layers"]["qkv"].sharding.spec)
    assert MODEL_AXIS in spec, spec  # genuinely model-sharded, not replicated
    assert run(sparams) == base


def test_cancel_active_slot_notifies_stream(setup):
    """A request cancelled (or deadline-evicted) while DECODING must still
    deliver a terminal on_tokens(done=True) — a streaming waiter would
    otherwise block forever (round-3 review finding)."""
    params, cfg, proc, prompts, images = setup
    eng = ContinuousBatcher(
        params, cfg, proc, n_slots=1, max_new_tokens=12, chunk=2,
        cache_dtype=jnp.float32,
    )
    r = eng.submit(prompts[0], images[0])
    events = []
    r.on_tokens = lambda toks, done: events.append((list(toks), done))
    eng.step()  # join + first chunk
    r.cancelled = True
    eng.run()
    assert r.done
    assert events and events[-1][1] is True, events


def test_cancel_while_queued(setup):
    """A request cancelled before it ever joins a slot completes without
    decoding a single token."""
    params, cfg, proc, prompts, images = setup
    eng = ContinuousBatcher(
        params, cfg, proc, n_slots=1, max_new_tokens=6, chunk=2,
        cache_dtype=jnp.float32,
    )
    r0 = eng.submit(prompts[0], images[0])  # occupies the only slot
    r1 = eng.submit(prompts[1], images[1])  # queued
    eng.step()
    r1.cancelled = True
    eng.run()
    assert r1.done and r1.tokens == []


def test_kv_window_identity_with_resizes(setup):
    """Occupancy-bounded cache window (kv_window): streams are EXACTLY the
    full-cache engine's (the masked attention never read the dropped tail),
    while the window genuinely resized (grow on a long request, shrink after
    it finishes and short requests rejoin)."""
    params, cfg, proc, prompts, images = setup

    def run(**kw):
        eng = ContinuousBatcher(
            params, cfg, proc, n_slots=2, max_new_tokens=160, chunk=4,
            cache_dtype=jnp.float32, **kw,
        )
        # One long request crosses the first bucket; the short ones after it
        # pull the bound back down.
        budgets = [140, 6, 5, 7]
        reqs = [eng.submit(p, im, max_new_tokens=m)
                for (p, im, m) in zip(prompts, images, budgets)]
        eng.run()
        assert all(r.done and r.error is None for r in reqs)
        return [r.tokens for r in reqs], eng

    base, _ = run()
    win, eng = run(kv_window=True)
    assert win == base
    assert eng.window_buckets is not None and len(eng.window_buckets) >= 2
    assert eng.window_resizes >= 1, (eng.window_buckets, eng.window)


def test_kv_quant_engine_streams(setup):
    """int8 KV cache engine: requests complete and (on this tiny fp32 model)
    the greedy streams match the bf16-cache engine's token for token."""
    params, cfg, proc, prompts, images = setup

    def run(**kw):
        eng = ContinuousBatcher(
            params, cfg, proc, n_slots=2, max_new_tokens=9, chunk=3,
            cache_dtype=jnp.float32, **kw,
        )
        reqs = [eng.submit(p, im, max_new_tokens=m)
                for (p, im, m) in zip(prompts, images, [5, 9, 3, 7])]
        eng.run()
        assert all(r.done and r.error is None for r in reqs)
        return [r.tokens for r in reqs]

    base = run()
    assert run(kv_quant=True) == base
    # All three levers compose (quant + window + full path through joins).
    assert run(kv_quant=True, kv_window=True) == base


def test_kv_quant_spec_engine(setup):
    """int8 KV composes with per-slot speculation: greedy streams match the
    plain engine's (the verify path reads the dequantized cache)."""
    params, cfg, proc, prompts, images = setup

    def run(**kw):
        eng = ContinuousBatcher(
            params, cfg, proc, n_slots=2, max_new_tokens=8, chunk=3,
            cache_dtype=jnp.float32, **kw,
        )
        reqs = [eng.submit(p, im) for p, im in zip(prompts[:3], images[:3])]
        eng.run()
        assert all(r.done and r.error is None for r in reqs)
        return [r.tokens for r in reqs]

    assert run(kv_quant=True, spec_k=3) == run()


def test_spec_longest_drafter_engine_identity(setup):
    """spec_drafter='longest' (variable-context longest-match proposals)
    emits exactly the plain engine's greedy streams — drafter choice moves
    acceptance only, never the output (VERDICT r4 #5)."""
    params, cfg, proc, prompts, images = setup

    def run(**kw):
        eng = ContinuousBatcher(
            params, cfg, proc, n_slots=2, max_new_tokens=8, chunk=3,
            cache_dtype=jnp.float32, **kw,
        )
        reqs = [eng.submit(p, im) for p, im in zip(prompts[:3], images[:3])]
        eng.run()
        assert all(r.done and r.error is None for r in reqs)
        return [r.tokens for r in reqs]

    assert run(spec_k=3, spec_drafter="longest") == run()


def test_w4a8_engine_spec_identity(setup):
    """The serving engine runs end-to-end on w4a8 params (int4 MLP weights +
    int8 activations, fused Pallas MLP in interpret mode on CPU), and the
    speculative engine emits exactly the plain w4a8 engine's greedy streams
    (verify exactness holds under w4a8 numerics; VERDICT r4 #2). Identity is
    w4a8-vs-w4a8 — quant tokens can legitimately differ from fp32 at tie
    margins."""
    from paligemma_tpu.quantization import quantize_params

    params, cfg, proc, prompts, images = setup
    qparams = quantize_params(params, llm_only=True, mode="w4a8")

    def run(**kw):
        eng = ContinuousBatcher(
            qparams, cfg, proc, n_slots=2, max_new_tokens=6, chunk=2,
            cache_dtype=jnp.float32, **kw,
        )
        reqs = [eng.submit(p, im) for p, im in zip(prompts[:3], images[:3])]
        eng.run()
        assert all(r.done and r.error is None for r in reqs)
        return [r.tokens for r in reqs]

    assert run(spec_k=3) == run()


def test_prefetch_identity_and_shutdown(setup):
    """The prefetch worker (off-thread preprocessing + host cache-dtype pixel
    convert + one stacked upload per join group) is a pure scheduling change:
    prefetch=True and prefetch=False produce identical streams, including for
    a mid-flight submit the worker sees while the engine decodes. close()
    stops the worker (idempotent)."""
    params, cfg, proc, prompts, images = setup

    def run(pf):
        eng = ContinuousBatcher(
            params, cfg, proc, n_slots=2, max_new_tokens=6, chunk=2,
            cache_dtype=jnp.float32, prefetch=pf,
        )
        reqs = [eng.submit(p, im) for p, im in zip(prompts[:3], images[:3])]
        eng.step()  # first wave in flight
        reqs.append(eng.submit(prompts[3], images[3]))  # racing the worker
        eng.run()
        assert all(r.done and r.error is None for r in reqs)
        if pf:
            assert eng._prefetch_thread is not None
        else:
            assert eng._prefetch_thread is None
        eng.close()
        eng.close()  # idempotent
        if pf:
            eng._prefetch_thread.join(timeout=5.0)
            assert not eng._prefetch_thread.is_alive()
        return [r.tokens for r in reqs]

    assert run(True) == run(False)


def test_staged_group_upload_hit_and_fallback(setup):
    """The staged group upload (the prefetch worker ships the next join
    group's stacked uint8 pixels to the device AHEAD of the join) is consumed
    only when the join group matches the staged head exactly, in order; any
    mismatch — here a cancellation between staging and join — falls back to
    the inline upload and counts a miss. Both paths must stay token-identical
    to batch-1 (pad rows beyond the group carry other requests' pixels, which
    the trash-row scatter discards)."""
    params, cfg, proc, prompts, images = setup

    def run(cancel_one):
        eng = ContinuousBatcher(
            params, cfg, proc, n_slots=2, max_new_tokens=5, chunk=2,
            cache_dtype=jnp.float32, prefetch=False,
        )
        reqs = [eng.submit(p, im) for p, im in zip(prompts, images)]
        # Deterministic staging (no worker thread to race): preprocess the
        # head group inline, then stage its stacked upload as the worker
        # would. _try_stage is also exercised end-to-end (worker-driven,
        # timing-dependent) by test_prefetch_identity_and_shutdown.
        for r in list(eng.pending)[: eng.n_slots]:
            r.prep = eng._preprocess_one(r)
        eng._try_stage()
        assert eng._staged is not None
        if cancel_one:
            reqs[0].cancelled = True
        eng.run()
        live = [r for r in reqs if not r.cancelled]
        assert all(r.done and r.error is None for r in live)
        if cancel_one:
            assert eng.staged_misses >= 1 and eng.staged_hits == 0
        else:
            assert eng.staged_hits >= 1
        for p, im, r in zip(prompts, images, reqs):
            if r.cancelled:
                continue
            assert r.tokens == oracle_tokens(params, cfg, proc, p, im, 5)

    run(False)
    run(True)
