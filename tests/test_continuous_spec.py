"""Per-slot speculative decoding in the continuous engine.

Oracle: the NON-speculative engine (itself pinned token-identical to batch-1
``generation.generate`` in tests/test_continuous.py). Every greedy request
through the speculative engine must produce exactly the same tokens —
speculation may only change HOW MANY forwards it takes, never the stream.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

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


def run_engine(params, cfg, proc, subs, spec_k, n_slots=2, chunk=3,
               max_new=9, **eng_kw):
    eng = ContinuousBatcher(
        params, cfg, proc, n_slots=n_slots, max_new_tokens=max_new,
        chunk=chunk, cache_dtype=jnp.float32, spec_k=spec_k, **eng_kw,
    )
    reqs = [eng.submit(*args, **kw) for args, kw in subs]
    eng.run()
    assert all(r.done and r.error is None for r in reqs), [r.error for r in reqs]
    return [r.tokens for r in reqs], eng


def test_spec_engine_identical_to_plain(setup):
    """4 mixed-budget greedy requests through 2 slots (queueing + mid-flight
    joins + eviction/reuse): the speculative engine's streams must equal the
    plain engine's, for several k."""
    params, cfg, proc, prompts, images = setup
    subs = [((p, im), dict(max_new_tokens=m))
            for (p, im, m) in zip(prompts, images, [5, 9, 3, 7])]
    base, _ = run_engine(params, cfg, proc, subs, spec_k=0)
    # k=16 pins the deep-draft config (drafts deeper than several requests'
    # whole budgets — clamping + full-accept bookkeeping) used by the long-
    # workload serving arm (scripts/run_round4_queue4.sh).
    for k in (2, 4, 16):
        spec, _ = run_engine(params, cfg, proc, subs, spec_k=k)
        assert spec == base, (k, spec, base)


def test_spec_engine_mixed_sampling(setup):
    """Sampled requests ride the same compiled program (1 token/verify) and
    complete within budget; greedy groupmates stay exact."""
    params, cfg, proc, prompts, images = setup
    subs = [
        ((prompts[0], images[0]), dict(max_new_tokens=6)),
        ((prompts[1], images[1]),
         dict(max_new_tokens=6, do_sample=True, temperature=0.9)),
        ((prompts[2], images[2]), dict(max_new_tokens=4)),
    ]
    base, _ = run_engine(params, cfg, proc, subs, spec_k=0)
    spec, _ = run_engine(params, cfg, proc, subs, spec_k=3)
    # Greedy rows exact; the sampled row completes with a plausible stream.
    assert spec[0] == base[0] and spec[2] == base[2]
    assert 1 <= len(spec[1]) <= 6
    assert all(isinstance(t, int) for t in spec[1])


def test_spec_engine_sampled_near_zero_temp_is_greedy(setup):
    """The engine's sampled speculative path at temperature ~0 must emit
    exactly the greedy stream (deterministic check of the per-row
    speculative-sampling branch; nucleus keeps only the argmax)."""
    params, cfg, proc, prompts, images = setup
    subs_greedy = [((prompts[i], images[i]), dict(max_new_tokens=7))
                   for i in range(2)]
    base, _ = run_engine(params, cfg, proc, subs_greedy, spec_k=0)
    subs_sampled = [
        ((prompts[i], images[i]),
         dict(max_new_tokens=7, do_sample=True, temperature=1e-6))
        for i in range(2)
    ]
    spec, eng = run_engine(params, cfg, proc, subs_sampled, spec_k=4)
    assert spec == base, (spec, base)
    # The sampled rows really went through speculation (acceptance can
    # exceed 1 token/verify).
    assert eng.spec_verifies > 0


def test_draft_noise_streams_exact_and_acceptance_drops(setup):
    """``draft_noise`` (the real-text acceptance emulator) may only lower
    ACCEPTANCE — never change a stream: verification rejects corrupted
    drafts. At noise 1.0 every draft position is a uniform-random vocab id,
    so acceptance collapses toward 1 token/verify while greedy output stays
    exactly the plain engine's."""
    params, cfg, proc, prompts, images = setup
    subs = [((p, im), dict(max_new_tokens=m))
            for (p, im, m) in zip(prompts, images, [9, 7, 5, 8])]
    base, _ = run_engine(params, cfg, proc, subs, spec_k=0)
    clean, eng_clean = run_engine(params, cfg, proc, subs, spec_k=4)
    noisy, eng_noisy = run_engine(
        params, cfg, proc, subs, spec_k=4, draft_noise=1.0)
    assert noisy == base == clean, (noisy, base)
    accept = eng_noisy.spec_emitted / eng_noisy.spec_verifies
    accept_clean = eng_clean.spec_emitted / eng_clean.spec_verifies
    # tiny-vocab random drafts still occasionally match; the bound is loose
    # but must sit clearly below the clean run's acceptance.
    assert accept < accept_clean, (accept, accept_clean)


def test_spec_engine_multi_lora(setup):
    """Per-slot adapters compose with per-slot speculation: adapter and base
    greedy requests both stay identical to the plain-lora engine."""
    from paligemma_tpu.lora import LoraConfig, init_lora

    params, cfg, proc, prompts, images = setup
    lcfg = LoraConfig(r=2, alpha=4, dropout=0.0)
    ad = init_lora(cfg, lcfg, jax.random.PRNGKey(5))

    def run(spec_k):
        eng = ContinuousBatcher(
            params, cfg, proc, n_slots=2, max_new_tokens=6, chunk=3,
            cache_dtype=jnp.float32, lora_rank=2, spec_k=spec_k,
        )
        eng.register_adapter("fin", ad, lcfg.scale)
        r1 = eng.submit(prompts[0], images[0], adapter="fin")
        r2 = eng.submit(prompts[1], images[1])
        eng.run()
        assert r1.error is None and r2.error is None
        return r1.tokens, r2.tokens

    assert run(spec_k=4) == run(spec_k=0)


def test_adaptive_engine_identical_to_plain(setup):
    """Occupancy-adaptive engine (spec_adaptive): mode switches mid-stream
    as occupancy crosses spec_max_slots, and every greedy stream stays
    exactly the plain engine's. spec_max_slots=1 with 2 slots forces plain
    chunks while both slots are busy and spec chunks when one drains —
    both programs run within one request lifetime."""
    params, cfg, proc, prompts, images = setup
    subs = [((p, im), dict(max_new_tokens=m))
            for (p, im, m) in zip(prompts, images, [9, 3, 7, 5])]
    base, _ = run_engine(params, cfg, proc, subs, spec_k=0)
    spec, eng = run_engine(
        params, cfg, proc, subs, spec_k=3,
        spec_adaptive=True, spec_max_slots=1,
    )
    assert spec == base, (spec, base)
    # The run genuinely exercised BOTH programs.
    assert True in eng.spec_mode_log and False in eng.spec_mode_log, (
        eng.spec_mode_log)


def test_adaptive_low_acceptance_demotes_and_probes(setup):
    """An unreachable spec_min_accept demotes to plain after the first
    speculative chunk; spec_probe_every re-probes on schedule; streams stay
    exact."""
    params, cfg, proc, prompts, images = setup
    subs = [((prompts[0], images[0]), dict(max_new_tokens=12))]
    base, _ = run_engine(params, cfg, proc, subs, spec_k=0, max_new=12)
    spec, eng = run_engine(
        params, cfg, proc, subs, spec_k=3, max_new=12,
        spec_adaptive=True, spec_max_slots=2,
        spec_min_accept=100.0, spec_probe_every=2,
    )
    assert spec == base, (spec, base)
    log = eng.spec_mode_log
    # First chunk speculates (no EMA yet), then demotes; every later spec
    # chunk is a scheduled probe after exactly spec_probe_every plain chunks.
    assert log[0] is True
    for i, mode in enumerate(log[1:], start=1):
        if mode:
            assert log[i - 2 : i] == [False, False], (i, log)
    assert eng.spec_accept_ema is not None


def test_ladder_engine_identical_to_plain(setup):
    """The draft-depth ladder (spec_ks) may change HOW MANY forwards run,
    never a stream: every greedy request through a (2, 4) ladder engine
    matches the plain engine, and every chunk's chosen depth is a rung (or
    plain)."""
    params, cfg, proc, prompts, images = setup
    subs = [((p, im), dict(max_new_tokens=m))
            for (p, im, m) in zip(prompts, images, [9, 5, 7, 8])]
    base, _ = run_engine(params, cfg, proc, subs, spec_k=0)
    lad, eng = run_engine(
        params, cfg, proc, subs, spec_k=0, spec_ks=(2, 4),
        spec_adaptive=True, spec_max_slots=2,
    )
    assert lad == base, (lad, base)
    assert eng.spec_k == 4  # deepest rung sizes the buffers
    assert eng.spec_k_log and set(eng.spec_k_log) <= {0, 2, 4}


def test_ladder_policy_transitions(setup):
    """Deterministic unit test of the rung policy (host logic only):
    climb on near-saturated EMA, step down below the rung's break-even,
    demote to plain from the lowest rung with exponential probe backoff,
    and resume on a successful probe."""
    params, cfg, proc, prompts, images = setup
    eng = ContinuousBatcher(
        params, cfg, proc, n_slots=2, chunk=4, cache_dtype=jnp.float32,
        spec_ks=(4, 8), spec_adaptive=True, spec_max_slots=2,
        spec_probe_every=2,
    )
    # Fresh engine: lowest rung, no EMA yet.
    assert eng._decide_spec_mode(1) == 4
    # Near-saturated at k=4 -> climb to 8; EMA resets for re-measurement.
    eng.spec_accept_ema = 3.6  # >= 0.85 * 4
    assert eng._decide_spec_mode(1) == 8
    assert eng.spec_accept_ema is None
    # Below the break-even (default flat 2.0) -> step down to 4, EMA reset.
    eng.spec_accept_ema = 1.5
    assert eng._decide_spec_mode(1) == 4
    assert eng.spec_accept_ema is None
    # Below break-even at the lowest rung -> plain, then a probe after
    # spec_probe_every plain chunks.
    eng.spec_accept_ema = 1.0
    assert eng._decide_spec_mode(1) == 0
    assert eng._decide_spec_mode(1) == 4 and eng._probing
    # Failed probe doubles the interval (up to 8x).
    eng._probing = False
    eng._chunks_since_spec = 0
    eng._probe_interval = 4
    assert eng._decide_spec_mode(1) == 0
    # Occupancy above spec_max_slots always forces plain.
    eng.spec_accept_ema = 4.0
    assert eng._decide_spec_mode(3) == 0


def test_spec_engine_prefill_cache(setup):
    """The content-keyed prefix cache stores prompt ids too, so a cache-hit
    join still seeds the n-gram history; repeated requests stay identical."""
    params, cfg, proc, prompts, images = setup
    eng = ContinuousBatcher(
        params, cfg, proc, n_slots=1, max_new_tokens=5, chunk=2,
        cache_dtype=jnp.float32, spec_k=3, prefill_cache_size=2,
    )
    r1 = eng.submit(prompts[0], images[0])
    eng.run()
    r2 = eng.submit(prompts[0], images[0])  # identical request -> cache hit
    eng.run()
    assert eng.prefill_cache_hits == 1
    assert r1.tokens == r2.tokens


def test_spec_depth_rejected_under_a8(params, cfg):
    """prefill_a8 + a verify program deep enough to cross a8_min_seq must be
    rejected at construction (it would silently route verify through the
    non-exact a8 path while plain chunks stay weight-only)."""
    import pytest

    from paligemma_tpu import runtime
    from paligemma_tpu.continuous import ContinuousBatcher
    from paligemma_tpu.processing import ByteTokenizer, PaliGemmaProcessor

    proc = PaliGemmaProcessor(
        ByteTokenizer(), cfg.vision_config.num_image_tokens,
        cfg.vision_config.image_size)
    runtime.set_prefill_a8(True)
    try:
        with pytest.raises(ValueError, match="a8_min_seq"):
            ContinuousBatcher(
                params, cfg, proc, n_slots=2, max_new_tokens=4, chunk=2,
                cache_dtype=__import__("jax.numpy", fromlist=["x"]).float32,
                spec_k=runtime.a8_min_seq - 1)
    finally:
        runtime.set_prefill_a8(False)
