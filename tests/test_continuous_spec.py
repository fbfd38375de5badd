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
    for k in (2, 4):
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
