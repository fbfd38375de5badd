"""n-gram (prompt-lookup) speculative decoding: exactness vs plain greedy.

Speculative decoding is an addition over the reference (whose decode loop is
strictly one token per forward, reference: inference.py:55-78): drafts come
from matching the last n-gram against the context (checkpoint-free), and a
k-token verify step accepts the longest prefix agreeing with the model's own
greedy choices. Exactness is the whole contract — every test here reduces to
"the speculative stream IS the greedy stream".
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paligemma_tpu import generation
from paligemma_tpu.config import tiny_config
from paligemma_tpu.models import paligemma


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    params = paligemma.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    n_img = cfg.vision_config.num_image_tokens
    size = cfg.vision_config.image_size
    rng = np.random.RandomState(0)

    def mk(seed, text_len=12):
        r = np.random.RandomState(seed)
        ids = np.concatenate(
            [np.full((1, n_img), cfg.image_token_index),
             r.randint(4, 200, size=(1, text_len))], axis=1
        ).astype(np.int32)
        pix = rng.randn(1, 3, size, size).astype(np.float32)
        return jnp.asarray(ids), jnp.asarray(pix)

    return params, cfg, mk


def test_verify_step_matches_sequential_decode(setup):
    """k-token verify logits == k sequential decode_step logits (the
    per-query threshold mask is exactly 'cache + causal over drafts')."""
    params, cfg, mk = setup
    ids, pix = mk(1)
    toks = jnp.asarray([[7, 42, 99, 7]], jnp.int32)  # arbitrary drafts

    cache = generation.make_cache(cfg, 1, ids.shape[1], 8, jnp.float32)
    _, cache = paligemma.prefill(params, cfg, ids, pix, cache)
    seq_logits = []
    c = cache
    for i in range(toks.shape[1]):
        lg, c = paligemma.decode_step(params, cfg, toks[:, i : i + 1], c)
        seq_logits.append(np.asarray(lg[0, 0]))

    cache2 = generation.make_cache(cfg, 1, ids.shape[1], 8, jnp.float32)
    _, cache2 = paligemma.prefill(params, cfg, ids, pix, cache2)
    ver_logits, vcache = paligemma.verify_step(params, cfg, toks, cache2)
    np.testing.assert_allclose(
        np.asarray(ver_logits[0]), np.stack(seq_logits), rtol=2e-4, atol=2e-4
    )
    assert int(vcache.length) == int(cache.length) + toks.shape[1]
    # The verify-step cache (rolled back or not) must continue identically.
    lg_seq, _ = paligemma.decode_step(params, cfg, toks[:, :1], c)
    lg_ver, _ = paligemma.decode_step(params, cfg, toks[:, :1], vcache)
    np.testing.assert_allclose(
        np.asarray(lg_seq), np.asarray(lg_ver), rtol=2e-4, atol=2e-4
    )


@pytest.mark.parametrize("k,n", [(4, 3), (8, 3), (6, 2)])
def test_generate_spec_identical_to_greedy(setup, k, n):
    params, cfg, mk = setup
    for seed in (1, 2, 3):
        ids, pix = mk(seed)
        base = generation.generate_chunked(
            params, cfg, ids, pix, max_new_tokens=24, eos_token_id=-1,
            cache_dtype=jnp.float32, chunk=8)
        stats = {}
        spec = generation.generate_spec(
            params, cfg, ids, pix, max_new_tokens=24, eos_token_id=-1,
            cache_dtype=jnp.float32, chunk=8, k=k, n=n, stats=stats)
        assert spec == base, (seed, k, n, spec, base)
        assert stats["verify_steps"] >= 1
        assert stats["tokens_per_verify"] >= 1.0


def test_generate_spec_eos_trim(setup):
    """EOS semantics match generate_chunked: pick the token the greedy
    stream emits mid-sequence as 'EOS' and both streams must stop there."""
    params, cfg, mk = setup
    ids, pix = mk(4)
    base_full = generation.generate_chunked(
        params, cfg, ids, pix, max_new_tokens=20, eos_token_id=-1,
        cache_dtype=jnp.float32, chunk=8)
    eos = base_full[6]
    base = generation.generate_chunked(
        params, cfg, ids, pix, max_new_tokens=20, eos_token_id=eos,
        cache_dtype=jnp.float32, chunk=8)
    spec = generation.generate_spec(
        params, cfg, ids, pix, max_new_tokens=20, eos_token_id=eos,
        cache_dtype=jnp.float32, chunk=8, k=4, n=3)
    assert spec == base
    assert spec[-1] == eos and eos not in spec[:-1]


def test_spec_sampled_near_zero_temperature_is_greedy(setup):
    """The sampled speculative path, driven at temperature ~0, must emit
    exactly the greedy stream — a deterministic end-to-end check of the
    sampling branch (nucleus keeps only the argmax at t -> 0)."""
    params, cfg, mk = setup
    ids, pix = mk(6)
    base = generation.generate_chunked(
        params, cfg, ids, pix, max_new_tokens=16, eos_token_id=-1,
        cache_dtype=jnp.float32, chunk=8)
    spec = generation.generate_spec(
        params, cfg, ids, pix, max_new_tokens=16, eos_token_id=-1,
        cache_dtype=jnp.float32, chunk=8, k=4, n=3,
        do_sample=True, temperature=1e-6, top_p=0.9,
        key=jax.random.PRNGKey(3))
    assert spec == base


def test_spec_sampled_distribution_parity(setup):
    """Monte-Carlo: the sampled speculative stream's per-position marginals
    match plain sampling's (the delta-draft speculative-sampling identity).
    Loose tolerance — this guards against gross acceptance bias, not noise."""
    import collections

    params, cfg, mk = setup
    ids, pix = mk(7)
    n_runs, max_new = 220, 3
    counters = {
        "plain": [collections.Counter() for _ in range(max_new)],
        "spec": [collections.Counter() for _ in range(max_new)],
    }
    for s in range(n_runs):
        plain = generation.generate_chunked(
            params, cfg, ids, pix, max_new_tokens=max_new, eos_token_id=-1,
            cache_dtype=jnp.float32, chunk=4, do_sample=True,
            temperature=0.8, top_p=0.8, key=jax.random.PRNGKey(1000 + s))
        spec = generation.generate_spec(
            params, cfg, ids, pix, max_new_tokens=max_new, eos_token_id=-1,
            cache_dtype=jnp.float32, chunk=4, k=3, n=2, do_sample=True,
            temperature=0.8, top_p=0.8, key=jax.random.PRNGKey(5000 + s))
        for pos in range(max_new):
            if pos < len(plain):
                counters["plain"][pos][plain[pos]] += 1
            if pos < len(spec):
                counters["spec"][pos][spec[pos]] += 1

    for pos in range(max_new):
        p, q = counters["plain"][pos], counters["spec"][pos]
        # Full-support L1 is statistically useless on a long-tailed law at
        # this sample size (two same-law draws measure ~sqrt(K/n) ~= 0.8);
        # compare only the top tokens, where per-token binomial noise is
        # ~0.02-0.03 at n=220 — an acceptance bias concentrates exactly
        # there (accepted drafts are high-probability tokens).
        top = [t for t, _ in (p + q).most_common(8)]
        l1_top = sum(abs(p[t] / n_runs - q[t] / n_runs) for t in top)
        assert l1_top < 0.30, (pos, l1_top, p.most_common(5), q.most_common(5))


def test_spec_accepts_on_repetitive_text(setup):
    """A prompt whose tail repeats an earlier n-gram must give >1
    tokens/verify when the model itself continues the repetition — at
    minimum the machinery reports acceptance rates correctly."""
    params, cfg, mk = setup
    n_img = cfg.vision_config.num_image_tokens
    pattern = [11, 12, 13, 14, 15, 11, 12, 13, 14, 15, 11, 12]
    ids = jnp.asarray(
        [[cfg.image_token_index] * n_img + pattern], jnp.int32)
    _, pix = mk(5)
    base = generation.generate_chunked(
        params, cfg, ids, pix, max_new_tokens=16, eos_token_id=-1,
        cache_dtype=jnp.float32, chunk=8)
    stats = {}
    spec = generation.generate_spec(
        params, cfg, ids, pix, max_new_tokens=16, eos_token_id=-1,
        cache_dtype=jnp.float32, chunk=8, k=6, n=3, stats=stats)
    assert spec == base
    assert stats["produced"] >= 16


# ---------------------------------------------------------------------------
# longest-match (variable-context prompt-lookup) drafter
# ---------------------------------------------------------------------------


def test_longest_match_reduces_to_ngram():
    """With n_max = min_match = n-1 the longest-match drafter IS the fixed
    n-gram drafter (same match set, same recency tie-break) — the formal
    link between the two proposal rules."""
    rng = np.random.RandomState(11)
    k, n = 6, 3
    for seed in range(8):
        r = np.random.RandomState(seed)
        L = 48
        row = jnp.asarray(r.randint(3, 9, size=(L,)), jnp.int32)  # repetitive
        for bl in (8, 17, 30, L):
            buf_len = jnp.asarray(bl, jnp.int32)
            token = row[bl - 1]
            a = generation._ngram_propose_row(row, buf_len, token, k, n)
            b = generation._longest_match_propose_row(
                row, buf_len, token, k, n_max=n - 1, min_match=n - 1)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_longest_match_prefers_longer_context():
    """Where the fixed bigram drafter keys on the most RECENT 2-token match,
    the longest-match drafter picks the earlier occurrence with the longer
    matched context — the acceptance-lifting behavior on structured text."""
    #        0  1  2  3  4  5  6  7  8  9 10 11 12 13 14
    row = jnp.asarray([1, 2, 3, 4, 5, 9, 9, 6, 4, 5, 7, 7, 3, 4, 5], jnp.int32)
    buf_len = jnp.asarray(15, jnp.int32)
    k = 4
    ng = generation._ngram_propose_row(row, buf_len, row[14], k, n=3)
    lm = generation._longest_match_propose_row(row, buf_len, row[14], k)
    # bigram (4,5): most recent earlier occurrence ends at 9 -> proposes 7,7,3
    np.testing.assert_array_equal(np.asarray(ng), [7, 7, 3])
    # longest match: (3,4,5) at 2..4 (run 3) beats (4,5) at 8..9 (run 2)
    np.testing.assert_array_equal(np.asarray(lm), [9, 9, 6])


def test_longest_match_fallback_no_context():
    """No match at all -> repeated-token fallback (same contract as ngram)."""
    row = jnp.zeros((32,), jnp.int32)
    row = row.at[:6].set(jnp.asarray([3, 4, 5, 6, 7, 8]))
    out = generation._longest_match_propose_row(
        row, jnp.asarray(6, jnp.int32), jnp.asarray(8, jnp.int32), 5)
    # every token unique -> only the trivial 0-length context matches are
    # excluded by min_match=1... the last token 8 never occurred before, so
    # no candidate start has run >= 1 except via clipped-window artifacts.
    assert out.shape == (4,)
    np.testing.assert_array_equal(np.asarray(out), [8, 8, 8, 8])


@pytest.mark.parametrize("k", [4, 8])
def test_generate_spec_longest_identical_to_greedy(setup, k):
    """Exactness is drafter-independent: the longest-match speculative
    stream IS the greedy stream (the verify rule rejects bad drafts)."""
    params, cfg, mk = setup
    for seed in (1, 5):
        ids, pix = mk(seed)
        base = generation.generate_chunked(
            params, cfg, ids, pix, max_new_tokens=24, eos_token_id=-1,
            cache_dtype=jnp.float32, chunk=8)
        stats = {}
        spec = generation.generate_spec(
            params, cfg, ids, pix, max_new_tokens=24, eos_token_id=-1,
            cache_dtype=jnp.float32, chunk=8, k=k, n=3, stats=stats,
            drafter="longest")
        assert spec == base, (seed, k, spec, base)
        assert stats["tokens_per_verify"] >= 1.0
