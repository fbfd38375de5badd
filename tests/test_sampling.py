"""Sampling tests: greedy and top-p nucleus semantics.

Top-p parity with the reference algorithm (reference: inference.py:15-24) is
structural (same truncation set and renormalized distribution); the drawn
stream differs (torch.multinomial vs JAX PRNG), so validation is
distributional, as planned in SURVEY.md §7.
"""
import jax
import jax.numpy as jnp
import numpy as np

from paligemma_tpu.ops.sampling import greedy, sample_top_p, select_token


def test_greedy():
    logits = jnp.asarray([[0.1, 2.0, -1.0], [3.0, 0.0, 0.0]])
    assert greedy(logits).tolist() == [1, 0]


def test_top_p_truncates_tail():
    """With p=0.5 and probs [0.6, 0.3, 0.1], only token 0 survives
    (cumsum-before-token rule: token 1 has cumsum-prob 0.6 > 0.5)."""
    probs = np.array([0.6, 0.3, 0.1])
    logits = jnp.log(jnp.asarray(probs))[None, :]
    draws = [
        int(sample_top_p(logits, jax.random.PRNGKey(i), temperature=1.0, top_p=0.5)[0])
        for i in range(20)
    ]
    assert set(draws) == {0}


def test_top_p_keeps_nucleus():
    """p=0.8: tokens {0,1} kept (cum-before 0 is 0, before 1 is 0.6 <= 0.8;
    before 2 is 0.9 > 0.8 -> dropped), renormalized to [2/3, 1/3]."""
    probs = np.array([0.6, 0.3, 0.1])
    logits = jnp.log(jnp.asarray(probs))[None, :]
    n = 3000
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    draws = np.array(
        [int(sample_top_p(logits, k, temperature=1.0, top_p=0.8)[0]) for k in keys[:300]]
    )
    assert set(draws.tolist()) <= {0, 1}
    frac0 = np.mean(draws == 0)
    assert abs(frac0 - 2 / 3) < 0.1


def test_temperature_sharpens():
    logits = jnp.asarray([[1.0, 0.0, -1.0]])
    draws = [
        int(sample_top_p(logits, jax.random.PRNGKey(i), temperature=0.05, top_p=1.0)[0])
        for i in range(20)
    ]
    assert set(draws) == {0}


def test_select_token_greedy_when_not_sampling():
    logits = jnp.asarray([[0.0, 5.0, 1.0]])
    tok = select_token(logits, jax.random.PRNGKey(0), do_sample=False, temperature=0.8, top_p=0.9)
    assert int(tok[0]) == 1
    # temperature 0.0 -> greedy even with do_sample (benchmark convention)
    tok = select_token(logits, jax.random.PRNGKey(0), do_sample=True, temperature=0.0, top_p=0.9)
    assert int(tok[0]) == 1


def test_sampled_generation_reproducible():
    """Same PRNG key -> identical sampled stream; different keys diverge."""
    import jax
    from paligemma_tpu import generation
    from paligemma_tpu.config import tiny_config
    from paligemma_tpu.models import paligemma

    cfg = tiny_config()
    params = paligemma.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    n_img = cfg.vision_config.num_image_tokens
    ids = jnp.concatenate(
        [jnp.full((1, n_img), cfg.image_token_index, jnp.int32),
         jnp.ones((1, 5), jnp.int32) * 9], axis=1)
    pix = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 32, 32))

    kw = dict(max_new_tokens=8, eos_token_id=-1, do_sample=True,
              temperature=1.5, top_p=0.95, cache_dtype=jnp.float32,
              stop_at_eos=False)
    a, _ = generation.generate(params, cfg, ids, pix, key=jax.random.PRNGKey(7), **kw)
    b, _ = generation.generate(params, cfg, ids, pix, key=jax.random.PRNGKey(7), **kw)
    c, _ = generation.generate(params, cfg, ids, pix, key=jax.random.PRNGKey(8), **kw)
    assert a == b
    assert a != c  # overwhelmingly likely at temperature 1.5


def test_threshold_method_selects_same_nucleus():
    """Threshold nucleus == sorted-prefix nucleus on known distributions."""
    probs = np.array([0.6, 0.3, 0.08, 0.02])
    logits = jnp.log(jnp.asarray(probs))[None, :]
    for p, nucleus in [(0.5, {0}), (0.8, {0, 1}), (0.95, {0, 1, 2}), (1.0, {0, 1, 2, 3})]:
        draws = {
            int(sample_top_p(logits, jax.random.PRNGKey(i), 1.0, p, method="threshold")[0])
            for i in range(200)
        }
        assert draws <= nucleus, (p, draws)
        # most-probable token always reachable
        assert 0 in draws
