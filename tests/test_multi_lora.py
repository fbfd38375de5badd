"""Multi-tenant LoRA serving: per-slot adapters in the continuous engine.

Invariants pinned here:
- gemma.forward with per-row adapters == per-request forwards with the
  corresponding shared adapter (row independence of the batched einsum).
- A request with no adapter in a lora-enabled engine decodes token-identical
  to the base engine (zero adapters are exact no-ops).
- Two requests with DIFFERENT adapters decoding concurrently each match the
  same request run alone (adapter isolation across slots).
- Rank padding: a rank-r adapter served at engine rank R > r is exact.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from paligemma_tpu import generation
from paligemma_tpu.config import tiny_config
from paligemma_tpu.continuous import ContinuousBatcher
from paligemma_tpu.lora import LoraConfig, init_lora
from paligemma_tpu.models import gemma, paligemma
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
    rng = np.random.RandomState(3)
    images = [
        Image.fromarray(rng.randint(0, 255, (24, 20, 3), np.uint8))
        for _ in range(3)
    ]
    prompts = ["alpha", "beta prompt", "gamma"]
    return params, cfg, proc, prompts, images


def random_adapter(cfg, r, seed, scale_b=0.5):
    """A LoRA adapter with NON-zero B (so it actually changes logits)."""
    lcfg = LoraConfig(r=r, alpha=2 * r, dropout=0.0)
    ad = init_lora(cfg, lcfg, jax.random.PRNGKey(seed))
    key = jax.random.PRNGKey(seed + 100)
    layers = {}
    for i, (name, mod) in enumerate(ad["layers"].items()):
        k = jax.random.fold_in(key, i)
        layers[name] = {
            "a": mod["a"],
            "b": jax.random.normal(k, mod["b"].shape, jnp.float32) * scale_b,
        }
    return {"layers": layers}, lcfg


def test_per_row_forward_matches_shared(setup):
    """forward with per-row adapters [X, zeros] == [forward(X), forward(None)]."""
    params, cfg, proc, prompts, images = setup
    tc = cfg.text_config
    ad, lcfg = random_adapter(cfg, r=2, seed=7)
    layers = ad["layers"]

    d = tc.hidden_size
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, d), jnp.float32) * 0.1
    pos = jnp.broadcast_to(jnp.arange(3, dtype=jnp.int32)[None], (2, 3))

    # Per-row tree: row 0 carries X (scale folded into b), row 1 zeros.
    def stack_rows(leaf_x):
        zeros = jnp.zeros_like(leaf_x)
        return jnp.stack([leaf_x, zeros], axis=1)  # (L, 2, ...)

    per_row = {
        name: {
            "a": stack_rows(mod["a"]),
            "b": stack_rows(mod["b"] * lcfg.scale),
        }
        for name, mod in layers.items()
    }
    h_rows, _ = gemma.forward(params["llm"], tc, x, pos, lora=per_row)

    h_x, _ = gemma.forward(
        params["llm"], tc, x[:1], pos[:1], lora=ad, lora_scale=lcfg.scale
    )
    h_none, _ = gemma.forward(params["llm"], tc, x[1:], pos[1:])

    np.testing.assert_allclose(h_rows[0], h_x[0], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(h_rows[1], h_none[0], rtol=2e-5, atol=2e-5)


def engine_tokens(params, cfg, proc, reqs, n_slots=2, lora_rank=None,
                  adapters=(), max_new=6):
    eng = ContinuousBatcher(
        params, cfg, proc, n_slots=n_slots, max_new_tokens=max_new, chunk=2,
        cache_dtype=jnp.float32, lora_rank=lora_rank,
    )
    for name, ad, scale in adapters:
        eng.register_adapter(name, ad, scale)
    out = [eng.submit(p, im, adapter=a) for p, im, a in reqs]
    eng.run()
    return [r.tokens for r in out]


def test_no_adapter_matches_base_engine(setup):
    params, cfg, proc, prompts, images = setup
    reqs = [(prompts[0], images[0], None)]
    base = engine_tokens(params, cfg, proc, [(prompts[0], images[0], None)])
    ad, lcfg = random_adapter(cfg, r=2, seed=11)
    withz = engine_tokens(
        params, cfg, proc, reqs, lora_rank=4,
        adapters=[("fin", ad, lcfg.scale)],
    )
    assert withz == base


def test_adapter_isolation_across_slots(setup):
    """adapter A next to adapter B == each alone; and != base tokens."""
    params, cfg, proc, prompts, images = setup
    ad1, l1 = random_adapter(cfg, r=2, seed=21, scale_b=0.8)
    ad2, l2 = random_adapter(cfg, r=3, seed=22, scale_b=0.8)
    adapters = [("a1", ad1, l1.scale), ("a2", ad2, l2.scale)]

    together = engine_tokens(
        params, cfg, proc,
        [(prompts[0], images[0], "a1"), (prompts[1], images[1], "a2")],
        n_slots=2, lora_rank=4, adapters=adapters,
    )
    alone1 = engine_tokens(
        params, cfg, proc, [(prompts[0], images[0], "a1")],
        n_slots=2, lora_rank=4, adapters=adapters,
    )
    alone2 = engine_tokens(
        params, cfg, proc, [(prompts[1], images[1], "a2")],
        n_slots=2, lora_rank=4, adapters=adapters,
    )
    assert together[0] == alone1[0]
    assert together[1] == alone2[0]

    base = engine_tokens(
        params, cfg, proc,
        [(prompts[0], images[0], None), (prompts[1], images[1], None)],
        n_slots=2, lora_rank=4, adapters=adapters,
    )
    # Strong random B's must actually steer decoding somewhere.
    assert together != base


def test_adapter_reuse_after_eviction(setup):
    """A slot serving adapter A then rejoining with NO adapter must not leak
    A's weights (the zero scatter overwrites them)."""
    params, cfg, proc, prompts, images = setup
    ad, lcfg = random_adapter(cfg, r=2, seed=31, scale_b=0.8)
    eng = ContinuousBatcher(
        params, cfg, proc, n_slots=1, max_new_tokens=5, chunk=2,
        cache_dtype=jnp.float32, lora_rank=2,
    )
    eng.register_adapter("fin", ad, lcfg.scale)
    r_ad = eng.submit(prompts[0], images[0], adapter="fin")
    r_base = eng.submit(prompts[1], images[1])  # reuses the same slot
    eng.run()
    expect = engine_tokens(params, cfg, proc, [(prompts[1], images[1], None)],
                           n_slots=1, max_new=5)
    assert r_base.tokens == expect[0]
    assert r_ad.done and len(r_ad.tokens) >= 1


def test_adapters_compose_with_int8_base(setup):
    """Multi-tenant adapters over an int8-quantized base (the production
    serving config): LoRA deltas apply to the projection OUTPUTS, so a
    QTensor qkv composes. The no-adapter request must match the plain int8
    engine; the adapted one must decode and differ from base."""
    from paligemma_tpu.quantization import quantize_params

    params, cfg, proc, prompts, images = setup
    qparams = quantize_params(params, llm_only=True)
    ad, lcfg = random_adapter(cfg, r=2, seed=51, scale_b=0.9)

    base = engine_tokens(qparams, cfg, proc, [(prompts[0], images[0], None)])
    together = engine_tokens(
        qparams, cfg, proc,
        [(prompts[0], images[0], None), (prompts[1], images[1], "fin")],
        n_slots=2, lora_rank=2, adapters=[("fin", ad, lcfg.scale)],
    )
    assert together[0] == base[0]
    assert len(together[1]) >= 1
    adapted_alone = engine_tokens(
        qparams, cfg, proc, [(prompts[1], images[1], "fin")],
        n_slots=2, lora_rank=2, adapters=[("fin", ad, lcfg.scale)],
    )
    assert together[1] == adapted_alone[0]
    # The delta must actually LAND on the int8 base — a silent no-op would
    # make the adapted stream equal the base stream for the same request.
    base_p1 = engine_tokens(qparams, cfg, proc, [(prompts[1], images[1], None)])
    assert together[1] != base_p1[0]


def test_unknown_adapter_rejected(setup):
    params, cfg, proc, prompts, images = setup
    eng = ContinuousBatcher(
        params, cfg, proc, n_slots=1, max_new_tokens=4,
        cache_dtype=jnp.float32, lora_rank=2,
    )
    with pytest.raises(ValueError, match="unknown adapter"):
        eng.submit(prompts[0], images[0], adapter="nope")
    with pytest.raises(ValueError, match="exceeds the engine budget"):
        eng.submit(prompts[0], images[0], max_new_tokens=99)


def test_rank_guard_and_padding(setup):
    params, cfg, proc, prompts, images = setup
    ad_big, l_big = random_adapter(cfg, r=8, seed=41)
    eng = ContinuousBatcher(
        params, cfg, proc, n_slots=1, max_new_tokens=4,
        cache_dtype=jnp.float32, lora_rank=4,
    )
    with pytest.raises(ValueError, match="exceeds engine lora_rank"):
        eng.register_adapter("big", ad_big, l_big.scale)
    eng_none = ContinuousBatcher(
        params, cfg, proc, n_slots=1, max_new_tokens=4,
        cache_dtype=jnp.float32,
    )
    with pytest.raises(ValueError, match="without lora_rank"):
        eng_none.register_adapter("x", ad_big, 1.0)
