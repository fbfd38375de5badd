"""Batched VQA serving: padded-batch decode must match batch-1 generation."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from paligemma_tpu import generation, serving
from paligemma_tpu.config import tiny_config
from paligemma_tpu.models import paligemma
from paligemma_tpu.processing import ByteTokenizer, PaliGemmaProcessor


@pytest.fixture(scope="module")
def setup():
    cfg0 = tiny_config()
    tok = ByteTokenizer()
    proc = PaliGemmaProcessor(
        tok, cfg0.vision_config.num_image_tokens, cfg0.vision_config.image_size
    )
    cfg = dataclasses.replace(
        cfg0,
        image_token_index=proc.image_token_id,
        vocab_size=max(cfg0.vocab_size, tok.vocab_size + 1200),
    )
    params = paligemma.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    rng = np.random.RandomState(0)
    images = [
        Image.fromarray(rng.randint(0, 255, (40, 40, 3), np.uint8)) for _ in range(8)
    ]
    prompts = [f"describe item {i} please" + " extra" * (i % 3) for i in range(8)]
    return params, cfg, proc, prompts, images


def test_pad_batch_shapes(setup):
    params, cfg, proc, prompts, images = setup
    ids, valid, pix, real_b = serving.pad_batch(proc, prompts, images)
    assert real_b == 8
    assert ids.shape[0] == 8 and pix.shape == (8, 3, 32, 32)
    assert valid.max() == ids.shape[1]
    # rows are right-padded with zeros
    for i in range(8):
        assert np.all(ids[i, valid[i]:] == 0)


def test_batched_matches_single(setup):
    """Each row of an 8-way ragged batch must produce the same greedy tokens
    as running that sample alone at batch 1."""
    params, cfg, proc, prompts, images = setup
    n = 6
    batched = serving.batch_generate(
        params, cfg, proc, prompts, images,
        max_new_tokens=n, cache_dtype=jnp.float32, eos_token_id=-1,
    )
    for i in range(8):
        out = proc(text=[prompts[i]], images=[images[i]])
        toks, _ = generation.generate(
            params, cfg,
            jnp.asarray(out["input_ids"]), jnp.asarray(out["pixel_values"]),
            max_new_tokens=n, eos_token_id=-1,
            cache_dtype=jnp.float32, stop_at_eos=False,
        )
        expect = proc.tokenizer.decode(toks, skip_special_tokens=True)
        assert batched[i] == expect, (i, batched[i], expect)


def test_batched_eos_truncation(setup):
    params, cfg, proc, prompts, images = setup
    outs = serving.batch_generate(
        params, cfg, proc, prompts[:2], images[:2],
        max_new_tokens=4, cache_dtype=jnp.float32,
        eos_token_id=None,  # byte tokenizer eos
    )
    assert len(outs) == 2


def test_batched_matches_single_with_pallas_flag(setup):
    """Regression: the Pallas decode kernel must NOT be used when the caller
    supplies a custom (non-contiguous) mask — batched serving rows with
    padding holes stay correct with the flag on."""
    from paligemma_tpu import runtime

    params, cfg, proc, prompts, images = setup
    try:
        runtime.set_pallas_attention(True)
        batched = serving.batch_generate(
            params, cfg, proc, prompts[:3], images[:3],
            max_new_tokens=4, cache_dtype=jnp.float32, eos_token_id=-1,
        )
    finally:
        runtime.set_pallas_attention(False)
    for i in range(3):
        out = proc(text=[prompts[i]], images=[images[i]])
        toks, _ = generation.generate(
            params, cfg,
            jnp.asarray(out["input_ids"]), jnp.asarray(out["pixel_values"]),
            max_new_tokens=4, eos_token_id=-1,
            cache_dtype=jnp.float32, stop_at_eos=False,
        )
        assert batched[i] == proc.tokenizer.decode(toks, skip_special_tokens=True)


def test_bucketing_does_not_change_outputs(setup):
    """prompt_bucket/batch_bucket padding (the server's shape hygiene) must
    not change any row's tokens."""
    params, cfg, proc, prompts, images = setup
    plain = serving.batch_generate(
        params, cfg, proc, prompts[:3], images[:3],
        max_new_tokens=5, cache_dtype=jnp.float32, eos_token_id=-1,
    )
    bucketed = serving.batch_generate(
        params, cfg, proc, prompts[:3], images[:3],
        max_new_tokens=5, cache_dtype=jnp.float32, eos_token_id=-1,
        prompt_bucket=64, batch_bucket=4,
    )
    assert plain == bucketed
    texts, tokens = serving.batch_generate(
        params, cfg, proc, prompts[:3], images[:3],
        max_new_tokens=5, cache_dtype=jnp.float32, eos_token_id=-1,
        prompt_bucket=64, batch_bucket=4, return_tokens=True,
    )
    assert texts == plain and len(tokens) == 3 and all(len(t) == 5 for t in tokens)
