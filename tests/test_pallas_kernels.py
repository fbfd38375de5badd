"""Pallas kernels vs the canonical XLA ops (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paligemma_tpu.ops.attention import gqa_attention, length_mask, mha
from paligemma_tpu.ops.pallas_attention import decode_attention, flash_attention


@pytest.mark.parametrize("t,h,hkv,d", [(64, 4, 4, 32), (48, 4, 2, 32)])
def test_flash_attention_matches_xla(t, h, hkv, d):
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    b = 2
    q = jax.random.normal(kq, (b, t, h, d))
    k = jax.random.normal(kk, (b, t, hkv, d))
    v = jax.random.normal(kv, (b, t, hkv, d))
    ref = gqa_attention(q, k, v)
    out = flash_attention(q, k, v, block_q=16, block_k=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_attention_valid_len_masks_tail():
    key = jax.random.PRNGKey(1)
    b, t, h, d = 1, 32, 2, 16
    q = jax.random.normal(key, (b, t, h, d))
    k = jax.random.normal(jax.random.PRNGKey(2), (b, t, h, d))
    v = jax.random.normal(jax.random.PRNGKey(3), (b, t, h, d))
    valid = 20
    out = flash_attention(q, k, v, valid_len=valid, block_q=16, block_k=16)
    # XLA reference with additive mask over the tail
    mask = length_mask(valid, t, b)  # (B,1,1,1,S)
    ref = gqa_attention(q, k, v, mask=mask)
    np.testing.assert_allclose(
        np.asarray(out[:, :valid]), np.asarray(ref[:, :valid]), rtol=2e-5, atol=2e-5
    )
    # Garbage beyond valid must not influence the valid region
    k_poison = k.at[:, valid:].set(1e6)
    v_poison = v.at[:, valid:].set(1e6)
    out2 = flash_attention(q, k_poison, v_poison, valid_len=valid, block_q=16, block_k=16)
    np.testing.assert_allclose(
        np.asarray(out2[:, :valid]), np.asarray(out[:, :valid]), rtol=1e-6
    )


@pytest.mark.parametrize("hkv", [1, 2])
def test_decode_attention_matches_xla(hkv):
    b, h, d, s = 2, 4, 32, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (b, 1, h, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, s, hkv, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, s, hkv, d))
    valid = jnp.int32(37)
    mask = length_mask(valid, s, b)
    ref = gqa_attention(q, k, v, mask=mask)
    out = decode_attention(q, k, v, valid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_decode_attention_ignores_unwritten_slots():
    b, h, hkv, d, s = 1, 4, 2, 16, 32
    q = jax.random.normal(jax.random.PRNGKey(0), (b, 1, h, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, s, hkv, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, s, hkv, d))
    valid = jnp.int32(10)
    out1 = decode_attention(q, k, v, valid)
    out2 = decode_attention(
        q, k.at[:, 10:].set(1e9), v.at[:, 10:].set(1e9), valid
    )
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_full_model_pallas_path_matches_xla(params, cfg, sample_inputs):
    """End-to-end: prefill + decode with use_pallas_attention on == off."""
    import jax.numpy as jnp
    from paligemma_tpu import generation, runtime
    from paligemma_tpu.models import paligemma

    ids, pix = sample_inputs
    try:
        runtime.set_pallas_attention(False)
        cache = generation.make_cache(cfg, 1, ids.shape[1], 3, jnp.float32)
        lg_ref, cache_ref = paligemma.prefill(params, cfg, ids, pix, cache)
        tok = jnp.argmax(lg_ref[:, -1, :], -1).astype(jnp.int32)[:, None]
        d_ref, _ = paligemma.decode_step(params, cfg, tok, cache_ref)

        runtime.set_pallas_attention(True)
        cache = generation.make_cache(cfg, 1, ids.shape[1], 3, jnp.float32)
        lg_p, cache_p = paligemma.prefill(params, cfg, ids, pix, cache)
        d_p, _ = paligemma.decode_step(params, cfg, tok, cache_p)
    finally:
        runtime.set_pallas_attention(False)

    np.testing.assert_allclose(np.asarray(lg_p), np.asarray(lg_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_ref), rtol=2e-4, atol=2e-4)


def test_decode_attention_per_row_lengths_and_window():
    """LengthMask semantics in the kernel: row b sees [0, valid[b]) plus the
    shared [gen_start, gen_end) window — batched serving's layout — and must
    match the dense-mask XLA path exactly."""
    from paligemma_tpu.ops.attention import LengthMask

    b, h, hkv, d, s = 3, 4, 2, 16, 48
    q = jax.random.normal(jax.random.PRNGKey(0), (b, 1, h, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, s, hkv, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, s, hkv, d))
    lm = LengthMask(
        valid=jnp.asarray([7, 12, 3], jnp.int32),
        gen_start=jnp.int32(20),
        gen_end=jnp.int32(25),
    )
    ref = gqa_attention(q, k, v, mask=lm.materialize(s))
    out = decode_attention(
        q, k, v, lm.valid, gen_start=lm.gen_start, gen_end=lm.gen_end
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
    # The pad hole [valid_b, 20) must be fully masked: poisoning it is a no-op.
    k_p = k.at[:, 15:20].set(1e9)
    v_p = v.at[:, 15:20].set(1e9)
    out2 = decode_attention(
        q, k_p, v_p, lm.valid, gen_start=lm.gen_start, gen_end=lm.gen_end
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_flash_attention_per_row_lengths():
    b, t, h, d = 3, 32, 2, 16
    q = jax.random.normal(jax.random.PRNGKey(1), (b, t, h, d))
    k = jax.random.normal(jax.random.PRNGKey(2), (b, t, h, d))
    v = jax.random.normal(jax.random.PRNGKey(3), (b, t, h, d))
    valid = jnp.asarray([20, 32, 5], jnp.int32)
    out = flash_attention(q, k, v, valid_len=valid, block_q=16, block_k=16)
    ref = gqa_attention(q, k, v, mask=length_mask(valid, t, b))
    for i in range(b):
        vl = int(valid[i])
        np.testing.assert_allclose(
            np.asarray(out[i, :vl]), np.asarray(ref[i, :vl]), rtol=2e-5, atol=2e-5
        )


def test_batched_serving_pallas_matches_xla(params, cfg):
    """The batched serving path (per-row prompts + shared generated window)
    must produce identical tokens with the Pallas kernels on and off."""
    from paligemma_tpu import runtime, serving
    from paligemma_tpu.processing import ByteTokenizer, PaliGemmaProcessor, align_config
    from PIL import Image

    tok = ByteTokenizer()
    proc = PaliGemmaProcessor(
        tok, cfg.vision_config.num_image_tokens, cfg.vision_config.image_size
    )
    acfg = align_config(cfg, proc)
    from paligemma_tpu.models import paligemma as _pg

    # The params fixture was built for the unaligned cfg; rebuild for acfg.
    aparams = _pg.init_params(acfg, jax.random.PRNGKey(0), jnp.float32)

    rng = np.random.RandomState(0)
    images = [Image.fromarray(rng.randint(0, 255, (24, 24, 3), np.uint8))
              for _ in range(3)]
    prompts = ["a", "longer prompt here", "mid one"]

    def run():
        jax.clear_caches()
        return serving.batch_generate(
            aparams, acfg, proc, prompts, images, max_new_tokens=6,
            cache_dtype=jnp.float32, return_tokens=True,
        )[1]

    try:
        runtime.set_pallas_attention(False)
        ref_tokens = run()
        runtime.set_pallas_attention(True)
        pallas_tokens = run()
    finally:
        runtime.set_pallas_attention(False)
        jax.clear_caches()
    assert pallas_tokens == ref_tokens


def test_auto_flash_long_seq_logit_parity(params, cfg):
    """The auto-flash route (seq >= runtime.auto_flash_min_seq reroutes
    prefill through the Pallas flash kernel even with use_pallas_attention
    off) must hold the 1e-3 LOGIT bar at a genuinely long sequence — the
    896-res path's fidelity previously rested only on short-sequence kernel
    tests (ADVICE r3). Runs the decoder trunk + lm_head over 2048 tokens
    with the XLA path vs the flash route."""
    import jax

    from paligemma_tpu import runtime
    from paligemma_tpu.models import gemma

    tc = cfg.text_config
    ids = jax.random.randint(jax.random.PRNGKey(11), (1, 2048), 0, 200)
    embeds = gemma.embed_tokens(params["llm"], ids)
    positions = jnp.arange(2048, dtype=jnp.int32)[None, :]

    def trunk():
        h, _ = gemma.forward(params["llm"], tc, embeds, positions)
        return np.asarray(gemma.logits(params["llm"], h))

    old = runtime.auto_flash_min_seq
    try:
        runtime.set_auto_flash_min_seq(0)  # plain XLA attention
        jax.clear_caches()
        ref = trunk()
        runtime.set_auto_flash_min_seq(2048)  # flash auto-route engages
        jax.clear_caches()
        got = trunk()
    finally:
        runtime.set_auto_flash_min_seq(old)
        jax.clear_caches()
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-3)
