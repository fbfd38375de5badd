"""Core model invariants: cache mechanics, scan-vs-loop identity, merge parity.

These encode the reference's de-facto integration test — cached-vs-uncached
consistency (reference: ablation_study_fixed.py:427-440) — plus the exact
cache-correctness oracle: a slow concat-based decode loop mirroring the
reference's ``KVCache.update`` semantics (modeling_gemma.py:10-36).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paligemma_tpu import generation
from paligemma_tpu.models import gemma, paligemma
from paligemma_tpu.ops.rope import apply_rope, rope_cos_sin
from paligemma_tpu.ops.attention import gqa_attention


def reference_decode_concat(params, cfg, embeds_list, positions_list):
    """Slow oracle: concat-based KV cache exactly like the reference
    (modeling_gemma.py:10-36): each step feeds one token, K/V are concatenated,
    attention spans all cached positions with a zero mask.

    embeds_list: list of (B, 1, D) per-step embeddings (already merged).
    Returns final-step hidden states (B, 1, D).
    """
    tcfg = cfg.text_config
    lp = params["llm"]["layers"]
    n_layers = tcfg.num_hidden_layers
    caches = [{"k": None, "v": None} for _ in range(n_layers)]

    h_out = None
    for embeds, positions in zip(embeds_list, positions_list):
        h = embeds * jnp.asarray(tcfg.hidden_size**0.5, embeds.dtype)
        cos, sin = rope_cos_sin(
            positions, tcfg.head_dim, tcfg.rope_theta,
            tcfg.max_position_embeddings, h.dtype,
        )
        for i in range(n_layers):
            layer = jax.tree.map(lambda x: x[i], lp)
            residual = h
            from paligemma_tpu.ops.norms import rms_norm

            x = rms_norm(h, layer["input_ln"], tcfg.rms_norm_eps)
            b, t, _ = x.shape
            nh, hkv, hd = (
                tcfg.num_attention_heads,
                tcfg.num_key_value_heads,
                tcfg.head_dim,
            )
            # Oracle deliberately uses SEPARATE matmuls over slices of the
            # fused qkv kernel — proving the production fused GEMM + split
            # matches the unfused formulation.
            wq = layer["qkv"][:, : nh * hd]
            wk = layer["qkv"][:, nh * hd : (nh + hkv) * hd]
            wv = layer["qkv"][:, (nh + hkv) * hd :]
            q = (x @ wq).reshape(b, t, nh, hd)
            k = (x @ wk).reshape(b, t, hkv, hd)
            v = (x @ wv).reshape(b, t, hkv, hd)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            if caches[i]["k"] is None:
                caches[i]["k"], caches[i]["v"] = k, v
            else:
                caches[i]["k"] = jnp.concatenate([caches[i]["k"], k], axis=1)
                caches[i]["v"] = jnp.concatenate([caches[i]["v"], v], axis=1)
            attn = gqa_attention(
                q, caches[i]["k"], caches[i]["v"], mask=None, scale=hd**-0.5
            )
            h = residual + attn.reshape(b, t, nh * hd) @ layer["o"]
            residual = h
            x = rms_norm(h, layer["post_ln"], tcfg.rms_norm_eps)
            inter = layer["gate_up"].shape[-1] // 2
            wgate = layer["gate_up"][:, :inter]
            wup = layer["gate_up"][:, inter:]
            act = jax.nn.gelu((x @ wgate).astype(jnp.float32), approximate=True)
            h = residual + (act.astype(x.dtype) * (x @ wup)) @ layer["down"]
        h_out = rms_norm(h, params["llm"]["final_norm"], tcfg.rms_norm_eps)
    return h_out


class TestKVCache:
    def test_prefill_matches_nocache_forward(self, params, cfg, sample_inputs):
        """Prefill through the cache machinery == plain full forward."""
        ids, pix = sample_inputs
        cache = generation.make_cache(cfg, 1, ids.shape[1], 4, jnp.float32)
        logits_cached, new_cache = paligemma.prefill(params, cfg, ids, pix, cache)
        logits_plain = paligemma.forward_nocache(params, cfg, ids, pix)
        np.testing.assert_allclose(
            np.asarray(logits_cached), np.asarray(logits_plain), rtol=1e-5, atol=1e-5
        )
        assert int(new_cache.length) == ids.shape[1]

    def test_decode_matches_concat_oracle(self, params, cfg, sample_inputs):
        """Preallocated-cache decode == reference-style concat cache decode."""
        ids, pix = sample_inputs
        t = ids.shape[1]
        n_steps = 3
        cache = generation.make_cache(cfg, 1, t, n_steps, jnp.float32)
        logits, cache = paligemma.prefill(params, cfg, ids, pix, cache)
        tok = jnp.argmax(logits[:, -1, :], -1).astype(jnp.int32)

        # Oracle: prefill step then single-token steps with concat cache.
        img = paligemma.encode_image(params, cfg, pix)
        embeds0 = paligemma.merge_prefix(params, cfg, ids, img)
        pos0 = jnp.arange(t, dtype=jnp.int32)[None, :]
        embeds_list = [embeds0]
        positions_list = [pos0]

        toks = [tok]
        for step in range(n_steps):
            lg, cache = paligemma.decode_step(params, cfg, toks[-1][:, None], cache)

            embeds_list.append(gemma.embed_tokens(params["llm"], toks[-1][:, None]))
            positions_list.append(jnp.asarray([[t + step]], jnp.int32))
            h_ref = reference_decode_concat(params, cfg, embeds_list, positions_list)
            lg_ref = gemma.logits(params["llm"], h_ref)
            np.testing.assert_allclose(
                np.asarray(lg[:, -1]), np.asarray(lg_ref[:, -1]), rtol=2e-5, atol=2e-5
            )
            toks.append(jnp.argmax(lg[:, -1, :], -1).astype(jnp.int32))

    def test_cache_slots_beyond_length_are_masked(self, params, cfg, sample_inputs):
        """Garbage in unwritten cache slots must not affect decode logits."""
        ids, pix = sample_inputs
        t = ids.shape[1]
        cache = generation.make_cache(cfg, 1, t, 8, jnp.float32)
        logits, cache = paligemma.prefill(params, cfg, ids, pix, cache)
        tok = jnp.argmax(logits[:, -1, :], -1).astype(jnp.int32)[:, None]

        lg1, _ = paligemma.decode_step(params, cfg, tok, cache)
        poisoned = cache._replace(
            k=cache.k.at[:, :, t + 1 :].set(1e9),
            v=cache.v.at[:, :, t + 1 :].set(1e9),
        )
        lg2, _ = paligemma.decode_step(params, cfg, tok, poisoned)
        np.testing.assert_array_equal(np.asarray(lg1), np.asarray(lg2))


class TestGeneration:
    def test_scan_matches_python_loop_greedy(self, params, cfg, sample_inputs):
        ids, pix = sample_inputs
        toks, _ = generation.generate(
            params, cfg, ids, pix, 6, eos_token_id=-1,
            cache_dtype=jnp.float32, stop_at_eos=False,
        )
        cache = generation.make_cache(cfg, 1, ids.shape[1], 6, jnp.float32)
        res = generation.generate_scan(
            params, cfg, ids, pix, cache, jax.random.PRNGKey(0), 6, eos_token_id=-1
        )
        assert toks == res.tokens[0].tolist()

    def test_eos_early_exit(self, params, cfg, sample_inputs):
        ids, pix = sample_inputs
        toks, _ = generation.generate(
            params, cfg, ids, pix, 6, eos_token_id=-1,
            cache_dtype=jnp.float32, stop_at_eos=False,
        )
        eos = toks[0]
        toks_stop, _ = generation.generate(
            params, cfg, ids, pix, 6, eos_token_id=eos, cache_dtype=jnp.float32
        )
        assert toks_stop == toks[:1]
        cache = generation.make_cache(cfg, 1, ids.shape[1], 6, jnp.float32)
        res = generation.generate_scan(
            params, cfg, ids, pix, cache, jax.random.PRNGKey(0), 6, eos_token_id=eos
        )
        assert int(res.num_valid[0]) == 1
        assert res.tokens[0, 0].tolist() == toks[0]

    def test_first_token_cached_vs_uncached_identity(self, params, cfg, sample_inputs):
        """The reference's cached-vs-uncached correctness check
        (ablation_study_fixed.py:427-440): the first generated token is
        guaranteed identical; later tokens may diverge (bidirectional
        recompute changes earlier KVs), which the reference logs, not asserts.
        """
        ids, pix = sample_inputs
        cache = generation.make_cache(cfg, 1, ids.shape[1], 1, jnp.float32)
        logits_c, _ = paligemma.prefill(params, cfg, ids, pix, cache)
        logits_u = paligemma.forward_nocache(params, cfg, ids, pix)
        assert int(jnp.argmax(logits_c[0, -1])) == int(jnp.argmax(logits_u[0, -1]))


class TestMerge:
    def test_prefix_merge_equals_general_merge(self, params, cfg, sample_inputs):
        ids, pix = sample_inputs
        img = paligemma.encode_image(params, cfg, pix)
        a = paligemma.merge_prefix(params, cfg, ids, img)
        b = paligemma.merge_general(params, cfg, ids, img)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)

    def test_image_scaling_cancels_embed_scaling(self, params, cfg, sample_inputs):
        """Image features are pre-divided by sqrt(hidden)
        (reference: modeling_gemma.py:481) so after the decoder's sqrt(hidden)
        scaling they re-enter at their native magnitude."""
        ids, pix = sample_inputs
        img = paligemma.encode_image(params, cfg, pix)
        merged = paligemma.merge_prefix(params, cfg, ids, img)
        scaled = merged * jnp.asarray(cfg.hidden_size**0.5, merged.dtype)
        n_img = cfg.vision_config.num_image_tokens
        raw_proj = img * jnp.asarray(cfg.hidden_size**0.5, img.dtype)
        np.testing.assert_allclose(
            np.asarray(scaled[:, :n_img]), np.asarray(raw_proj), rtol=1e-5, atol=1e-5
        )


class TestLoss:
    def test_loss_matches_manual_ce(self, params, cfg, sample_inputs):
        ids, pix = sample_inputs
        labels = ids.at[:, : cfg.vision_config.num_image_tokens].set(cfg.ignore_index)
        loss = paligemma.loss_fn(params, cfg, ids, pix, labels)
        logits = paligemma.forward_nocache(params, cfg, ids, pix)
        lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
        lab = np.asarray(labels[:, 1:])
        total, count = 0.0, 0
        for b in range(lab.shape[0]):
            for t in range(lab.shape[1]):
                if lab[b, t] != cfg.ignore_index:
                    total -= float(lp[b, t, lab[b, t]])
                    count += 1
        np.testing.assert_allclose(float(loss), total / count, rtol=1e-5)


class TestChunkedGeneration:
    def test_chunked_matches_loop_greedy(self, params, cfg, sample_inputs):
        ids, pix = sample_inputs
        loop, _ = generation.generate(
            params, cfg, ids, pix, 10, eos_token_id=-1,
            cache_dtype=jnp.float32, stop_at_eos=False,
        )
        chunked = generation.generate_chunked(
            params, cfg, ids, pix, 10, eos_token_id=-1,
            cache_dtype=jnp.float32, chunk=4,
        )
        assert chunked == loop

    def test_chunked_eos_trim(self, params, cfg, sample_inputs):
        ids, pix = sample_inputs
        loop, _ = generation.generate(
            params, cfg, ids, pix, 10, eos_token_id=-1,
            cache_dtype=jnp.float32, stop_at_eos=False,
        )
        eos = loop[0]
        chunked = generation.generate_chunked(
            params, cfg, ids, pix, 10, eos_token_id=eos,
            cache_dtype=jnp.float32, chunk=4,
        )
        assert chunked == [eos]


class TestReferenceForwardAPI:
    def test_forward_dict_contract(self, params, cfg, sample_inputs):
        """Reference-shaped forward: prefill -> decode via the kv_cache dict
        protocol (reference: modeling_gemma.py:539-617, inference.py:55-78)."""
        ids, pix = sample_inputs
        mask = jnp.ones_like(ids)
        cache = generation.make_cache(cfg, 1, ids.shape[1], 4, jnp.float32)
        out = paligemma.forward(params, cfg, ids, pix, mask, kv_cache=cache)
        assert set(out) == {"logits", "kv_cache"}
        ref, _ = paligemma.prefill(
            params, cfg, ids, pix,
            generation.make_cache(cfg, 1, ids.shape[1], 4, jnp.float32),
        )
        np.testing.assert_array_equal(np.asarray(out["logits"]), np.asarray(ref))

        tok = jnp.argmax(out["logits"][:, -1:, :], -1).astype(jnp.int32)
        out2 = paligemma.forward(params, cfg, tok, kv_cache=out["kv_cache"])
        assert out2["logits"].shape[1] == 1
        assert int(out2["kv_cache"].length) == ids.shape[1] + 1

    def test_forward_loss_and_padding_assert(self, params, cfg, sample_inputs):
        ids, pix = sample_inputs
        out = paligemma.forward(params, cfg, ids, pix, labels=ids)
        assert "loss" in out and np.isfinite(float(out["loss"]))
        padded_mask = jnp.ones_like(ids).at[0, -1].set(0)
        with pytest.raises(AssertionError, match="cannot be padded"):
            paligemma.forward(params, cfg, ids, pix, padded_mask)

    def test_merge_lora_rejects_quantized(self, params, cfg):
        from paligemma_tpu import lora as lora_lib
        from paligemma_tpu.quantization import quantize_params

        lcfg = lora_lib.LoraConfig(r=2, alpha=4)
        adapter = lora_lib.init_lora(cfg, lcfg, jax.random.PRNGKey(0))
        qp = quantize_params(params, llm_only=True)
        with pytest.raises(TypeError, match="unquantized"):
            lora_lib.merge_lora(qp, adapter, lcfg)


def test_higher_resolution_variants_geometry():
    """448/896 variants differ from 224 only in image_size and the derived
    image-token count ((size/14)^2) — the whole pipeline is geometry-generic,
    proven by a tiny-scale forward at a larger patch grid."""
    import dataclasses

    from paligemma_tpu.config import (
        paligemma_3b_pt_224,
        paligemma_3b_pt_448,
        paligemma_3b_pt_896,
        tiny_config,
    )

    c224, c448, c896 = paligemma_3b_pt_224(), paligemma_3b_pt_448(), paligemma_3b_pt_896()
    assert (c448.vision_config.image_size, c448.vision_config.num_image_tokens) == (448, 1024)
    assert (c896.vision_config.image_size, c896.vision_config.num_image_tokens) == (896, 4096)
    for c in (c448, c896):
        assert c.text_config == c224.text_config
        assert c.vision_config.hidden_size == c224.vision_config.hidden_size

    # Tiny-scale analog of the 448 step-up: double the image size, 4x tokens.
    base = tiny_config()
    up = dataclasses.replace(
        base,
        vision_config=dataclasses.replace(
            base.vision_config,
            image_size=base.vision_config.image_size * 2,
            num_image_tokens=base.vision_config.num_image_tokens * 4,
        ),
    )
    params = paligemma.init_params(up, jax.random.PRNGKey(0), jnp.float32)
    n_img = up.vision_config.num_image_tokens
    ids = jnp.concatenate(
        [jnp.full((1, n_img), up.image_token_index, jnp.int32),
         jnp.full((1, 4), 7, jnp.int32)], axis=1,
    )
    size = up.vision_config.image_size
    pix = jax.random.normal(jax.random.PRNGKey(1), (1, 3, size, size))
    logits = paligemma.forward_nocache(params, up, ids, pix)
    assert logits.shape == (1, n_img + 4, up.text_config.vocab_size)
    assert bool(jnp.all(jnp.isfinite(logits)))
