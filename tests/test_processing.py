"""Processor tests: prompt templating, image pipeline, tokenizer protocol.

Mirrors the reference processor behavior (reference: processing_paligemma.py):
template ``<image>*N + BOS + prompt + \\n``, bicubic resize -> /255 ->
(x-0.5)/0.5 -> CHW, and registered special tokens.
"""
import numpy as np
import pytest

from paligemma_tpu.processing import (
    ByteTokenizer,
    PaliGemmaProcessor,
    add_image_tokens_to_prompt,
    preprocess_jit,
    process_images,
)

PIL = pytest.importorskip("PIL")
from PIL import Image


@pytest.fixture
def processor():
    return PaliGemmaProcessor(ByteTokenizer(), num_image_tokens=4, image_size=16)


def random_image(w=20, h=12, seed=0):
    rng = np.random.RandomState(seed)
    return Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8))


def test_prompt_template():
    s = add_image_tokens_to_prompt("hello", "<bos>", 3, "<image>")
    assert s == "<image><image><image><bos>hello\n"


def test_processor_output_shapes(processor):
    out = processor(text=["describe"], images=[random_image()])
    assert out["pixel_values"].shape == (1, 3, 16, 16)
    assert out["input_ids"].shape[0] == 1
    assert np.all(out["attention_mask"] == 1)
    # image tokens are a fixed-length prefix
    img_id = processor.image_token_id
    assert out["input_ids"][0, :4].tolist() == [img_id] * 4
    assert out["input_ids"][0, 4] == processor.tokenizer.bos_token_id
    # ends with "\n" byte
    assert out["input_ids"][0, -1] == ord("\n")


def test_image_pipeline_values(processor):
    img = random_image()
    out = processor(text=["x"], images=[img])
    # reference pipeline recomputed by hand
    resized = np.array(img.resize((16, 16), resample=Image.Resampling.BICUBIC))
    expected = ((resized / 255.0).astype(np.float32) - 0.5) / 0.5
    np.testing.assert_allclose(
        out["pixel_values"][0], expected.transpose(2, 0, 1), rtol=1e-6, atol=1e-6
    )
    assert out["pixel_values"].min() >= -1.0 - 1e-6
    assert out["pixel_values"].max() <= 1.0 + 1e-6


def test_special_tokens_registered():
    tok = ByteTokenizer()
    PaliGemmaProcessor(tok, num_image_tokens=2, image_size=8)
    # <image> + 1024 loc + 128 seg tokens (reference: processing_paligemma.py:63-71)
    assert tok.convert_tokens_to_ids("<image>") is not None
    assert tok.convert_tokens_to_ids("<loc0000>") != tok.convert_tokens_to_ids("<loc1023>")
    assert tok.convert_tokens_to_ids("<seg000>") != tok.convert_tokens_to_ids("<seg127>")
    assert tok.add_bos_token is False and tok.add_eos_token is False


def test_byte_tokenizer_roundtrip():
    tok = ByteTokenizer()
    tok.add_bos_token = False
    ids = tok(["hello world"])["input_ids"][0]
    assert tok.decode(ids, skip_special_tokens=True) == "hello world"


def test_preprocess_jit_close_to_host():
    """On-device bicubic differs from PIL bicubic only slightly."""
    img = random_image(32, 32, seed=3)
    host = process_images([img], size=(16, 16))[0]
    dev = np.asarray(preprocess_jit(np.array(img)[None], 16, 16))[0]
    assert dev.shape == host.shape
    # Different bicubic kernels: allow loose agreement, enforce same range.
    assert np.mean(np.abs(dev - host)) < 0.15
    assert abs(dev.mean() - host.mean()) < 0.05


def test_align_config_and_assert(processor):
    """align_config must size BOTH vocab fields (the embedding table is sized
    from text_config.vocab_size) and set image_token_index; assert_aligned
    fails loudly on the silent-garbage-merge misconfigurations."""
    import dataclasses

    from paligemma_tpu.config import tiny_config
    from paligemma_tpu.processing import align_config, assert_aligned

    cfg = tiny_config()
    # ByteTokenizer + processor registers <image>/<loc>/<seg>: ids beyond the
    # tiny 260 vocab, which is exactly the out-of-range clamp hazard.
    assert processor.tokenizer.vocab_size > cfg.text_config.vocab_size
    aligned = align_config(cfg, processor)
    assert aligned.image_token_index == processor.image_token_id
    assert aligned.text_config.vocab_size >= processor.tokenizer.vocab_size
    assert aligned.vocab_size >= aligned.text_config.vocab_size
    assert_aligned(processor, aligned)  # no raise

    with pytest.raises(ValueError, match="image_token_index"):
        assert_aligned(processor, cfg)  # unaligned image id
    bad = dataclasses.replace(
        aligned,
        text_config=dataclasses.replace(aligned.text_config, vocab_size=10),
    )
    with pytest.raises(ValueError, match="out of range"):
        assert_aligned(processor, bad)


def test_embedding_covers_every_tokenizer_id(processor):
    """End-to-end guard for the clamp hazard: every id the tokenizer can emit
    (incl. the highest <seg> token) must hit a distinct embedding row."""
    import jax
    import jax.numpy as jnp

    from paligemma_tpu.config import tiny_config
    from paligemma_tpu.models import gemma
    from paligemma_tpu.processing import align_config

    cfg = align_config(tiny_config(), processor)
    params = gemma.init_params(cfg.text_config, jax.random.PRNGKey(0))
    top_id = processor.tokenizer.convert_tokens_to_ids("<seg127>")
    ids = jnp.asarray([[top_id, top_id - 1]], jnp.int32)
    rows = gemma.embed_tokens(params, ids)
    # Distinct ids -> distinct rows (a clamping table would collapse them).
    assert not np.allclose(np.asarray(rows[0, 0]), np.asarray(rows[0, 1]))


def test_hf_fast_tokenizer_protocol_conformance():
    """A real HF PreTrainedTokenizerFast (built in-memory — no network assets)
    must drop into PaliGemmaProcessor unmodified: the processor only uses the
    HF protocol subset {add_special_tokens, add_tokens,
    convert_tokens_to_ids, __call__(padding/truncation), decode,
    bos/eos/pad attrs} (reference: utils.py:8, processing_paligemma.py:63-75).
    """
    transformers = pytest.importorskip("transformers")
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    words = ["describe", "the", "chart", "a", "b", "hello"]
    vocab = {w: i + 4 for i, w in enumerate(words)}
    vocab.update({"<pad>": 0, "<bos>": 1, "<eos>": 2, "<unk>": 3})
    tk = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tk.pre_tokenizer = Whitespace()
    tok = transformers.PreTrainedTokenizerFast(
        tokenizer_object=tk,
        pad_token="<pad>", bos_token="<bos>", eos_token="<eos>",
        unk_token="<unk>", padding_side="right",
    )

    proc = PaliGemmaProcessor(tok, num_image_tokens=4, image_size=16)
    out = proc(text=["describe the chart"], images=[random_image()])
    ids = out["input_ids"][0].tolist()
    img_id = proc.image_token_id
    assert ids[:4] == [img_id] * 4, ids  # fixed-length image prefix
    assert ids[4] == tok.bos_token_id  # template BOS, no auto-BOS duplicate
    assert out["attention_mask"].shape == out["input_ids"].shape
    # decode round-trips the text portion
    text = tok.decode(ids[5:], skip_special_tokens=True)
    assert "describe" in text and "chart" in text


def test_pixel_lut_bit_identical_to_host_pipeline(processor):
    """The upload-light serving path (uint8 raw pixels + on-device LUT
    gather) must be BIT-identical to the full host pipeline — in fp32 and
    after a bf16 cast (the engine's cache dtype). The LUT rows are computed
    by the host `rescale`/`normalize` themselves, so this pins that the
    gather/cast plumbing preserves them exactly."""
    import jax.numpy as jnp

    from paligemma_tpu.processing import apply_pixel_lut, pixel_lut

    img = random_image(seed=3)
    host = processor(text=["x"], images=[img])["pixel_values"]
    raw = processor(text=["x"], images=[img], raw_uint8=True)["pixel_values"]
    assert raw.dtype == np.uint8 and raw.shape == host.shape

    lut32 = jnp.asarray(pixel_lut())  # fp32 table
    dev32 = np.asarray(apply_pixel_lut(lut32, jnp.asarray(raw)))
    assert dev32.dtype == np.float32
    assert np.array_equal(dev32, host)  # exact, not allclose

    lut16 = jnp.asarray(pixel_lut(), dtype=jnp.bfloat16)  # pre-cast table
    dev16 = apply_pixel_lut(lut16, jnp.asarray(raw))
    assert dev16.dtype == jnp.bfloat16
    assert np.array_equal(
        np.asarray(dev16.astype(jnp.float32)),
        np.asarray(jnp.asarray(host).astype(jnp.bfloat16).astype(jnp.float32)),
    )


def test_pixel_lut_nontrivial_mean_std():
    """Per-channel LUT correctness with asymmetric mean/std (not the
    all-0.5 imagenet-standard case, which would hide channel mixups)."""
    from paligemma_tpu.processing import (
        apply_pixel_lut,
        normalize,
        pixel_lut,
        rescale,
    )
    import jax.numpy as jnp

    mean, std = [0.1, 0.5, 0.9], [0.2, 0.25, 0.5]
    lut = pixel_lut(image_mean=mean, image_std=std)
    rng = np.random.RandomState(11)
    hwc = rng.randint(0, 256, (6, 5, 3), np.uint8)
    host = normalize(rescale(hwc, 1 / 255.0), mean, std).transpose(2, 0, 1)
    dev = np.asarray(
        apply_pixel_lut(jnp.asarray(lut), jnp.asarray(hwc.transpose(2, 0, 1)[None]))
    )[0]
    assert np.array_equal(dev, host.astype(np.float32))


def test_pixel_affine_matches_lut_when_ramp_check_passes():
    """The affine fast path replaces the LUT gather ONLY when the full
    0..255 ramp matches in the consumer dtype on the executing backend
    (the exact gate `ContinuousBatcher.__init__` applies). This pins that
    (a) the gate's equality over the ramp implies equality on arbitrary
    pixel batches (the ramp covers every possible byte), and (b) the gate
    passes at the engine's bf16 cache dtype on this backend."""
    import jax.numpy as jnp

    from paligemma_tpu.processing import (
        apply_pixel_affine,
        apply_pixel_lut,
        pixel_affine_coeffs,
        pixel_lut,
    )

    center, mul = pixel_affine_coeffs()
    ramp = jnp.broadcast_to(
        jnp.arange(256, dtype=jnp.uint8)[None, None, None, :], (1, 3, 1, 256))
    rng = np.random.RandomState(5)
    pix = jnp.asarray(rng.randint(0, 256, (2, 3, 6, 7), np.uint8))
    for dtype in (jnp.bfloat16, jnp.float32):
        lut = jnp.asarray(pixel_lut(), dtype=dtype)
        gate = bool(jnp.all(
            apply_pixel_lut(lut, ramp)
            == apply_pixel_affine(jnp.asarray(center), jnp.asarray(mul), ramp,
                                  dtype)))
        if dtype == jnp.bfloat16:
            assert gate, "bf16 ramp gate should pass on CPU/TPU fp32 subtract-scale"
        if gate:
            a = np.asarray(apply_pixel_affine(
                jnp.asarray(center), jnp.asarray(mul), pix, dtype
            ).astype(jnp.float32))
            b = np.asarray(apply_pixel_lut(lut, pix).astype(jnp.float32))
            assert np.array_equal(a, b), dtype


def test_engine_pixel_affine_gate_exposed():
    """The engine records which pixel path it selected; whichever it is,
    its join-group pixels remain pinned by the engine-vs-batch-1 oracle
    tests (test_continuous.py) — here just assert the gate ran and the
    fallback invariant holds."""
    import jax.numpy as jnp

    from paligemma_tpu.config import tiny_config
    from paligemma_tpu.continuous import ContinuousBatcher
    from paligemma_tpu.models import paligemma
    from paligemma_tpu.processing import (
        ByteTokenizer, PaliGemmaProcessor, align_config)
    import jax

    tok = ByteTokenizer()
    cfg = tiny_config()
    proc = PaliGemmaProcessor(
        tok, cfg.vision_config.num_image_tokens, cfg.vision_config.image_size)
    cfg = align_config(cfg, proc)
    params = paligemma.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    eng = ContinuousBatcher(params, cfg, proc, n_slots=2,
                            cache_dtype=jnp.float32)
    assert isinstance(eng.pixel_affine, bool)
    assert eng.pixel_affine == (eng._pixel_aff is not None)
