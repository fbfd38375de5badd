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
