"""Native C++ preprocessing vs the PIL/numpy host pipeline."""
import numpy as np
import pytest

from paligemma_tpu import native
from paligemma_tpu.processing import process_images

PIL = pytest.importorskip("PIL")
from PIL import Image

pytestmark = pytest.mark.skipif(
    not native.available(), reason="g++/native library unavailable"
)


@pytest.mark.parametrize("hw", [(64, 48), (224, 224), (480, 640)])
def test_native_matches_pil_pipeline(hw):
    h, w = hw
    rng = np.random.RandomState(0)
    raw = rng.randint(0, 255, (h, w, 3), np.uint8)
    out_size = 32

    host = process_images([Image.fromarray(raw)], size=(out_size, out_size))[0]
    nat = native.preprocess_images_native(raw[None], out_size)[0]
    assert nat.shape == host.shape == (3, out_size, out_size)
    # PIL computes the same separable cubic in uint8 fixed point; allow
    # one quantization step of slack per pixel (1/255 in [-1,1] space = 2/255).
    diff = np.abs(nat - host)
    assert diff.max() <= 2.5 / 255.0 + 1e-6, diff.max()
    assert np.mean(diff) < 0.5 / 255.0


def test_native_batch():
    rng = np.random.RandomState(1)
    raw = rng.randint(0, 255, (4, 100, 80, 3), np.uint8)
    out = native.preprocess_images_native(raw, 16)
    assert out.shape == (4, 3, 16, 16)
    # per-sample equality with single calls
    for i in range(4):
        single = native.preprocess_images_native(raw[i][None], 16)[0]
        np.testing.assert_array_equal(out[i], single)


def test_native_range():
    raw = np.zeros((8, 8, 3), np.uint8)
    out = native.preprocess_images_native(raw[None], 8)
    np.testing.assert_allclose(out, -1.0)  # (0/255 - 0.5)/0.5
    raw = np.full((8, 8, 3), 255, np.uint8)
    out = native.preprocess_images_native(raw[None], 8)
    np.testing.assert_allclose(out, 1.0)
