"""Financial dataset tests: parquet manifest, image glob, fallbacks, batching."""
import numpy as np
import pytest

pd = pytest.importorskip("pandas")
from PIL import Image

from paligemma_tpu.data import (
    FinancialImageDataset,
    find_page_image,
    validate_dataset,
)
from paligemma_tpu.processing import ByteTokenizer


@pytest.fixture
def dataset_dir(tmp_path):
    images = tmp_path / "images"
    images.mkdir()
    rng = np.random.RandomState(0)
    rows = []
    for i in range(4):
        sid = f"doc{i}"
        img = Image.fromarray(rng.randint(0, 255, (40, 30, 3), np.uint8))
        img.save(images / f"{sid}_p0.png")
        rows.append(
            {
                "source_identifier": sid,
                "FEATURE_page_indexes": [0],
                "FEATURE_full_prompt": f"what is in document {i}?",
                "template_id": "t1",
            }
        )
    # one row with a missing image, one with a corrupted file
    rows.append(
        {
            "source_identifier": "missing",
            "FEATURE_page_indexes": [0],
            "FEATURE_full_prompt": "missing image",
            "template_id": "t1",
        }
    )
    (images / "corrupt_p0.png").write_bytes(b"not an image")
    rows.append(
        {
            "source_identifier": "corrupt",
            "FEATURE_page_indexes": [0],
            "FEATURE_full_prompt": "corrupt image",
            "template_id": "t1",
        }
    )
    parquet = tmp_path / "data.parquet"
    pd.DataFrame(rows).to_parquet(parquet)
    return str(parquet), str(images)


def test_find_page_image(dataset_dir):
    parquet, images = dataset_dir
    assert find_page_image(images, "doc0", 0) is not None
    assert find_page_image(images, "nope", 0) is None


def test_validate_dataset(dataset_dir):
    parquet, images = dataset_dir
    report = validate_dataset(parquet, images, max_check=100, logger=lambda *_: None)
    assert report == {"checked": 6, "missing": 1, "corrupted": 1}


def test_sample_shapes_and_labels(dataset_dir):
    parquet, images = dataset_dir
    tok = ByteTokenizer()
    tok.add_special_tokens({"additional_special_tokens": ["<image>"]})
    ds = FinancialImageDataset(
        parquet, images, tok, num_image_tokens=4, image_size=16, max_length=64
    )
    s = ds[0]
    assert s["pixel_values"].shape == (3, 16, 16)
    assert s["input_ids"].shape == (64,)
    assert s["labels"].shape == (64,)
    # image-token positions and padding are ignore_index
    assert np.all(s["labels"][:4] == -100)
    assert np.all(s["labels"][s["valid_len"]:] == -100)
    # text region labels mirror input ids
    np.testing.assert_array_equal(
        s["labels"][4 : s["valid_len"]], s["input_ids"][4 : s["valid_len"]]
    )


def test_corrupt_and_missing_fall_forward(dataset_dir):
    parquet, images = dataset_dir
    tok = ByteTokenizer()
    tok.add_special_tokens({"additional_special_tokens": ["<image>"]})
    ds = FinancialImageDataset(
        parquet, images, tok, num_image_tokens=2, image_size=8, max_length=32
    )
    # rows 4 (missing) and 5 (corrupt) must still yield usable samples
    for idx in (4, 5):
        s = ds[idx]
        assert s["pixel_values"].shape == (3, 8, 8)


def test_batching_static_shapes(dataset_dir):
    parquet, images = dataset_dir
    tok = ByteTokenizer()
    tok.add_special_tokens({"additional_special_tokens": ["<image>"]})
    ds = FinancialImageDataset(
        parquet, images, tok, num_image_tokens=2, image_size=8, max_length=32,
        max_samples=5,
    )
    batches = list(ds.batches(batch_size=2, shuffle=True, seed=1))
    assert len(batches) == 2  # 5 samples -> 2 full batches, tail dropped
    for b in batches:
        assert b["input_ids"].shape == (2, 32)
        assert b["pixel_values"].shape == (2, 3, 8, 8)
        assert b["labels"].shape == (2, 32)
