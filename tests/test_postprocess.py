"""Detection/segmentation token post-processing."""
from paligemma_tpu.postprocess import (
    Detection,
    extract_detections,
    format_detection_prompt,
    strip_location_tokens,
)


def test_single_detection():
    text = "<loc0256><loc0128><loc0768><loc0896> table"
    dets = extract_detections(text)
    assert len(dets) == 1
    d = dets[0]
    assert d.label == "table"
    assert d.box_norm == (0.25, 0.125, 0.75, 0.875)
    assert d.to_absolute(1000, 800) == (125, 200, 875, 600)


def test_multiple_objects_with_separator():
    text = (
        "<loc0000><loc0000><loc0512><loc0512> chart ; "
        "<loc0512><loc0512><loc1023><loc1023> logo"
    )
    dets = extract_detections(text)
    assert [d.label for d in dets] == ["chart", "logo"]
    assert dets[1].box_norm[0] == 0.5


def test_segmentation_indices():
    segs = "".join(f"<seg{i:03d}>" for i in range(16))
    text = f"<loc0100><loc0200><loc0300><loc0400>{segs} figure"
    (d,) = extract_detections(text)
    assert d.seg_indices == list(range(16))
    assert d.label == "figure"


def test_strip_and_prompts():
    text = "<loc0001><loc0002><loc0003><loc0004> cat"
    assert strip_location_tokens(text) == "cat"
    assert format_detection_prompt("table", "chart") == "detect table ; chart"


def test_no_detections_in_plain_text():
    assert extract_detections("the total revenue is 42") == []
