"""End-to-end CLI smoke via subprocess (reference call stack §3.1/§3.4)."""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, timeout=420):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable] + args, capture_output=True, text=True,
        timeout=timeout, cwd=REPO, env=env,
    )


@pytest.fixture(scope="module")
def image_path(tmp_path_factory):
    from PIL import Image

    p = tmp_path_factory.mktemp("img") / "pic.jpg"
    rng = np.random.RandomState(0)
    Image.fromarray(rng.randint(0, 255, (48, 64, 3), np.uint8)).save(str(p))
    return str(p)


def test_inference_cli_demo(image_path):
    r = run_cli([
        "inference.py", "--demo", "--only_cpu=True",
        "--prompt=what is this?", f"--image_file_path={image_path}",
        "--max_tokens_to_generate=4",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Running inference" in r.stdout
    assert "what is this?" in r.stdout  # prompt + decoded


def test_inference_cli_demo_int8(image_path):
    """--quant int8 serves the quantized decoder end-to-end from the CLI."""
    r = run_cli([
        "inference.py", "--demo", "--only_cpu=True", "--quant=int8",
        "--prompt=total assets?", f"--image_file_path={image_path}",
        "--max_tokens_to_generate=4",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "total assets?" in r.stdout


def test_inference_cli_demo_prefill_a8(image_path):
    """--prefill_a8 runs the both-operands-int8 prefill route end-to-end
    (tiny prompt is below runtime.a8_min_seq, so this exercises the flag
    plumbing + unchanged short-T programs); without --quant int8 it's a
    usage error."""
    r = run_cli([
        "inference.py", "--demo", "--only_cpu=True", "--quant=int8",
        "--prefill_a8=True", "--prompt=total assets?",
        f"--image_file_path={image_path}", "--max_tokens_to_generate=4",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "total assets?" in r.stdout
    r = run_cli([
        "inference.py", "--demo", "--only_cpu=True", "--prefill_a8=True",
        "--prompt=x", f"--image_file_path={image_path}",
    ])
    assert r.returncode == 2
    assert "requires --quant int8" in r.stderr


def test_inference_cli_demo_speculative(image_path):
    """--speculative routes greedy decoding through n-gram speculation from
    the CLI (token-identical path, tests/test_speculative.py)."""
    r = run_cli([
        "inference.py", "--demo", "--only_cpu=True", "--speculative",
        "--prompt=what is this?", f"--image_file_path={image_path}",
        "--max_tokens_to_generate=6",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "what is this?" in r.stdout


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    import pandas as pd
    from PIL import Image

    root = tmp_path_factory.mktemp("ds")
    images = root / "images"
    images.mkdir()
    rng = np.random.RandomState(0)
    rows = []
    for i in range(3):
        Image.fromarray(
            rng.randint(0, 255, (32, 32, 3), np.uint8)
        ).save(str(images / f"doc{i}_p0.png"))
        rows.append({
            "source_identifier": f"doc{i}",
            "FEATURE_page_indexes": [0],
            "FEATURE_full_prompt": f"what is in document {i}?",
            "template_id": "t1",
        })
    parquet = root / "data.parquet"
    pd.DataFrame(rows).to_parquet(parquet)
    return str(parquet), str(images), str(root / "adapter_out")


def test_finetune_then_eval_cli(tiny_dataset):
    """Train a demo LoRA adapter via the CLI, then --eval_only both with and
    without it — the full train -> eval workflow end to end."""
    parquet, images, out = tiny_dataset
    r = run_cli([
        "finetune_paligemma_lora.py", "--demo", "--only_cpu=True",
        f"--parquet_file={parquet}", f"--images_folder={images}",
        f"--output_dir={out}", "--batch_size=1", "--accum_steps=1",
        "--max_length=80", "--save_every_n_steps=0", "--max_samples=3",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Adapter saved" in r.stdout
    assert os.path.exists(os.path.join(out, "adapter_model.safetensors"))

    r = run_cli([
        "finetune_paligemma_lora.py", "--demo", "--only_cpu=True",
        f"--parquet_file={parquet}", f"--images_folder={images}",
        "--eval_only", "--batch_size=1", "--max_length=80", "--max_samples=3",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "mean loss" in r.stdout and "perplexity" in r.stdout

    r = run_cli([
        "finetune_paligemma_lora.py", "--demo", "--only_cpu=True",
        f"--parquet_file={parquet}", f"--images_folder={images}",
        "--eval_only", f"--adapter_dir={out}",
        "--batch_size=1", "--max_length=80", "--max_samples=3",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "adapter" in r.stdout and "mean loss" in r.stdout


def test_inference_cli_missing_args():
    r = run_cli(["inference.py", "--demo", "--only_cpu=True"])
    assert r.returncode == 2
    assert "required" in r.stderr
