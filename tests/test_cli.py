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


def test_inference_cli_missing_args():
    r = run_cli(["inference.py", "--demo", "--only_cpu=True"])
    assert r.returncode == 2
    assert "required" in r.stderr
