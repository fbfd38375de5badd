"""Figure generator: reads measured summaries, falls back to published data."""
import json
import os

import pytest

matplotlib = pytest.importorskip("matplotlib")

import visualize_results


def _summary(tmp_path):
    s = {}
    for n in (128, 256):
        for cached in (True, False):
            name = f"{'kv_cache' if cached else 'no_kv_cache'}_{n}"
            base = 7.0 if cached else 20.0 + n / 50
            s[name] = {
                "sequence_length": n,
                "kv_cache_enabled": cached,
                "num_samples": 25,
                "steady_state_tps": {"mean": 1000 / base, "ci_95": 0.5, "std": 0.4},
                "steady_state_ms_per_token": {"mean": base, "ci_95": 0.1, "std": 0.1},
                "peak_memory_mb": {"mean": 5000.0, "ci_95": 1.0, "std": 1.0},
                "tokens_generated": {"mean": float(n)},
            }
    p = tmp_path / "summary_statistics.json"
    p.write_text(json.dumps(s))
    return str(p)


def test_figures_from_measured(tmp_path):
    results = _summary(tmp_path)
    out = tmp_path / "figs"
    visualize_results.main(["--results", results, "--out_dir", str(out)])
    for i in range(1, 6):
        assert any(f.startswith(f"fig{i}_") and f.endswith(".pdf") for f in os.listdir(out))
        assert any(f.startswith(f"fig{i}_") and f.endswith(".png") for f in os.listdir(out))


def test_figures_fallback_to_published(tmp_path):
    out = tmp_path / "figs"
    visualize_results.main(["--results", str(tmp_path / "missing.json"), "--out_dir", str(out)])
    files = os.listdir(out)
    # The 5 reference-protocol figures always render (PDF+PNG each); the
    # measured-data figures (fig6 serving, fig7 width scaling, fig8
    # speculative) additionally render exactly when their
    # continuous_bench*/spec_bench* JSON exists in --serving_dir (repo root
    # here), so the count floats with the measured artifacts present.
    for i in range(1, 6):
        assert any(f.startswith(f"fig{i}_") and f.endswith(".pdf") for f in files)
        assert any(f.startswith(f"fig{i}_") and f.endswith(".png") for f in files)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    expected = 10
    fig6_files = ["continuous_bench.json", "continuous_bench_int8.json",
                  "continuous_bench_int8_s16c32.json"]
    if any(os.path.exists(os.path.join(repo, f)) for f in fig6_files):
        expected += 2  # fig6 renders from any measured serving file
    # fig7/fig8 conditions mirror visualize_results.py exactly: fig7 needs
    # >= 3 width-scaling points, fig8 needs spec_k*_ms_per_tok keys.
    fig7_files = [
        "continuous_bench_int8_s16c32_r128.json",
        "continuous_bench_int8_s24c32_r128.json",
        "continuous_bench_int8_s32c32_r128.json",
        "continuous_bench_int8_s32c32_r256.json",
        "continuous_bench_int8_s48c32_r256.json",
    ]
    if sum(os.path.exists(os.path.join(repo, f)) for f in fig7_files) >= 3:
        expected += 2
    spec_path = os.path.join(repo, "spec_bench_int8.json")
    if os.path.exists(spec_path):
        import json

        with open(spec_path) as f:
            d = json.load(f)
        if any(s.startswith("spec_k") and s.endswith("ms_per_tok")
               for s in d):
            expected += 2
    assert len(files) == expected, sorted(files)
