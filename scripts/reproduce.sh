#!/bin/bash
# Reproduce everything: tests (CPU mesh), headline bench (TPU), the KV-cache
# ablation grid (TPU), and the publication figures.
set -e
cd "$(dirname "$0")/.."

echo "=== 1/4 tests (CPU, 8 virtual devices) ==="
python -m pytest tests/ -q

echo "=== 2/4 headline benchmark (TPU) ==="
python bench.py

echo "=== 3/5 KV-cache ablation grid (TPU, ~20 min) ==="
bash scripts/run_ablation_watchdog.sh

echo "=== 4/5 serving benchmarks (TPU) ==="
python scripts/bench_continuous.py
python scripts/bench_continuous.py --quant int8
python scripts/bench_continuous.py --quant int8 --n_slots 16 --chunk 32
python scripts/bench_vision.py

echo "=== 5/5 figures ==="
python visualize_results.py

echo "Done. See ablation_results/, figures/, *_bench*.json, REPORT.md."
