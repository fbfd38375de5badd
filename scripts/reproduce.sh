#!/bin/bash
# Reproduce everything: tests (CPU mesh), headline bench (TPU), the KV-cache
# ablation grid (TPU), and the publication figures.
set -e
cd "$(dirname "$0")/.."

echo "=== 1/4 tests (CPU, 8 virtual devices) ==="
python -m pytest tests/ -q

echo "=== 2/4 headline benchmark (TPU) ==="
python bench.py

echo "=== 3/4 KV-cache ablation grid (TPU, ~20 min) ==="
bash scripts/run_ablation_watchdog.sh

echo "=== 4/4 figures ==="
python visualize_results.py

echo "Done. See ablation_results/, figures/, REPORT.md."
