#!/bin/bash
# Round-4 measurement queue 5: pixel-affine fast path (replaces the 302 ms
# per-run LUT gather — REPORT r4 trace). One traced arm to confirm the gather
# is gone from the device profile, then untraced headline repeats.
# Kill by PARENT pid (CLAUDE.md).
cd /root/repo || exit 1
PY=python
mark() { echo "=== [$(date +%H:%M:%S)] $* ==="; }

SRV="--quant int8 --n_slots 32 --chunk 32 --spec_ks 8 --spec_adaptive --spec_chunk 16 --kv_window --skip_coalesced"

mark "q5-1: std + a8 TRACED (pixel affine)"
timeout 2700 $PY scripts/bench_continuous.py $SRV --n_req 256 --prefill_a8 --trace /tmp/trace_serving_affine
mark "q5-2: std + a8"
timeout 2700 $PY scripts/bench_continuous.py $SRV --n_req 256 --prefill_a8
mark "q5-3: std (server defaults)"
timeout 2700 $PY scripts/bench_continuous.py $SRV --n_req 256
mark "q5-4: long + a8"
timeout 2700 $PY scripts/bench_continuous.py $SRV --n_req 96 --budget_set long --prefill_a8
mark "q5-5: long (server defaults)"
timeout 2700 $PY scripts/bench_continuous.py $SRV --n_req 96 --budget_set long
mark "QUEUE5 DONE"
