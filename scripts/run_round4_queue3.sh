#!/bin/bash
# Round-4 measurement queue 3: staged group uploads (prefetch worker ships
# each join wave's stacked uint8 pixels ahead of the join) x {std, long} x
# {weight-only, +prefill_a8}. Same program shapes as queue2 -> compile cache
# hits, each run is minutes. Run AFTER CPU tests pass; kill by PARENT pid.
cd /root/repo || exit 1
PY=python
mark() { echo "=== [$(date +%H:%M:%S)] $* ==="; }

SRV="--quant int8 --n_slots 32 --chunk 32 --spec_ks 8 --spec_adaptive --spec_chunk 16 --kv_window"

mark "q3-1: std staged"
timeout 2700 $PY scripts/bench_continuous.py $SRV --n_req 256 --skip_coalesced
mark "q3-2: std staged + a8"
timeout 2700 $PY scripts/bench_continuous.py $SRV --n_req 256 --prefill_a8 --skip_coalesced
mark "q3-3: long staged"
timeout 2700 $PY scripts/bench_continuous.py $SRV --n_req 96 --budget_set long --skip_coalesced
mark "q3-4: long staged + a8"
timeout 2700 $PY scripts/bench_continuous.py $SRV --n_req 96 --budget_set long --prefill_a8 --skip_coalesced
mark "QUEUE3 DONE"
