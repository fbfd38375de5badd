#!/bin/bash
# Round-4 measurement queue 7: verify-cadence re-litigation on the PACKED
# pipeline. The r4 "cadence > chunk/2 negative" results were measured at the
# ~2165 tok/s host-bound level; post staged-uploads + affine the per-cycle
# fetch RTT is a larger relative share, so fewer host syncs (higher
# spec_chunk) may now win despite the budget-overshoot waste. Plus one traced
# long arm (long's device-busy floor was never pinned). Kill by PARENT pid.
cd /root/repo || exit 1
PY=python
mark() { echo "=== [$(date +%H:%M:%S)] $* ==="; }

SRV="--quant int8 --n_slots 32 --chunk 32 --spec_ks 8 --spec_adaptive --kv_window --skip_coalesced --prefill_a8"

mark "q7-1: std a8 cadence 24"
timeout 2700 $PY scripts/bench_continuous.py $SRV --spec_chunk 24 --n_req 256
mark "q7-2: std a8 cadence 32"
timeout 2700 $PY scripts/bench_continuous.py $SRV --spec_chunk 32 --n_req 256
mark "q7-3: long a8 cadence 24"
timeout 2700 $PY scripts/bench_continuous.py $SRV --spec_chunk 24 --n_req 96 --budget_set long
mark "q7-4: long a8 cadence 32"
timeout 2700 $PY scripts/bench_continuous.py $SRV --spec_chunk 32 --n_req 96 --budget_set long
mark "q7-5: long a8 cadence 16 TRACED (device-busy floor at long)"
timeout 2700 $PY scripts/bench_continuous.py $SRV --spec_chunk 16 --n_req 96 --budget_set long --trace /tmp/trace_serving_long
mark "QUEUE7 DONE"
