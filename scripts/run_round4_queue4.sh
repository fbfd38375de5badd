#!/bin/bash
# Round-4 measurement queue 4:
#  (a) deeper single-rung spec k=16 at the LONG workload — new data justifies
#      re-litigating depth: queue3 measured acceptance 7.413 tokens/verify at
#      k=8 on long (saturating the k+1=9 ceiling), so the r4 "k=12 negative"
#      (measured on std at ~3.8) does not bind here. New verify program shape
#      (T=17) -> one ~3-4 min compile per arm, then cached.
#  (b) wobble-band repeats of the queue3 headline arms (single runs so far).
# Kill by PARENT pid (CLAUDE.md).
cd /root/repo || exit 1
PY=python
mark() { echo "=== [$(date +%H:%M:%S)] $* ==="; }

BASE="--quant int8 --n_slots 32 --chunk 32 --spec_adaptive --spec_chunk 16 --kv_window --skip_coalesced"

mark "q4-1: long k16"
timeout 2700 $PY scripts/bench_continuous.py $BASE --spec_ks 16 --n_req 96 --budget_set long
mark "q4-2: long k16 + a8"
timeout 2700 $PY scripts/bench_continuous.py $BASE --spec_ks 16 --n_req 96 --budget_set long --prefill_a8
mark "q4-3: repeat long k8 + a8"
timeout 2700 $PY scripts/bench_continuous.py $BASE --spec_ks 8 --n_req 96 --budget_set long --prefill_a8
mark "q4-4: repeat std k8 + a8"
timeout 2700 $PY scripts/bench_continuous.py $BASE --spec_ks 8 --n_req 256 --prefill_a8
mark "q4-5: repeat std k8"
timeout 2700 $PY scripts/bench_continuous.py $BASE --spec_ks 8 --n_req 256
mark "q4-6: std k16 (does std's 3.8 acceptance already cap depth?)"
timeout 2700 $PY scripts/bench_continuous.py $BASE --spec_ks 16 --n_req 256
mark "QUEUE4 DONE"
