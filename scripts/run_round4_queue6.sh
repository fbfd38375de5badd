#!/bin/bash
# Round-4 measurement queue 6: serving at the 448 model variant (1024 image
# tokens — prefill-bound regime, where a8's both-operand-int8 MXU prefill
# should matter most). First run per arm pays ~20-30 min of remote compiles
# (new prefill/decode/verify shapes); reruns are cached. Kill by PARENT pid.
cd /root/repo || exit 1
PY=python
mark() { echo "=== [$(date +%H:%M:%S)] $* ==="; }

SRV="--quant int8 --res 448 --n_slots 32 --chunk 32 --spec_ks 8 --spec_adaptive --spec_chunk 16 --kv_window --skip_coalesced --n_req 128"

mark "q6-1: 448 std defaults"
timeout 3600 $PY scripts/bench_continuous.py $SRV
mark "q6-2: 448 std + a8"
timeout 3600 $PY scripts/bench_continuous.py $SRV --prefill_a8
mark "QUEUE6 DONE"
