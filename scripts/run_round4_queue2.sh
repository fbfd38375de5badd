#!/bin/bash
# Round-4 measurement queue, continuation (steps 1b..5).
# Step 1a (std traced) completed 2026-08-18 14:43 -> 2632.2 tok/s, trace in
# continuous_bench_int8_s32c32_r256_specL8av16_kvw_traced.json. The previous
# batch died with the session at ~15:00 after starting 1b; this resumes.
# Runs SEQUENTIALLY (one process holds the chip). Kill by PARENT pid only.
cd /root/repo || exit 1
PY=python
mark() { echo "=== [$(date +%H:%M:%S)] $* ==="; }

SRV="--quant int8 --n_slots 32 --chunk 32 --spec_ks 8 --spec_adaptive --spec_chunk 16 --kv_window"

mark "1b: long (post uint8-upload fix)"
timeout 2700 $PY scripts/bench_continuous.py $SRV --n_req 96 --budget_set long --skip_coalesced
mark "1c: std repeat (untraced)"
timeout 2700 $PY scripts/bench_continuous.py $SRV --n_req 256 --skip_coalesced
mark "1d: plain+window std"
timeout 2700 $PY scripts/bench_continuous.py --quant int8 --n_slots 32 --chunk 32 --kv_window --n_req 256 --skip_coalesced

mark "2: MXU int8 microbench"
timeout 2700 $PY scripts/bench_mxu_int8.py > mxu_int8_bench.json

mark "3: a8 e2e bench (incl. vision arm)"
timeout 3600 $PY scripts/bench_a8.py --vision > a8_bench.json

SPEED=$($PY -c "import json; d=json.load(open('a8_bench.json')); print(d.get('speedup') or 0)" 2>/dev/null || echo 0)
mark "a8 measured speedup: $SPEED (gate: >1.15)"
if $PY -c "import sys; sys.exit(0 if float('$SPEED') > 1.15 else 1)"; then
  mark "4: serving --prefill_a8 (gate passed)"
  timeout 2700 $PY scripts/bench_continuous.py $SRV --n_req 256 --prefill_a8 --skip_coalesced
else
  mark "4: SKIPPED serving --prefill_a8 (gate failed: $SPEED <= 1.15)"
fi

mark "5: LoRA train bench"
timeout 3600 $PY scripts/bench_train.py

mark "QUEUE DONE"
