#!/bin/bash
# Round-4 measurement queue — reconstruction of the /tmp batch that was lost
# when the box recycled during the backend outage (CLAUDE.md round-4 notes).
# Runs SEQUENTIALLY (one process holds the chip) with generous timeouts
# (remote compiles ~3.5 min/shape). Kill by PARENT pid (this script), never
# the timeout/python child — the parent advances to the next line and two
# processes fight for the chip.
#
#   nohup bash scripts/run_round4_queue.sh > /tmp/r4_batch.log 2>&1 &
#   echo $! > /tmp/r4_batch.pid
#
# Queue:
#  1. packed-pipeline serving re-measure (std traced / long / std repeat /
#     plain+window) — the REPORT.md "step 3" pending numbers
#  2. MXU s8xs8 microbench  -> mxu_int8_bench.json
#  3. a8 prefill e2e at 3B  -> a8_bench.json  (latency + token agreement)
#  4. serving --prefill_a8, GATED on measured a8 speedup > 1.15
#  5. LoRA train-step throughput at 3B -> train_bench.json
cd /root/repo || exit 1
PY=python
mark() { echo "=== [$(date +%H:%M:%S)] $* ==="; }

SRV="--quant int8 --n_slots 32 --chunk 32 --spec_ks 8 --spec_adaptive --spec_chunk 16 --kv_window"

mark "1a: std traced"
timeout 2700 $PY scripts/bench_continuous.py $SRV --n_req 256 --trace /tmp/trace_serving_r4
mark "1b: long"
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
