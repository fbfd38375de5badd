#!/bin/bash
# Weather-gated re-measure: every ~25 min probe the tunnel with bench_h2d;
# when the int8 upload arm clears 38 MB/s (a "good window"), run the clean
# depth-2 A/B: traced std+a8 (mechanism evidence vs the depth-1 737 ms
# upload-wait trace) + untraced headline repeats. Fires at most once, caps at
# 12 probes (~5 h). Kill by PARENT pid.
cd /root/repo || exit 1
PY=python
mark() { echo "=== [$(date +%H:%M:%S)] $* ==="; }

SRV="--quant int8 --n_slots 32 --chunk 32 --spec_ks 8 --spec_adaptive --spec_chunk 16 --kv_window --skip_coalesced"

for attempt in $(seq 1 12); do
  mark "probe $attempt"
  rate=$(timeout 600 $PY scripts/bench_h2d.py 2>/dev/null | tail -1 | $PY -c "
import json,sys
try:
    d=json.load(sys.stdin); print(d['arms'].get('int8',{}).get('mb_s',0))
except Exception: print(0)")
  mark "probe $attempt int8 upload ${rate} MB/s"
  ok=$($PY -c "print(1 if float('${rate:-0}' or 0) > 38 else 0)")
  if [ "$ok" = "1" ]; then
    mark "good window: traced depth-2 std+a8"
    timeout 2700 $PY scripts/bench_continuous.py $SRV --n_req 256 --prefill_a8 --trace /tmp/trace_serving_d2_good
    mark "good window: std+a8 repeat"
    timeout 2700 $PY scripts/bench_continuous.py $SRV --n_req 256 --prefill_a8
    mark "good window: std repeat"
    timeout 2700 $PY scripts/bench_continuous.py $SRV --n_req 256
    mark "good window: long+a8 repeat"
    timeout 2700 $PY scripts/bench_continuous.py $SRV --n_req 96 --budget_set long --prefill_a8
    mark "WEATHER RUN DONE"
    exit 0
  fi
  sleep 1500
done
mark "NO GOOD WINDOW FOUND"
