#!/bin/bash
# Round-5 continuation queue — runs when the tunneled TPU comes back up.
#
# 1. bench.py headline re-verify (w4a8+lmw4 sub-arm; ~6 min) -> /tmp/bench_r5c.json
# 2. Serving drafter A/B at the std spec config, order-balanced
#    ngram/longest/longest/ngram (the one serving cell the longest-match
#    drafter has never been measured in — drafter_eval.json is teacher-forced
#    oracle acceptance only, REPORT r5). Output JSONs are distinct via the
#    _dLM tag; snapshots land in drafter_serving/ with window timestamps.
#
# The synthetic workload's prompts are repetition-heavy, so ngram acceptance
# is already saturated there (3.6-3.8 tok/verify); the open question is
# whether longest-match's variable context costs wall at equal acceptance
# (it verifies the same cadence — any delta is drafter-gather cost).
set -u
cd /root/repo || exit 1
PY=python
mkdir -p drafter_serving
LOG=drafter_serving/log.txt

echo "=== queue2 start $(date) ===" >> "$LOG"

# --- 1. bench.py headline ---
timeout 2400 $PY bench.py > /tmp/bench_r5c.json 2>> "$LOG"
echo "bench.py: $(cat /tmp/bench_r5c.json)" >> "$LOG"

# --- 2. drafter A/B, order-balanced ---
ARGS="--quant int8 --n_slots 32 --chunk 32 --n_req 256 \
  --spec_ks 8 --spec_adaptive --spec_chunk 16 --kv_window --skip_coalesced"
BASE=continuous_bench_int8_s32c32_r256_specL8a

run_arm() {  # $1 = ngram|longest
  local arm="$1" extra="" suffix="v16_kvw"
  [ "$arm" = longest ] && { extra="--spec_drafter longest"; suffix="_dLMv16_kvw"; }
  echo "=== arm $arm at $(date +%H%M%S) ===" >> "$LOG"
  timeout 1800 $PY scripts/bench_continuous.py $ARGS $extra >> "$LOG" 2>&1
  cp "${BASE}${suffix}.json" \
     "drafter_serving/$(date +%H%M%S)_${arm}.json" 2>/dev/null
}

run_arm ngram
run_arm longest
run_arm longest
run_arm ngram
echo "=== queue2 done $(date) ===" >> "$LOG"
