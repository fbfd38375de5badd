#!/bin/bash
# One 448-res weather window (REPORT 3g / VERDICT r4 item 4): interleaved
# a8/std/std/a8 arms so order effects cancel, each result JSON snapshotted
# into weather448/ under the window tag. Run the script in >=3 distinct
# tunnel-weather windows (hours apart), then compare per-window a8-vs-std
# signs: the cell is settled when the sign agrees across windows (or
# documented unmeasurable when it doesn't).
# Usage: scripts/run_weather448.sh w2
set -u
cd /root/repo || exit 1
W="${1:?window tag, e.g. w2}"
PY=python
ARGS="--quant int8 --res 448 --n_slots 32 --chunk 32 --n_req 128 \
  --spec_ks 8 --spec_adaptive --spec_chunk 16 --kv_window --skip_coalesced"
OUT=continuous_bench_int8_res448_s32c32_r128_specL8av16
mkdir -p weather448

run_arm() {  # $1 = arm name (a8|std)
  local arm="$1" extra="" suffix="_kvw"
  [ "$arm" = a8 ] && { extra="--prefill_a8"; suffix="_a8_kvw"; }
  echo "=== window $W arm $arm at $(date +%H%M%S) ===" >> weather448/log.txt
  timeout 1800 $PY scripts/bench_continuous.py $ARGS $extra \
    >> weather448/log.txt 2>&1
  cp "${OUT}${suffix}.json" "weather448/${W}_$(date +%H%M%S)_${arm}.json" \
    2>/dev/null
}

run_arm a8
run_arm std
run_arm std
run_arm a8
echo "window $W done at $(date +%H:%M:%S)" >> weather448/log.txt
