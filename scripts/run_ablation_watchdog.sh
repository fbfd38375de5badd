#!/bin/bash
# Run the full ablation with a stall watchdog: the tunneled TPU backend's
# remote compiles occasionally hang; if the log stops growing for
# STALL_SECS, kill and restart (server-side compile caches make retries
# cheap). Up to MAX_TRIES attempts.
set -u
LOG="${LOG:-/tmp/ablation_full.log}"
OUT="${OUT:-ablation_results}"
QUANT="${QUANT:-none}"
STALL_SECS="${STALL_SECS:-420}"
MAX_TRIES="${MAX_TRIES:-6}"

for try in $(seq 1 "$MAX_TRIES"); do
    echo "=== attempt $try ===" >> "$LOG"
    python ablation_study.py --output_dir "$OUT" --quant "$QUANT" >> "$LOG" 2>&1 &
    PID=$!
    while kill -0 "$PID" 2>/dev/null; do
        sleep 30
        now=$(date +%s)
        mtime=$(stat -c %Y "$LOG")
        if (( now - mtime > STALL_SECS )); then
            echo "=== watchdog: stalled ${STALL_SECS}s, killing attempt $try ===" >> "$LOG"
            kill -9 "$PID" 2>/dev/null
            sleep 5
            break
        fi
    done
    wait "$PID" 2>/dev/null
    rc=$?
    if [ -f "$OUT/summary_statistics.json" ] && [ "$rc" -eq 0 ]; then
        echo "=== ablation complete on attempt $try ===" >> "$LOG"
        exit 0
    fi
done
echo "=== ablation failed after $MAX_TRIES attempts ===" >> "$LOG"
exit 1
