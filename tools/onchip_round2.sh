#!/bin/bash
# Round-2 on-chip measurement sweep: run when the TPU tunnel is up.
# Each step appends one JSON line to /tmp/onchip_r2.log.
set -u
LOG=/tmp/onchip_r2.log
cd /root/repo
echo "=== onchip round2 sweep $(date -u +%FT%TZ) ===" >> "$LOG"

run() {
    echo "--- $1 ---" >> "$LOG"
    shift
    timeout 1500 "$@" 2>&1 | grep -v WARNING | tail -4 >> "$LOG"
}

run "north star (bench.py)" python bench.py
run "hh events (scalar + batch flat/dd)" python benchmarks/hh_event_bench.py
run "geopot ensemble deg4 B=10240" python benchmarks/geopot_bench.py 4 10240
run "ensemble public API" python tools/ensemble_tpu_bench.py
echo "=== sweep done $(date -u +%FT%TZ) ===" >> "$LOG"
