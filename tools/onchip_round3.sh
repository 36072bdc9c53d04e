#!/bin/bash
# Round-3 on-chip measurement sweep (BASELINE configs 1-5 + ensemble +
# mascon huge-tape). Appends one section per benchmark to /tmp/onchip_r3.log.
set -u
LOG=/tmp/onchip_r3.log
cd /root/repo
# `python benchmarks/x.py` puts benchmarks/ (not the repo root) on
# sys.path — this silently ate round 2's config-5 numbers
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
echo "=== onchip round3 sweep $(date -u +%FT%TZ) ===" >> "$LOG"

run() {
    echo "--- $1 ---" >> "$LOG"
    shift
    timeout 2400 "$@" 2>&1 | grep -v "WARNING\|cpu_aot" | tail -6 >> "$LOG"
}

run "config 1: pendulum scalar" python benchmarks/pendulum_bench.py
run "config 2: outer-SS north star (bench.py)" python bench.py
run "config 3: HH events scalar+batch" python benchmarks/hh_event_bench.py
run "config 4: pcr3bp variational" python benchmarks/var_bench.py
run "config 5: geopot ensemble deg4 B=10240" python benchmarks/geopot_bench.py 4 10240
run "config 5b: sgp4 batch" python benchmarks/sgp4_bench.py
run "huge-tape: vsop2013/elp2000 series" python benchmarks/vsop2013_cartesian.py
run "huge-tape: mascon 512 (piecewise reads)" python benchmarks/mascon_bench.py 512 1024 32
run "huge-tape: mascon 512 A/B gathers" env HEYOKA_FLAT_NO_PIECES=1 python benchmarks/mascon_bench.py 512 1024 32
run "ensemble public API" python tools/ensemble_tpu_bench.py
echo "=== sweep done $(date -u +%FT%TZ) ===" >> "$LOG"
