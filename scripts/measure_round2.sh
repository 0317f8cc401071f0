#!/bin/bash
# One-shot TPU measurement sweep for the round-2 static fast path.
# Usage: bash scripts/measure_round2.sh [outfile]
# Appends one labelled JSON/req line per config; safe to rerun.
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/measure_r2.log}"
echo "==== sweep $(date -u +%FT%TZ) ====" >> "$OUT"

run() {
  local label="$1"; shift
  echo "-- $label" | tee -a "$OUT"
  timeout 1200 env "$@" python bench.py 2>/dev/null | tail -1 | tee -a "$OUT"
}

run "cloth-256(grid path)"        BENCH_GRID=256
run "cloth-256(sym spmv)"         BENCH_GRID=256 BENCH_SPMV_SYM=1
run "cloth-1024(1M)"              BENCH_GRID=1024
run "tet-32"                      BENCH_CONFIG=tet
run "collide-256"                 BENCH_CONFIG=collide BENCH_GRID=256
run "cloth-256(general path)"     BENCH_GRID=256 BENCH_GRIDPREP=0

echo "-- apply stage profile 256" | tee -a "$OUT"
timeout 1200 env BENCH_GRID=256 python scripts/profile_apply_fine.py 2>/dev/null | tee -a "$OUT"
echo "==== done ====" >> "$OUT"
