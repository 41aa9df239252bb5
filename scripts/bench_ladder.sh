#!/bin/bash
# Family x tier bench ladder (BENCH.md rows) — one bench.py invocation per
# row, strictly sequential (never two TPU processes). Appends JSON lines
# to runs/bench_ladder_r05.jsonl (override with LADDER_OUT) with a "row"
# tag line before each.
cd "$(dirname "$0")/.."
OUT=${LADDER_OUT:-runs/bench_ladder_r05.jsonl}
run_row() {
  name="$1"; shift
  echo "# row: $name  ($*)" >> "$OUT"
  timeout 1500 python bench.py "$@" >> "$OUT" 2>/tmp/bench_row_err.log \
    || echo "{\"row\": \"$name\", \"error\": \"rc=$?\"}" >> "$OUT"
}
run_row headline
# trt/mrt at Re=200 defaults (tau=0.538) need the stability options from
# physics.py's boundary-feedback note; throughput is unaffected by them
run_row trt          --collision trt --zou-he-corners clean
run_row mrt          --collision mrt --mrt-rates e=1.857
run_row regularized  --collision regularized
run_row kbc          --collision kbc
run_row les          --smagorinsky 0.17
run_row power-law    --power-law 0.7
run_row bouzidi      --obstacle-bc bouzidi
run_row thermal      --thermal
run_row multiphase   --multiphase
run_row periodic     --periodic
run_row kolmogorov   --kolmogorov
run_row kolmogorov3d --kolmogorov --nz 128 --nx 128 --ny 128
run_row periodic3d   --periodic --nz 256 --nx 256 --ny 256
run_row d3q19        --nz 256 --nx 256 --ny 256
echo "# ladder done $(date -u +%FT%TZ)" >> "$OUT"
