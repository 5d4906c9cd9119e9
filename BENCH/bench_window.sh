#!/bin/bash
# Interleaved clean-window protocol: cpu ceiling control before/between/after
# each bench rep, all results appended as JSON lines with a tag + timestamp.
OUT=${1:-/root/repo/BENCH/results/bench_window_r4.jsonl}
cd /root/repo
for i in 1 2 3; do
  echo "{\"tag\": \"cpu_control\", \"rep\": $i, \"ts\": $(date +%s), \"data\": $(python BENCH/cpu_control.py)}" >> "$OUT"
  B=$(SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 python bench.py 2>/dev/null | tail -1)
  echo "{\"tag\": \"bench\", \"rep\": $i, \"ts\": $(date +%s), \"data\": $B}" >> "$OUT"
done
echo "{\"tag\": \"cpu_control\", \"rep\": 4, \"ts\": $(date +%s), \"data\": $(python BENCH/cpu_control.py)}" >> "$OUT"
