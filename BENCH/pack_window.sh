#!/bin/bash
OUT=/root/repo/BENCH/results/scaling_runs_r4d_packing_tmpfs.jsonl
> "$OUT"
echo "{\"tag\":\"cpu\",\"data\":$(python /root/repo/BENCH/cpu_control.py)}" >> "$OUT"
for round in 0 1; do
  for N in 8 32; do
    R=$(timeout 560 spark-submit --master local[$N] --driver-memory 20g \
      --conf spark.driver.extraJavaOptions=-XX:+UseParallelGC \
      --conf spark.local.dir=/dev/shm/spark-local \
      --py-files /root/repo/tokens_ts.zip /tmp/pack_probe.py /dev/shm/probe_seq 2>/dev/null | tail -1)
    echo "{\"tag\":\"pack\",\"round\":$round,\"data\":$R}" >> "$OUT"
  done
done
echo "{\"tag\":\"cpu\",\"data\":$(python /root/repo/BENCH/cpu_control.py)}" >> "$OUT"
