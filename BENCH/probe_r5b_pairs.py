"""Matched-pair addendum to probe_r5b_scaling.py.

The 3-round interleaved probe showed this box's minute-scale variance
EXCEEDS the 8->32 signal for the window-heavy r5b shapes (its own
membw ceiling swung 0.057 -> 1.27 between rounds). This addendum
tightens the estimator: each trial runs the local[8] leg and the
local[32] leg BACK-TO-BACK (fresh JVM each, warm + 1 timed rep,
N=50M so a pair fits inside one host-mode window), and efficiency is
computed PER PAIR. The max-pair efficiency estimates the uncontended
ratio (both legs landing in the host's fast mode); the per-pair
spread documents the host noise. Writes
BENCH/results/probe_r5b_pairs.json.
"""

import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
BENCH = ROOT / "BENCH"

WORKER = r"""
import json, sys, time
sys.path.insert(0, %(root)r)
cores = int(sys.argv[1]); op = sys.argv[2]; n = int(sys.argv[3])
from pyspark.sql import SparkSession
import pyspark.sql.functions as F
spark = (SparkSession.builder.master(f"local[{cores}]")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.shuffle.partitions", str(2 * cores))
    .config("spark.ui.enabled", "false")
    .config("spark.local.dir", "/dev/shm/spark_r5b")
    .config("spark.driver.memory", "20g")
    .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from tokens_ts import analytics
NKEYS = 256
df = spark.range(0, n, 1, cores * 4).select(
    (F.col("id") %% NKEYS).cast("string").alias("key"),
    F.timestamp_seconds(F.lit(1767225600) + (F.col("id") / NKEYS).cast("bigint")).alias("event_ts"),
    (((F.col("id") * 2654435761) %% 1000000) / 1e3).alias("value"),
)
if op == "twa":
    out = analytics.time_weighted_avg(df, ["key"], interval="1 hour")
elif op == "trend":
    out = analytics.trend(df, ["key"], interval="1 hour")
else:
    out = analytics.with_level_shift(df, ["key"], width=16)
def noop(d): d.write.format("noop").mode("overwrite").save()
noop(out)  # warm
t0 = time.time(); noop(out)
print(json.dumps({"cores": cores, "wall": round(time.time() - t0, 2)}))
spark.stop()
""" % {"root": str(ROOT)}

N = {"twa": 50_000_000, "shift": 50_000_000, "trend": 500_000_000}


def leg(cores, op):
    r = subprocess.run(
        [sys.executable, "-c", WORKER, str(cores), op, str(N[op])],
        capture_output=True, text=True, timeout=1800,
    )
    lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
    return json.loads(lines[-1])["wall"] if lines else None


def main():
    ops = sys.argv[1:] or ["twa", "shift"]
    out = {"n_points": {o: N[o] for o in ops}, "pairs": {o: [] for o in ops}}
    for trial in range(6):
        for op in ops:
            w8 = leg(8, op)
            w32 = leg(32, op)
            if w8 and w32:
                pair = {"trial": trial, "w8": w8, "w32": w32,
                        "eff": round(w8 / (4 * w32), 3)}
                out["pairs"][op].append(pair)
                print(json.dumps({"op": op, **pair}), flush=True)
    for op in ops:
        effs = [p["eff"] for p in out["pairs"][op]]
        if effs:
            out[f"{op}_eff_best_pair"] = max(effs)
            out[f"{op}_eff_median_pair"] = sorted(effs)[len(effs) // 2]
    (BENCH / "results" / "probe_r5b_pairs.json").write_text(json.dumps(out, indent=1))
    print(json.dumps({k: v for k, v in out.items() if k != "pairs"}))


if __name__ == "__main__":
    main()
