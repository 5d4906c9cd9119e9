"""Two-parallelism-level probe for the round-5b analytics family.

Three distinct plan shapes over 100 M points × 256 keys:
  twa    — lead window + bucket partial-agg (time_weighted_avg; the
           heartbeat/gap-stats ops share this exact shape)
  trend  — pure partial-agg, ONE exchange (normal-equation sums)
  shift  — two bounded ROWS sliding frames (with_level_shift)

Protocol: local[8] vs local[32], one fresh JVM per leg, interleaved
cpu_control ceilings, min-of-2 warm walls (matches
BENCH/BASELINE.md's clean-window procedure). Writes
BENCH/results/probe_r5b_scaling.json.
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
cores = int(sys.argv[1]); op = sys.argv[2]
from pyspark.sql import SparkSession
import pyspark.sql.functions as F
spark = (SparkSession.builder.master(f"local[{cores}]")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.shuffle.partitions", str(2 * cores))
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "20g")
    .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from tokens_ts import analytics
N = 100_000_000
NKEYS = 256
df = spark.range(0, N, 1, cores * 4).select(
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
walls = []
for _ in range(2):
    t0 = time.time(); noop(out); walls.append(round(time.time() - t0, 2))
print(json.dumps({"cores": cores, "op": op, "walls": walls}))
spark.stop()
""" % {"root": str(ROOT)}


def ceiling():
    r = subprocess.run(
        [sys.executable, str(BENCH / "cpu_control.py")],
        capture_output=True, text=True, timeout=600,
    )
    return json.loads(r.stdout.strip().splitlines()[-1])


def leg(cores, op):
    r = subprocess.run(
        [sys.executable, "-c", WORKER, str(cores), op],
        capture_output=True, text=True, timeout=1800,
    )
    lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
    return json.loads(lines[-1]) if lines else {"cores": cores, "op": op, "err": r.stderr[-800:]}


def main():
    out = {"n_points": 100_000_000, "nkeys": 256, "ceilings": [ceiling()], "legs": []}
    for op in ("twa", "trend", "shift"):
        for cores in (8, 32):
            res = leg(cores, op)
            out["legs"].append(res)
            print(json.dumps(res), flush=True)
        out["ceilings"].append(ceiling())
    for op in ("twa", "trend", "shift"):
        walls = {
            l["cores"]: min(l["walls"])
            for l in out["legs"]
            if l.get("op") == op and "walls" in l
        }
        if 8 in walls and 32 in walls:
            out[f"eff_8_to_32_{op}"] = round(walls[8] / (4 * walls[32]), 3)
    (BENCH / "results" / "probe_r5b_scaling.json").write_text(
        json.dumps(out, indent=1)
    )
    print(json.dumps({k: v for k, v in out.items() if k not in ("legs", "ceilings")}))


if __name__ == "__main__":
    main()
