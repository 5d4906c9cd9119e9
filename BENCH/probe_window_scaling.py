"""Two-parallelism-level probe for the WINDOW-FUNCTION plan family.

The tier/dedup/packing scaling legs all exercise hash-aggregate or
join plans; round 5's analytics (EWMA, counter rate) run per-key SORT
WINDOWS — a different executor path whose parallelism is capped by the
number of keys. This probe measures analytics.with_ewma over 100 M
points at two key counts (256 keys = healthy, 16 keys = the
deliberately-degenerate case) at local[8] vs local[32], interleaved
with cpu_control ceilings, one fresh JVM per leg.

Writes BENCH/results/probe_window_scaling_r5.json.
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
cores = int(sys.argv[1]); nkeys = int(sys.argv[2])
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
df = spark.range(0, N, 1, cores * 4).select(
    (F.col("id") %% nkeys).cast("string").alias("key"),
    F.timestamp_seconds(F.lit(1767225600) + (F.col("id") / nkeys).cast("bigint")).alias("event_ts"),
    (((F.col("id") * 2654435761) %% 1000000) / 1e3).alias("value"),
)
out = analytics.with_ewma(df, ["key"], alpha=0.25, horizon=8)
def noop(d): d.write.format("noop").mode("overwrite").save()
noop(out)  # warm
walls = []
for _ in range(2):
    t0 = time.time(); noop(out); walls.append(round(time.time() - t0, 2))
print(json.dumps({"cores": cores, "nkeys": nkeys, "walls": walls}))
spark.stop()
""" % {"root": str(ROOT)}


def ceiling():
    r = subprocess.run(
        [sys.executable, str(BENCH / "cpu_control.py")],
        capture_output=True, text=True, timeout=600,
    )
    return json.loads(r.stdout.strip().splitlines()[-1])


def leg(cores, nkeys):
    r = subprocess.run(
        [sys.executable, "-c", WORKER, str(cores), str(nkeys)],
        capture_output=True, text=True, timeout=1800,
    )
    lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
    return json.loads(lines[-1]) if lines else {"cores": cores, "err": r.stderr[-800:]}


def main():
    out = {"n_points": 100_000_000, "ceilings": [ceiling()], "legs": []}
    for nkeys in (256, 16):
        for cores in (8, 32):
            res = leg(cores, nkeys)
            out["legs"].append(res)
            print(json.dumps(res), flush=True)
        out["ceilings"].append(ceiling())
    for nkeys in (256, 16):
        walls = {
            l["cores"]: min(l["walls"])
            for l in out["legs"]
            if l.get("nkeys") == nkeys and "walls" in l
        }
        if 8 in walls and 32 in walls:
            out[f"eff_8_to_32_keys{nkeys}"] = round(walls[8] / (4 * walls[32]), 3)
    (BENCH / "results" / "probe_window_scaling_r5.json").write_text(
        json.dumps(out, indent=1)
    )
    print(json.dumps({k: v for k, v in out.items() if k != "legs"}))


if __name__ == "__main__":
    main()
