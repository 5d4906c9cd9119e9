"""Two-parallelism-level probe for the round-5j stateful Arrow shape.

One op, the shape no earlier probe covered:
  bucket — token_bucket's FlatMapGroupsInPandas stage: ONE user-key
           shuffle into a pure-Python int64 admission loop (160 M
           synthetic events, 4096 users ≈ 39k rows/group). Unlike the
           dtw probe (scalar pandas_udf, numpy DP) this path spends
           its time in the Python bytecode loop itself, so it tests
           whether the Python-worker pool scales 8→32 when the work
           is interpreter-bound rather than numpy/JVM-bound.

Protocol = BENCH/probe_r5b_scaling.py verbatim (BIMODAL box: min-wall
across 3 interleaved rounds per cores level, in-window CPU + membw
ceilings, tmpfs spark.local.dir, fresh JVM per leg, warm + 2 timed
reps). Writes BENCH/results/probe_r5j_scaling.json.
"""

import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
BENCH = ROOT / "BENCH"

N = 160_000_000
NKEYS = 4096

WORKER = r"""
import json, sys, time
sys.path.insert(0, %(root)r)
cores = int(sys.argv[1]); n = int(sys.argv[2])
from pyspark.sql import SparkSession
import pyspark.sql.functions as F
spark = (SparkSession.builder.master(f"local[{cores}]")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.shuffle.partitions", str(2 * cores))
    .config("spark.ui.enabled", "false")
    .config("spark.local.dir", "/dev/shm/spark_r5j")
    .config("spark.driver.memory", "20g")
    .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from tokens_ts import analytics
NKEYS = %(nkeys)d
df = spark.range(0, n, 1, cores * 4).select(
    (F.col("id") %% NKEYS).alias("user_id"),
    F.col("id").alias("event_id"),
    F.timestamp_seconds(
        (F.col("id") * 2654435761) %% 100000000
    ).alias("ts"),
)
out = analytics.token_bucket(df, keys=["user_id"], ts_col="ts")
def noop(d): d.write.format("noop").mode("overwrite").save()
noop(out)  # warm: codegen + python worker pool
walls = []
for _ in range(2):
    t0 = time.time(); noop(out); walls.append(round(time.time() - t0, 2))
print(json.dumps({"cores": cores, "walls": walls}))
spark.stop()
""" % {"root": str(ROOT), "nkeys": NKEYS}


def ceiling(script):
    r = subprocess.run(
        [sys.executable, str(BENCH / script)],
        capture_output=True, text=True, timeout=900,
    )
    return json.loads(r.stdout.strip().splitlines()[-1])


def leg(cores):
    r = subprocess.run(
        [sys.executable, "-c", WORKER, str(cores), str(N)],
        capture_output=True, text=True, timeout=3600,
    )
    lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
    return json.loads(lines[-1]) if lines else {"cores": cores, "err": r.stderr[-800:]}


def main():
    out = {"n_points": N, "n_keys": NKEYS, "ceilings": [], "legs": []}
    for rnd in range(3):
        out["ceilings"].append(
            {"cpu": ceiling("cpu_control.py"), "membw": ceiling("membw_control.py")}
        )
        print(json.dumps(out["ceilings"][-1]), flush=True)
        for cores in (8, 32):
            res = leg(cores)
            res["round"] = rnd
            out["legs"].append(res)
            print(json.dumps(res), flush=True)
    walls = {}
    for l in out["legs"]:
        if "walls" in l:
            walls.setdefault(l["cores"], []).append(min(l["walls"]))
    if 8 in walls and 32 in walls:
        w8, w32 = min(walls[8]), min(walls[32])
        cpu_eff = min(c["cpu"]["eff_8_to_32"] for c in out["ceilings"])
        out["bucket"] = {
            "w8": w8, "w32": w32,
            "raw_eff": round(w8 / (4 * w32), 3),
            "norm_eff": round(w8 / (4 * w32) / cpu_eff, 3),
            "throughput_8": round(N / w8 / 1e6, 1),
            "throughput_32": round(N / w32 / 1e6, 1),
        }
    (BENCH / "results" / "probe_r5j_scaling.json").write_text(
        json.dumps(out, indent=1)
    )
    print(json.dumps({k: out[k] for k in ("bucket",) if k in out}))


if __name__ == "__main__":
    main()
