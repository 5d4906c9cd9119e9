"""Two-parallelism-level probe for the round-5f operator family.

Three NEW plan shapes not covered by earlier probes:
  winnow — pure row-local expression mapper (md5 per 8-gram, window
           minima): zero shuffles, the embarrassingly-parallel bound
           (300k synthetic ~200-char docs ≈ 58 M md5 calls)
  dtw    — Arrow scalar-pandas_udf DP stage (2048 keys × 90 day-pairs,
           ≤24² cells each): the Python-worker scaling path — work is
           per-row-group, no shuffle after one small bucket agg
  perm   — per-key window sort + lead()s over 100 M points, 256 keys:
           the window-heavy shape (twa/shift family), membw-bound

Protocol = BENCH/probe_r5b_scaling.py verbatim (this box is BIMODAL:
min-wall across 3 interleaved rounds per (op, cores), in-window CPU
and membw ceilings, tmpfs spark.local.dir, fresh JVM per leg,
warm + 2 timed reps). Writes BENCH/results/probe_r5f_scaling.json.
"""

import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
BENCH = ROOT / "BENCH"

OPS = {"winnow": 300_000, "dtw": 2048 * 91 * 24, "perm": 100_000_000}

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
    .config("spark.local.dir", "/dev/shm/spark_r5f")
    .config("spark.driver.memory", "20g")
    .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from tokens_ts import analytics, dedup

if op == "winnow":
    # ~200-char deterministic pseudo-text per doc (distinct grams)
    df = spark.range(0, n, 1, cores * 4).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *[
            F.md5((F.col("id") * 31 + F.lit(j)).cast("string"))[0:12]
            for j in range(16)
        ]).alias("text"),
    )
    out = dedup.winnowing_fingerprints(df)
elif op == "dtw":
    NKEYS = 2048
    df = spark.range(0, n, 1, cores * 4).select(
        (F.col("id") %% NKEYS).cast("string").alias("key"),
        F.timestamp_seconds(
            F.lit(1767225600) + (F.col("id") / NKEYS).cast("bigint") * 3600
        ).alias("event_ts"),
        (((F.col("id") * 2654435761) %% 1000000) / 1e3).alias("value"),
    )
    out = analytics.dtw_daily(df, ["key"])
else:
    NKEYS = 256
    df = spark.range(0, n, 1, cores * 4).select(
        (F.col("id") %% NKEYS).cast("string").alias("key"),
        F.timestamp_seconds(
            F.lit(1767225600) + (F.col("id") / NKEYS).cast("bigint")
        ).alias("event_ts"),
        (((F.col("id") * 2654435761) %% 1000000) / 1e3).alias("value"),
    )
    out = analytics.permutation_entropy(df, ["key"], trunc="day")

def noop(d): d.write.format("noop").mode("overwrite").save()
noop(out)  # warm
walls = []
for _ in range(2):
    t0 = time.time(); noop(out); walls.append(round(time.time() - t0, 2))
print(json.dumps({"cores": cores, "op": op, "walls": walls}))
spark.stop()
""" % {"root": str(ROOT)}


def ceiling(script):
    r = subprocess.run(
        [sys.executable, str(BENCH / script)],
        capture_output=True, text=True, timeout=900,
    )
    return json.loads(r.stdout.strip().splitlines()[-1])


def leg(cores, op):
    r = subprocess.run(
        [sys.executable, "-c", WORKER, str(cores), op, str(OPS[op])],
        capture_output=True, text=True, timeout=3600,
    )
    lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
    return json.loads(lines[-1]) if lines else {"cores": cores, "op": op, "err": r.stderr[-800:]}


def main():
    out = {"n_points": OPS, "ceilings": [], "legs": []}
    for rnd in range(3):
        out["ceilings"].append(
            {"cpu": ceiling("cpu_control.py"), "membw": ceiling("membw_control.py")}
        )
        print(json.dumps(out["ceilings"][-1]), flush=True)
        for op in OPS:
            for cores in (8, 32):
                res = leg(cores, op)
                res["round"] = rnd
                out["legs"].append(res)
                print(json.dumps(res), flush=True)
    cpu_effs = [c["cpu"]["eff_8_to_32"] for c in out["ceilings"]]
    bw_effs = [c["membw"]["bw_eff_8_to_32"] for c in out["ceilings"]]
    out["cpu_eff_8_to_32"] = cpu_effs
    out["membw_eff_8_to_32"] = bw_effs
    for op in OPS:
        walls = {}
        for l in out["legs"]:
            if l.get("op") == op and "walls" in l:
                walls.setdefault(l["cores"], []).append(min(l["walls"]))
        if 8 in walls and 32 in walls:
            w8, w32 = min(walls[8]), min(walls[32])
            raw = round(w8 / (4 * w32), 3)
            out[f"{op}"] = {
                "min_wall_8": w8, "min_wall_32": w32,
                "all_min_walls_8": walls[8], "all_min_walls_32": walls[32],
                "eff_raw": raw,
                "eff_vs_cpu_ceiling": round(raw / max(cpu_effs), 3),
                "eff_vs_membw_ceiling": round(raw / max(bw_effs), 3),
            }
    (BENCH / "results" / "probe_r5f_scaling.json").write_text(
        json.dumps(out, indent=1)
    )
    print(json.dumps({k: v for k, v in out.items() if k not in ("legs", "ceilings")}))


if __name__ == "__main__":
    main()
