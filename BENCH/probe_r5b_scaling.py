"""Two-parallelism-level probe for the round-5b analytics family.

Three distinct plan shapes:
  twa    — lead window + bucket partial-agg over 100 M points
           (time_weighted_avg; heartbeat/gap-stats share this shape)
  trend  — pure partial-agg, ONE exchange (normal-equation sums) over
           1 B points (100 M finishes in ~1.3 s at local[32] — all
           fixed overhead — so trend gets 10× the rows for signal)
  shift  — two bounded ROWS sliding frames (with_level_shift), 100 M

Protocol (the BENCH/BASELINE.md clean-window procedure, hardened for
this box's now-documented BIMODAL behavior — identical twa legs
minutes apart read min-walls of 7.2 s and 25.2 s, so single-leg
medians are meaningless here):

  * 3 interleaved rounds; each round samples the pure-CPU ceiling AND
    the memory-bandwidth ceiling, then runs every (op, cores) leg in
    a fresh JVM (warm + 2 timed reps).
  * estimator = min wall per (op, cores) across ALL rounds — the
    fast-mode wall; slow-mode reps are host throttling, not the
    operator (the GC experiment in git history shows the same config
    swinging 7→95 s with ParallelGC/G1/20g/48g all alike).
  * efficiencies reported raw AND normalized against the in-window
    ceilings: cpu for ALU-bound shapes, membw for the shuffle+sort-
    heavy twa/shift (their 100 M-row exchange streams ~7 GB through
    tmpfs — RAM-to-RAM, bus-bound at high core counts; a real 4N
    cluster adds memory channels with its nodes).

spark.local.dir is tmpfs (/dev/shm) as in the r4 packing probe: the
sandbox's single shared disk serializes shuffle I/O across cores;
per-node local disks on a real cluster do not. Writes
BENCH/results/probe_r5b_scaling.json.
"""

import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
BENCH = ROOT / "BENCH"

OPS = {"twa": 100_000_000, "trend": 1_000_000_000, "shift": 100_000_000}

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
    out = {"n_points": OPS, "nkeys": 256, "ceilings": [], "legs": []}
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
    (BENCH / "results" / "probe_r5b_scaling.json").write_text(
        json.dumps(out, indent=1)
    )
    print(json.dumps({k: v for k, v in out.items() if k not in ("legs", "ceilings")}))


if __name__ == "__main__":
    main()


