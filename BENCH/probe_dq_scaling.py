"""Two-parallelism-level probe for the data-quality audit shapes.

Two ops, shapes the earlier probes don't isolate:
  dq_row  — dq.audit's fused row-rule pass: ONE scan, N sum(when(...))
            partials, a single tiny global agg state (bytes per task).
            The opposite pole from raw→1m's 30 M-group hash state:
            if the shared-JVM story is really about per-task agg
            state, this op should scale near the CPU ceiling.
  dq_uniq — one uniqueness rule at 1 M distinct keys: the keyed
            two-level groupBy between those poles (state ≫ dq_row,
            ≪ raw→1m).

Input is generated (spark.range → 400 M events-shaped rows), so legs
measure pure compute + shuffle, no disk read. Protocol =
BENCH/probe_r5b_scaling.py (min-wall across 3 interleaved rounds per
cores level, in-window CPU + membw ceilings, tmpfs local dir, fresh
JVM per leg, warm + 2 timed reps). Writes
BENCH/results/probe_dq_scaling.json.
"""

import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
BENCH = ROOT / "BENCH"

N = 400_000_000
NKEYS = 1_000_000

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
    .config("spark.local.dir", "/dev/shm/spark_dq")
    .config("spark.driver.memory", "20g")
    .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from tokens_ts import dq
NKEYS = %(nkeys)d
df = spark.range(0, n, 1, cores * 4).select(
    F.col("id"),
    (F.col("id") %% NKEYS).alias("k"),
    ((F.col("id") * 2654435761) %% 1000 / 10.0).alias("v"),
    F.concat(F.lit("type"), (F.col("id") %% 7).cast("string")).alias("t"),
)
row_rules = [
    dq.not_null("v"),
    dq.in_range("v", 5.0, 95.0),
    dq.in_set("t", ["type0", "type1", "type2", "type3", "type4"]),
    dq.matches("t", "^type"),
]
ops = {
    "dq_row": dq.audit(df, row_rules),
    "dq_uniq": dq.audit(df, [dq.not_null("k")], {"k": ["k"]}),
}
def noop(d): d.write.format("noop").mode("overwrite").save()
out = {"cores": cores}
for name, frame in ops.items():
    noop(frame)  # warm codegen
    walls = []
    for _ in range(2):
        t0 = time.time(); noop(frame); walls.append(round(time.time() - t0, 2))
    out[name] = walls
print(json.dumps(out))
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
    for op in ("dq_row", "dq_uniq"):
        walls = {}
        for l in out["legs"]:
            if op in l:
                walls.setdefault(l["cores"], []).append(min(l[op]))
        if 8 in walls and 32 in walls:
            w8, w32 = min(walls[8]), min(walls[32])
            cpu_eff = min(c["cpu"]["eff_8_to_32"] for c in out["ceilings"])
            out[op] = {
                "w8": w8, "w32": w32,
                "raw_eff": round(w8 / (4 * w32), 3),
                "norm_eff": round(w8 / (4 * w32) / cpu_eff, 3),
                "throughput_8": round(N / w8 / 1e6, 1),
                "throughput_32": round(N / w32 / 1e6, 1),
            }
    (BENCH / "results" / "probe_dq_scaling.json").write_text(
        json.dumps(out, indent=1)
    )
    print(json.dumps({k: out[k] for k in ("dq_row", "dq_uniq") if k in out}))


if __name__ == "__main__":
    main()
