"""Two-parallelism-level probe for the round-5m plan families.

Three NEW plan shapes this batch introduced:
  census   -- MinHash-LSH signatures + banded bucket self-join, then
              node-iterator triangle counting (degree agg + edge-edge
              join + left-semi closure) over a 4-doc-family synthetic
              corpus: the graph-analytics shuffle family
              (dedup.dup_graph_census over lsh_candidates, xxhash
              production path)
  survival -- (type, user) lead-window waits -> bounded histograms ->
              reverse-cumsum risk sets (kaplan_meier; logrank shares
              the construction): the per-user window family at
              survival's specific shape
  attrib   -- bucket-exploded conversion join (fanout exactly 2) +
              per-conversion rank windows (attribution_linear): the
              interval-join family at the attribution shape

Protocol = BENCH/BASELINE.md clean-window procedure (3 interleaved
rounds, in-round cpu + membw ceilings, fresh JVM per leg, warm + 2
timed noop-write reps, min-wall estimator, efficiencies raw AND
ceiling-normalized). spark.local.dir on tmpfs as in the r4/r5 probes.
Writes BENCH/results/probe_r5m_scaling.json.

Caution from calibration: timing reps MUST be noop writes — collect()
on one DataFrame object caches its executedPlan/RDD, so a second
collect skips every completed shuffle map stage and reads ~0 s.
"""

import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
BENCH = ROOT / "BENCH"

OPS = {"census": 300_000, "survival": 250_000_000, "attrib": 500_000_000}

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
    .config("spark.local.dir", "/dev/shm/spark_r5m")
    .config("spark.driver.memory", "20g")
    .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from tokens_ts import analytics, dedup

if op == "census":
    words = F.transform(F.sequence(F.lit(1), F.lit(30)),
        lambda i: F.concat(F.lit("w"),
            ((F.col("fam") * F.lit(31) + i * F.lit(7)) %% F.lit(50000)).cast("string"),
            F.when((i > 27) & (F.col("var") > 0),
                   F.concat(F.lit("_v"), F.col("var").cast("string"))
                   ).otherwise(F.lit(""))))
    docs = spark.range(0, n, 1, cores * 4).select(
        F.col("id").alias("doc_id"),
        (F.col("id") / 4).cast("bigint").alias("fam"),
        (F.col("id") %% 4).cast("bigint").alias("var"),
    ).select("doc_id", F.array_join(words, " ").alias("text"))
    out = dedup.dup_graph_census(
        dedup.lsh_candidates(docs, 32, 8, hash_mode="xxhash"))
else:
    NU = 1_000_000
    ev = spark.range(0, n, 1, cores * 4).select(
        (F.col("id") %% NU).alias("user_id"),
        F.col("id").alias("event_id"),
        F.when(F.col("id") %% 50 == 0, F.lit("purchase"))
         .otherwise(F.lit("click")).alias("event_type"),
        F.timestamp_seconds(
            F.lit(1767225600)
            + ((F.col("id") * 2654435761) %% 10_000_000)).alias("ts"),
    )
    if op == "survival":
        out = analytics.kaplan_meier(ev)
    else:
        out = analytics.attribution_linear(ev)

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
    return json.loads(lines[-1]) if lines else {
        "cores": cores, "op": op, "err": r.stderr[-800:]}


def main():
    out = {"volumes": OPS, "ceilings": [], "legs": []}
    for rnd in range(3):
        out["ceilings"].append(
            {"cpu": ceiling("cpu_control.py"),
             "membw": ceiling("membw_control.py")}
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
            out[op] = {
                "min_wall_8": w8, "min_wall_32": w32,
                "all_min_walls_8": walls[8], "all_min_walls_32": walls[32],
                "eff_raw": raw,
                "eff_vs_cpu_ceiling": round(raw / max(cpu_effs), 3),
                "eff_vs_membw_ceiling": round(raw / max(bw_effs), 3),
            }
    (BENCH / "results" / "probe_r5m_scaling.json").write_text(
        json.dumps(out, indent=1)
    )
    print(json.dumps({k: v for k, v in out.items()
                      if k not in ("legs", "ceilings")}))


if __name__ == "__main__":
    main()
