"""One leg of the separate-executor-JVM raw->1m probe.

Times scan (count) and the full tiers.rollup('1m') over a parquet raw
table at the given master, in ONE fresh JVM (local[N]) or 4 fresh
executor JVMs (local-cluster[4,8,8192]) — the configuration question
the r4 deployment note left open: does the @32 slow mode (shared-heap
high-cardinality partial-agg state) disappear when the same 32 cores
are split across 4 separate 8-core heaps, as on a real cluster?

Usage: python probe_raw1m_worker.py <master> <data_dir> [expected_cores]
Prints ONE JSON line {"master":…, "cores":…, "scan":[…], "agg":[…]}.
"""

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

master, data = sys.argv[1], sys.argv[2]
expected = int(sys.argv[3]) if len(sys.argv) > 3 else 32

from pyspark.sql import SparkSession
import pyspark.sql.functions as F

b = (
    SparkSession.builder.master(master)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "8g")
    # same collector on both legs (bench.py rationale: G1 anti-scales
    # for allocation-heavy stages in one big heap)
    .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
    .config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC")
)
spark = b.getOrCreate()
sc = spark.sparkContext

# local-cluster executors register asynchronously: wait until the full
# core count is online so the first timed rep isn't half-cluster
t0 = time.time()
while sc.defaultParallelism < expected and time.time() - t0 < 120:
    time.sleep(0.5)
cores = sc.defaultParallelism
spark.conf.set("spark.sql.shuffle.partitions", str(2 * cores))

from tokens_ts import tiers

raw = spark.read.parquet(data)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


out = {"master": master, "cores": cores, "scan": [], "agg": []}
raw.agg(F.count("value")).collect()  # warm page cache + codegen
noop(tiers.rollup(raw, "1m"))  # warm the hash-agg path untimed
for _ in range(3):
    t0 = time.time()
    raw.agg(F.count("value")).collect()
    out["scan"].append(round(time.time() - t0, 2))
    t0 = time.time()
    noop(tiers.rollup(raw, "1m"))
    out["agg"].append(round(time.time() - t0, 2))
print(json.dumps(out))
spark.stop()
