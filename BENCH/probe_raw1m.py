"""Localize the raw->1m 8->32 scaling limiter: scan vs hash-agg.

Times, at one parallelism level (worker invoked once per level):
  scan     : count(value) over the 300M-row parquet — parquet decode
             + predicate-free scan, no aggregation state
  agg      : full tiers.rollup('1m') materialized to noop — scan +
             partial hash agg + 1 shuffle + final agg
The delta isolates the aggregation stage; comparing levels shows which
part stops scaling.
"""
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "BENCH"))

from pyspark.sql import SparkSession
import pyspark.sql.functions as F

data = sys.argv[1]
spark = (SparkSession.builder
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.ui.enabled", "false").getOrCreate())
cores = spark.sparkContext.defaultParallelism
spark.conf.set("spark.sql.shuffle.partitions", str(2 * cores))
from tokens_ts import tiers

raw = spark.read.parquet(data)

def noop(df):
    df.write.format("noop").mode("overwrite").save()

out = {"cores": cores, "scan": [], "agg": [], "agg_noshuffle": []}
raw.agg(F.count("value")).collect()  # warm page cache + codegen
noop(tiers.rollup(raw, "1m"))
for _ in range(3):
    t0 = time.time(); raw.agg(F.count("value")).collect(); out["scan"].append(round(time.time()-t0, 2))
    t0 = time.time(); noop(tiers.rollup(raw, "1m")); out["agg"].append(round(time.time()-t0, 2))
print(json.dumps(out))
spark.stop()
