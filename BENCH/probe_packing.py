"""Packing-stage scaling probe: 3 reps of pack_tokens(2048) over a
pre-generated tmpfs sequences table; invoked per parallelism level by
the interleaved window driver (results/scaling_runs_r4d_*)."""
import json, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
import pyspark.sql.functions as F
spark = SparkSession.builder.config("spark.ui.enabled","false").config("spark.sql.adaptive.enabled","true").config("spark.sql.session.timeZone","UTC").getOrCreate()
cores = spark.sparkContext.defaultParallelism
spark.conf.set("spark.sql.shuffle.partitions", str(2*cores))
from tokens_ts import packing
seq = spark.read.parquet(sys.argv[1])
def noop(df): df.write.format("noop").mode("overwrite").save()
out = {"cores": cores, "walls": []}
noop(packing.pack_tokens(seq, 2048))
for _ in range(3):
    t0=time.time(); noop(packing.pack_tokens(seq, 2048)); out["walls"].append(round(time.time()-t0,1))
print(json.dumps(out))
spark.stop()
