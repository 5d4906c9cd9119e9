"""Per-tier throughput benchmark for the tokens_ts engine.

Measures the north-rule metric (BASELINE.json:2): rolled-up points/sec
per retention tier (raw→1m, 1m→1h, 1h→1d), on the deterministic
FIXTURES.md sequences table generated in-Spark at a chosen scale.

Launch (the spark-submit --py-files path mandated by the north rule):

    python tools/make_pyfiles.py           # builds tokens_ts.zip
    spark-submit --master local[8]  --py-files tokens_ts.zip \
        BENCH/run_bench.py --k 600000 --out /tmp/bench8.json
    spark-submit --master local[32] --py-files tokens_ts.zip \
        BENCH/run_bench.py --k 600000 --out /tmp/bench32.json

Scaling efficiency N→4N = (thr_32 / thr_8) / 4, target ≥ 0.8
(BASELINE.md protocol — same input, two parallelism levels).

Each tier is timed as its own job reading its input from parquet, so
the numbers are the real shuffle+scan cost of that tier, not a fused
pipeline artifact.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=200_000, help="grid budget of src00")
    ap.add_argument("--sources", type=int, default=8)
    ap.add_argument("--warehouse", default="/tmp/tokens_ts_bench")
    ap.add_argument("--out", default="")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    import pyspark.sql.functions as F

    spark = (
        SparkSession.builder.appName("tokens_ts-bench")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    cores = spark.sparkContext.defaultParallelism
    spark.conf.set("spark.sql.shuffle.partitions", str(4 * cores))

    from tokens_ts import extract, synth, tiers

    wh = Path(args.warehouse)
    if wh.exists():
        shutil.rmtree(wh)
    wh.mkdir(parents=True)

    res: dict = {"cores": cores, "k": args.k, "sources": args.sources, "tiers": {}}

    # ---- generate + extract → raw tier -------------------------------------
    t0 = time.time()
    seq = synth.sequences(spark, args.k, args.sources)
    raw = extract.to_raw(extract.full_stats(seq, stats=["mean", "max"]))
    raw.write.mode("overwrite").parquet(str(wh / "raw"))
    gen_s = time.time() - t0
    raw_df = spark.read.parquet(str(wh / "raw"))
    n_raw = raw_df.count()
    res["extract"] = {"wall_s": round(gen_s, 3), "rows_out": n_raw,
                      "rows_per_s": round(n_raw / gen_s, 1)}

    # ---- raw → 1m -----------------------------------------------------------
    t0 = time.time()
    tiers.rollup(raw_df, "1m").write.mode("overwrite").parquet(str(wh / "t1m"))
    w = time.time() - t0
    t1m = spark.read.parquet(str(wh / "t1m"))
    n1m = t1m.count()
    res["tiers"]["raw_to_1m"] = {
        "wall_s": round(w, 3),
        "points_in": n_raw,
        "rows_out": n1m,
        "points_per_s": round(n_raw / w, 1),
    }

    # ---- 1m → 1h ------------------------------------------------------------
    t0 = time.time()
    tiers.cascade(t1m, "1h").write.mode("overwrite").parquet(str(wh / "t1h"))
    w = time.time() - t0
    t1h = spark.read.parquet(str(wh / "t1h"))
    n1h = t1h.count()
    res["tiers"]["1m_to_1h"] = {
        "wall_s": round(w, 3),
        "points_in": n1m,
        "rows_out": n1h,
        "points_per_s": round(n1m / w, 1),
    }

    # ---- 1h → 1d ------------------------------------------------------------
    t0 = time.time()
    tiers.cascade(t1h, "1d").write.mode("overwrite").parquet(str(wh / "t1d"))
    w = time.time() - t0
    n1d = spark.read.parquet(str(wh / "t1d")).count()
    res["tiers"]["1h_to_1d"] = {
        "wall_s": round(w, 3),
        "points_in": n1h,
        "rows_out": n1d,
        "points_per_s": round(n1h / w, 1),
    }

    # ---- codec segment encode (C1-C4 throughput) ----------------------------
    from tokens_ts import codec

    t0 = time.time()
    segs = codec.encode_segments(
        raw_df.where(F.col("value").isNotNull()), "1h"
    )
    stats = segs.agg(
        F.sum("n").alias("pts"), F.sum("enc_bytes").alias("enc"), F.sum("raw_bytes").alias("rawb")
    ).collect()[0]
    w = time.time() - t0
    res["codec_encode"] = {
        "wall_s": round(w, 3),
        "points": int(stats["pts"]),
        "points_per_s": round(stats["pts"] / w, 1),
        "compression_ratio": round(stats["enc"] / stats["rawb"], 4),
    }

    if not args.keep:
        shutil.rmtree(wh)

    line = json.dumps(res)
    print(line)
    if args.out:
        Path(args.out).write_text(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
