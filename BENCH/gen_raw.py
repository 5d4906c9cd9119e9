"""Direct raw-tier point generator for tier-stage benchmarks.

Extraction is the CPU-heavy stage and is benchmarked on the real
sequences fixture; the tier stages (rollup/cascade) need 10-100×
more points than extraction can produce in bench time to exercise the
shuffle at scale. This generator builds raw-tier points straight from
spark.range — same schema, deterministic, ~10⁷ rows/s.

Layout: `ppm` points per (source, series, minute); value is a cheap
integer hash → double. 8 sources × 2 series.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from tokens_ts import config as C

N_SOURCES = 8
N_SERIES = 2


def raw_points(spark: SparkSession, n: int, ppm: int = 10) -> DataFrame:
    df = spark.range(0, n, 1, spark.sparkContext.defaultParallelism * 4)
    id_ = F.col("id")
    s = (id_ % N_SOURCES).cast("int")
    series = ((id_ / N_SOURCES).cast("bigint") % N_SERIES).cast("int")
    slot = (id_ / (N_SOURCES * N_SERIES)).cast("bigint")
    minute = (slot / ppm).cast("bigint")
    offset = (slot % ppm) * (60 // ppm if ppm <= 60 else 1)
    return df.select(
        F.concat(F.lit("src"), F.lpad(s.cast("string"), 2, "0")).alias("source"),
        F.concat(F.lit("series_"), series.cast("string")).alias("series_id"),
        F.timestamp_seconds(
            F.lit(C.T0_EPOCH) + minute * 60 + offset
        ).alias("event_ts"),
        (((id_ * C.GAP_MULT) % 1_000_000) / 1e3).alias("value"),
    )
