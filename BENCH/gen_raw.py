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


def synth_docs(spark: SparkSession, n: int, words_per_doc: int = 100) -> DataFrame:
    """Deterministic synthetic documents for dedup-stage benchmarks:
    ~100-word texts over a 400-word vocabulary via an integer
    recurrence (pure JVM expressions, ~10⁶ docs/s to generate). Every
    100th doc duplicates its predecessor's template so LSH buckets
    carry realistic collision structure."""
    df = spark.range(0, n, 1, spark.sparkContext.defaultParallelism * 4)
    id_ = F.col("id")
    tid = F.when(id_ % 100 == 99, id_ - 1).otherwise(id_)
    vocab = F.array(*[F.lit(f"w{i:03d}") for i in range(400)])
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(words_per_doc - 1)),
            lambda i: F.element_at(vocab, ((tid * 31 + i * 17) % 400 + 1).cast("int")),
        ),
        " ",
    )
    return df.select(
        id_.alias("doc_id"),
        text.alias("text"),
        F.lit("en").alias("lang"),
        F.concat(F.lit("src"), (id_ % 8).cast("string")).alias("source"),
    )


def tier_state(
    spark: SparkSession,
    n: int,
    n_sources: int = N_SOURCES,
    n_series: int = 2000,
    slots_unit_s: int = 60,
) -> DataFrame:
    """Synthetic partial-state tier rows at arbitrary volume.

    The cascade stages (1m→1h, 1h→1d) merge PARTIAL STATES, so their
    honest benchmark input is a tier-shaped table — deriving it from
    raw would need 60× the rows per cascade level (10^10+ raw points
    for a 60 s wall), while the merge itself only ever sees the tier
    rows. Wide key space (thousands of series) matches the 100-TB
    shape where series count, not per-series depth, carries the scale.
    slots_unit_s=60 yields 1m-tier rows; 3600 yields 1h-tier rows.
    """
    df = spark.range(0, n, 1, spark.sparkContext.defaultParallelism * 4)
    id_ = F.col("id")
    s = (id_ % n_sources).cast("int")
    series = ((id_ / n_sources).cast("bigint") % n_series).cast("int")
    slot = (id_ / (n_sources * n_series)).cast("bigint")
    v = ((id_ * C.GAP_MULT) % 1_000_000) / 1e3
    return df.select(
        F.concat(F.lit("src"), F.lpad(s.cast("string"), 2, "0")).alias("source"),
        F.concat(F.lit("series_"), series.cast("string")).alias("series_id"),
        F.timestamp_seconds(
            F.lit(C.T0_EPOCH) + slot * slots_unit_s
        ).alias("window_start"),
        (id_ % 7 + 1).cast("bigint").alias("cnt"),
        v.alias("sum"),
        (v / 7.0).alias("min"),
        v.alias("max"),
        (v * v).alias("sum_sq"),
    )
