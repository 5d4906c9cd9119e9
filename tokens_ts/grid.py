"""Event-time derivation: doc_id → per-source event-time grid.

Reference analog: geomatics' time decode (t_var CF-units decode /
strp_filename strptime / ordinal fallback — geomatics/timeseries.py
entry-fn kwargs, UNVERIFIED, SURVEY.md S4). Here the grid index ``k``
is embedded in ``doc_id`` (``{source}-{k:012d}``) and the event time is
``t0 + k * step(source)`` — all native Spark expressions, so Catalyst
can constant-fold and push partition filters through them.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from tokens_ts import config as C

DOC_K_PATTERN = r"-(\d{12})$"


def k_from_doc_id(doc_id: Column = None) -> Column:
    """Grid index k parsed from doc_id (strp_filename analog)."""
    doc_id = F.col("doc_id") if doc_id is None else doc_id
    return F.regexp_extract(doc_id, DOC_K_PATTERN, 1).cast("bigint")


def source_ordinal(source: Column = None) -> Column:
    """Source ordinal s from the 'srcNN' name (drives the per-source step)."""
    source = F.col("source") if source is None else source
    return F.regexp_extract(source, r"(\d+)$", 1).cast("int")


def step_seconds_col(source: Column = None) -> Column:
    s = source_ordinal(source)
    return F.lit(60) * (F.lit(1) + s % 3)


def event_ts(doc_id: Column = None, source: Column = None) -> Column:
    """event_ts = t0 + k * step_s   (UTC, exact integer seconds)."""
    k = k_from_doc_id(doc_id)
    return F.timestamp_seconds(F.lit(C.T0_EPOCH) + k * step_seconds_col(source))


def with_event_time(df: DataFrame) -> DataFrame:
    """Attach (k, event_ts) to a sequences-shaped DataFrame."""
    return df.withColumn("k", k_from_doc_id()).withColumn(
        "event_ts", event_ts()
    )


def full_grid(spark, k_total: int, n_sources: int = C.DEFAULT_SOURCES) -> DataFrame:
    """The complete per-source grid (no gaps): one row per (source, slot).

    Used by gap-fill (SURVEY.md G1) to left-join observed points onto.
    ONE spark.range × a broadcast sources dim — plan size is O(1) in
    the source count. (The previous shape unioned one range branch per
    source: at thousands of sources the ANALYSIS cost grows linearly
    with the plan tree, before a single task runs.) The dim is a
    handful of scalars per source (name, budget, step) — driver-built
    rows are fine at any realistic source count; the k fan-out stays
    fully distributed in the range."""
    dim = spark.createDataFrame(
        [
            (f"src{s:02d}", C.source_budget(k_total, s), C.step_seconds(s))
            for s in range(n_sources)
        ],
        "source string, budget bigint, step bigint",
    )
    # s=0 has the largest Zipf budget; range covers it, the per-source
    # budget predicate trims the rest inside the broadcast join
    max_budget = C.source_budget(k_total, 0)
    return (
        spark.range(0, max_budget)
        .withColumnRenamed("id", "k")
        .join(F.broadcast(dim), F.col("k") < F.col("budget"))
        .select(
            "k",
            "source",
            F.timestamp_seconds(
                F.lit(C.T0_EPOCH) + F.col("k") * F.col("step")
            ).alias("event_ts"),
        )
    )
