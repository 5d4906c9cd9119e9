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
    ONE spark.range × a broadcast bucket dim — plan size is O(1) in
    the source count AND the join is an EQUI BroadcastHashJoin, not a
    nested loop. (A bare `k < budget` condition plans as
    BroadcastNestedLoopJoin: max_budget × n_sources predicate pairs
    for sum(budgets) output rows — a ~n/ln(n) waste factor under Zipf
    budgets.) Bucketing: each k hashes to bucket k div G; the dim
    holds one row per (source, covered bucket), so each k is probed
    only against sources whose budget actually reaches its bucket,
    plus one boundary bucket trimmed by the residual filter. G is
    sized so the dim stays ≤ ~1k rows per source scale — driver-built
    and broadcast-tiny; the k fan-out stays fully distributed."""
    # s=0 has the largest Zipf budget; the range covers it
    max_budget = C.source_budget(k_total, 0)
    granule = max(1, max_budget // 1024)
    dim = spark.createDataFrame(
        [
            (f"src{s:02d}", b, C.source_budget(k_total, s), C.step_seconds(s))
            for s in range(n_sources)
            for b in range(-(-C.source_budget(k_total, s) // granule))
        ],
        "source string, b bigint, budget bigint, step bigint",
    )
    return (
        spark.range(0, max_budget)
        .withColumnRenamed("id", "k")
        .withColumn("b", F.expr(f"k div {granule}"))
        .join(F.broadcast(dim), "b")
        .where(F.col("k") < F.col("budget"))
        .select(
            "k",
            "source",
            F.timestamp_seconds(
                F.lit(C.T0_EPOCH) + F.col("k") * F.col("step")
            ).alias("event_ts"),
        )
    )
