"""Checkpoint manifest: per-partition lineage + metrics + resume.

North rule: "resumable from checkpoint with per-partition lineage and
metrics" (BASELINE.json:14; SURVEY.md §4.4). The unit of work is an
input partition — `source` in the sandbox, `(source_bucket, day)` at
10^12 scale; the manifest schema carries both via a string id.

Resume = left_anti join of pending partitions against status='done'
manifest rows (SURVEY.md J3). Manifest writes are parquet appends of a
handful of rows per completed batch — atomic enough per partition-file;
on Iceberg the same append is a snapshot commit.

The token-array-equality invariant travels as `token_checksum`: an
xor-fold of xxhash64(doc_id, tokens) per partition (order-independent,
overflow-free) — recomputable at any later stage to prove no rewrite
touched a token.
"""

from __future__ import annotations

import time
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MANIFEST_SCHEMA = StructType(
    [
        StructField("partition_id", StringType(), False),
        StructField("status", StringType(), False),
        StructField("rows_in", LongType()),
        StructField("points_raw", LongType()),
        StructField("points_1m", LongType()),
        StructField("points_1h", LongType()),
        StructField("points_1d", LongType()),
        StructField("token_checksum", LongType()),
        StructField("wall_ms", DoubleType()),
        StructField("attempt", LongType()),
        StructField("job_run_id", StringType()),
        StructField("ts", DoubleType()),
    ]
)


def new_run_id() -> str:
    return uuid.uuid4().hex[:12]


def token_checksum_by_partition(seq: DataFrame, partition_col: str = "source") -> DataFrame:
    """(partition_id, rows_in, token_checksum) — the invariant carrier."""
    return seq.groupBy(F.col(partition_col).alias("partition_id")).agg(
        F.count("*").alias("rows_in"),
        F.bit_xor(F.xxhash64("doc_id", "tokens")).alias("token_checksum"),
    )


MANIFEST_TABLE = "_lineage"


def read_manifest(spark: SparkSession, where) -> DataFrame:
    """`where` is a Catalog (format-aware: parquet path OR iceberg
    table identifier) or, for backward compatibility with tests and
    ad-hoc inspection, a plain parquet path string. The manifest must
    go through the same format dispatch as the data tables — a
    filesystem path under an iceberg root like 'lake.db' would resolve
    against the driver's working directory and silently break the
    exactly-once batch gate.

    Only a MISSING manifest degrades to an empty frame (first run).
    Any other read failure re-raises: a transiently unreadable
    manifest must abort the job — treating it as empty would make
    every replay gate see 'nothing done' and re-execute committed
    batches with side effects (DLQ/watermark reclassification),
    diverging silently instead of failing loudly."""
    from pyspark.errors import AnalysisException

    try:
        if isinstance(where, str):
            return spark.read.schema(MANIFEST_SCHEMA).parquet(where)
        return where.read(spark, MANIFEST_TABLE)
    except (AnalysisException, FileNotFoundError) as e:
        msg = str(e)
        if (
            isinstance(e, FileNotFoundError)
            or "PATH_NOT_FOUND" in msg
            or "TABLE_OR_VIEW_NOT_FOUND" in msg
            or "Path does not exist" in msg
        ):
            return spark.createDataFrame([], MANIFEST_SCHEMA)
        raise


def done_partitions(spark: SparkSession, where) -> DataFrame:
    """Distinct partition ids already completed (any attempt)."""
    return (
        read_manifest(spark, where)
        .where(F.col("status") == "done")
        .select("partition_id")
        .distinct()
    )


def is_done(spark: SparkSession, where, partition_id: str) -> bool:
    """Server-side membership probe for ONE partition/batch marker.

    The hot-path replay gate (run_increment per batch, streaming._fold
    per epoch) needs exactly one bit — collecting the full done-set to
    the driver costs O(total-epochs) per epoch on a manifest that
    grows forever. The filter + limit(1) shape pushes the predicate
    into the scan (parquet row-group stats / Iceberg file pruning) and
    ships back at most one row."""
    return (
        not read_manifest(spark, where)
        .where((F.col("partition_id") == partition_id) & (F.col("status") == "done"))
        .limit(1)
        .isEmpty()
    )


def filter_pending(
    df: DataFrame, done: DataFrame, partition_col: str = "source"
) -> DataFrame:
    """Drop rows whose partition already completed — broadcast anti-join
    (the done set is tiny: one row per partition, not per data row)."""
    return df.join(
        F.broadcast(done.withColumnRenamed("partition_id", partition_col)),
        partition_col,
        "left_anti",
    )


def record_done(
    spark: SparkSession,
    where,
    lineage_rows: list[dict],
    job_run_id: str,
    attempt_base: dict[str, int] | None = None,
) -> None:
    now = time.time()
    attempt_base = attempt_base or {}
    rows = [
        Row(
            partition_id=r["partition_id"],
            status="done",
            rows_in=int(r.get("rows_in", 0)),
            points_raw=int(r.get("points_raw", 0)),
            points_1m=int(r.get("points_1m", 0)),
            points_1h=int(r.get("points_1h", 0)),
            points_1d=int(r.get("points_1d", 0)),
            token_checksum=int(r.get("token_checksum") or 0),
            wall_ms=float(r.get("wall_ms", 0.0)),
            attempt=int(attempt_base.get(r["partition_id"], 0)) + 1,
            job_run_id=job_run_id,
            ts=now,
        )
        for r in lineage_rows
    ]
    df = spark.createDataFrame(rows, MANIFEST_SCHEMA).coalesce(1)
    if isinstance(where, str):
        df.write.mode("append").parquet(where)
    else:
        where.append(df, MANIFEST_TABLE)
