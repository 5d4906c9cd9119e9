"""JSONL source with schema enforcement and dead-letter routing —
the second real on-disk format next to parquet (S2), shaped for
ingest-from-logs deployments where upstream writers occasionally emit
garbage lines.

Spark's native PERMISSIVE json reader forbids selecting only the
corrupt-record column (it would prune the parse away), which forces a
cache() or a second scan to split good from bad. This module reads the
file ONCE as text and parses with from_json — a JVM-side whole-stage-
codegen expression — so the good/bad split is two filters over one
scan, no cache, no re-read, and the dead-letter branch keeps the raw
line for forensics. At 100 TB this is a map-only pass."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def jsonl_scan(
    spark: SparkSession,
    path: str,
    schema: str,
    required: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Read line-delimited JSON at `path` against `schema` (DDL
    string). Returns (good, dead_letter):

    - a line that does not parse as JSON at all → dead letter
      (from_json yields a NULL struct);
    - a line that parses but misses any `required` field → dead
      letter too (valid JSON, invalid record — silently nulling a key
      column corrupts downstream joins, so it routes out instead);
    - everything else → good, projected to the schema's columns.

    Both frames derive from ONE text scan; the raw line rides along in
    the dead-letter frame so the quarantine table is replayable."""
    parsed = spark.read.text(path).select(
        F.col("value").alias("_line"),
        F.from_json(F.col("value"), schema).alias("_r"),
    )
    ok = F.col("_r").isNotNull()
    for c in required or []:
        ok = ok & F.col(f"_r.{c}").isNotNull()
    good = parsed.where(ok).select("_r.*")
    dead = parsed.where(~ok).select(F.col("_line").alias("line"))
    return good, dead
