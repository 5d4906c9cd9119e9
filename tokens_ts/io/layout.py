"""Physical-layout audits: file skipping and compaction policy.

Min/max pruning is the lakehouse's cheapest lever — Iceberg file stats
and parquet row-group stats both skip units whose [min, max] cannot
intersect the predicate — but whether it actually FIRES is a property
of the layout, not the reader: a column scattered across every file
skips nothing. `skipping_audit` measures that property for a table +
range predicate (the decision input for "would a sort/z-order rewrite
pay off"); `compaction_candidates` is the policy half of
`Catalog.compact_partitions` — which partitions have degenerated into
small-file soup and are worth rewriting.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from tokens_ts.io.catalog import Catalog


def skipping_audit(
    spark: SparkSession, path: str, col: str, lo: float, hi: float
) -> DataFrame:
    """Per-FILE stats of `col` and whether a `col BETWEEN lo AND hi`
    predicate could skip the file outright (file_max < lo or
    file_min > hi — the exact test Iceberg evaluates on its file
    stats and the parquet reader on row-group stats).

    One scan, grouped on input_file_name(): the audit reads the data
    once to recompute what the footers already know, because the point
    is the REPORT (skip fraction per predicate) — at 10^12 rows the
    production form reads Iceberg's files metadata table instead, and
    this is the parquet-fallback equivalent with identical output
    semantics. Columns: file, n, vmin, vmax, skippable."""
    return (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("file"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.min(col).alias("vmin"),
            F.max(col).alias("vmax"),
        )
        .withColumn(
            "skippable",
            (F.col("vmax") < F.lit(lo)) | (F.col("vmin") > F.lit(hi)),
        )
    )


def compaction_candidates(
    spark: SparkSession,
    cat: Catalog,
    name: str,
    max_files: int = 8,
    min_avg_mb: float = 16.0,
) -> list[dict]:
    """Which partitions should `Catalog.compact_partitions` rewrite:
    every leaf partition whose data-file count exceeds `max_files` OR
    whose mean file size is under `min_avg_mb` (small-file soup from
    thousands of incremental commits). Pure control plane — one
    recursive Hadoop-FS listing, no Spark job; output is
    partition-count bounded and feeds compact_partitions directly as
    its `keys` argument (each dict carries `partition` plus the
    measured n_files / avg_mb so the operator can log the decision).

    Iceberg note: the same policy reads the `files` metadata table;
    this walks the hive layout the parquet fallback writes."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    HPath = jvm.org.apache.hadoop.fs.Path
    base = HPath(cat.path(name))
    fs = base.getFileSystem(hconf)
    if not fs.exists(base):
        return []
    base_str = str(fs.makeQualified(base))
    out: list[dict] = []

    def walk(d):
        files, subdirs = [], []
        for st in fs.listStatus(d):
            nm = st.getPath().getName()
            if nm.startswith(("_", ".")):
                continue
            (subdirs if st.isDirectory() else files).append(st)
        if files:
            rel = str(fs.makeQualified(d))[len(base_str):].strip("/")
            key = dict(
                seg.split("=", 1) for seg in rel.split("/") if "=" in seg
            )
            n = len(files)
            avg_mb = sum(f.getLen() for f in files) / n / (1024 * 1024)
            if n > max_files or avg_mb < min_avg_mb:
                out.append(
                    {
                        "partition": key,
                        "n_files": n,
                        "avg_mb": round(avg_mb, 3),
                    }
                )
        for sd in subdirs:
            walk(sd.getPath())

    walk(base)
    return sorted(out, key=lambda d: tuple(sorted(d["partition"].items())))
