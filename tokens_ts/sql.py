"""SQL surface: register a warehouse's tables as views + canned reports.

The reference has no SQL layer (SURVEY.md §3.3); the Spark-first answer
is not a parser but the session catalog: register each tier table as a
temp view and let users run ANSI SQL over them (spark.sql), with
Catalyst doing pushdown/pruning exactly as it does for the DataFrame
API. Canned reports cover the questions an operator asks a tier store
first; each is plain SQL over the views, so it also documents the
schema contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tokens_ts.io.catalog import Catalog

TIER_VIEWS = ("sequences", "raw", "t1m", "t1h", "t1d", "dead_letter")


def register_views(
    spark: SparkSession, out_root: str, fmt: str = "parquet", prefix: str = ""
) -> list[str]:
    """Register every existing warehouse table as `<prefix><name>`.

    Views are lazy: each spark.sql over them re-plans against the
    current table state (new partitions appear without re-registering
    on Iceberg; on parquet the file listing is refreshed per query).
    Returns the registered view names."""
    cat = Catalog(out_root, fmt)
    names = []
    for name in TIER_VIEWS + ("_lineage",):
        if not cat.exists(spark, name):
            continue
        view = f"{prefix}{name.lstrip('_')}"
        cat.read(spark, name).createOrReplaceTempView(view)
        names.append(view)
    return names


def _view(spark: SparkSession, prefix: str, name: str) -> str | None:
    """Resolve `<prefix><name>` iff registered in the session catalog
    (so reports degrade gracefully on a partial store / custom prefix
    instead of throwing TABLE_OR_VIEW_NOT_FOUND mid-query)."""
    view = f"{prefix}{name}"
    return view if spark.catalog.tableExists(view) else None


def tier_summary(spark: SparkSession, prefix: str = "") -> DataFrame:
    """Rows/series/day-span per tier — the first sanity query on any
    tier store. UNION ALL of per-view aggregates; each leg is one
    column-pruned scan. Legs whose view is absent are skipped."""
    legs = []
    for name in ("t1m", "t1h", "t1d"):
        view = _view(spark, prefix, name)
        if view is None:
            continue
        legs.append(
            f"""SELECT '{name}' AS tier,
                       count(*) AS n_windows,
                       count(DISTINCT source) AS n_sources,
                       count(DISTINCT series_id) AS n_series,
                       min(window_start) AS first_window,
                       max(window_start) AS last_window
                FROM {view}"""
        )
    if not legs:
        raise ValueError(
            f"tier_summary: no tier views registered under prefix {prefix!r}"
            " — call register_views first"
        )
    return spark.sql(" UNION ALL ".join(legs))


def freshness(spark: SparkSession, prefix: str = "") -> DataFrame:
    """Per-source staleness: latest rolled-up window per tier vs the
    raw tier's latest point — the lag a monitoring page alerts on."""
    raw = _view(spark, prefix, "raw")
    t1m = _view(spark, prefix, "t1m")
    if raw is None:
        raise ValueError(
            f"freshness: view {prefix!r}+'raw' not registered"
            " — call register_views first"
        )
    if t1m is None:
        # No rollup yet: report raw freshness with null lag.
        return spark.sql(
            f"""SELECT source, max(event_ts) AS latest_raw,
                       CAST(NULL AS timestamp) AS latest_1m,
                       CAST(NULL AS bigint) AS lag_s
                FROM {raw} GROUP BY source"""
        )
    return spark.sql(
        f"""
        WITH r AS (
          SELECT source, max(event_ts) AS latest_raw FROM {raw} GROUP BY source
        ),
        m AS (
          SELECT source, max(window_start) AS latest_1m FROM {t1m} GROUP BY source
        )
        SELECT r.source, r.latest_raw, m.latest_1m,
               unix_timestamp(r.latest_raw) - unix_timestamp(m.latest_1m)
                 AS lag_s
        FROM r LEFT JOIN m ON r.source = m.source
        """
    )


def lineage_report(spark: SparkSession, prefix: str = "") -> DataFrame:
    """Manifest rollup: attempts / rows / points per partition (latest
    row per partition, duplicate-tolerant like every manifest consumer)."""
    lineage = _view(spark, prefix, "lineage")
    if lineage is None:
        raise ValueError(
            f"lineage_report: view {prefix!r}+'lineage' not registered"
            " — call register_views first"
        )
    return spark.sql(
        f"""
        SELECT partition_id,
               max(attempt) AS attempts,
               max_by(status, struct(ts, attempt)) AS status,
               max_by(rows_in, struct(ts, attempt)) AS rows_in,
               max_by(points_raw, struct(ts, attempt)) AS points_raw,
               max(max_event_us) AS max_event_us
        FROM {lineage} GROUP BY partition_id
        """
    )
