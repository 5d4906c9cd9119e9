"""SQL surface: views over a backfilled warehouse + canned reports."""

import pyspark.sql.functions as F

from tokens_ts import grid, pipeline
from tokens_ts import sql as tsql


def test_views_and_reports_over_backfilled_warehouse(spark, seq_tiny, tmp_path):
    seq = grid.with_event_time(seq_tiny)
    root = str(tmp_path / "wh")
    pipeline.run_backfill(spark, seq, root)

    views = tsql.register_views(spark, root)
    assert set(views) == {"raw", "t1m", "t1h", "t1d", "lineage"}

    # ad-hoc ANSI SQL works over the views and agrees with the tables
    n_sql = spark.sql("SELECT count(*) FROM t1m").collect()[0][0]
    from tokens_ts.io.catalog import Catalog

    assert n_sql == Catalog(root).read(spark, "t1m").count()

    summary = {r["tier"]: r for r in tsql.tier_summary(spark).collect()}
    assert set(summary) == {"t1m", "t1h", "t1d"}
    # cascades only coarsen: window counts strictly decrease up the tiers
    assert (
        summary["t1m"]["n_windows"]
        > summary["t1h"]["n_windows"]
        > summary["t1d"]["n_windows"]
    )
    assert summary["t1m"]["n_sources"] == 4

    fresh = {r["source"]: r for r in tsql.freshness(spark).collect()}
    assert set(fresh) == {"src00", "src01", "src02", "src03"}
    for r in fresh.values():
        # the 1m rollup's last window floor-truncates the latest point
        assert 0 <= r["lag_s"] < 60

    lin = {r["partition_id"]: r for r in tsql.lineage_report(spark).collect()}
    assert set(lin) == {"src00", "src01", "src02", "src03"}
    assert all(r["status"] == "done" and r["attempts"] == 1 for r in lin.values())
    # report rows_in matches the actual input partition sizes
    sizes = {
        r["source"]: r["cnt"]
        for r in seq.groupBy("source").agg(F.count("*").alias("cnt")).collect()
    }
    for s, r in lin.items():
        assert r["rows_in"] == sizes[s], s
