"""Structured Streaming increment == batch backfill (end state)."""

import math

import pyspark.sql.functions as F
import pytest

from tokens_ts import grid, pipeline, streaming
from tokens_ts.io.catalog import Catalog


def test_stream_increment_matches_batch(spark, seq_tiny, tmp_path):
    seq = grid.with_event_time(seq_tiny)

    # batch reference
    ref_root = str(tmp_path / "ref")
    pipeline.run_backfill(spark, seq, ref_root)

    # stream input: files arriving in three chunks
    in_dir = str(tmp_path / "in")
    for lo, hi in [(0, 150), (150, 300), (300, 10**9)]:
        seq.where((F.col("k") >= lo) & (F.col("k") < hi)).drop(
            "k", "event_ts"
        ).coalesce(1).write.mode("append").parquet(in_dir)

    out_root = str(tmp_path / "stream")
    # seed the warehouse so increments have tables to fold into
    pipeline.run_backfill(
        spark, seq.where(F.lit(False)), out_root
    )  # no-op backfill creates nothing; first increment bootstraps
    q = streaming.stream_increment(
        spark, in_dir, out_root, str(tmp_path / "ckpt")
    )
    q.awaitTermination(300)

    for name in ("t1m", "t1h", "t1d"):
        cat_a, cat_b = Catalog(out_root), Catalog(ref_root)
        a = {
            (r["source"], r["series_id"], r["window_start"]): (r["cnt"], r["sum"])
            for r in cat_a.read(spark, name).collect()
        }
        b = {
            (r["source"], r["series_id"], r["window_start"]): (r["cnt"], r["sum"])
            for r in cat_b.read(spark, name).collect()
        }
        assert a.keys() == b.keys()
        for k in a:
            assert a[k][0] == b[k][0]
            x, y = a[k][1], b[k][1]
            if x is None or y is None:
                assert x is None and y is None
            else:
                assert math.isclose(x, y, rel_tol=1e-12)
