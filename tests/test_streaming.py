"""Structured Streaming increment == batch backfill (end state),
plus the dead-letter route for beyond-watermark rows."""

import math

import pyspark.sql.functions as F
import pytest

from tokens_ts import grid, pipeline, streaming
from tokens_ts.io.catalog import Catalog


def _compare_tiers(spark, out_root, ref_root):
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

    _compare_tiers(spark, out_root, ref_root)


def test_stream_dead_letter_routes_late_rows(spark, seq_tiny, tmp_path):
    """Rows older than high-watermark − lateness land in dead_letter;
    on-time rows land in the tiers; nothing is silently dropped."""
    seq = grid.with_event_time(seq_tiny).where(F.col("source") == "src00")
    in_dir, out_root, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )

    # epoch 1: the recent half establishes the watermark
    # (src00: step 60 s, max k ≈ 399 → watermark ≈ t0 + 399 min)
    recent = seq.where(F.col("k") >= 200)
    recent.drop("k", "event_ts").coalesce(1).write.mode("append").parquet(in_dir)
    q = streaming.stream_increment(spark, in_dir, out_root, ckpt, lateness="4 hours")
    q.awaitTermination(300)

    # epoch 2: very-late rows (k < 50 → ~5.8 h behind the watermark,
    # beyond the 4 h bound) mixed with slightly-late-but-in-bound ones
    # (k ∈ [195, 200) → ~3.4 h behind)
    late_ks = {r["k"] for r in seq.where(F.col("k") < 50).select("k").collect()}
    assert late_ks
    mixed = seq.where((F.col("k") < 50) | ((F.col("k") >= 195) & (F.col("k") < 200)))
    mixed.drop("k", "event_ts").coalesce(1).write.mode("append").parquet(in_dir)
    q = streaming.stream_increment(spark, in_dir, out_root, ckpt, lateness="4 hours")
    q.awaitTermination(300)

    cat = Catalog(out_root)
    dl = grid.with_event_time(cat.read(spark, "dead_letter").drop("k", "event_ts"))
    dl_ks = {r["k"] for r in dl.select("k").collect()}
    assert dl_ks == late_ks, "exactly the late rows are dead-lettered"
    assert {r["dl_reason"] for r in dl.select("dl_reason").collect()} == {
        "beyond_watermark"
    }
    # the late rows' windows never entered the tiers: the earliest tier
    # window is at/after the earliest ON-TIME row folded
    t1m = cat.read(spark, "t1m")
    min_window = t1m.agg(F.min("window_start").alias("m")).collect()[0]["m"]
    min_ontime = (
        seq.where((F.col("k") >= 195) & (F.col("k") < 200))
        .agg(F.min("event_ts").alias("m"))
        .collect()[0]["m"]
    )
    assert t1m.count() > 0 and min_window >= min_ontime


def test_stream_sessionize_stateful(spark, tmp_path):
    """applyInPandasWithState sessionization: a within-batch gap closes
    a session immediately; the trailing open session is held in state
    and flushed by the event-time timeout once the watermark passes
    session_end + gap."""
    import datetime as dt

    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
    )
    t0 = dt.datetime(2026, 1, 1, 8, 0, 0)

    def write_file(rows):
        spark.createDataFrame(rows, "user_id long, ts timestamp").coalesce(
            1
        ).write.mode("append").parquet(in_dir)

    def run_once():
        stream = (
            spark.readStream.schema("user_id long, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q = (
            streaming.stream_sessionize(stream, gap_seconds=1800)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    def sessions():
        try:
            return {
                (r["user_id"], r["session_start"], r["n_events"])
                for r in spark.read.parquet(out_dir).collect()
            }
        except Exception:
            return set()

    m = dt.timedelta(minutes=1)
    # burst A (3 events) then a >30min silence then burst B (2 events)
    write_file(
        [(1, t0), (1, t0 + 2 * m), (1, t0 + 5 * m)]
        + [(1, t0 + 120 * m), (1, t0 + 122 * m)]
    )
    run_once()
    # nothing is sealed yet: a session emits only once the watermark
    # passes session_end + gap (events within allowed lateness could
    # still merge into A or B)
    assert sessions() == set()

    # out-of-order event EARLIER than burst B's start (within gap, and
    # above the current watermark t0+2m): B must extend BACKWARDS —
    # the single-open-session design got this wrong. The user-99 event
    # advances the watermark to t0+600m; availableNow then runs a
    # no-data micro-batch in the same query, so the event-time timeouts
    # fire and seal both of user 1's sessions within this run.
    write_file([(1, t0 + 115 * m), (99, t0 + 720 * m)])
    run_once()
    got = sessions()
    assert (1, t0, 3) in got, got              # burst A
    assert (1, t0 + 115 * m, 3) in got, got    # burst B extended backwards
    assert all(s[0] != 99 for s in got)        # user 99 still open

    # replay safety: another batch must not re-emit sealed sessions
    write_file([(99, t0 + 721 * m)])
    run_once()
    rows = spark.read.parquet(out_dir).where("user_id = 1").collect()
    assert len(rows) == 2, rows                # exactly once each


def test_stream_with_compaction_keeps_manifest_bounded(spark, seq_tiny, tmp_path):
    """compact_every=1: after a multi-epoch stream the manifest holds
    exactly one row per marker (no unbounded per-epoch file growth) and
    the tier state still matches the batch backfill."""
    from tokens_ts import checkpoint

    seq = grid.with_event_time(seq_tiny)
    ref_root = str(tmp_path / "ref")
    pipeline.run_backfill(spark, seq, ref_root)

    in_dir = str(tmp_path / "in")
    # 8 single-file chunks; maxFilesPerTrigger=4 → ≥2 epochs
    ks = sorted(r["k"] for r in seq.select("k").distinct().collect())
    cuts = [ks[i * len(ks) // 8] for i in range(8)] + [10**9]
    for lo, hi in zip(cuts, cuts[1:]):
        seq.where((F.col("k") >= lo) & (F.col("k") < hi)).drop(
            "k", "event_ts"
        ).coalesce(1).write.mode("append").parquet(in_dir)

    out_root = str(tmp_path / "stream")
    q = streaming.stream_increment(
        spark, in_dir, out_root, str(tmp_path / "ckpt"),
        lateness="100 days",  # exercises the watermark-from-manifest path
        compact_every=1,
    )
    q.awaitTermination(300)

    _compare_tiers(spark, out_root, ref_root)
    cat = Catalog(out_root)
    m = checkpoint.read_manifest(spark, cat)
    rows = m.collect()
    markers = {r["partition_id"] for r in rows}
    assert len(rows) == len(markers), "compaction left duplicate marker rows"
    assert all(p.startswith("batch:epoch-") for p in markers)
    assert checkpoint.watermark_us(spark, cat) is not None


def test_stream_dedup_emits_first_arrival_only(spark, tmp_path):
    """Exact streaming dedup: duplicate content inside the watermark
    window is dropped; distinct content passes; each hash is emitted
    exactly once across micro-batches."""
    import datetime as dt

    in_dir = str(tmp_path / "docs_in")
    t0 = dt.datetime(2024, 1, 1)
    schema = "doc_id long, text string, ingest_ts timestamp"
    # batch 1: two distinct docs + an in-batch duplicate
    spark.createDataFrame(
        [
            (1, "alpha body", t0),
            (2, "beta body", t0 + dt.timedelta(minutes=1)),
            (3, "alpha body", t0 + dt.timedelta(minutes=2)),
        ],
        schema,
    ).coalesce(1).write.mode("append").parquet(in_dir)
    # batch 2 (same listing — file source reads all): cross-batch dup + new doc
    spark.createDataFrame(
        [
            (4, "beta body", t0 + dt.timedelta(minutes=3)),
            (5, "gamma body", t0 + dt.timedelta(minutes=4)),
        ],
        schema,
    ).coalesce(1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    out = streaming.stream_dedup(stream, watermark="1 hour")
    sink = str(tmp_path / "dedup_out")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "dedup_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    rows = spark.read.parquet(sink).collect()
    by_hash = {}
    for r in rows:
        by_hash.setdefault(r["content_hash"], []).append(r["doc_id"])
    # one emission per distinct content, and it is the first arrival
    assert sorted(len(v) for v in by_hash.values()) == [1, 1, 1]
    emitted_ids = {v[0] for v in by_hash.values()}
    assert emitted_ids == {1, 2, 5}


def test_stream_token_bucket_out_of_order_equals_batch(spark, tmp_path):
    """The streaming bucket must equal the batch replay on the sealed
    event-time prefix even when arrival order is WRONG: the later
    event (t+62m) arrives first, the earlier one (t+60m) arrives in a
    later file, and decisions flush only after the watermark seals
    them — in correct event-time order."""
    import datetime as dt

    from tokens_ts import analytics

    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
    )
    t0 = dt.datetime(2026, 1, 1, 8, 0, 0)
    m = dt.timedelta(minutes=1)

    def write_file(rows):
        spark.createDataFrame(
            rows, "user_id long, event_id long, ts timestamp"
        ).coalesce(1).write.mode("append").parquet(in_dir)

    def run_once():
        stream = (
            spark.readStream.schema("user_id long, event_id long, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q = (
            streaming.stream_token_bucket(stream, cap=300, cost=250)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    def decided():
        try:
            return {
                (r["event_id"], r["ep"], r["level_after"], r["admitted"])
                for r in spark.read.parquet(out_dir).collect()
            }
        except Exception:
            return set()

    write_file([(1, 2, t0 + 62 * m)])                    # later event first
    write_file([(1, 1, t0 + 60 * m), (9, 99, t0 + 600 * m)])  # earlier + wm push
    run_once()
    write_file([(9, 100, t0 + 1200 * m)])                # push wm further
    run_once()
    out = decided()
    batch = {
        (r["event_id"], r["ep"], r["level_after"], r["admitted"])
        for r in analytics.token_bucket(
            spark.createDataFrame(
                [(1, 1, t0 + 60 * m), (1, 2, t0 + 62 * m)],
                "user_id long, event_id long, ts timestamp",
            ),
            keys=["user_id"],
            ts_col="ts",
            cap=300,
            cost=250,
        ).collect()
    }
    # u1's two events sealed and identical to the batch replay
    # (reject case: e1 admits 300→50, e2 pre=min(300,50+120)=170 <250 → reject)
    assert batch <= out
    assert {t[3] for t in batch} == {1, 0}
    # the sentinel events themselves are not yet sealed
    assert all(eid not in (100,) for eid, *_ in out)


def test_stream_gapfill_out_of_order_and_seal(spark, tmp_path):
    """Forward-fill must emit the dense sealed grid in event-time
    order even when the LATER observation arrives first: gap slots
    carry the correct earlier slot's aggregate, the unsealed tail
    stays unemitted until the watermark passes, and a re-run after
    the watermark advances appends exactly the newly-sealed slots."""
    import datetime as dt

    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
    )
    t0 = dt.datetime(2026, 1, 1, 8, 0, 0)
    m = dt.timedelta(minutes=1)

    def write_file(rows):
        spark.createDataFrame(
            rows, "event_type string, ts timestamp, value double"
        ).coalesce(1).write.mode("append").parquet(in_dir)

    def run_once():
        stream = (
            spark.readStream.schema(
                "event_type string, ts timestamp, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q = (
            streaming.stream_gapfill(stream, watermark="1 hour")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    def emitted():
        try:
            return {
                (
                    r["series_id"], r["slot_epoch"], r["src_slot_epoch"],
                    r["sum_e3"], r["cnt"], r["filled"],
                )
                for r in spark.read.parquet(out_dir).collect()
            }
        except Exception:
            return set()

    ep0 = int(t0.timestamp())
    # minute 3 arrives BEFORE minutes 0 and 1 (two events in slot 0)
    write_file([("a", t0 + 3 * m, 7.0)])
    write_file([
        ("a", t0, 2.0),
        ("a", t0, 4.0),
        ("a", t0 + 1 * m, 10.0),
        ("a", t0 + 200 * m, 99.0),  # pushes wm past slot 3
    ])
    run_once()
    out1 = emitted()
    # sealed prefix: slots 0..3; slot 2 is the filled gap carrying
    # slot 1's aggregate; slot 0 aggregates BOTH its events
    assert ("a", ep0, ep0, 6000, 2, False) in out1
    assert ("a", ep0 + 60, ep0 + 60, 10000, 1, False) in out1
    assert ("a", ep0 + 120, ep0 + 60, 10000, 1, True) in out1
    assert ("a", ep0 + 180, ep0 + 180, 7000, 1, False) in out1
    # the 200-minute observation itself is NOT sealed (wm = its ts - 1h)
    assert not any(r[1] == ep0 + 12000 for r in out1)
    n1 = len(out1)
    # advance the watermark past slot 200 -> the gap 4..199 and slot
    # 200 itself flush, each gap slot carrying slot 3's aggregate
    write_file([("a", t0 + 400 * m, 1.0)])
    run_once()
    out2 = emitted()
    assert ("a", ep0 + 12000, ep0 + 12000, 99000, 1, False) in out2
    assert ("a", ep0 + 240, ep0 + 180, 7000, 1, True) in out2
    assert ("a", ep0 + 11940, ep0 + 180, 7000, 1, True) in out2
    # exactly slots 4..200 were appended (197 new rows)
    assert len(out2) - n1 == 197
    # append-once: no slot emitted twice
    slots = [r[1] for r in out2]
    assert len(slots) == len(set(slots))


def test_stream_interval_join_matches_and_drops_late(spark, tmp_path):
    """Stream-stream interval join across checkpointed restarts: an
    on-time right row joins every in-range left row; a right row
    arriving BELOW the restored watermark is dropped, never matched —
    the state-boundedness contract that makes the join runnable
    forever."""
    import datetime as dt

    c_dir, p_dir, out_dir, ckpt = (
        str(tmp_path / "c"),
        str(tmp_path / "p"),
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
    )
    t0 = dt.datetime(2026, 1, 1, 8, 0, 0)
    m = dt.timedelta(minutes=1)

    def write(d, rows, schema):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(d)

    def run_once():
        cs = spark.readStream.schema("user_id long, ts timestamp").parquet(
            c_dir
        )
        ps = spark.readStream.schema(
            "user_id long, ts timestamp, value double"
        ).parquet(p_dir)
        q = (
            streaming.stream_interval_join(
                cs, ps, within="1 hour", watermark="30 minutes"
            )
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    def pairs():
        try:
            return {
                (r["user_id"], r["r_value"])
                for r in spark.read.parquet(out_dir).collect()
            }
        except Exception:
            return set()

    # batch 1: two clicks 10h apart; one on-time purchase for each.
    # The 10h-later events push the committed watermark far past t0.
    write(c_dir, [(1, t0), (2, t0 + 600 * m)], "user_id long, ts timestamp")
    write(
        p_dir,
        [(1, t0 + 5 * m, 10.0), (2, t0 + 601 * m, 20.0)],
        "user_id long, ts timestamp, value double",
    )
    run_once()
    assert pairs() == {(1, 10.0), (2, 20.0)}

    # batch 2 after restart: a purchase 9.5h BELOW the restored
    # watermark (would have matched click 1) must be dropped; an
    # on-time purchase still joins.
    write(
        p_dir,
        [(1, t0 + 6 * m, 99.0), (2, t0 + 630 * m, 30.0)],
        "user_id long, ts timestamp, value double",
    )
    run_once()
    assert pairs() == {(1, 10.0), (2, 20.0), (2, 30.0)}
