"""Structured Streaming surface (SURVEY.md §2.9, stretch M8).

The north rule's refresh path is incremental *batch* (pipeline.
run_increment); this module wraps the same logic in Structured
Streaming so new sequence files flow into the tiers continuously:

- `stream_increment`: file-source stream → foreachBatch →
  pipeline.run_increment. Each micro-batch recomputes exactly the
  touched (source, day) tier partitions. foreachBatch is at-least-once;
  exactly-once comes from run_increment's batch-id discipline: the
  streaming epoch id is passed as the batch_id, a replayed epoch is
  skipped via the `batch:<id>` manifest row, and a *partially applied*
  epoch is converged by the batch-keyed raw upsert (pipeline.py).
  Optionally routes late rows (event_ts older than the observed
  high-watermark minus `lateness`) to a `dead_letter` table instead
  of folding them into tiers (SURVEY.md §2.9 dead-letter variant).
- `stream_window_agg`: the pure-streaming alternative — watermarked
  tumbling-window partial-state aggregation (same algebraic state as
  tiers.rollup) with late data beyond the watermark dropped to the
  configured lateness bound; append-mode sink emits each window once,
  when it finalizes.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from tokens_ts import pipeline

SEQ_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("tokens", ArrayType(IntegerType())),
        StructField("n_tok", IntegerType()),
        StructField("source", StringType()),
    ]
)


def read_sequence_stream(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.readStream.schema(SEQ_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(path)
    )


def stream_increment(
    spark: SparkSession,
    input_path: str,
    out_root: str,
    checkpoint_dir: str,
    available_now: bool = True,
    lateness: str | None = None,
):
    """Micro-batch tier refresh: every new file batch folds into
    raw/t1m/t1h/t1d via the touched-window incremental path.

    With `lateness` (e.g. "2 hours"), rows whose event_ts is older than
    the high-watermark (max event_ts folded so far, persisted in the
    `_watermark` table) minus the bound are appended to the
    `dead_letter` table with the rejection context instead of silently
    mutating long-closed tier windows."""
    from tokens_ts.io.catalog import Catalog

    from tokens_ts import grid

    stream = read_sequence_stream(spark, input_path)
    cat = Catalog(out_root)

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sp = batch_df.sparkSession
        timed = grid.with_event_time(batch_df)
        if lateness is not None:
            bound = None
            if cat.exists(sp, "_watermark"):
                r = cat.read(sp, "_watermark").agg(
                    F.max("max_event_ts").alias("m")
                ).collect()[0]
                if r["m"] is not None:
                    bound = F.lit(r["m"]) - F.expr(f"interval {lateness}")
            if bound is not None:
                late = timed.where(F.col("event_ts") < bound)
                if not late.isEmpty():
                    cat.append(
                        late.withColumn("dl_batch_id", F.lit(str(batch_id)))
                        .withColumn("dl_reason", F.lit("beyond_watermark"))
                        .withColumn("dl_bound", bound),
                        "dead_letter",
                    )
                timed = timed.where(~(F.col("event_ts") < bound))
            if timed.isEmpty():
                return
            new_wm = timed.agg(F.max("event_ts").alias("max_event_ts"))
            # watermark advances monotonically (union + max on read)
            cat.append(new_wm, "_watermark")
        # epoch id as batch id: a replayed epoch delivers the same files,
        # so the manifest skip + batch-keyed upsert give exactly-once
        pipeline.run_increment(
            sp, timed, out_root, batch_id=f"epoch-{batch_id}"
        )

    w = stream.writeStream.foreachBatch(_fold).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


SESSION_OUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint"
)
SESSION_STATE_SCHEMA = "start long, end long, n bigint"


def stream_sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
):
    """Custom stateful streaming operator via applyInPandasWithState
    (SURVEY.md §2.9 / task brief): per-user sessionization with a gap
    rule, the streaming twin of the batch ts_sessionize query.

    State per user = the open session (start, end, n) in epoch-µs.
    Each micro-batch merges its (sorted) events into the open session,
    EMITS every session closed by a > gap_seconds silence, and keeps
    the trailing session open with an event-time timeout at
    end + gap: when the watermark passes it, the timeout fires and the
    session flushes — so results are deterministic in event time, not
    in arrival time. Arrow-batched per group; no per-row Python."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdf_iter, state: GroupState):
        (user,) = key
        out = []
        if state.hasTimedOut:
            if state.exists:
                s, e, n = state.get
                out.append((user, s, e, int(n)))
            state.remove()
        else:
            ts_us = []
            for pdf in pdf_iter:
                ts_us.extend(
                    (pdf[ts_col].astype("datetime64[us]").astype("int64")).tolist()
                )
            ts_us.sort()
            cur = state.get if state.exists else None
            for t in ts_us:
                if cur is None:
                    cur = (t, t, 1)
                elif t - cur[1] > gap_seconds * 1_000_000:
                    out.append((user, cur[0], cur[1], int(cur[2])))
                    cur = (t, t, 1)
                else:
                    cur = (cur[0], max(cur[1], t), cur[2] + 1)
            if cur is not None:
                state.update(cur)
                # flush when event time (the watermark) passes the gap
                state.setTimeoutTimestamp(cur[1] // 1000 + gap_seconds * 1000)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [r[0] for r in out],
                    "session_start": pd.to_datetime([r[1] for r in out], unit="us"),
                    "session_end": pd.to_datetime([r[2] for r in out], unit="us"),
                    "n_events": [r[3] for r in out],
                }
            )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_window_agg(
    seq_stream: DataFrame,
    watermark: str = "2 hours",
    window: str = "1 minute",
):
    """Watermarked tumbling-window rollup of the streaming extraction.

    Emits the same algebraic partial state as tiers.rollup in append
    mode; rows later than `watermark` are dropped (the dead-letter
    variant would route them via a second stream with a filter on
    event_ts < watermark bound)."""
    from tokens_ts import extract, grid

    raw = extract.to_raw(
        extract.full_stats(grid.with_event_time(seq_stream), stats=["mean"])
    )
    return (
        raw.withWatermark("event_ts", watermark)
        .groupBy(
            F.window("event_ts", window).alias("w"),
            "source",
            "series_id",
        )
        .agg(
            F.count("value").alias("cnt"),
            F.sum("value").alias("sum"),
            F.min("value").alias("min"),
            F.max("value").alias("max"),
            F.sum(F.col("value") * F.col("value")).alias("sum_sq"),
        )
        .select(
            "source",
            "series_id",
            F.col("w.start").alias("window_start"),
            "cnt",
            "sum",
            "min",
            "max",
            "sum_sq",
        )
    )
