"""Structured Streaming surface (SURVEY.md §2.9, stretch M8).

The north rule's refresh path is incremental *batch* (pipeline.
run_increment); this module wraps the same logic in Structured
Streaming so new sequence files flow into the tiers continuously:

- `stream_increment`: file-source stream → foreachBatch →
  pipeline.run_increment. Each micro-batch recomputes exactly the
  touched (source, day) tier partitions; the streaming checkpoint
  makes the whole flow resumable (exactly-once per input file on top
  of the engine's idempotent dynamic partition overwrites).
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
):
    """Micro-batch tier refresh: every new file batch folds into
    raw/t1m/t1h/t1d via the touched-window incremental path."""
    from tokens_ts import grid

    stream = read_sequence_stream(spark, input_path)

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        pipeline.run_increment(
            batch_df.sparkSession, grid.with_event_time(batch_df), out_root
        )

    w = stream.writeStream.foreachBatch(_fold).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


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
