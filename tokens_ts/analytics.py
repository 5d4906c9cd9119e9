"""Per-series analytics operators beyond the tier rollups: EWMA,
counter-reset rates, native session windows.

All pure Catalyst expressions (window functions + groupBy) — one
shuffle per keyed operator, no Python. Each has an exact cross-engine
definition (driver pairs mirror the arithmetic term-for-term in
DuckDB), which is why the EWMA is the FINITE-HORIZON form: the
infinite-memory recurrence is inherently sequential (a scan), and its
cumulative-product rewrite overflows (1−α)^{−n} at real series
lengths — the truncated kernel keeps the operator one bounded window
pass at any scale, with the truncation error (1−α)^W stated instead of
hidden.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def with_ewma(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "event_ts",
    value_col: str = "value",
    alpha: float = 0.25,
    horizon: int = 8,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Finite-horizon EWMA: per key, ordered by ts,

        ewma_n = Σ_{k<W, x_{n−k} exists} (1−α)^k · x_{n−k}
                 / Σ_{same k} (1−α)^k

    (pandas ewm(alpha).mean() with adjust=True restricted to the last
    W points). Truncation error vs the infinite kernel is ≤ (1−α)^W of
    the oldest mass — 0.1% at the defaults. One window pass, W lag
    terms, O(W) state per row, no scan dependency → scales to any
    series length; weights are summed oldest-term-last in a fixed fold
    order so independent engines reproduce the exact double."""
    w = Window.partitionBy(*keys).orderBy(ts_col, *(order_cols or []))
    decay = 1.0 - alpha
    num = None
    den = None
    for k in range(horizon):
        x = F.col(value_col) if k == 0 else F.lag(value_col, k).over(w)
        wk = F.when(x.isNotNull(), F.lit(decay**k))
        term = x * F.lit(decay**k)
        num = term if num is None else num + F.coalesce(term, F.lit(0.0))
        den = wk if den is None else den + F.coalesce(wk, F.lit(0.0))
    return df.withColumn("ewma", num / den)


def with_counter_rate(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "event_ts",
    value_col: str = "value",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Prometheus-style counter increase/rate with reset handling: per
    key ordered by ts, delta = v − lag(v); a NEGATIVE delta means the
    counter restarted from zero, so the increase is the new value
    itself (the standard rate()/increase() reset rule). Emits
    `increase` and `rate_per_s` (null on the first point and dt=0)."""
    w = Window.partitionBy(*keys).orderBy(ts_col, *(order_cols or []))
    prev_v = F.lag(value_col).over(w)
    dv = F.col(value_col) - prev_v
    increase = F.when(dv >= 0, dv).otherwise(F.col(value_col))
    dt_s = (
        F.unix_micros(F.col(ts_col).cast("timestamp"))
        - F.unix_micros(F.lag(ts_col).over(w).cast("timestamp"))
    ) / 1e6
    return df.withColumn(
        "increase", F.when(prev_v.isNotNull(), increase)
    ).withColumn(
        "rate_per_s",
        F.when(prev_v.isNotNull() & (dt_s > 0), increase / dt_s),
    )


def session_windows(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "event_ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """Native Spark session windows (F.session_window): per key,
    events within `gap` of the previous one merge into one session;
    window end = last event + gap. Boundary rule (measured, pinned by
    pytest): a successor exactly `gap` later still MERGES — only a
    strictly larger gap splits, the same > rule as the hand-rolled
    gaps-and-islands in ts_sessionize. This is the batch twin of
    streaming.stream_sessionize, expressed as a single built-in
    grouping — one shuffle on (keys, merged-window), state handled by
    the engine."""
    return (
        df.groupBy(*keys, F.session_window(ts_col, gap).alias("sw"))
        .agg(F.count("*").alias("n_events"))
        .select(
            *keys,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )
