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


def time_weighted_avg(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "event_ts",
    value_col: str = "value",
    interval: str = "1 hour",
) -> DataFrame:
    """Time-weighted average (TimescaleDB time_weight('Linear') analog)
    per key per bucket: the trapezoidal integral over consecutive
    samples divided by the observed span,

        twa = Σ_i (v_i + v_{i+1})/2 · (t_{i+1} − t_i)  /  (t_n − t_1)

    Bucket-local by design: the integral uses only samples inside the
    bucket (no cross-boundary interpolation — the same no-extrapolation
    default TimescaleDB uses), and a bucket with one sample or zero
    span degrades to the plain mean. Irregular sampling is the point:
    a value that held for 50 minutes weighs 50× one that held for a
    minute, which arithmetic mean gets wrong.

    Shape: one window pass (lead) + one partial-agg shuffle on
    (keys, bucket) — identical scale profile to rollup_interval."""
    w = Window.partitionBy(*keys, "_tw_bucket").orderBy(ts_col)
    t_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    nxt_v = F.lead(value_col).over(w)
    nxt_t = F.lead(t_us).over(w)
    area = (F.col(value_col) + nxt_v) / 2.0 * ((nxt_t - t_us) / 1e6)
    seg = (
        df.where(F.col(value_col).isNotNull())
        .withColumn(
            "_tw_bucket", F.window(ts_col, interval)["start"]
        )
        .withColumn("_tw_area", area)
    )
    out = seg.groupBy(*keys, "_tw_bucket").agg(
        F.count(value_col).alias("n_samples"),
        F.sum("_tw_area").alias("_integral"),
        ((F.max(t_us) - F.min(t_us)) / 1e6).alias("_span_s"),
        F.avg(value_col).alias("_plain_mean"),
    )
    return out.select(
        *keys,
        F.col("_tw_bucket").alias("window_start"),
        "n_samples",
        F.when(F.col("_span_s") > 0, F.col("_integral") / F.col("_span_s"))
        .otherwise(F.col("_plain_mean"))
        .alias("twa"),
    )


def trend(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "event_ts",
    value_col: str = "value",
    interval: str = "1 hour",
) -> DataFrame:
    """Per-key per-bucket least-squares trend (PromQL deriv /
    TimescaleDB stats_agg slope): regress value on seconds-since-
    bucket-start and emit slope (units/second) and intercept (value at
    bucket start). The normal equations are written out as explicit
    sum aggregates —

        slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)

    — rather than regr_slope(), so an independent engine can mirror
    the arithmetic term-for-term. x is RELATIVE seconds (epoch minus
    bucket start): epoch-scale x (~1.7e9) would put Σx² near 1e19 per
    point and the subtraction would cancel catastrophically; relative
    x keeps every sum well inside double precision at any bucket
    width up to years. Degenerate buckets (all samples at one
    timestamp → zero variance) yield null slope/intercept.

    One partial-agg shuffle on (keys, bucket); all sums are algebraic
    (map-side combinable)."""
    b = F.window(ts_col, interval)["start"]
    x = (
        F.unix_micros(F.col(ts_col).cast("timestamp"))
        - F.unix_micros(F.col("_tr_bucket").cast("timestamp"))
    ) / 1e6
    y = F.col(value_col)
    seg = (
        df.where(y.isNotNull())
        .withColumn("_tr_bucket", b)
        .select(*keys, F.col("_tr_bucket"), x.alias("_x"), y.alias("_y"))
    )
    g = seg.groupBy(*keys, "_tr_bucket").agg(
        F.count("*").cast("double").alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
    )
    denom = F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    slope = F.when(
        denom != 0,
        (F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")) / denom,
    )
    intercept = F.when(
        denom != 0,
        (F.col("_sy") - slope * F.col("_sx")) / F.col("_n"),
    )
    return g.select(
        *keys,
        F.col("_tr_bucket").alias("window_start"),
        F.col("_n").cast("bigint").alias("n_samples"),
        slope.alias("slope_per_s"),
        intercept.alias("intercept"),
    )


def reset_stats(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "event_ts",
    value_col: str = "value",
    interval: str = "1 hour",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """PromQL resets()/increase() aggregated to buckets: deltas are
    computed over the FULL per-key series order (a bucket's first
    delta reaches back into the previous bucket — the same continuity
    rule Prometheus uses), then grouped by the bucket of the CURRENT
    point. Emits per (key, bucket): n_resets (negative deltas =
    counter restarts) and total_increase (reset-adjusted).

    Two shuffles total: the series window, then the bucket agg — the
    window partitioning is on a prefix of the agg key, so AQE can
    often reuse the exchange."""
    cr = with_counter_rate(
        df, keys, ts_col=ts_col, value_col=value_col, order_cols=order_cols
    )
    w = Window.partitionBy(*keys).orderBy(ts_col, *(order_cols or []))
    is_reset = (F.col(value_col) - F.lag(value_col).over(w)) < 0
    seg = cr.withColumn("_rs_reset", is_reset).withColumn(
        "_rs_bucket", F.window(ts_col, interval)["start"]
    )
    return seg.groupBy(*keys, "_rs_bucket").agg(
        F.sum(F.when(F.col("_rs_reset"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_resets"),
        F.sum("increase").alias("total_increase"),
        F.count("*").cast("bigint").alias("n_points"),
    ).withColumnRenamed("_rs_bucket", "window_start")


def seasonal_zscore(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "event_ts",
    value_col: str = "value",
) -> DataFrame:
    """Seasonal-baseline anomaly score: build an hour-of-day profile
    (mean, population std) per key, broadcast it back, and z-score
    every point against ITS OWN hour's baseline — the detector that
    catches 'normal for 3pm, anomalous for 3am' which a global z-score
    (ts_anomaly_zscore) cannot.

    The profile is keys×24 rows — broadcast-sized at ANY corpus scale,
    so the join back is a BroadcastHashJoin with zero shuffle of the
    fact side beyond the profile agg itself. Points whose hour has
    std = 0 (constant baseline) get null z."""
    hod = F.hour(F.col(ts_col).cast("timestamp"))
    prof = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*keys, hod.alias("hod"))
        .agg(
            F.avg(value_col).alias("hod_mean"),
            F.stddev_pop(value_col).alias("hod_std"),
            F.count("*").cast("bigint").alias("hod_n"),
        )
    )
    fact = df.withColumn("hod", hod)
    joined = fact.join(F.broadcast(prof), [*keys, "hod"], "left")
    return joined.withColumn(
        "seasonal_z",
        F.when(
            F.col("hod_std") > 0,
            (F.col(value_col) - F.col("hod_mean")) / F.col("hod_std"),
        ),
    )


def heartbeat_uptime(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "event_ts",
    tolerance_s: float = 3600.0,
    interval_s: int = 86400,
) -> DataFrame:
    """Heartbeat/uptime aggregation (TimescaleDB heartbeat_agg
    analog): each event keeps its key 'live' for tolerance_s; per
    (key, day) the live time is the union of those intervals, clipped
    to the day:

        live = Σ_{i<n} min(t_{i+1} − t_i, τ) + min(τ, day_end − t_n)

    (consecutive events closer than τ chain into one covered span;
    the last event's coverage is capped at the day boundary — coverage
    does NOT roll into the next day, a pinned bucket-local rule that
    keeps the op a single window + agg with no cross-day state).
    Emits live seconds and uptime fraction of the day.

    One window pass (lead within (keys, day)) + one partial-agg
    shuffle."""
    t_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    day = F.date_trunc("day", F.col(ts_col).cast("timestamp"))
    seg = df.withColumn("_hb_day", day)
    w = Window.partitionBy(*keys, "_hb_day").orderBy(ts_col)
    nxt = F.lead(t_us).over(w)
    day_end_us = F.unix_micros(F.col("_hb_day") + F.expr("INTERVAL 1 DAY"))
    cover_s = F.when(
        nxt.isNotNull(), F.least((nxt - t_us) / 1e6, F.lit(tolerance_s))
    ).otherwise(F.least(F.lit(tolerance_s), (day_end_us - t_us) / 1e6))
    out = seg.withColumn("_hb_cover", cover_s).groupBy(*keys, "_hb_day").agg(
        F.count("*").cast("bigint").alias("n_beats"),
        F.sum("_hb_cover").alias("live_s"),
    )
    return out.select(
        *keys,
        F.col("_hb_day").alias("day"),
        "n_beats",
        "live_s",
        (F.col("live_s") / F.lit(float(interval_s))).alias("uptime_frac"),
    )


def with_level_shift(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "event_ts",
    value_col: str = "value",
    width: int = 16,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Level-shift (changepoint candidate) score: at each point, the
    difference between the mean of the NEXT `width` values and the
    mean of the trailing `width` values (current included). A step
    change in the series level produces a spike of height ≈ the step
    at the boundary. Null unless BOTH frames are full — partial
    windows at series edges would fake shifts.

    Both frames are bounded ROWS frames (W−1 preceding / W
    following), which Spark evaluates with an O(n) sliding buffer —
    this is deliberately NOT the unbounded-following frame whose
    per-row rescan is O(n²) (see gapfill.py bfill note)."""
    w = Window.partitionBy(*keys).orderBy(ts_col, *(order_cols or []))
    trail = w.rowsBetween(-(width - 1), 0)
    lead_f = w.rowsBetween(1, width)
    v = F.col(value_col)
    shift = F.when(
        (F.count(v).over(trail) == width) & (F.count(v).over(lead_f) == width),
        F.avg(v).over(lead_f) - F.avg(v).over(trail),
    )
    return df.withColumn("level_shift", shift)
