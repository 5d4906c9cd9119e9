"""Driver-contract query pairs: Spark DataFrame impl + DuckDB oracle SQL.

Every operator from SURVEY.md §2 gets a (queries, oracle_sql) pair over
the driver's pre-registered tables (events / documents / embeddings),
plus synthetic-sequence queries where BOTH engines generate the
north-rule input table from the FIXTURES.md recurrences — so the
flagship rollup semantics are checked against an independent engine
end-to-end.

Cross-engine determinism rules used throughout:
- timestamps → wall-clock strings (date_format / strftime) or epoch
  bigints: immune to session-timezone differences;
- float aggregates → ROUND to fixed decimals (sums 4, means/stds/
  quantiles 6, sum_sq 2): double summation order differs between
  engines by ~n·eps·magnitude, far below these rounding grains;
- ties in top-k → broken by a unique id column.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from tokens_ts import config as C
from tokens_ts import extract, gapfill, tiers

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _events_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map the driver's events table onto the engine's raw-tier shape."""
    return _ev(spark, sf_dir).select(
        F.lit("events").alias("source"),
        F.col("event_type").alias("series_id"),
        F.col("ts").alias("event_ts"),
        F.col("value"),
    )


def _fmt(col):
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss")


def _e(col, k: int):
    """Scaled-integer canonicalization: round(x*10^k) as bigint.

    Cross-engine value hashing cannot rely on double equality after
    arithmetic (summation order differs by ulps); integers hash
    identically everywhere."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * F.lit(float(10 ** k))).cast("bigint")


# ---------------------------------------------------------------------------
# A2: raw → 1m rollup (partial state)
# ---------------------------------------------------------------------------

@q(
    "ts_rollup_1m",
    """
    SELECT event_type AS series_id,
           strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           count(value) AS cnt,
           CAST(ROUND(sum(value) * 1e4) AS BIGINT) AS sum_e4,
           min(value) AS min,
           max(value) AS max,
           CAST(ROUND(sum(value * value) * 1e2) AS BIGINT) AS sumsq_e2
    FROM events
    GROUP BY 1, 2
    """,
)
def ts_rollup_1m(spark, sf_dir):
    t = tiers.rollup(_events_raw(spark, sf_dir), "1m")
    return t.select(
        "series_id",
        _fmt("window_start").alias("window_start"),
        "cnt",
        _e("sum", 4).alias("sum_e4"),
        "min",
        "max",
        _e("sum_sq", 2).alias("sumsq_e2"),
    )


# ---------------------------------------------------------------------------
# A3: cascade 1m → 1h → 1d — oracle computes DIRECTLY from raw, so this
# checks that merging partial states is exact, not just self-consistent.
# ---------------------------------------------------------------------------

@q(
    "ts_cascade_1h",
    """
    SELECT event_type AS series_id,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           count(value) AS cnt,
           CAST(ROUND(sum(value) * 1e4) AS BIGINT) AS sum_e4,
           min(value) AS min,
           max(value) AS max
    FROM events
    GROUP BY 1, 2
    """,
)
def ts_cascade_1h(spark, sf_dir):
    t1m = tiers.rollup(_events_raw(spark, sf_dir), "1m")
    t1h = tiers.cascade(t1m, "1h")
    return t1h.select(
        "series_id",
        _fmt("window_start").alias("window_start"),
        "cnt",
        _e("sum", 4).alias("sum_e4"),
        "min",
        "max",
    )


@q(
    "ts_cascade_1d_finish",
    """
    SELECT event_type AS series_id,
           strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           count(value) AS cnt,
           CAST(ROUND(avg(value) * 1e6) AS BIGINT) AS mean_e6,
           CAST(ROUND(stddev_pop(value) * 1e6) AS BIGINT) AS std_e6
    FROM events
    GROUP BY 1, 2
    """,
)
def ts_cascade_1d_finish(spark, sf_dir):
    t1m = tiers.rollup(_events_raw(spark, sf_dir), "1m")
    t1d = tiers.finish(tiers.cascade(tiers.cascade(t1m, "1h"), "1d"))
    return t1d.select(
        "series_id",
        _fmt("window_start").alias("window_start"),
        "cnt",
        _e("mean", 6).alias("mean_e6"),
        _e("std", 6).alias("std_e6"),
    )


# ---------------------------------------------------------------------------
# A4: exact per-tier quantiles from raw (non-mergeable stats)
# ---------------------------------------------------------------------------

@q(
    "ts_quantiles_1h",
    """
    SELECT event_type AS series_id,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           CAST(ROUND(median(value) * 1e6) AS BIGINT) AS median_e6,
           CAST(ROUND(quantile_cont(value, 0.95) * 1e6) AS BIGINT) AS p95_e6
    FROM events
    GROUP BY 1, 2
    """,
)
def ts_quantiles_1h(spark, sf_dir):
    qx = tiers.exact_quantiles(_events_raw(spark, sf_dir), "1h", percentiles=(0.5, 0.95))
    return qx.select(
        "series_id",
        _fmt("window_start").alias("window_start"),
        _e("median", 6).alias("median_e6"),
        _e("p95", 6).alias("p95_e6"),
    )


# ---------------------------------------------------------------------------
# A4 web-scale path: FLAGGED-APPROXIMATE percentiles. percentile_approx
# (Greenwald-Khanna) has no bit-identical DuckDB twin, so the pair checks
# the declared ERROR BOUND instead of the value: the approx result must
# be a data point whose empirical rank is within n/accuracy (+1 discrete
# slack) of p·n — computed exactly, per window, in Spark; the oracle pins
# the window set and the all-TRUE bound columns. A sketch regression that
# drifts beyond its contract flips a boolean and fails the value hash.
# ---------------------------------------------------------------------------

@q(
    "ts_quantiles_approx_1h",
    """
    SELECT event_type AS series_id,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           TRUE AS median_in_bound,
           TRUE AS p95_in_bound
    FROM events
    GROUP BY 1, 2
    """,
)
def ts_quantiles_approx_1h(spark, sf_dir, accuracy: int = 100):
    qx = tiers.approx_quantiles(
        _events_raw(spark, sf_dir), "1h", (0.5, 0.95), accuracy=accuracy
    )
    j = (
        _events_raw(spark, sf_dir)
        .withColumn("window_start", F.date_trunc("hour", "event_ts"))
        .join(qx, ["source", "series_id", "window_start"])
    )

    def in_bound(p: float, approx_col: str):
        # GK contract: rank(approx) ∈ [p·n − n/acc, p·n + n/acc]; +1
        # discrete slack for the floor/ceil of fractional ranks.
        tol = F.col("n") / accuracy + F.lit(1.0)
        lo_ok = F.col(f"le_{approx_col}") >= F.col("n") * p - tol
        hi_ok = F.col(f"lt_{approx_col}") <= F.col("n") * p + tol
        return lo_ok & hi_ok

    counted = j.groupBy("series_id", "window_start").agg(
        F.count("value").alias("n"),
        F.sum((F.col("value") <= F.col("median")).cast("long")).alias("le_median"),
        F.sum((F.col("value") < F.col("median")).cast("long")).alias("lt_median"),
        F.sum((F.col("value") <= F.col("p95")).cast("long")).alias("le_p95"),
        F.sum((F.col("value") < F.col("p95")).cast("long")).alias("lt_p95"),
    )
    return counted.select(
        "series_id",
        _fmt("window_start").alias("window_start"),
        in_bound(0.5, "median").alias("median_in_bound"),
        in_bound(0.95, "p95").alias("p95_in_bound"),
    )


# ---------------------------------------------------------------------------
# A8: salted two-phase aggregation — oracle is the PLAIN group-by, so the
# salted path must reproduce it exactly.
# ---------------------------------------------------------------------------

@q(
    "ts_salted_rollup_1d",
    """
    SELECT event_type AS series_id,
           strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           count(value) AS cnt,
           CAST(ROUND(sum(value) * 1e4) AS BIGINT) AS sum_e4,
           min(value) AS min,
           max(value) AS max
    FROM events
    GROUP BY 1, 2
    """,
)
def ts_salted_rollup_1d(spark, sf_dir):
    t = tiers.rollup_salted(_events_raw(spark, sf_dir), "1d", nsalt=8)
    return t.select(
        "series_id",
        _fmt("window_start").alias("window_start"),
        "cnt",
        _e("sum", 4).alias("sum_e4"),
        "min",
        "max",
    )


@q(
    "ts_salted_hot_rollup",
    """
    SELECT event_type AS series_id,
           strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           count(value) AS cnt,
           CAST(ROUND(sum(value) * 1e4) AS BIGINT) AS sum_e4,
           min(value) AS min,
           max(value) AS max
    FROM events
    GROUP BY 1, 2
    """,
)
def ts_salted_hot_rollup(spark, sf_dir):
    """PARTIAL salting: skew detection (top-2 heaviest series) feeds
    the salted path; cold keys skip the salt fan-out. Oracle is again
    the plain group-by — the optimization must be invisible in the
    values."""
    t = tiers.rollup_salted_hot(
        _events_raw(spark, sf_dir), "1d", nsalt=8, top_k=2
    )
    return t.select(
        "series_id",
        _fmt("window_start").alias("window_start"),
        "cnt",
        _e("sum", 4).alias("sum_e4"),
        "min",
        "max",
    )


# ---------------------------------------------------------------------------
# A7: grouping sets / rollup report
# ---------------------------------------------------------------------------

@q(
    "ts_rollup_report",
    """
    SELECT coalesce(event_type, 'ALL') AS series_id,
           coalesce(strftime(date_trunc('day', ts), '%Y-%m-%d'), 'ALL') AS day,
           count(*) AS cnt,
           CAST(ROUND(sum(value) * 1e4) AS BIGINT) AS sum_e4
    FROM events
    GROUP BY ROLLUP(event_type, date_trunc('day', ts))
    """,
)
def ts_rollup_report(spark, sf_dir):
    ev = _ev(spark, sf_dir)
    return (
        ev.rollup("event_type", F.date_trunc("day", "ts").alias("_day"))
        .agg(F.count("*").alias("cnt"), _e(F.sum("value"), 4).alias("sum_e4"))
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("series_id"),
            F.coalesce(F.date_format("_day", "yyyy-MM-dd"), F.lit("ALL")).alias("day"),
            "cnt",
            "sum_e4",
        )
    )


# ---------------------------------------------------------------------------
# W1/W5: top-k heavy series (skew detection input for salting)
# ---------------------------------------------------------------------------

@q(
    "ts_topk_users",
    """
    SELECT user_id, cnt, rank FROM (
      SELECT user_id, count(*) AS cnt,
             row_number() OVER (ORDER BY count(*) DESC, user_id) AS rank
      FROM events GROUP BY user_id
    ) WHERE rank <= 10
    """,
)
def ts_topk_users(spark, sf_dir):
    """Distributed top-k: orderBy+limit plans as TakeOrderedAndProject
    (per-partition top-10 merged on the driver); rank is attached by a
    window AFTER the limit, over exactly 10 rows. A pre-limit global
    row_number window would funnel every distinct user through ONE
    task — the same skew funnel tiers.detect_hot_keys avoids."""
    ev = _ev(spark, sf_dir)
    top = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("user_id"))
        .limit(10)
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("user_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "user_id", "cnt", "rank"
    )


# ---------------------------------------------------------------------------
# A6 web-scale twin: approximate distinct (HLL++) with a declared rsd.
# Like the approx-percentile pair, the sketch has no bit-identical DuckDB
# twin, so the pair value-checks the EXACT count and the declared error
# bound: |approx − exact| ≤ 5·rsd·exact (+1 discrete slack; HLL++ rsd is
# one standard deviation — 5σ makes the boolean deterministic in
# practice while still catching any real sketch regression).
# ---------------------------------------------------------------------------

@q(
    "ts_approx_distinct_users",
    """
    SELECT event_type AS series_id,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
           TRUE AS within_bound
    FROM events GROUP BY 1
    """,
)
def ts_approx_distinct_users(spark, sf_dir, rsd: float = 0.02):
    ev = _ev(spark, sf_dir)
    agg = ev.groupBy(F.col("event_type").alias("series_id")).agg(
        F.countDistinct("user_id").alias("exact_distinct"),
        F.approx_count_distinct("user_id", rsd).alias("approx"),
    )
    within = (
        F.abs(F.col("approx") - F.col("exact_distinct"))
        <= 5 * rsd * F.col("exact_distinct") + F.lit(1)
    )
    return agg.select(
        "series_id", "exact_distinct", within.alias("within_bound")
    )


# ---------------------------------------------------------------------------
# G1-G3: per-series minute grid + forward fill
# ---------------------------------------------------------------------------

_GAPFILL_GRID_SQL = """
    WITH slot AS (
      SELECT event_type, date_trunc('minute', ts) AS m, avg(value) AS v
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type, min(m) AS lo, max(m) AS hi FROM slot GROUP BY 1
    ),
    grid AS (
      SELECT b.event_type, unnest(generate_series(b.lo, b.hi, INTERVAL 1 MINUTE)) AS m
      FROM bounds b
    ),
    joined AS (
      SELECT g.event_type, g.m, s.v
      FROM grid g LEFT JOIN slot s ON s.event_type = g.event_type AND s.m = g.m
    )
"""


@q(
    "ts_gapfill_ffill",
    _GAPFILL_GRID_SQL
    + """
    SELECT event_type AS series_id,
           strftime(m, '%Y-%m-%d %H:%M:%S') AS slot_ts,
           CAST(ROUND(v * 1e6) AS BIGINT) AS value_e6,
           CAST(ROUND(last_value(v IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY m
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1e6) AS BIGINT) AS ffill_e6
    FROM joined
    """,
)
def ts_gapfill_ffill(spark, sf_dir):
    ev = _ev(spark, sf_dir)
    slot = ev.groupBy(
        F.col("event_type").alias("series_id"),
        F.date_trunc("minute", "ts").alias("event_ts"),
    ).agg(F.avg("value").alias("value"))
    bounds = slot.groupBy("series_id").agg(
        F.min("event_ts").alias("lo"), F.max("event_ts").alias("hi")
    )
    grid_df = bounds.select(
        "series_id",
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 minute"))).alias("event_ts"),
    ).withColumn("source", F.lit("events"))
    aligned = grid_df.join(
        slot.withColumn("source", F.lit("events")),
        ["source", "series_id", "event_ts"],
        "left",
    )
    out = gapfill.with_ffill(aligned)
    return out.select(
        "series_id",
        _fmt("event_ts").alias("slot_ts"),
        _e("value", 6).alias("value_e6"),
        _e("ffill", 6).alias("ffill_e6"),
    )


@q(
    "ts_gapfill_ffill_limit",
    _GAPFILL_GRID_SQL
    + """
    , nb AS (
      SELECT event_type, m, v,
             row_number() OVER (PARTITION BY event_type ORDER BY m) AS rn
      FROM joined
    ),
    fb AS (
      SELECT event_type, m, v, rn,
             last_value(v IGNORE NULLS) OVER w AS fv,
             last_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS)
               OVER w AS orn
      FROM nb
      WINDOW w AS (PARTITION BY event_type ORDER BY m
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_type AS series_id,
           strftime(m, '%Y-%m-%d %H:%M:%S') AS slot_ts,
           CAST(ROUND(v * 1e6) AS BIGINT) AS value_e6,
           CAST(ROUND(CASE WHEN rn - orn <= 5 THEN fv END * 1e6) AS BIGINT)
             AS ffill5_e6
    FROM fb
    """,
)
def ts_gapfill_ffill_limit(spark, sf_dir):
    """Bounded forward-fill (pandas ffill(limit=) / TimescaleDB locf
    max-gap): values carry at most 5 slots; staler slots stay null.
    The carry distance uses the SAME cumulative O(n) frame as the fill
    — no extra pass."""
    ev = _ev(spark, sf_dir)
    slot = ev.groupBy(
        F.col("event_type").alias("series_id"),
        F.date_trunc("minute", "ts").alias("event_ts"),
    ).agg(F.avg("value").alias("value"))
    bounds = slot.groupBy("series_id").agg(
        F.min("event_ts").alias("lo"), F.max("event_ts").alias("hi")
    )
    grid_df = bounds.select(
        "series_id",
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 minute"))).alias("event_ts"),
    ).withColumn("source", F.lit("events"))
    aligned = grid_df.join(
        slot.withColumn("source", F.lit("events")),
        ["source", "series_id", "event_ts"],
        "left",
    )
    out = gapfill.with_ffill(aligned, limit=5)
    return out.select(
        "series_id",
        _fmt("event_ts").alias("slot_ts"),
        _e("value", 6).alias("value_e6"),
        _e("ffill", 6).alias("ffill5_e6"),
    )


@q(
    "ts_downsample_minmax",
    """
    SELECT event_type AS series_id,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS w_ts,
           CAST(count(value) AS BIGINT) AS cnt,
           CAST(ROUND(min(value) * 1e6) AS BIGINT) AS min_v_e6,
           CAST(ROUND(max(value) * 1e6) AS BIGINT) AS max_v_e6,
           strftime(first(ts ORDER BY value ASC, ts ASC), '%Y-%m-%d %H:%M:%S') AS min_ts,
           strftime(first(ts ORDER BY value DESC, ts ASC), '%Y-%m-%d %H:%M:%S') AS max_ts
    FROM events WHERE value IS NOT NULL
    GROUP BY 1, 2
    """,
)
def ts_downsample_minmax(spark, sf_dir):
    """Min-max plot decimation: the extreme points (with their true
    timestamps) per hour window — preserves spikes a mean tier
    flattens. Deterministic tie-break (earliest ts) via struct
    comparators, mirrored by DuckDB ordered aggregates."""
    d = tiers.downsample_minmax(_events_raw(spark, sf_dir), "1h")
    return d.select(
        "series_id",
        _fmt("window_start").alias("w_ts"),
        "cnt",
        _e("min_v", 6).alias("min_v_e6"),
        _e("max_v", 6).alias("max_v_e6"),
        _fmt("min_ts").alias("min_ts"),
        _fmt("max_ts").alias("max_ts"),
    )


@q(
    "ts_retention_ttl",
    """
    SELECT series_id, strftime(w, '%Y-%m-%d %H:%M:%S') AS w_ts, cnt
    FROM (
      SELECT event_type AS series_id, date_trunc('hour', ts) AS w,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    )
    WHERE w >= CAST('2024-01-20 00:00:00' AS TIMESTAMP) - INTERVAL 3 DAY
    """,
)
def ts_retention_ttl(spark, sf_dir):
    """Retention enforcement (the dual of downsampling): keep only 1h
    windows newer than now − keep. On the (source, day) layout this
    filter is partition-pruned whole-partition drops — no row rewrite.
    Fixed 'now' (mid-corpus) so the pair is deterministic and both
    kept and aged-out windows exist."""
    t1h = (
        _events_raw(spark, sf_dir)
        .groupBy(
            "series_id",
            F.date_trunc("hour", "event_ts").alias("window_start"),
        )
        .agg(F.count("*").alias("cnt"))
    )
    kept = tiers.retention_filter(t1h, "2024-01-20 00:00:00", "3 days")
    return kept.select(
        "series_id", _fmt("window_start").alias("w_ts"), "cnt"
    )


@q(
    "ts_props_json",
    """
    SELECT event_type AS series_id,
           CAST(count(k) AS BIGINT) AS cnt,
           CAST(sum(k) AS BIGINT) AS sum_k,
           CAST(min(k) AS BIGINT) AS min_k,
           CAST(max(k) AS BIGINT) AS max_k
    FROM (
      SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events
    )
    GROUP BY event_type
    """,
)
def ts_props_json(spark, sf_dir):
    """Semi-structured props column (§2.8 json surface): extract the
    embedded metric from the JSON blob JVM-side (get_json_object — no
    Python, no full from_json schema when one path is needed) and
    aggregate per series."""
    ev = _ev(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long").alias("k")
    return (
        ev.select(F.col("event_type").alias("series_id"), k)
        .groupBy("series_id")
        .agg(
            F.count("k").alias("cnt"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@q(
    "ts_value_histogram",
    """
    SELECT event_type AS series_id, bucket, CAST(count(*) AS BIGINT) AS cnt
    FROM (
      SELECT event_type,
             CASE WHEN value < 0.0 THEN 0
                  WHEN value >= 100.0 THEN 11
                  ELSE CAST(floor((value - 0.0) / (100.0 - 0.0) * 10) AS BIGINT) + 1
             END AS bucket
      FROM events WHERE value IS NOT NULL
    )
    GROUP BY 1, 2
    """,
)
def ts_value_histogram(spark, sf_dir):
    """Per-series value histogram via the native width_bucket (§2.8) —
    one map-side-combined count agg over at most nbins+2 buckets per
    series; the oracle mirrors Postgres width_bucket semantics with
    explicit floor arithmetic (DuckDB lacks the function)."""
    ev = _ev(spark, sf_dir).where(F.col("value").isNotNull())
    return (
        ev.select(
            F.col("event_type").alias("series_id"),
            F.width_bucket("value", F.lit(0.0), F.lit(100.0), F.lit(10)).alias(
                "bucket"
            ),
        )
        .groupBy("series_id", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


@q(
    "ts_histogram_quantile",
    """
    WITH b AS (
      SELECT event_type AS series_id,
             CASE WHEN value < 0.0 THEN 0
                  WHEN value >= 500.0 THEN 11
                  ELSE CAST(floor((value - 0.0) / (500.0 - 0.0) * 10) AS BIGINT) + 1
             END AS bucket,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2
    ), c AS (
      SELECT *,
             sum(cnt) OVER (PARTITION BY series_id ORDER BY bucket
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(cnt) OVER (PARTITION BY series_id) AS total
      FROM b
    ), r AS (
      SELECT c.*, qd.qname,
             greatest(CAST(1 AS BIGINT),
                      (qd.q_num * total + qd.q_den - 1) // qd.q_den) AS rnk
      FROM c, (VALUES ('p50', CAST(1 AS BIGINT), CAST(2 AS BIGINT)),
                      ('p95', CAST(19 AS BIGINT), CAST(20 AS BIGINT)),
                      ('p99', CAST(99 AS BIGINT), CAST(100 AS BIGINT)))
               AS qd(qname, q_num, q_den)
    )
    SELECT series_id, qname, total AS cnt,
           CAST(ROUND((CASE WHEN bucket = 0 THEN 0.0
                            WHEN bucket = 11 THEN 500.0
                            ELSE 0.0 + (bucket - 1) * 50.0
                                 + 50.0 * (rnk - (cum - cnt)) / cnt
                       END) * 1e6) AS BIGINT) AS val_e6
    FROM r
    WHERE cum >= rnk AND cum - cnt < rnk
    """,
)
def ts_histogram_quantile(spark, sf_dir):
    """Quantiles SERVED FROM the mergeable histogram tier (A4's gap
    closed for the tier lifecycle): raw → hourly fixed-bin histogram
    tier → integer-cnt merge to per-series buckets → read-side
    histogram_quantile (integer rank, linear in-bucket interpolation,
    lo/hi clamp on the unbounded buckets). The oracle re-derives the
    same quantity from raw with the width_bucket CASE mirror — so the
    tier build, the merge, AND the serving math are all checked
    cross-engine; merge≡direct and the one-bucket-width error bound
    are pinned in pytest."""
    t = tiers.histogram_tier(_events_raw(spark, sf_dir), "1h")
    m = tiers.histogram_merge(t, ["series_id"])
    hq = tiers.histogram_quantile(m)
    return hq.select(
        "series_id", "qname", "cnt", _e("value", 6).alias("val_e6")
    )


@q(
    "ts_ohlc_1h",
    """
    SELECT event_type AS series_id,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS w_ts,
           CAST(count(value) AS BIGINT) AS cnt,
           CAST(ROUND(first(value ORDER BY ts ASC, value ASC) * 1e6) AS BIGINT) AS open_e6,
           CAST(ROUND(max(value) * 1e6) AS BIGINT) AS high_e6,
           CAST(ROUND(min(value) * 1e6) AS BIGINT) AS low_e6,
           CAST(ROUND(first(value ORDER BY ts DESC, value ASC) * 1e6) AS BIGINT) AS close_e6
    FROM events WHERE value IS NOT NULL
    GROUP BY 1, 2
    """,
)
def ts_ohlc_1h(spark, sf_dir):
    """OHLC bars: first/last-by-time plus extremes per hour window —
    one map-side-combined ordered aggregation (no window function, no
    per-series sort)."""
    d = tiers.downsample_ohlc(_events_raw(spark, sf_dir), "1h")
    return d.select(
        "series_id",
        _fmt("window_start").alias("w_ts"),
        "cnt",
        _e("open", 6).alias("open_e6"),
        _e("high", 6).alias("high_e6"),
        _e("low", 6).alias("low_e6"),
        _e("close", 6).alias("close_e6"),
    )


@q(
    "ts_gapfill_interp",
    _GAPFILL_GRID_SQL
    + """
    , filled AS (
      SELECT event_type, m, v,
        last_value(v IGNORE NULLS) OVER w_prev AS pv,
        last_value(CASE WHEN v IS NOT NULL THEN m END IGNORE NULLS) OVER w_prev AS pt,
        first_value(v IGNORE NULLS) OVER w_next AS nv,
        first_value(CASE WHEN v IS NOT NULL THEN m END IGNORE NULLS) OVER w_next AS nt
      FROM joined
      WINDOW
        w_prev AS (PARTITION BY event_type ORDER BY m
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_next AS (PARTITION BY event_type ORDER BY m
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type AS series_id,
           strftime(m, '%Y-%m-%d %H:%M:%S') AS slot_ts,
           CAST(ROUND((CASE
             WHEN v IS NOT NULL THEN v
             WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
               pv + (nv - pv) * (epoch(m) - epoch(pt)) / (epoch(nt) - epoch(pt))
             ELSE NULL END) * 1e6) AS BIGINT) AS interp_e6
    FROM filled
    """,
)
def ts_gapfill_interp(spark, sf_dir):
    ev = _ev(spark, sf_dir)
    slot = ev.groupBy(
        F.col("event_type").alias("series_id"),
        F.date_trunc("minute", "ts").alias("event_ts"),
    ).agg(F.avg("value").alias("value"))
    bounds = slot.groupBy("series_id").agg(
        F.min("event_ts").alias("lo"), F.max("event_ts").alias("hi")
    )
    grid_df = bounds.select(
        "series_id",
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 minute"))).alias("event_ts"),
    ).withColumn("source", F.lit("events"))
    aligned = grid_df.join(
        slot.withColumn("source", F.lit("events")),
        ["source", "series_id", "event_ts"],
        "left",
    )
    out = gapfill.with_interp(aligned)
    return out.select(
        "series_id",
        _fmt("event_ts").alias("slot_ts"),
        _e("interp", 6).alias("interp_e6"),
    )


@q(
    "ts_gapfill_bucketed",
    _GAPFILL_GRID_SQL
    + """
    , filled AS (
      SELECT event_type, m, v,
        last_value(v IGNORE NULLS) OVER w_prev AS pv,
        last_value(CASE WHEN v IS NOT NULL THEN m END IGNORE NULLS) OVER w_prev AS pt,
        first_value(v IGNORE NULLS) OVER w_next AS nv,
        first_value(CASE WHEN v IS NOT NULL THEN m END IGNORE NULLS) OVER w_next AS nt
      FROM joined
      WINDOW
        w_prev AS (PARTITION BY event_type ORDER BY m
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_next AS (PARTITION BY event_type ORDER BY m
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type AS series_id,
           strftime(m, '%Y-%m-%d %H:%M:%S') AS slot_ts,
           CAST(ROUND(pv * 1e6) AS BIGINT) AS ffill_e6,
           CAST(ROUND((CASE
             WHEN v IS NOT NULL THEN v
             WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
               pv + (nv - pv) * (epoch(m) - epoch(pt)) / (epoch(nt) - epoch(pt))
             ELSE NULL END) * 1e6) AS BIGINT) AS interp_e6
    FROM filled
    """,
)
def ts_gapfill_bucketed(spark, sf_dir):
    """Range-bucketed gap-fill (1d buckets, per-bucket window sorts +
    spine carries) against the same single-window oracle: the scale
    path must be value-identical to the semantics, not just similar."""
    ev = _ev(spark, sf_dir)
    slot = ev.groupBy(
        F.col("event_type").alias("series_id"),
        F.date_trunc("minute", "ts").alias("event_ts"),
    ).agg(F.avg("value").alias("value"))
    bounds = slot.groupBy("series_id").agg(
        F.min("event_ts").alias("lo"), F.max("event_ts").alias("hi")
    )
    grid_df = bounds.select(
        "series_id",
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 minute"))).alias("event_ts"),
    ).withColumn("source", F.lit("events"))
    aligned = grid_df.join(
        slot.withColumn("source", F.lit("events")),
        ["source", "series_id", "event_ts"],
        "left",
    )
    out = gapfill.bucketed_fill(aligned, bucket="1d")
    return out.select(
        "series_id",
        _fmt("event_ts").alias("slot_ts"),
        _e("ffill", 6).alias("ffill_e6"),
        _e("interp", 6).alias("interp_e6"),
    )


# ---------------------------------------------------------------------------
# G5/J5: as-of join — DuckDB has native ASOF JOIN as the oracle
# ---------------------------------------------------------------------------

@q(
    "ts_asof_click_purchase",
    """
    SELECT c.event_id,
           p.value AS asof_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def ts_asof_click_purchase(spark, sf_dir):
    ev = _ev(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    buys = ev.where(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    j = gapfill.asof_join(
        clicks, buys, keys=["user_id"], left_ts="ts", right_ts="ts", value_cols=["value"]
    )
    return j.select("event_id", "asof_value")


@q(
    "ts_asof_forward",
    """
    SELECT c.event_id,
           p.value AS next_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id AND c.ts <= p.ts
    """,
)
def ts_asof_forward(spark, sf_dir):
    """Forward as-of (nearest-LATER match): each click paired with the
    user's next purchase — the time-to-conversion primitive. Same
    union+window O(n) shape as backward (descending-time cumulative
    frame, never an O(n²) following frame); DuckDB's native forward
    ASOF (c.ts <= p.ts) is the oracle."""
    ev = _ev(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    buys = ev.where(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    j = gapfill.asof_join(
        clicks, buys, keys=["user_id"], left_ts="ts", right_ts="ts",
        value_cols=["value"], direction="forward",
    )
    return j.select("event_id", F.col("asof_value").alias("next_value"))


# ---------------------------------------------------------------------------
# J4: explicit range/interval join — events matched into UNALIGNED hot
# windows (top-k (type, hour) cells stretched ±30 min, so interval
# boundaries never coincide with the join buckets). Oracle is DuckDB's
# native inequality join; the engine side must reproduce it with the
# bucketed equi-join shape.
# ---------------------------------------------------------------------------

@q(
    "ts_interval_join",
    """
    WITH hot AS (
      SELECT event_type, date_trunc('hour', ts) AS h
      FROM events GROUP BY 1, 2
      ORDER BY count(*) DESC, event_type, h
      LIMIT 20
    ),
    iv AS (
      SELECT event_type,
             h - INTERVAL 30 MINUTE AS start,
             h + INTERVAL 90 MINUTE AS "end"
      FROM hot
    )
    SELECT i.event_type,
           strftime(i.start, '%Y-%m-%d %H:%M:%S') AS start,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(ROUND(sum(e.value) * 1e4) AS BIGINT) AS sum_e4
    FROM iv i JOIN events e
      ON e.event_type = i.event_type AND e.ts >= i.start AND e.ts < i."end"
    GROUP BY 1, 2
    """,
)
def ts_interval_join(spark, sf_dir):
    ev = _ev(spark, sf_dir)
    w = Window.orderBy(
        F.desc("cnt"), F.asc("event_type"), F.asc("h")
    )
    hot = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count("*").alias("cnt"))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 20)
    )
    iv = hot.select(
        "event_type",
        (F.col("h") - F.expr("interval 30 minutes")).alias("start"),
        (F.col("h") + F.expr("interval 90 minutes")).alias("end"),
    )
    j = gapfill.interval_join(
        ev, iv, keys=["event_type"], left_ts="ts", bucket="1h"
    )
    return j.groupBy("event_type", _fmt("start").alias("start")).agg(
        F.count("*").alias("n_events"),
        _e(F.sum("value"), 4).alias("sum_e4"),
    )


# ---------------------------------------------------------------------------
# Retention enforcement: tier rows surviving a keep-window (partition-
# pruned drop at scale; the dual of downsampling)
# ---------------------------------------------------------------------------

@q(
    "ts_retention_1h",
    """
    SELECT event_type AS series_id,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           count(value) AS cnt
    FROM events
    WHERE date_trunc('hour', ts) >= TIMESTAMP '2024-01-15 00:00:00' - INTERVAL 7 DAY
    GROUP BY 1, 2
    """,
)
def ts_retention_1h(spark, sf_dir):
    from tokens_ts import tiers as _tiers

    t1h = _tiers.cascade(_tiers.rollup(_events_raw(spark, sf_dir), "1m"), "1h")
    kept = _tiers.retention_filter(t1h, "2024-01-15 00:00:00", "7 days")
    return kept.select(
        "series_id", _fmt("window_start").alias("window_start"), "cnt"
    )


# ---------------------------------------------------------------------------
# J3: resume anti-join — the checkpoint skip-set expressed over events
# so the driver hash-checks the exact filter_pending semantics used by
# run_backfill's resume (pytest covers the full crash/resume flow; this
# pins the anti-join itself cross-engine).
# ---------------------------------------------------------------------------

@q(
    "ts_resume_pending",
    """
    WITH done AS (
      SELECT event_type FROM (
        SELECT event_type,
               row_number() OVER (ORDER BY count(*) DESC, event_type) AS rnk
        FROM events GROUP BY event_type
      ) WHERE rnk <= 2
    )
    SELECT event_type AS partition_id,
           count(*) AS cnt,
           CAST(ROUND(sum(value) * 1e4) AS BIGINT) AS sum_e4
    FROM events
    WHERE event_type NOT IN (SELECT event_type FROM done)
    GROUP BY 1
    """,
)
def ts_resume_pending(spark, sf_dir):
    from tokens_ts import checkpoint

    ev = _ev(spark, sf_dir)
    # "done" = the 2 heaviest partitions (scale-free skip-set)
    w = Window.orderBy(F.desc("cnt"), F.asc("event_type"))
    done = (
        ev.groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 2)
        .select(F.col("event_type").alias("partition_id"))
    )
    pending = checkpoint.filter_pending(ev, done, partition_col="event_type")
    return pending.groupBy(F.col("event_type").alias("partition_id")).agg(
        F.count("*").alias("cnt"), _e(F.sum("value"), 4).alias("sum_e4")
    )


# ---------------------------------------------------------------------------
# W6: increment-union — two disjoint batches rolled up separately, then
# union + cascade-merged; the oracle computes the 1h windows DIRECTLY
# from raw, so the union-of-partials path must reproduce a single-shot
# aggregation exactly (the algebra behind run_increment).
# ---------------------------------------------------------------------------

@q(
    "ts_increment_union",
    """
    SELECT event_type AS series_id,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           count(value) AS cnt,
           CAST(ROUND(sum(value) * 1e4) AS BIGINT) AS sum_e4,
           min(value) AS min,
           max(value) AS max
    FROM events
    GROUP BY 1, 2
    """,
)
def ts_increment_union(spark, sf_dir):
    raw = _events_raw(spark, sf_dir)
    split = F.lit("2024-01-08 00:00:00").cast(raw.schema["event_ts"].dataType)
    old = tiers.rollup(raw.where(F.col("event_ts") < split), "1m")
    new = tiers.rollup(raw.where(F.col("event_ts") >= split), "1m")
    t1h = tiers.cascade(old.unionByName(new), "1h")
    return t1h.select(
        "series_id",
        _fmt("window_start").alias("window_start"),
        "cnt",
        _e("sum", 4).alias("sum_e4"),
        "min",
        "max",
    )


# ---------------------------------------------------------------------------
# W3 applications: per-series delta/rate (counter semantics — the
# lag-based derivative every TS engine exposes) and cross-series
# Pearson correlation on aligned windows.
# ---------------------------------------------------------------------------

@q(
    "ts_series_rate",
    """
    WITH d AS (
      -- dt from INTEGER microseconds: epoch() returns fractional
      -- seconds as a ~1.7e9 double whose subtraction ulps differ from
      -- Spark's exact unix_micros difference; integer micros divided
      -- by 1e6 is the identical double in both engines
      SELECT event_type, ts, value,
             value - lag(value) OVER w AS dv,
             (epoch_us(ts) - epoch_us(lag(ts) OVER w)) / 1e6 AS dt_s
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    )
    SELECT event_type AS series_id,
           CAST(count(dv) AS BIGINT) AS n_deltas,
           CAST(ROUND(avg(CASE WHEN dt_s > 0
             THEN CAST(ROUND(dv / dt_s * 1e6) AS BIGINT) END) / 100.0) AS BIGINT) AS mean_rate_e4,
           CAST(ROUND(max(abs(dv)) * 1e4) AS BIGINT) AS max_abs_delta_e4
    FROM d GROUP BY 1
    """,
)
def ts_series_rate(spark, sf_dir):
    """Per-series delta + rate-of-change (value'/dt over consecutive
    observations) summarized per series — one window pass, one agg."""
    ev = _ev(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    dv = F.col("value") - F.lag("value").over(w)
    dt_s = (
        F.unix_micros(F.col("ts").cast("timestamp"))
        - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
    ) / 1e6
    d = ev.select(
        F.col("event_type").alias("series_id"),
        dv.alias("dv"),
        dt_s.alias("dt_s"),
    )
    return d.groupBy("series_id").agg(
        F.count("dv").alias("n_deltas"),
        # order-insensitive mean: each rate is quantized to an e6
        # INTEGER before averaging — integer sums are exact in both
        # engines, so the mean is bit-identical regardless of
        # summation order (a raw double mean drifted 1-2 ulps at
        # 2k-20k deltas, observed at both sf0.01 and sf0.1)
        F.round(
            F.avg(
                F.when(
                    F.col("dt_s") > 0,
                    F.round(F.col("dv") / F.col("dt_s") * 1e6).cast("long"),
                )
            )
            / 100.0
        ).cast("bigint").alias("mean_rate_e4"),
        _e(F.max(F.abs("dv")), 4).alias("max_abs_delta_e4"),
    )


@q(
    "ts_anomaly_zscore",
    """
    WITH scored AS (
      SELECT event_id, event_type, ts, value,
             avg(value)        OVER w AS mu,
             stddev_pop(value) OVER w AS sd,
             count(value)      OVER w AS n_hist
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN 100 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, event_type AS series_id,
           CAST(ROUND((value - mu) / sd * 1e4) AS BIGINT) AS z_e4
    FROM scored
    WHERE n_hist >= 30 AND sd > 0 AND abs((value - mu) / sd) > 3.0
    """,
)
def ts_anomaly_zscore(spark, sf_dir):
    """Rolling z-score anomaly detection: each point scored against the
    mean/stddev of its own trailing 100 observations (point excluded),
    flagged beyond 3σ. One window pass per series — the standard TS
    outlier query; the trailing frame makes it causally valid (no
    future leakage) and streamable."""
    ev = _ev(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-100, -1)
    )
    mu = F.avg("value").over(w)
    sd = F.stddev_pop("value").over(w)
    n_hist = F.count("value").over(w)
    z = (F.col("value") - mu) / sd
    scored = ev.select(
        "event_id",
        F.col("event_type").alias("series_id"),
        z.alias("z"),
        n_hist.alias("n_hist"),
        sd.alias("sd"),
    )
    return scored.where(
        (F.col("n_hist") >= 30) & (F.col("sd") > 0) & (F.abs("z") > 3.0)
    ).select("event_id", "series_id", _e("z", 4).alias("z_e4"))


CORR_TOP_K = 8  # pair generation bound: only the top-k most active series


@q(
    "ts_series_corr",
    f"""
    WITH active AS (
      SELECT event_type FROM events GROUP BY event_type
      ORDER BY count(*) DESC, event_type LIMIT {CORR_TOP_K}
    ),
    hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h, avg(value) AS v
      FROM events
      WHERE event_type IN (SELECT event_type FROM active)
      GROUP BY 1, 2
    )
    SELECT a.event_type AS series_a, b.event_type AS series_b,
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(ROUND(corr(a.v, b.v) * 1e4) AS BIGINT) AS corr_e4
    FROM hourly a JOIN hourly b
      ON a.h = b.h AND a.event_type < b.event_type
    GROUP BY 1, 2
    """,
)
def ts_series_corr(spark, sf_dir, top_k: int = CORR_TOP_K):
    """Pearson correlation between series pairs on aligned hourly
    windows, with the pair set BOUNDED to the top-k most active series
    before the self-join: an unrestricted self-join on the hour is
    O(S²) pairs per window — fine for the sandbox's 5 event types, a
    scale-killer at millions of series. The bound is a distributed
    TakeOrderedAndProject (same shape as tiers.detect_hot_keys), the
    survivor set broadcasts into a semi-join, and only then do series
    pairs form — worst case k² pairs per window, k driver-chosen.
    Correlation is rounded to 1e-4: corr is a ratio of large
    near-cancelling sums, so its cross-engine agreement is inherently
    coarser than the 1e-6 of plain aggregates."""
    ev = _ev(spark, sf_dir)
    active = (
        ev.groupBy("event_type")
        .agg(F.count("*").alias("acnt"))
        .orderBy(F.desc("acnt"), F.asc("event_type"))
        .limit(top_k)
        .select("event_type")
    )
    hourly = (
        ev.join(F.broadcast(active), "event_type")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.avg("value").alias("v"))
    )
    a = hourly.select(
        F.col("event_type").alias("series_a"), "h", F.col("v").alias("va")
    )
    b = hourly.select(
        F.col("event_type").alias("series_b"), "h", F.col("v").alias("vb")
    )
    j = a.join(b, "h").where(F.col("series_a") < F.col("series_b"))
    return j.groupBy("series_a", "series_b").agg(
        F.count("*").alias("n_windows"),
        _e(F.corr("va", "vb"), 4).alias("corr_e4"),
    )


# ---------------------------------------------------------------------------
# W3: sessionization — lag + cumulative-sum session ids (the batch form
# of session_window; gap > 30 minutes starts a new session)
# ---------------------------------------------------------------------------

@q(
    "ts_sessionize",
    """
    WITH lagged AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, epoch_us(ts))
    ),
    sess AS (
      SELECT user_id, ts,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM lagged
    )
    SELECT user_id,
           CAST(count(DISTINCT sid) AS BIGINT) AS n_sessions,
           CAST(count(*) AS BIGINT) AS n_events
    FROM sess GROUP BY user_id
    """,
)
def ts_sessionize(spark, sf_dir):
    ev = _ev(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts")
    # ts is TIMESTAMP_NTZ in the driver parquet: compare via interval
    # arithmetic (NTZ cannot cast to double)
    lagged = ev.withColumn(
        "new_sess",
        F.when(
            F.col("ts") - F.lag("ts").over(w) > F.expr("interval 30 minutes"),
            1,
        )
        .when(F.lag("ts").over(w).isNull(), 1)
        .otherwise(0),
    )
    sess = lagged.withColumn(
        "sid",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return sess.groupBy("user_id").agg(
        F.countDistinct("sid").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# Cross-tier cascade-invariant audit (tiers.coherence_audit): a stored
# 1h tier with three deterministically planted corruption classes —
# value-corrupt windows, dropped windows, orphan windows — audited
# against the re-cascade of the 1m tier. The oracle re-derives the
# stored tier (same planting rules), the expected tier, and every
# verdict independently in SQL.
# ---------------------------------------------------------------------------

@q(
    "ts_tier_coherence",
    """
    WITH t1h AS (
      SELECT event_type AS series_id, date_trunc('hour', ts) AS ws,
             count(value) AS cnt,
             sum(value) AS s,
             min(value) AS mn, max(value) AS mx,
             sum(value * value) AS sq
      FROM events GROUP BY 1, 2
    ),
    h AS (
      SELECT *, CAST(epoch(ws) AS BIGINT) // 3600 + length(series_id) AS hh
      FROM t1h
    ),
    stored AS (
      SELECT series_id, ws,
             CASE WHEN hh % 13 = 0 THEN cnt + 1 ELSE cnt END AS cnt,
             CASE WHEN hh % 13 = 0 THEN s + 0.5 ELSE s END AS s,
             mn, mx, sq
      FROM h WHERE hh % 17 <> 5
      UNION ALL
      SELECT series_id, ws + INTERVAL 370 DAY, cnt, s, mn, mx, sq
      FROM h WHERE hh % 19 = 3
    ),
    sc AS (
      SELECT series_id, ws, cnt,
             CAST(ROUND(s * 1e4) AS BIGINT) AS s_e4, mn, mx,
             CAST(ROUND(sq * 1e2) AS BIGINT) AS sq_e2
      FROM stored
    ),
    ec AS (
      SELECT series_id, ws, cnt,
             CAST(ROUND(s * 1e4) AS BIGINT) AS s_e4, mn, mx,
             CAST(ROUND(sq * 1e2) AS BIGINT) AS sq_e2
      FROM t1h
    )
    SELECT COALESCE(s.series_id, e.series_id) AS series_id,
           strftime(COALESCE(s.ws, e.ws), '%Y-%m-%d %H:%M:%S')
             AS window_start,
           CASE WHEN s.cnt IS NULL THEN 'missing'
                WHEN e.cnt IS NULL THEN 'orphan'
                WHEN s.cnt = e.cnt AND abs(s.s_e4 - e.s_e4) <= 1
                     AND s.mn IS NOT DISTINCT FROM e.mn
                     AND s.mx IS NOT DISTINCT FROM e.mx
                     AND abs(s.sq_e2 - e.sq_e2) <= 1 THEN 'ok'
                ELSE 'mismatch' END AS status,
           CASE WHEN s.cnt IS NOT NULL AND e.cnt IS NOT NULL
                THEN s.cnt - e.cnt END AS cnt_diff
    FROM sc s FULL OUTER JOIN ec e
      ON s.series_id = e.series_id AND s.ws = e.ws
    """,
)
def ts_tier_coherence(spark, sf_dir):
    """Audit a stored 1h tier against cascade(1m tier) with planted
    corruption: hh = epoch(window)//3600 + len(series_id); hh%13==0 →
    cnt+1 and sum+0.5 (mismatch), hh%17==5 → window dropped (missing),
    hh%19==3 → the window re-emitted at +370 days (orphan — beyond the
    data's time range by construction, so it collides with nothing).
    Exercises every verdict branch of tiers.coherence_audit in one
    driver-checked pair. Output keeps the integer-exact columns
    (status, cnt_diff): the engine's sum_diff on a corrupt window is
    round((s+0.5)·1e4) − round(s'·1e4) over two differently-ordered
    sums, i.e. 5000 ± a possible rounding-boundary unit — correct, but
    not a value a cross-engine hash can pin."""
    raw = _events_raw(spark, sf_dir)
    t1m = tiers.rollup(raw, "1m")
    t1h = tiers.rollup(raw, "1h")
    hh = (F.unix_timestamp("window_start") / F.lit(3600)).cast(
        "bigint"
    ) + F.length("series_id")
    corrupt = hh % 13 == 0
    stored = (
        t1h.where(hh % 17 != 5)
        .withColumn("cnt", F.when(corrupt, F.col("cnt") + 1).otherwise(F.col("cnt")))
        .withColumn("sum", F.when(corrupt, F.col("sum") + 0.5).otherwise(F.col("sum")))
        .unionByName(
            t1h.where(hh % 19 == 3).withColumn(
                "window_start",
                F.col("window_start") + F.expr("INTERVAL 370 DAYS"),
            )
        )
    )
    aud = tiers.coherence_audit(stored, t1m, "1h")
    return aud.select(
        "series_id",
        _fmt("window_start").alias("window_start"),
        "status",
        "cnt_diff",
    )


@q(
    "ts_tier_repair",
    """
    SELECT event_type AS series_id,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
             AS window_start,
           count(value) AS cnt,
           CAST(ROUND(sum(value) * 1e4) AS BIGINT) AS sum_e4,
           min(value) AS min,
           max(value) AS max
    FROM events
    GROUP BY 1, 2
    """,
)
def ts_tier_repair(spark, sf_dir):
    """Repair the SAME corrupted stored 1h tier ts_tier_coherence
    plants (cnt/sum-corrupt + dropped + orphan windows) from the 1m
    tier below it — and the oracle is simply the direct 1h rollup:
    repair(corrupted) must be value-equal to rebuild, while touching
    only the flagged windows (pytest pins the pass-through side)."""
    raw = _events_raw(spark, sf_dir)
    t1m = tiers.rollup(raw, "1m")
    t1h = tiers.rollup(raw, "1h")
    hh = (F.unix_timestamp("window_start") / F.lit(3600)).cast(
        "bigint"
    ) + F.length("series_id")
    corrupt = hh % 13 == 0
    stored = (
        t1h.where(hh % 17 != 5)
        .withColumn("cnt", F.when(corrupt, F.col("cnt") + 1).otherwise(F.col("cnt")))
        .withColumn("sum", F.when(corrupt, F.col("sum") + 0.5).otherwise(F.col("sum")))
        .unionByName(
            t1h.where(hh % 19 == 3).withColumn(
                "window_start",
                F.col("window_start") + F.expr("INTERVAL 370 DAYS"),
            )
        )
    )
    rep = tiers.repair_tier(stored, t1m, "1h")
    return rep.select(
        "series_id",
        _fmt("window_start").alias("window_start"),
        "cnt",
        _e("sum", 4).alias("sum_e4"),
        "min",
        "max",
    )
