"""Count-min sketch over item streams — the sublinear frequency
summary for head-of-distribution queries when even the token-histogram
tier (vocab × buckets rows) is too wide to keep hot, e.g. per-user or
per-n-gram keys at 10^12 scale.

The sketch is a depth × width grid of counters; item i increments one
counter per row at bucket h_j(i). Estimates read min_j grid[j][h_j(i)]
— always ≥ the true count (counters only ever absorb extra mass), with
the classical (ε=e/width, δ=e^-depth) overestimate bound. Counters are
ADDITIVE, so sketches merge by cell-wise sum: build per increment,
merge into the stored sketch — the same partial-state contract as the
value tiers.

Hashing is md5_60 (dedup.py) so DuckDB computes the exact same grid —
every estimate is cross-engine value-checkable, not just
property-tested."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from tokens_ts.dedup import md5_60


def _bucket(item_col: str, j: int, width: int):
    """Row-j bucket of an item: md5_60('<j>#<item>') mod width.
    md5_60 is non-negative (60-bit), so % == pmod."""
    return F.pmod(
        md5_60(
            F.concat_ws("#", F.lit(str(j)), F.col(item_col).cast("string"))
        ),
        F.lit(width),
    )


def count_min(
    items: DataFrame,
    item_col: str,
    weight_col: str | None = None,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Build a count-min sketch: (j, bucket, cnt) rows, ≤ depth×width
    of them regardless of input size. One map-side-combined agg over a
    depth× explode of the input (each row contributes `depth` cells) —
    with weight_col, pre-aggregated (item, count) rows build the
    identical sketch as the raw stream, so feed it the histogram tier
    when one exists."""
    w = (F.col(weight_col) if weight_col else F.lit(1)).cast("bigint")
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                _bucket(item_col, j, width).alias("bucket"),
            )
            for j in range(depth)
        ]
    )
    return (
        items.select(F.explode(cells).alias("h"), w.alias("_w"))
        .groupBy(
            F.col("h.j").alias("j"), F.col("h.bucket").alias("bucket")
        )
        .agg(F.sum("_w").alias("cnt"))
    )


def cm_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Point-query the sketch for each distinct item in `queries`:
    est_c = min over rows of the item's bucket counter (0 if a bucket
    was never touched). The sketch side is ≤ depth×width rows —
    broadcast, so estimation is a map-side join at any query count."""
    q = queries.select(F.col(item_col)).distinct()
    probes = q.select(
        item_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _bucket(item_col, j, width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("h"),
    ).select(item_col, F.col("h.j").alias("j"), F.col("h.bucket").alias("bucket"))
    joined = probes.join(F.broadcast(sketch), ["j", "bucket"], "left")
    return joined.groupBy(item_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("bigint").alias("est_c")
    )


def cm_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum of two sketches built with the same (depth,
    width): sketch(A ⊎ B) == cm_merge(sketch(A), sketch(B)) exactly —
    the incremental-maintenance path."""
    return (
        a.unionByName(b)
        .groupBy("j", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
