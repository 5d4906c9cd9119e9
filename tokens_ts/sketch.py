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


# --- Bloom filter -----------------------------------------------------
#
# The membership twin of count_min: a per-group bit array answering
# "was this item ingested?" with no false negatives and a bounded
# false-positive rate — the dedup PRE-FILTER that lets a 10^12-row
# ingest skip the expensive exact-dedup shuffle for items whose bits
# miss. Words are bigint rows (group, widx, word) built with bit_or,
# which is idempotent AND mergeable: bloom(A ∪ B) == word-wise OR of
# bloom(A), bloom(B) — the same partial-state contract as the tiers.
# Word width is 60 bits so every word stays a POSITIVE bigint: DuckDB
# raises on 1<<63 (signed overflow), so 64-bit words could never be
# cross-engine value-checked.

BLOOM_WORD_BITS = 60


def _bloom_pos(item_col: str, j: int, m_bits: int):
    """Hash-j bit position of an item: md5_60('<j>#<item>') mod m
    (md5_60 is non-negative, so % == pmod) — same seeding convention
    as count_min's _bucket, DuckDB-reproducible."""
    return F.pmod(
        md5_60(
            F.concat_ws("#", F.lit(str(j)), F.col(item_col).cast("string"))
        ),
        F.lit(m_bits),
    )


def bloom_build(
    items: DataFrame,
    item_col: str,
    group_cols: list[str],
    m_bits: int = 960,
    k: int = 4,
) -> DataFrame:
    """Build one Bloom filter per group: (group_cols..., widx, word)
    rows, ≤ ceil(m_bits/60) per group regardless of item count. ONE
    map-side-combined bit_or agg over a k× position explode; zero-bit
    words are absent (OR-identity zero ⇒ absence is canonical, and
    merge stays a plain unionByName + re-OR)."""
    positions = F.array(
        *[_bloom_pos(item_col, j, m_bits) for j in range(k)]
    )
    return (
        items.select(*group_cols, F.explode(positions).alias("_pos"))
        .select(
            *group_cols,
            (F.col("_pos") / BLOOM_WORD_BITS).cast("int").alias("widx"),
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                (F.col("_pos") % BLOOM_WORD_BITS).cast("int"),
            ).alias("_bit"),
        )
        .groupBy(*group_cols, "widx")
        .agg(F.bit_or("_bit").alias("word"))
    )


def bloom_probe(
    bloom: DataFrame,
    probes: DataFrame,
    item_col: str,
    group_cols: list[str],
    m_bits: int = 960,
    k: int = 4,
) -> DataFrame:
    """Membership verdict per distinct (group, item) probe: positive
    iff ALL k bits are set. The filter side is words-bounded —
    broadcast — so probing is a map-side join at any probe count; a
    missing word row means those bits are zero (absent-as-zero
    convention from bloom_build)."""
    q = probes.select(*group_cols, item_col).distinct()
    pos = q.select(
        *group_cols,
        F.col(item_col),
        F.explode(
            F.array(*[_bloom_pos(item_col, j, m_bits) for j in range(k)])
        ).alias("_pos"),
    ).select(
        *group_cols,
        item_col,
        (F.col("_pos") / BLOOM_WORD_BITS).cast("int").alias("widx"),
        F.call_function(
            "shiftleft",
            F.lit(1).cast("long"),
            (F.col("_pos") % BLOOM_WORD_BITS).cast("int"),
        ).alias("_bit"),
    )
    joined = pos.join(F.broadcast(bloom), [*group_cols, "widx"], "left")
    hit = (
        F.coalesce(F.col("word"), F.lit(0)).bitwiseAND(F.col("_bit"))
        == F.col("_bit")
    ).cast("int")
    return joined.groupBy(*group_cols, item_col).agg(
        (F.min(hit) == 1).alias("maybe_member")
    )


# ---------------------------------------------------------------------------
# K-minimum-values (KMV) distinct sketch: the set algebra HLL lacks
# ---------------------------------------------------------------------------

KMV_RANGE = 1 << 60  # md5_60 hash space


def kmv_sketch(
    items: DataFrame, item_col: str, group_cols: list[str], k: int = 64
) -> DataFrame:
    """Per-group KMV sketch: the k smallest md5_60 values of the
    DISTINCT items, plus the exact distinct count. KMV supports what
    HLL cannot: sketch UNION (merge + re-truncate) and sketch
    INTERSECTION (Jaccard from the union sketch, kmv_overlap) — the
    audience-overlap question without an exact pairwise pass.
    Deterministic hashing ⇒ the whole sketch is cross-engine
    value-checkable, not just property-tested.

    Scale shape (the 10^12-distinct design): computing min-k by
    sorting all hashes is a corpus sort, so the k smallest are taken
    from a THRESHOLD prefilter instead — survivors = hashes below
    LEAST(2^60, (2^60 div max(n, 8k)) · 8k), where n is the group's
    exact distinct count (one agg). Expected survivors ≈ 8k per group
    (an 8× safety margin over the k-th order statistic's mean), so
    the final per-group sort touches a few hundred values. The
    threshold rule is PART OF THE SPEC: in the astronomically unlikely
    event it clips below the true k-th minimum, both engines clip
    identically (parity holds; the estimator just uses fewer values)."""
    h = items.select(
        *group_cols,
        md5_60(F.col(item_col).cast("string")).alias("_hv"),
    ).distinct()
    m = 8 * k
    n = h.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_distinct")
    )
    thr = n.withColumn(
        "_thr",
        F.expr(
            f"LEAST(CAST({KMV_RANGE} AS BIGINT), "
            f"(CAST({KMV_RANGE} AS BIGINT) DIV "
            f"GREATEST(n_distinct, {m})) * {m})"
        ),
    )
    surv = h.join(F.broadcast(thr), group_cols).where(
        F.col("_hv") < F.col("_thr")
    )
    return surv.groupBy(*group_cols, "n_distinct").agg(
        F.slice(F.array_sort(F.collect_list("_hv")), 1, k).alias("hs")
    )


def kmv_overlap(sk: DataFrame, group_col: str, k: int = 64) -> DataFrame:
    """All-pairs audience overlap from KMV sketches: for each group
    pair (ga < gb), the union-size estimate, the Jaccard estimate
    (fraction of the union sketch's values present in BOTH input
    sketches — the standard KMV intersection rule), and their product,
    the intersection-size estimate. When the union sketch holds fewer
    than k values it IS the whole union, so the estimate degrades to
    exact. The pair frame is groups-bounded (broadcast non-equi join
    over the sketch table, never the corpus)."""
    a = sk.select(
        F.col(group_col).alias("ga"),
        F.col("hs").alias("ha"),
        F.col("n_distinct").alias("na"),
    )
    b = sk.select(
        F.col(group_col).alias("gb"),
        F.col("hs").alias("hb"),
        F.col("n_distinct").alias("nb"),
    )
    p = a.join(F.broadcast(b), F.col("ga") < F.col("gb"))
    union_k = F.slice(F.array_sort(F.array_union("ha", "hb")), 1, k)
    inter = F.array_intersect("ha", "hb")
    p = (
        p.withColumn("_uk", union_k)
        .withColumn("m", F.size("_uk").cast("bigint"))
        .withColumn(
            "matched",
            F.size(F.array_intersect(F.col("_uk"), inter)).cast("bigint"),
        )
    )
    union_est = F.when(
        F.col("m") < k, F.col("m").cast("double")
    ).otherwise(
        F.lit(float(k - 1))
        * F.lit(float(KMV_RANGE))
        / F.element_at("_uk", k).cast("double")
    )
    jac = F.col("matched").cast("double") / F.col("m").cast("double")
    return p.select(
        "ga",
        "gb",
        "na",
        "nb",
        "m",
        "matched",
        union_est.alias("union_est"),
        jac.alias("jaccard"),
        (jac * union_est).alias("inter_est"),
    )
