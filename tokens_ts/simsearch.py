"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline; random-hyperplane LSH
bucketing as the scale path (candidates only within a bucket — turns
the O(n·q) cross join into a bucket-key equi-join).

All math is JVM-side (zip_with / aggregate on array<double>); at
10^12 rows the brute-force path broadcast-joins the (small) query set
against the corpus — one scan, no shuffle — while the LSH path
shuffles once on bucket id.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k for a small query set.

    The query side is broadcast (BroadcastNestedLoopJoin over ~|Q|
    rows); rank ties are broken on the scaled similarity then id so
    results are deterministic across engines and runs.
    """
    e = emb.select(
        F.col(id_col).alias("nid"), F.col(vec_col).cast("array<double>").alias("v")
    )
    q = emb.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("qid"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    j = e.crossJoin(F.broadcast(q)).where(F.col("nid") != F.col("qid"))
    sim = _dot(F.col("qv"), F.col("v")) / (_norm(F.col("qv")) * _norm(F.col("v")))
    scored = j.select(
        "qid", "nid", F.round(sim * 1e6).cast("bigint").alias("sim_e6")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim_e6"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "nid", "rank", "sim_e6")
    )


def hyperplane(j: int, dim: int = 64):
    """Deterministic pseudo-random hyperplane j: h[i] = ((i·31+j·37)%19)−9
    for i = 1..dim (1-based so the DuckDB oracle can mirror it exactly)."""
    return F.array(
        *[F.lit(float(((i * 31 + j * 37) % 19) - 9)) for i in range(1, dim + 1)]
    )


def _bucket_expr(vec_col: str, n_planes: int, dim: int, table: int = 0):
    """Bucket id for one hash table: bit j = (h_{table·n_planes+j}·v > 0)."""
    v = F.col(vec_col).cast("array<double>")
    bucket = F.lit(0).cast("long")
    for j in range(n_planes):
        bit = F.when(
            _dot(hyperplane(table * n_planes + j, dim), v) > 0,
            F.lit(1).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        bucket = bucket + F.shiftleft(bit, j)
    return bucket


def with_lsh_bucket(
    emb: DataFrame, n_planes: int = 8, dim: int = 64, vec_col: str = "embedding"
) -> DataFrame:
    """Sign-of-projection bucket id: bit j = (h_j · v > 0)."""
    return emb.withColumn("bucket", _bucket_expr(vec_col, n_planes, dim))


def cosine_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int = 10_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS (the dedup-by-embedding
    op): candidates restricted to LSH bucket collisions (equi-join on
    bucket id — the only pairwise stage, bounded by bucket size and
    capped like skewed agg keys), then exact cosine verification
    ≥ threshold. The web-scale shape: no all-pairs product anywhere."""
    b = with_lsh_bucket(emb, n_planes, dim, vec_col).select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
        "bucket",
    )
    w = Window.partitionBy("bucket")
    sized = b.withColumn("_bsz", F.count("*").over(w)).where(
        (F.col("_bsz") >= 2) & (F.col("_bsz") <= max_bucket)
    )
    lhs = sized.select("bucket", F.col("_id").alias("a"), F.col("_v").alias("va"))
    rhs = sized.select("bucket", F.col("_id").alias("b"), F.col("_v").alias("vb"))
    sim = _dot(F.col("va"), F.col("vb")) / (
        _norm(F.col("va")) * _norm(F.col("vb"))
    )
    return (
        lhs.join(rhs, "bucket")
        .where(F.col("a") < F.col("b"))
        .select("a", "b", F.round(sim * 1e6).cast("bigint").alias("sim_e6"))
        .where(F.col("sim_e6") >= int(round(threshold * 1e6)))
        .distinct()
    )


def lsh_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 1,
    n_planes: int = 8,
    dim: int = 64,
    n_tables: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to bucket collisions.

    n_tables > 1 is the recall lever: each table hashes with an
    independent plane set (planes table·n_planes .. +n_planes-1); a
    candidate qualifies if it collides with the query in ANY table
    (union + distinct), trading candidate-set size for recall — the
    standard multi-table LSH design. Collision probability per table
    is (1−θ/π)^n_planes, so misses decay exponentially in n_tables.
    Measured by the emb_ann_recall driver pair against the exact
    cosine_topk ground truth."""
    base = emb.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).cast("array<double>").alias("v"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        _bucket_expr(vec_col, n_planes, dim, t).alias("bucket"),
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("tb"),
    ).select("nid", "v", "tb.tbl", "tb.bucket")
    q = base.where(F.col("nid").isin(query_ids)).select(
        F.col("nid").alias("qid"),
        F.col("v").alias("qv"),
        F.col("tbl").alias("qt"),
        F.col("bucket").alias("qb"),
    )
    cand = (
        base.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("qb")) & (F.col("tbl") == F.col("qt")),
        )
        .where(F.col("nid") != F.col("qid"))
        .select("qid", "qv", "nid", "v")
        .distinct()  # a pair colliding in several tables scores once
    )
    sim = _dot(F.col("qv"), F.col("v")) / (_norm(F.col("qv")) * _norm(F.col("v")))
    scored = cand.select(
        "qid", "nid", F.round(sim * 1e6).cast("bigint").alias("sim_e6")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim_e6"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "nid", "rank", "sim_e6")
    )
