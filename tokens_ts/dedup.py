"""Deduplication operators for training-data pipelines.

Exact (hash-groupBy), MinHash+LSH (shingle → minhash → band →
bucket-join), SimHash, and n-gram Jaccard — all DataFrame-native;
hashing is JVM-side xxhash64/md5, candidate generation is a self-join
on band buckets (shuffle on bucket key, no O(n²) cross join).

Scale notes: at 10^12 documents the LSH band join is the only pairwise
stage, and its cost is bounded by bucket sizes — hot buckets (boiler-
plate text) should be capped (`max_bucket`) exactly like skewed
aggregation keys are salted (SURVEY.md A8).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def exact_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by content hash (md5) — one shuffle."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.count("*").alias("n_dup"),
            F.min("doc_id").alias("keep_doc_id"),
        )
    )


def word_shingles(text_col: str = "text", k: int = 3):
    """k-gram word shingles as a distinct string array (expression)."""
    # greatest(..., 1): a doc shorter than k words yields one whole-doc
    # shingle (sequence(1, 0) would infer step -1 and slice at pos 0)
    return F.expr(
        f"""array_distinct(transform(
              sequence(1, greatest(size(split(trim({text_col}), '\\\\s+')) - {k - 1}, 1)),
              i -> concat_ws(' ', slice(split(trim({text_col}), '\\\\s+'), i, {k}))
            ))"""
    )


def with_minhash(
    docs: DataFrame, n_perm: int = 32, text_col: str = "text"
) -> DataFrame:
    """MinHash signature: min over shingles of xxhash64(shingle, seed),
    one column per permutation — all JVM-side array expressions."""
    df = docs.withColumn("_sh", word_shingles(text_col))
    sig = F.array(
        *[
            F.array_min(
                F.transform(F.col("_sh"), lambda s: F.xxhash64(s, F.lit(j)))
            )
            for j in range(n_perm)
        ]
    )
    return df.withColumn("minhash", sig).drop("_sh")


def lsh_candidates(
    docs: DataFrame,
    n_perm: int = 32,
    bands: int = 8,
    text_col: str = "text",
    max_bucket: int = 1000,
) -> DataFrame:
    """MinHash-LSH candidate pairs: band-hash → bucket self-join.

    rows_per_band = n_perm // bands; two docs collide if any band of
    their signatures is identical. Bucket sizes above max_bucket are
    dropped (degenerate boilerplate buckets would otherwise explode
    the join at web scale)."""
    r = n_perm // bands
    sigs = with_minhash(docs, n_perm, text_col).select("doc_id", "minhash")
    band_rows = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.slice("minhash", b * r + 1, r).cast("string")
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    from pyspark.sql import Window

    w = Window.partitionBy("band", "bucket")
    sized = band_rows.withColumn("bsz", F.count("*").over(w)).where(
        (F.col("bsz") >= 2) & (F.col("bsz") <= max_bucket)
    )
    a = sized.select("band", "bucket", F.col("doc_id").alias("a"))
    b = sized.select("band", "bucket", F.col("doc_id").alias("b"))
    pairs = (
        a.join(b, ["band", "bucket"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    return pairs


def simhash64(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit SimHash over word shingles: per bit, sign of the sum of
    ±1 contributions from each shingle's xxhash64 bit — expressed as
    64 aggregate-free array expressions (row-local)."""
    df = docs.withColumn("_sh", word_shingles(text_col)).withColumn(
        "_h", F.transform(F.col("_sh"), lambda s: F.xxhash64(s))
    )
    bit_cols = []
    for b in range(64):
        contrib = F.aggregate(
            F.col("_h"),
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.getbit(h, F.lit(b)) == 1, 1).otherwise(-1),
        )
        bit_cols.append(
            F.when(contrib > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(
                F.lit(0).cast("long")
            )
        )
    sim = bit_cols[0]
    for c in bit_cols[1:]:
        sim = sim + c
    return df.select("doc_id", sim.alias("simhash"))
