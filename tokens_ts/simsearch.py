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


def ivf_assign(
    emb: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its max-cosine
    centroid. Default centroids are the first n_centroids vectors by
    id — deterministic so the DuckDB oracle can mirror the whole index;
    pass `centroids` (e.g. from lloyd_centroids) for refined cells —
    the Spark shape is identical either way: the assignment is always
    a broadcast-centroids × corpus scan, one pass, no shuffle of the
    corpus. Ties break to the lowest centroid id on the e6-rounded
    similarity, cross-engine-stable."""
    e = emb.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    # ALL centroids as one broadcast array row → the argmax runs
    # row-locally inside the corpus scan: ZERO shuffles of the corpus
    # (a per-(vector, centroid) window/groupBy would shuffle N×C or N
    # rows for nothing — the centroid set is tiny by construction)
    if centroids is not None:
        cents = e.sparkSession.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
            "cid long, cv array<double>",
        ).select(
            F.struct(F.col("cid"), F.col("cv")).alias("c")
        ).agg(F.collect_list("c").alias("_cs"))
    else:
        cents = (
            e.where(F.col("nid") < n_centroids)
            .select(F.struct(F.col("nid").alias("cid"), F.col("v").alias("cv")).alias("c"))
            .agg(F.collect_list("c").alias("_cs"))
        )
    j = e.crossJoin(F.broadcast(cents))
    nv = _norm(F.col("v"))
    csim = lambda c: F.round(  # noqa: E731
        _dot(F.col("v"), c["cv"]) / (nv * _norm(c["cv"])) * 1e6
    ).cast("bigint")
    # one dot per centroid (transform), then a comparison-only argmax
    # fold — an expression referenced in a lambda is re-evaluated per
    # reference (no CSE across lambdas), so the sim is materialized
    # into the struct array first
    sims = F.transform(
        "_cs",
        lambda c: F.struct(
            csim(c).alias("s"), c["cid"].cast("bigint").alias("cid")
        ),
    )
    best = F.aggregate(
        sims,
        F.struct(
            F.lit(-(1 << 62)).cast("bigint").alias("s"),
            F.lit(-1).cast("bigint").alias("cid"),
        ),
        lambda acc, x: F.when(
            (x["s"] > acc["s"])
            | ((x["s"] == acc["s"]) & (x["cid"] < acc["cid"])),
            x,
        ).otherwise(acc),
    )
    return j.select("nid", "v", best["cid"].alias("cid"))


def lloyd_centroids(
    emb: DataFrame,
    n_centroids: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> list[list[float]]:
    """Deterministic Lloyd (k-means) refinement of the IVF centroids.

    Seeds = the first n_centroids vectors by id (same seed rule the
    un-refined index uses); each of the n_iter iterations is:

      1. broadcast-assign — the ivf_assign scan (zero corpus shuffles),
      2. per-cluster mean — ONE map-side-combined aggregation producing
         n_centroids×dim partial sums (64 F.avg expressions, JVM-side),
      3. driver-side closed-form update (control-plane: n_centroids
         rows collected).

    Everything is closed-form and order-independent (sums/counts), so
    a numpy oracle reproduces the exact centroids — pinned by pytest.
    Empty cells keep their previous centroid (the standard rule).
    Returns driver-side centroid vectors for ivf_assign/ivf_topk's
    `centroids=` parameter; total cost = n_iter corpus scans, no
    corpus shuffle beyond the agg's partial-state exchange."""
    e = emb.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    cents = [
        [float(x) for x in r["v"]]
        for r in e.where(F.col("nid") < n_centroids).orderBy("nid").collect()
    ]
    for _ in range(n_iter):
        assign = ivf_assign(emb, n_centroids, id_col, vec_col, centroids=cents)
        means = (
            assign.groupBy("cid")
            .agg(
                *[F.avg(F.col("v")[i]).alias(f"m{i}") for i in range(dim)]
            )
            .collect()
        )
        by_cid = {int(r["cid"]): [float(r[f"m{i}"]) for i in range(dim)] for r in means}
        cents = [by_cid.get(c, cents[c]) for c in range(len(cents))]
    return cents


def ivf_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 3,
    n_centroids: int = 8,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF ANN: probe the query's nprobe closest centroids, score only
    vectors assigned to those cells — the inverted-file alternative to
    LSH bucketing. Candidate generation is an equi-join on cid; the
    corpus is scanned once for assignment and once for scoring.
    `centroids` (e.g. lloyd_centroids output) replaces the default
    first-n seed cells on BOTH the assignment and the probe side."""
    assign = ivf_assign(emb, n_centroids, id_col, vec_col, centroids=centroids)
    e = emb.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).where(F.col("qid").isin(query_ids))
    if centroids is not None:
        cents = emb.sparkSession.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
            "cid long, cv array<double>",
        )
    else:
        cents = emb.select(
            F.col(id_col).alias("cid"),
            F.col(vec_col).cast("array<double>").alias("cv"),
        ).where(F.col("cid") < n_centroids)
    qsim = _dot(F.col("qv"), F.col("cv")) / (
        _norm(F.col("qv")) * _norm(F.col("cv"))
    )
    wq = Window.partitionBy("qid").orderBy(
        F.desc("qcsim_e6"), F.asc("cid")
    )
    probes = (
        e.crossJoin(F.broadcast(cents))
        .select("qid", "qv", "cid", F.round(qsim * 1e6).cast("bigint").alias("qcsim_e6"))
        .withColumn("_r", F.row_number().over(wq))
        .where(F.col("_r") <= nprobe)
        .select("qid", "qv", "cid")
    )
    cand = assign.join(F.broadcast(probes), "cid").where(
        F.col("nid") != F.col("qid")
    )
    sim = _dot(F.col("qv"), F.col("v")) / (_norm(F.col("qv")) * _norm(F.col("v")))
    scored = cand.select(
        "qid", "nid", F.round(sim * 1e6).cast("bigint").alias("sim_e6")
    ).distinct()
    w = Window.partitionBy("qid").orderBy(F.desc("sim_e6"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "nid", "rank", "sim_e6")
    )


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


def pca_top_component(
    emb: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    n_iter: int = 3,
):
    """Top principal component of the embedding cloud by UNROLLED
    power iteration — the embedding-drift / index-conditioning probe
    (a collapsing embedder shows one direction eating the variance;
    IVF cell balance degrades the same way).

    Fully deterministic and oracle-mirrorable (the lloyd_centroids
    contract): start vector is the exact binary double 1/8 in every
    coordinate; each iteration is (1) a row-local demeaned dot
    product, (2) ONE map-side-combined agg of dim F.sum expressions,
    (3) a driver-side normalize over dim control-plane doubles. The
    mean is broadcast as literals from one dim-wide F.avg agg.
    λ = v_{T−1}·(Σd(d·v_{T−1}))/n after the last iteration;
    explained = λ / mean squared demeaned norm. Power iteration is
    contractive toward the dominant eigenvector, so cross-engine
    ulp-level sum differences damp instead of amplifying — the e6
    grain holds through all iterations.

    Cost: n_iter + 2 corpus scans, each reduced map-side; zero
    corpus shuffles, zero Python in the per-row path.

    Returns (spark DataFrame of one row per dimension with the
    loading, λ, explained ratio, n) — built driver-side from
    control-plane values."""
    import math

    spark = emb.sparkSession
    e = emb.where(F.col(vec_col).isNotNull()).select(
        F.col(vec_col).cast("array<double>").alias("x")
    )
    mu_row = e.agg(
        *[F.avg(F.col("x")[j]).alias(f"m{j}") for j in range(dim)]
    ).collect()[0]
    mu_arr = F.array(*[F.lit(float(mu_row[f"m{j}"])) for j in range(dim)])
    d = e.select(
        F.zip_with(F.col("x"), mu_arr, lambda a, b: a - b).alias("d")
    )
    v = [0.125] * dim
    lam = None
    n = 0
    for _ in range(n_iter):
        vcol = F.array(*[F.lit(float(z)) for z in v])
        dot = F.aggregate(
            F.zip_with(F.col("d"), vcol, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )
        scored = d.select("d", dot.alias("_dot"))
        row = scored.agg(
            F.count("*").alias("n"),
            *[
                F.sum(F.col("d")[j] * F.col("_dot")).alias(f"s{j}")
                for j in range(dim)
            ],
        ).collect()[0]
        raw = [float(row[f"s{j}"]) for j in range(dim)]
        n = int(row["n"])
        lam = sum(a * b for a, b in zip(v, raw)) / n
        norm = math.sqrt(sum(z * z for z in raw))
        v = [z / norm for z in raw]
    tv = d.agg(
        F.avg(
            F.aggregate(
                F.col("d"), F.lit(0.0), lambda acc, z: acc + z * z
            )
        ).alias("tv")
    ).collect()[0]["tv"]
    rows = [
        (j + 1, v[j], float(lam), float(lam) / float(tv), n)
        for j in range(dim)
    ]
    return spark.createDataFrame(
        rows, "dim long, loading double, eigenvalue double, "
        "explained double, n long"
    )


def label_cohesion(
    emb: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Per-label embedding cohesion: each class's centroid norm and
    the mean cosine of members to their own centroid — the labeled-
    embedding QA gauge (a class whose cohesion sags is mislabeled,
    bimodal, or the embedder regressed on it; run per ingest batch).

    One dim-wide map-side-combined centroid agg (labels × dim,
    broadcast back), then a row-local cosine fold and one labels-
    bounded mean — zero corpus shuffles beyond the two partial-state
    aggs. Rows with zero norm are excluded from cohesion (cosine
    undefined; pinned)."""
    e = emb.where(
        F.col(vec_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.col(label_col).alias("label"),
        F.col(vec_col).cast("array<double>").alias("x"),
    )
    cents = e.groupBy("label").agg(
        F.count("*").cast("bigint").alias("n"),
        *[F.avg(F.col("x")[j]).alias(f"m{j}") for j in range(dim)],
    ).select(
        "label",
        "n",
        F.array(*[F.col(f"m{j}") for j in range(dim)]).alias("c"),
    )
    j = e.join(F.broadcast(cents), "label")

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda p, q: p * q),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )

    xx = _dot(F.col("x"), F.col("x"))
    cc = _dot(F.col("c"), F.col("c"))
    xc = _dot(F.col("x"), F.col("c"))
    cos = xc / (F.sqrt(xx) * F.sqrt(cc))
    scored = j.select(
        "label", "n", F.sqrt(cc).alias("_cn"),
        F.when((xx > 0) & (cc > 0), cos).alias("_cos"),
    )
    return scored.groupBy("label").agg(
        F.max("n").alias("n"),
        F.max("_cn").alias("centroid_norm"),
        F.avg("_cos").alias("cohesion"),
    )


def quantize_error(
    emb: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Symmetric per-dimension int8 quantization error — the
    memory-vs-recall planning table for an ANN index (int8 storage is
    4× smaller than float32; this says what it costs): per dim,
    scale s_j = max |x_j| (an ORDER-INDEPENDENT agg — exact
    cross-engine), q = round(x·127/s) ∈ [−127, 127], and the MSE and
    max abs error of dequantized values.

    Shape: ONE dim-wide max agg (order-independent — exact
    cross-engine) broadcast back as a 1-row frame, then ONE pass of
    2·dim more map-side-combined agg expressions (avg sqerr, max
    abserr per dim) — the corpus is scanned twice and NEVER exploded
    (a per-dim explode would push 64× the rows through the partial
    agg). The per-dim output table is unpivoted from the single
    result row. Dims with s = 0 quantize to 0 with zero error
    (pinned)."""
    e = emb.where(F.col(vec_col).isNotNull()).select(
        F.col(vec_col).cast("array<double>").alias("x")
    )
    scales = e.agg(
        *[F.max(F.abs(F.col("x")[j])).alias(f"s{j}") for j in range(dim)]
    )
    j = e.crossJoin(F.broadcast(scales))
    aggs = [F.count("*").cast("bigint").alias("n")]
    for jdim in range(dim):
        x = F.col("x")[jdim]
        s = F.col(f"s{jdim}")
        q = F.when(
            s > 0,
            F.greatest(
                F.lit(-127.0),
                F.least(F.lit(127.0), F.round(x * 127.0 / s)),
            ),
        ).otherwise(F.lit(0.0))
        err = x - F.when(s > 0, q * s / 127.0).otherwise(F.lit(0.0))
        aggs.append(F.avg(err * err).alias(f"mse{jdim}"))
        aggs.append(F.max(F.abs(err)).alias(f"mx{jdim}"))
        aggs.append(F.max(s).alias(f"sc{jdim}"))
    one = j.agg(*aggs)
    per_dim = F.array(
        *[
            F.struct(
                F.lit(jdim + 1).cast("long").alias("dim"),
                F.col(f"sc{jdim}").alias("scale"),
                F.col(f"mse{jdim}").alias("mse"),
                F.col(f"mx{jdim}").alias("max_abs_err"),
            )
            for jdim in range(dim)
        ]
    )
    return one.select("n", F.explode(per_dim).alias("r")).select(
        "r.dim", "r.scale", "r.mse", "r.max_abs_err", "n"
    )


def silhouette_centroid(
    emb: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Simplified (centroid-based) silhouette per label: for each row,
    a = Euclidean distance to its OWN label centroid, b = min distance
    to any OTHER label centroid, s = (b − a)/max(a, b) — the
    cluster-separation QA score (label_cohesion measures tightness
    only; silhouette also charges a class for sitting close to a
    NEIGHBORING class, which is what actually breaks classifiers and
    dedup thresholds). The full silhouette is O(n²); the centroid form
    is the standard large-scale surrogate.

    Pinned rules: rows with null vec/label excluded; a = b = 0 → s = 0
    (degenerate); single-label corpora emit b = s = null.

    Shapes: one dim-wide centroid agg (labels × dim), collected to ONE
    labels-bounded row and broadcast; per-row a/b are then ROW-LOCAL
    folds over the centroid array (no n×L shuffle, no corpus
    self-join); one labels-bounded mean agg finishes."""
    e = emb.where(
        F.col(vec_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.col(label_col).alias("label"),
        F.col(vec_col).cast("array<double>").alias("x"),
    )
    cents = e.groupBy("label").agg(
        *[F.avg(F.col("x")[j]).alias(f"m{j}") for j in range(dim)],
    ).select(
        "label",
        F.array(*[F.col(f"m{j}") for j in range(dim)]).alias("c"),
    )
    cl = cents.agg(
        F.collect_list(F.struct("label", "c")).alias("cs")
    )
    j = e.crossJoin(F.broadcast(cl))

    def _dist(c):
        return F.sqrt(
            F.aggregate(
                F.zip_with(F.col("x"), c, lambda p, q: (p - q) * (p - q)),
                F.lit(0.0),
                lambda acc, z: acc + z,
            )
        )

    own = F.filter(F.col("cs"), lambda s: s["label"] == F.col("label"))
    oth = F.filter(F.col("cs"), lambda s: s["label"] != F.col("label"))
    a = F.get(F.transform(own, lambda s: _dist(s["c"])), 0)
    b = F.array_min(F.transform(oth, lambda s: _dist(s["c"])))
    s = F.when(
        b.isNotNull(),
        F.when(
            F.greatest(a, b) > 0, (b - a) / F.greatest(a, b)
        ).otherwise(F.lit(0.0)),
    )
    scored = j.select("label", a.alias("_a"), b.alias("_b"), s.alias("_s"))
    return scored.groupBy("label").agg(
        F.count("*").cast("bigint").alias("n"),
        F.avg("_a").alias("mean_own_dist"),
        F.avg("_b").alias("mean_other_dist"),
        F.avg("_s").alias("silhouette"),
    )


def knn_outlier(
    emb: DataFrame,
    sample_mod: int = 37,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """k-NN-distance outlier scoring over a DETERMINISTIC query sample
    (id % sample_mod == 0): each sampled row's cosine distance to its
    k-th nearest neighbor in the full corpus — the classic
    density-based outlier signal for embedding QA (garbage inputs,
    embedder failures, and near-empty texts land far from everything;
    a duplicate-rich row lands at distance ~0).

    Per query: neighbors ranked by (e6-rounded sim desc, id asc) —
    the cosine_topk determinism rule; kth_sim = the rank-k similarity,
    outlier_score = 1 − kth_sim, mean_topk_sim = mean of the top-k
    e6 similarities (a rational of integers — exact cross-engine).
    Queries with fewer than k neighbors report their last available
    rank (n_found < k flags them).

    Shapes: ONE corpus scan × a broadcast query set (the exact/audit
    path, same as cosine_topk; at full-corpus query volume use
    lsh_topk — this operator's sampled contract IS the scale story:
    |corpus|/sample_mod queries, the corpus is never self-joined)."""
    e = emb.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    q = emb.where(
        (F.col(id_col) % sample_mod == 0) & F.col(vec_col).isNotNull()
    ).select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    j = e.crossJoin(F.broadcast(q)).where(F.col("nid") != F.col("qid"))
    sim = _dot(F.col("qv"), F.col("v")) / (_norm(F.col("qv")) * _norm(F.col("v")))
    scored = j.select(
        "qid", "nid", F.round(sim * 1e6).cast("bigint").alias("sim_e6")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim_e6"), F.asc("nid"))
    top = scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )
    return top.groupBy("qid").agg(
        F.count("*").cast("bigint").alias("n_found"),
        F.max_by("nid", F.col("rank")).alias("kth_nid"),
        (F.min("sim_e6") / 1e6).alias("kth_sim"),
        (F.avg("sim_e6") / 1e6).alias("mean_topk_sim"),
        (F.lit(1.0) - F.min("sim_e6") / 1e6).alias("outlier_score"),
    )


def mmr_topk(
    emb: DataFrame,
    sample_mod: int = 97,
    k: int = 5,
    pool: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance diversified top-k for a
    deterministic query sample (id % sample_mod == 0): greedy
    re-ranking of the brute-force top-`pool` cosine candidates with
    λ = 3/4 — MMR_score = λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s) —
    the standard redundancy-killer for retrieval-augmented sampling
    (plain top-k returns near-duplicates; MMR charges each pick for
    its similarity to what's already picked).

    Determinism is INTEGER-exact: similarities are e6-rounded bigints
    and λ = 3/4 makes 4·score = 3·sim_e6 − maxsel_e6 an integer;
    ties break on candidate id asc. Step 1 picks pure relevance; each
    later step is one candidates-bounded join + argmax (k−1 unrolled
    rounds, same design as the PCA/TextRank unrolled iterations).
    Queries whose pool is exhausted early just emit fewer rows.

    Shapes: candidate pooling is the cosine_topk broadcast shape (one
    corpus scan); everything after is bounded by queries × pool
    (pairwise frame ≤ pool² per query) — the corpus is touched
    exactly once."""
    e = emb.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    q = emb.where(
        (F.col(id_col) % sample_mod == 0) & F.col(vec_col).isNotNull()
    ).select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    j = e.crossJoin(F.broadcast(q)).where(F.col("nid") != F.col("qid"))
    sim = _dot(F.col("qv"), F.col("v")) / (_norm(F.col("qv")) * _norm(F.col("v")))
    w = Window.partitionBy("qid").orderBy(
        F.desc("sim_e6"), F.asc("nid")
    )
    cand = (
        j.select(
            "qid", "nid", "v",
            F.round(sim * 1e6).cast("bigint").alias("sim_e6"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= pool)
        .cache()
    )
    ca = cand.select("qid", F.col("nid").alias("a"), F.col("v").alias("va"))
    cb = cand.select("qid", F.col("nid").alias("b"), F.col("v").alias("vb"))
    psim = _dot(F.col("va"), F.col("vb")) / (
        _norm(F.col("va")) * _norm(F.col("vb"))
    )
    pairs = (
        ca.join(cb, "qid")
        .where(F.col("a") != F.col("b"))
        .select(
            "qid", "a", "b", F.round(psim * 1e6).cast("bigint").alias("p_e6")
        )
        .cache()
    )
    sel = cand.where(F.col("rank") == 1).select(
        "qid", "nid", F.lit(1).alias("step"), "sim_e6"
    )
    for step in range(2, k + 1):
        mx = (
            pairs.join(
                sel.select("qid", F.col("nid").alias("b")), ["qid", "b"]
            )
            .groupBy("qid", F.col("a").alias("nid"))
            .agg(F.max("p_e6").alias("mx"))
        )
        remaining = cand.join(
            sel.select("qid", "nid"), ["qid", "nid"], "left_anti"
        )
        scored = remaining.join(mx, ["qid", "nid"]).select(
            "qid", "nid", "sim_e6",
            (F.lit(3) * F.col("sim_e6") - F.col("mx")).alias("score4"),
        )
        wpick = Window.partitionBy("qid").orderBy(
            F.desc("score4"), F.asc("nid")
        )
        pick = (
            scored.withColumn("_rn", F.row_number().over(wpick))
            .where(F.col("_rn") == 1)
            .select("qid", "nid", F.lit(step).alias("step"), "sim_e6")
        )
        sel = sel.union(pick)
    return sel.select(
        "qid", "nid", F.col("step").cast("bigint").alias("step"), "sim_e6"
    )


def centroid_confusion(
    emb: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Nearest-centroid confusion matrix: assign every labeled row to
    its closest label centroid (Euclidean) and count (label, pred)
    cells — the label-quality triage view (a hot off-diagonal cell
    names the mislabeled/confusable class PAIR, which silhouette's
    scalar score cannot).

    Argmin determinism is pinned cross-engine: distances are e9-rounded
    bigints and ties break on predicted label asc (a struct/tuple min
    in both engines). Same shapes as silhouette_centroid: one dim-wide
    centroid agg collected to ONE labels-bounded broadcast row, then a
    ROW-LOCAL argmin fold and one labels²-bounded count agg."""
    e = emb.where(
        F.col(vec_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.col(label_col).alias("label"),
        F.col(vec_col).cast("array<double>").alias("x"),
    )
    cents = e.groupBy("label").agg(
        *[F.avg(F.col("x")[j]).alias(f"m{j}") for j in range(dim)],
    ).select(
        "label",
        F.array(*[F.col(f"m{j}") for j in range(dim)]).alias("c"),
    )
    cl = cents.agg(F.collect_list(F.struct("label", "c")).alias("cs"))
    j = e.crossJoin(F.broadcast(cl))
    dists = F.transform(
        F.col("cs"),
        lambda s: F.struct(
            F.round(
                F.sqrt(
                    F.aggregate(
                        F.zip_with(
                            F.col("x"), s["c"], lambda p, q: (p - q) * (p - q)
                        ),
                        F.lit(0.0),
                        lambda acc, z: acc + z,
                    )
                )
                * 1e9
            )
            .cast("bigint")
            .alias("d9"),
            s["label"].alias("pred"),
        ),
    )
    picked = j.select("label", F.array_min(dists)["pred"].alias("pred"))
    return picked.groupBy("label", "pred").agg(
        F.count("*").cast("bigint").alias("n")
    )


def rrf_fuse(
    lists: list[DataFrame],
    rrf_k: int = 60,
    topk: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked retrieval lists — the
    standard hybrid-search combiner (Cormack et al.): each list
    contributes 1/(rrf_k + rank) for the ids it ranked, missing ids
    contribute 0, final order is fused score desc then id asc.

    Every input is (id_col, rank) with rank 1-based. Cross-engine
    exactness: each contribution is one IEEE division of two exact
    integers and the fused score is a FIXED-ARITY expression sum of
    those terms (plus exact 0.0 for absences) — no aggregation-order
    ambiguity anywhere — so rrf_e9 = round(score·1e9) is identical in
    any engine.

    Scale shape: the inputs are top-pool lists (pool ≈ tens), so the
    full-outer fusion join and the final row_number run on
    pool·N-bounded frames — the corpus is only touched by the
    upstream retrievers."""
    if not lists:
        raise ValueError("rrf_fuse: no input lists")
    fused = None
    for i, df in enumerate(lists):
        t = df.select(
            F.col(id_col).alias("_id"),
            F.col("rank").cast("bigint").alias(f"rank_{i}"),
        )
        fused = t if fused is None else fused.join(t, "_id", "full_outer")
    contribs = [
        F.coalesce(
            F.lit(1.0) / (F.lit(rrf_k) + F.col(f"rank_{i}")), F.lit(0.0)
        )
        for i in range(len(lists))
    ]
    score = contribs[0]
    for c in contribs[1:]:
        score = score + c
    n_lists = sum(
        F.col(f"rank_{i}").isNotNull().cast("int") for i in range(len(lists))
    )
    scored = fused.select(
        F.col("_id").alias(id_col),
        *[F.col(f"rank_{i}") for i in range(len(lists))],
        n_lists.cast("bigint").alias("n_lists"),
        F.round(score * 1e9).cast("bigint").alias("rrf_e9"),
    )
    w = Window.orderBy(F.desc("rrf_e9"), F.asc(id_col))
    return (
        scored.withColumn("fused_rank", F.row_number().over(w))
        .where(F.col("fused_rank") <= topk)
    )


def hybrid_rrf(
    docs: DataFrame,
    emb: DataFrame,
    terms: list[str],
    query_vec_id: int,
    pool: int = 20,
    topk: int = 10,
    rrf_k: int = 60,
) -> DataFrame:
    """Hybrid lexical+vector retrieval: BM25 top-pool for the term
    query and brute cosine top-pool for the query vector, fused with
    reciprocal-rank fusion. The query vector's own row is absent from
    the vector list (cosine_topk excludes self) but may still arrive
    via the lexical list — a retrieval-semantics pin, not a bug.

    One row-local BM25 corpus pass + one broadcast-query cosine pass;
    everything after is pool-bounded (see rrf_fuse)."""
    from tokens_ts import textops

    wb = Window.orderBy(F.desc("score_e6"), F.asc("doc_id"))
    bm = (
        textops.bm25_topk(docs, terms, k=pool)
        .withColumn("rank", F.row_number().over(wb))
        .select("doc_id", "rank")
    )
    em = cosine_topk(emb, [query_vec_id], k=pool).select(
        F.col("nid").alias("doc_id"), "rank"
    )
    out = rrf_fuse([bm, em], rrf_k=rrf_k, topk=topk, id_col="doc_id")
    return out.select(
        "doc_id",
        F.col("rank_0").alias("bm_rank"),
        F.col("rank_1").alias("emb_rank"),
        "n_lists",
        "rrf_e9",
        "fused_rank",
    )


def ndcg_topk(
    emb: DataFrame,
    query_ids: list,
    k: int = 5,
    n_planes: int = 3,
    n_tables: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """NDCG@k of the multi-table LSH ANN ranking against the exact
    cosine ground truth — recall@k says WHETHER the true neighbors
    were found; NDCG says whether they landed in the right ORDER
    (position-discounted graded gain, the standard ranking metric).

    Grading: the item at true rank r carries relevance k+1−r
    (top neighbor = k ... k-th = 1); the approximate list earns
    rel/ln(pos+1) at each position it placed a true-top-k item, and
    the sum is normalized by the ideal ln-form DCG, so ndcg ∈ [0, 1]
    (ln vs log2 cancels in the ratio). Missed items contribute 0;
    a query whose candidate set misses everything scores an honest
    0, not NULL.

    Both rankings break ties on (e6-scaled similarity, nid) so the
    ranks themselves are cross-engine exact; the e6-rounded NDCG
    then follows the repo's IEEE-identical-expression-shape rule.
    Shapes: both retrievers are broadcast-query-set scans (zero
    corpus shuffles, see cosine_topk/lsh_topk); the metric join is
    queries×k-bounded."""
    exact = cosine_topk(emb, query_ids, k=k, id_col=id_col, vec_col=vec_col)
    approx = lsh_topk(
        emb, query_ids, k=k, n_planes=n_planes, n_tables=n_tables,
        id_col=id_col, vec_col=vec_col,
    )
    e = exact.select("qid", "nid", F.col("rank").alias("_trank"))
    a = approx.select("qid", "nid", F.col("rank").alias("_arank"))
    j = e.join(a, ["qid", "nid"], "left")
    contrib = F.when(
        F.col("_arank").isNotNull(),
        (F.lit(k + 1) - F.col("_trank"))
        / F.log(F.col("_arank") + F.lit(1.0)),
    ).otherwise(F.lit(0.0))
    idcg = None
    for r in range(1, k + 1):
        term = F.lit(float(k + 1 - r)) / F.log(F.lit(float(r + 1)))
        idcg = term if idcg is None else idcg + term
    return j.groupBy("qid").agg(
        F.count("_arank").cast("bigint").alias("n_hits"),
        F.round(F.sum(contrib) / idcg * 1e6).cast("bigint").alias("ndcg_e6"),
    )


def jl_signs(out_dim: int = 16, dim: int = 64) -> list[list[int]]:
    """Deterministic ±1 Johnson-Lindenstrauss sign matrix: s[j][i] =
    1 − 2·(md5("jl:i:j") first-nibble parity) — content-addressed like
    split_assign's bucket hash, so BOTH engines (and any future
    re-implementation) can rebuild the identical matrix from the
    string rule alone; computed once at plan-build time and inlined
    as literals (control-plane, out_dim×dim ≤ a few thousand)."""
    import hashlib

    return [
        [
            1
            - 2
            * (
                int(
                    hashlib.md5(f"jl:{i}:{j}".encode()).hexdigest()[:4], 16
                )
                % 2
            )
            for i in range(1, dim + 1)
        ]
        for j in range(1, out_dim + 1)
    ]


def jl_project(
    emb: DataFrame,
    out_dim: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Johnson-Lindenstrauss random projection: y_j = s_j · x over the
    deterministic ±1 sign matrix — the 4× dimensionality cut that
    preserves pairwise distances in expectation (E‖y‖² = k·‖x‖² for
    ±1 rows), the standard pre-index shrink for ANN at corpus scale.

    Scale shape: the sign rows are plan-time literals folded into
    row-local dot products — zero shuffles, zero Python, whole-stage
    codegen; composing with the LSH/IVF retrievers leaves their
    zero-corpus-shuffle plans untouched (they only see a shorter
    vector)."""
    v = F.col(vec_col).cast("array<double>")
    rows = [
        F.array(*[F.lit(float(s)) for s in srow])
        for srow in jl_signs(out_dim, dim)
    ]
    return emb.select(
        F.col(id_col).alias("nid"),
        v.alias("v"),
        F.array(*[_dot(r, v) for r in rows]).alias("y"),
    )


def jl_distortion(
    emb: DataFrame,
    out_dim: int = 16,
    dim: int = 64,
    stride: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Measured JL distance distortion on a deterministic pair sample:
    for each pair (id, id+stride), ratio = ‖y_a−y_b‖² / (k·‖x_a−x_b‖²)
    — 1.0 means the projection preserved that distance exactly; the JL
    bound says ratios concentrate around 1 with spread ~√(2/k). The
    audit that must accompany any projected index (recall measurements
    alone can't say whether the GEOMETRY survived).

    Exactness pins: both squared distances are e6-rounded bigints and
    the ratio is derived FROM those integers (round(1e4·d2y_e6 /
    (k·d2x_e6))) — the quotient is integer-input IEEE-identical
    cross-engine; identical vectors (d2x_e6 = 0) get a null ratio.

    Scale shape: one projection scan + ONE id-offset equi-join — one
    pair per vector, never a cross join; output is corpus-bounded."""
    p = jl_project(emb, out_dim, dim, id_col, vec_col)
    a = p.select(
        F.col("nid").alias("aid"), F.col("v").alias("va"), F.col("y").alias("ya")
    )
    b = p.select(
        (F.col("nid") - stride).alias("aid"),
        F.col("nid").alias("bid"),
        F.col("v").alias("vb"),
        F.col("y").alias("yb"),
    )
    d2 = lambda u, w: F.aggregate(  # noqa: E731
        F.zip_with(u, w, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    j = a.join(b, "aid")
    d2x = F.round(d2(F.col("va"), F.col("vb")) * 1e6).cast("bigint")
    d2y = F.round(d2(F.col("ya"), F.col("yb")) * 1e6).cast("bigint")
    out = j.select(
        "aid",
        "bid",
        d2x.alias("d2x_e6"),
        d2y.alias("d2y_e6"),
    )
    return out.withColumn(
        "ratio_e4",
        F.when(
            F.col("d2x_e6") > 0,
            F.round(
                F.lit(1e4) * F.col("d2y_e6") / (F.lit(out_dim) * F.col("d2x_e6"))
            ).cast("bigint"),
        ),
    )


def ivf_balance(
    emb: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF posting-list balance monitor: size, corpus share, and load
    factor (share × n_centroids; 1.0 = perfectly balanced) per cell —
    the skew audit for the partitioned index. A cell with load ≫ 1 is
    the ANN analogue of a hot aggregation key: probes hitting it scan
    that whole list, so tail latency tracks max load, and the fix
    (re-train centroids / split the cell) is the same rebalancing
    decision the salted-rollup path makes for aggregates.

    Scale shape: the assignment is the existing broadcast-centroid
    corpus scan (zero corpus shuffles); sizes are one map-side-combined
    count agg to a centroids-bounded frame; shares use a window over
    that C-row frame (control-plane sized). min/max member ids ride
    along for a cheap audit handle into each cell."""
    a = ivf_assign(emb, n_centroids, id_col, vec_col, centroids=centroids)
    sizes = a.groupBy("cid").agg(
        F.count("*").cast("bigint").alias("n_vecs"),
        F.min("nid").cast("bigint").alias("min_id"),
        F.max("nid").cast("bigint").alias("max_id"),
    )
    w = Window.partitionBy()
    total = F.sum("n_vecs").over(w)
    return sizes.select(
        F.col("cid").cast("bigint").alias("cid"),
        "n_vecs",
        F.round(F.col("n_vecs") * 1e6 / total).cast("bigint").alias("share_e6"),
        F.round(F.col("n_vecs") * F.lit(float(n_centroids)) * 1e6 / total)
        .cast("bigint")
        .alias("load_e6"),
        "min_id",
        "max_id",
    )


def hard_negatives(
    emb: DataFrame,
    sample_mod: int = 37,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining over labeled embeddings, on the same
    deterministic query sample as knn_outlier (id % sample_mod == 0):
    for each query, the most-similar OTHER-label vector (the hard
    negative a contrastive/retrieval trainer should pair it with) and
    the most-similar SAME-label vector (its hardest positive), plus
    margin = pos_sim − neg_sim. margin ≤ 0 flags queries whose nearest
    neighbor crosses the label boundary — the rows metric learning
    gets wrong today and the first rows to audit for mislabels.

    Determinism: candidates rank by (e6-rounded sim desc, id asc) —
    the cosine_topk rule — expressed as one max_by struct comparator
    (sim_e6, −id) per side, so both engines pick identical winners at
    equal similarity. Queries whose label is unique in the corpus get
    null positive columns and a null margin (pinned).

    Shapes: ONE corpus scan × a broadcast query set; the per-side
    argmax is a map-side-combined groupBy(qid) — partial maxima per
    partition, |Q|-bounded shuffle rows, the corpus is never
    self-joined or windowed."""
    e = emb.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).cast("array<double>").alias("v"),
        F.col(label_col).cast("bigint").alias("nlabel"),
    )
    q = emb.where(
        (F.col(id_col) % sample_mod == 0) & F.col(vec_col).isNotNull()
    ).select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        F.col(label_col).cast("bigint").alias("qlabel"),
    )
    j = e.crossJoin(F.broadcast(q)).where(F.col("nid") != F.col("qid"))
    sim = _dot(F.col("qv"), F.col("v")) / (_norm(F.col("qv")) * _norm(F.col("v")))
    scored = j.select(
        "qid",
        "qlabel",
        "nid",
        "nlabel",
        F.round(sim * 1e6).cast("bigint").alias("sim_e6"),
    )

    def best(side_cond, tag):
        pick = F.when(
            side_cond,
            F.struct(
                F.col("sim_e6").alias("s"), (-F.col("nid")).alias("negid")
            ),
        )
        val = F.when(side_cond, F.struct(F.col("nid"), F.col("sim_e6")))
        return F.max_by(val, pick).alias(tag)

    agg = scored.groupBy("qid", "qlabel").agg(
        best(F.col("nlabel") == F.col("qlabel"), "_pos"),
        best(F.col("nlabel") != F.col("qlabel"), "_neg"),
    )
    return agg.select(
        "qid",
        F.col("qlabel").alias("q_label"),
        F.col("_pos.nid").alias("pos_id"),
        F.col("_pos.sim_e6").alias("pos_sim_e6"),
        F.col("_neg.nid").alias("neg_id"),
        F.col("_neg.sim_e6").alias("neg_sim_e6"),
        (F.col("_pos.sim_e6") - F.col("_neg.sim_e6")).alias("margin_e6"),
    )


def centroid_drift(
    emb: DataFrame,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label centroid drift between the two interleaved id-parity
    cohorts (even ids = batch A, odd = batch B): cosine between the
    cohort centroids — the embedding-space A/B null test (same
    distribution ⇒ cos ≈ 1; an embedder change, ingestion bug, or
    label shift shows up as a label whose cohorts point apart). Parity
    cohorts make it a NULL test on static data while being exactly the
    re-ingest/batch comparison shape in production.

    Exactness pin: components are e6-quantized to bigints BEFORE
    summing, so the per-cohort component sums are order-independent
    exact integers; the count cancels in the cosine, so cos(centroids)
    = cos(sum-vectors) is computed from bigint dot/norms through one
    identical IEEE tree (sums ~1e8/component, dots ≤ ~64·1e16 — inside
    int64). Labels present in only one cohort emit null cos (pinned).

    Scale shape: ONE corpus scan → map-side-combined (label, parity)
    agg of 64 integer sums (labels×2 rows) → labels-bounded self-join.
    No broadcast of the corpus, no windows."""
    e = emb.where(
        F.col(vec_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        (F.col(id_col) % 2).alias("half"),
        F.col(label_col).cast("bigint").alias("label"),
        F.col(vec_col).cast("array<double>").alias("x"),
    )
    sums = e.groupBy("label", "half").agg(
        F.count("*").cast("bigint").alias("n"),
        *[
            F.sum(F.round(F.col("x")[j] * 1e6).cast("bigint")).alias(f"s{j}")
            for j in range(dim)
        ],
    )
    v = F.array(*[F.col(f"s{j}") for j in range(dim)])
    a = sums.where(F.col("half") == 0).select(
        "label", F.col("n").alias("n_even"), v.alias("va")
    )
    b = sums.where(F.col("half") == 1).select(
        "label", F.col("n").alias("n_odd"), v.alias("vb")
    )
    j = a.join(b, "label", "full")
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, t: acc + t,
    )
    q = lambda c: F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x * x),
        F.lit(0).cast("bigint"),
        lambda acc, t: acc + t,
    )
    cos = F.lit(1e6) * dot / (
        F.sqrt(q(F.col("va")).cast("double"))
        * F.sqrt(q(F.col("vb")).cast("double"))
    )
    cos_e6 = F.round(cos).cast("bigint")
    return j.select(
        "label",
        F.coalesce("n_even", F.lit(0).cast("bigint")).alias("n_even"),
        F.coalesce("n_odd", F.lit(0).cast("bigint")).alias("n_odd"),
        cos_e6.alias("cos_e6"),
        (F.lit(1_000_000) - cos_e6).cast("bigint").alias("drift_e6"),
    )


def pq_error(
    emb: DataFrame,
    n_sub: int = 8,
    n_codes: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization audit: split each vector into n_sub
    contiguous subvectors, assign each to its nearest codeword from a
    deterministic per-subspace codebook (the first n_codes vectors'
    subvectors, the same first-N convention as ivf_assign — so the
    oracle can rebuild the whole index), and report the code string
    plus the total reconstruction error. PQ is the memory side of ANN
    at corpus scale (64 dims × 4 B → n_sub bytes per vector); this
    operator is the audit that must accompany it — codes pin the
    assignment cross-engine, err_e9 quantifies what the compression
    destroyed (rising err over reingests = the codebook went stale).

    Pins: per-subspace squared L2 distances are e9-rounded bigints;
    the argmin breaks ties to the LOWEST code id on that integer;
    err_e9 = Σ_s of the winning integer distances (exact sum of
    bigints).

    Scale shape: the codebook is ONE collected broadcast row
    (n_sub·n_codes structs, control-plane sized); assignment is a
    row-local materialize-then-fold argmin per subspace inside the
    single corpus scan — zero corpus shuffles, no joins."""
    e = emb.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    w = dim // n_sub
    cb = (
        e.where(F.col("nid") < n_codes)
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(s).alias("s"),
                            F.col("nid").alias("cid"),
                            F.slice("v", s * w + 1, w).alias("cw"),
                        )
                        for s in range(n_sub)
                    ]
                )
            ).alias("c")
        )
        .agg(F.collect_list("c").alias("_cb"))
    )
    j = e.crossJoin(F.broadcast(cb))

    def best(s):
        sub = F.slice("v", s * w + 1, w)
        cands = F.filter(F.col("_cb"), lambda c: c["s"] == s)
        d9 = lambda c: F.round(  # noqa: E731
            F.aggregate(
                F.zip_with(sub, c["cw"], lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, t: acc + t,
            )
            * 1e9
        ).cast("bigint")
        scored = F.transform(
            cands,
            lambda c: F.struct(
                d9(c).alias("d"), c["cid"].cast("bigint").alias("cid")
            ),
        )
        return F.aggregate(
            scored,
            F.struct(
                F.lit((1 << 62)).cast("bigint").alias("d"),
                F.lit(-1).cast("bigint").alias("cid"),
            ),
            lambda acc, x: F.when(
                (x["d"] < acc["d"])
                | ((x["d"] == acc["d"]) & (x["cid"] < acc["cid"])),
                x,
            ).otherwise(acc),
        )

    bests = [best(s) for s in range(n_sub)]
    codes = F.concat_ws(
        ",", *[b["cid"].cast("string") for b in bests]
    )
    err = bests[0]["d"]
    for b in bests[1:]:
        err = err + b["d"]
    return j.select(
        "nid", codes.alias("codes"), err.cast("bigint").alias("err_e9")
    )


def ivf_recall_curve(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 3,
    n_centroids: int = 8,
    nprobes: tuple = (1, 2, 3),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Measured recall@k vs nprobe for the IVF index — the tuning
    curve that turns 'how many cells should a probe scan' from a
    guess into a table: recall rises with nprobe while scanned-list
    cost rises linearly, and the knee is the operating point. recall
    = Σ hits / Σ exact-neighbors over the query set, both exact
    integers (queries with fewer than k neighbors shrink the
    denominator honestly, the emb_ann_recall convention).

    Scale shape: ground truth is ONE broadcast-query exact scan; each
    curve point reuses the zero-corpus-shuffle ivf_topk plan. The
    curve is an audit run on a bounded query sample — |nprobes| scans
    of the corpus by construction, which is the audit's price, not
    the serving path's."""
    exact = cosine_topk(emb, query_ids, k=k, id_col=id_col, vec_col=vec_col)
    tot = exact.agg(F.count("*").cast("bigint").alias("_tot"))
    out = None
    for np_ in nprobes:
        approx = ivf_topk(
            emb,
            query_ids,
            k=k,
            n_centroids=n_centroids,
            nprobe=np_,
            id_col=id_col,
            vec_col=vec_col,
        )
        hits = (
            exact.join(approx, ["qid", "nid"], "left_semi")
            .agg(F.count("*").cast("bigint").alias("hits"))
            .select(F.lit(int(np_)).cast("bigint").alias("nprobe"), "hits")
        )
        out = hits if out is None else out.unionByName(hits)
    return out.crossJoin(F.broadcast(tot)).select(
        "nprobe",
        "hits",
        F.col("_tot").alias("n_exact"),
        F.round(F.col("hits").cast("double") / F.col("_tot") * 1e6)
        .cast("bigint")
        .alias("recall_e6"),
    )


def davies_bouldin(
    emb: DataFrame,
    dim: int = 64,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Cluster-quality audit per label: within-cluster scatter, the
    worst-separated neighbor, and the Davies-Bouldin ratio
    R_i = max_{j≠i} (s²_i + s²_j) / d²(c_i, c_j) — the per-cluster
    rows whose mean is the DB index (lower = tighter/better
    separated). The confusion matrix says which labels COLLIDE under
    nearest-centroid; this says which are GEOMETRICALLY entangled
    even before any classifier.

    Variance identity keeps everything one-pass: s²_i = Q_i/n_i −
    Σ_d (S_d/n_i)² with Q (Σ|x|² on the e6 grid) and the 64 component
    sums S_d exact bigints (per-row |x|²_e6 ≤ ~2e13 at |comp| ≤ 0.53
    → int64-safe past 2e5 rows/label); the finishing quotients and
    the 64-term d²/scatter folds run in doubles through IDENTICAL
    left-to-right expression trees in both engines. The neighbor
    comparator uses r9 = round(1e9·ratio) so selection AND the
    emitted r_e6 = round(r9/1e3) come from the same integer — no
    double-tie ambiguity; ties pin to the smallest neighbor label.
    Pairs with d² = 0 (duplicate centroids) are skipped, pinned; a
    label with no valid neighbor emits null worst/ratio. s2_e6 is
    reported in unit² scale (grid² / 1e12 → ×1e6).

    Scale shape: ONE corpus scan → map-side-combined per-label agg of
    (n, Q, 64 sums) → labels²-bounded self-join. No corpus broadcast,
    no window over data rows."""
    q6 = lambda x: F.round(x * 1e6).cast("bigint")  # noqa: E731
    e = emb.where(
        F.col(vec_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.col(label_col).cast("bigint").alias("label"),
        F.col(vec_col).cast("array<double>").alias("x"),
    )
    rowq = F.aggregate(
        F.transform(F.col("x"), lambda c: q6(c) * q6(c)),
        F.lit(0).cast("bigint"),
        lambda a, t: a + t,
    )
    sums = e.groupBy("label").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(rowq).cast("bigint").alias("q"),
        *[F.sum(q6(F.col("x")[j])).alias(f"s{j}") for j in range(dim)],
    )
    v = F.array(*[F.col(f"s{j}") for j in range(dim)])
    nd = F.col("n").cast("double")
    cent2 = F.aggregate(
        v,
        F.lit(0.0),
        lambda a, s: a + (s.cast("double") / nd) * (s.cast("double") / nd),
    )
    lab = sums.select(
        "label",
        "n",
        (F.col("q").cast("double") / nd - cent2).alias("s2"),
        v.alias("v"),
    )
    a = lab.select(
        F.col("label").alias("li"), F.col("n").alias("ni"),
        F.col("s2").alias("s2i"), F.col("v").alias("vi"),
    )
    b = lab.select(
        F.col("label").alias("lj"), F.col("n").alias("nj"),
        F.col("s2").alias("s2j"), F.col("v").alias("vj"),
    )
    p = a.join(F.broadcast(b), F.col("li") != F.col("lj"))
    d2 = F.aggregate(
        F.zip_with(
            "vi",
            "vj",
            lambda x, y: x.cast("double") / F.col("ni").cast("double")
            - y.cast("double") / F.col("nj").cast("double"),
        ),
        F.lit(0.0),
        lambda acc, t: acc + t * t,
    )
    p = p.withColumn("_d2", d2).where(F.col("_d2") > 0)
    r9 = F.round((F.col("s2i") + F.col("s2j")) / F.col("_d2") * 1e9).cast(
        "bigint"
    )
    best = p.groupBy(F.col("li").alias("label")).agg(
        F.max(
            F.struct(
                r9.alias("r9"), (-F.col("lj")).alias("negj"), F.col("lj")
            )
        ).alias("w")
    )
    return (
        lab.join(best, "label", "left")
        .select(
            "label",
            "n",
            F.round(F.col("s2") / 1e6).cast("bigint").alias("s2_e6"),
            F.col("w.lj").alias("worst_label"),
            F.round(F.col("w.r9").cast("double") / 1e3)
            .cast("bigint")
            .alias("r_e6"),
        )
    )


def calinski_harabasz(
    emb: DataFrame,
    dim: int = 64,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Calinski-Harabasz (variance-ratio) rows per label: within-SSE
    w_i = Σ_{x∈i} |x − c_i|², between-SSE contribution
    b_i = n_i·|c_i − g|² (g = the GLOBAL centroid), and on every row
    the shared index CH = (B/(k−1)) / (W/(N−k)) — higher = clusters
    tight AND far apart. Davies-Bouldin asks "who is my worst
    neighbor"; CH is the single separation-vs-compactness score an
    embedding-quality dashboard tracks over training runs.

    Same exactness scheme as davies_bouldin: per-label (n, Q, 64
    component sums) are exact e6-grid bigints, the GLOBAL sums are
    exact bigint totals of those, and every finishing quotient/fold
    runs in doubles through identical left-to-right trees in both
    engines (w_i via the one-pass identity n_i·s²_i = Q_i −
    n_i·Σ_d c²_id). B and W sum #labels doubles — the only
    order-dependent step, ~1e-9 of the e6 rounding step at this
    scale. k < 2 or W ≤ 0 or N ≤ k ⇒ ch null, rows still emitted.

    Scale shape: ONE corpus scan → map-side-combined per-label agg →
    a labels-bounded frame; the global row is a broadcast cross join.
    No corpus broadcast, no window over data rows."""
    q6 = lambda x: F.round(x * 1e6).cast("bigint")  # noqa: E731
    e = emb.where(
        F.col(vec_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.col(label_col).cast("bigint").alias("label"),
        F.col(vec_col).cast("array<double>").alias("x"),
    )
    rowq = F.aggregate(
        F.transform(F.col("x"), lambda c: q6(c) * q6(c)),
        F.lit(0).cast("bigint"),
        lambda a, t: a + t,
    )
    sums = e.groupBy("label").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(rowq).cast("bigint").alias("q"),
        *[F.sum(q6(F.col("x")[j])).alias(f"s{j}") for j in range(dim)],
    )
    nd = F.col("n").cast("double")
    v = F.array(*[F.col(f"s{j}") for j in range(dim)])
    cent2 = F.aggregate(
        v,
        F.lit(0.0),
        lambda a, s: a + (s.cast("double") / nd) * (s.cast("double") / nd),
    )
    # w_i = Q_i − n_i·Σ_d c²_id  (grid² units), exact-int inputs
    lab = sums.select(
        "label",
        "n",
        (F.col("q").cast("double") - nd * cent2).alias("w"),
        v.alias("v"),
    )
    glob = sums.groupBy().agg(
        F.sum("n").alias("nn"),
        F.count("*").alias("k"),
        *[F.sum(f"s{j}").alias(f"g{j}") for j in range(dim)],
    )
    gv = F.array(*[F.col(f"g{j}") for j in range(dim)])
    p = lab.join(F.broadcast(glob.select("nn", "k", gv.alias("gv"))))
    nnd = F.col("nn").cast("double")
    d2 = F.aggregate(
        F.zip_with(
            "v",
            "gv",
            lambda s, g: s.cast("double") / nd - g.cast("double") / nnd,
        ),
        F.lit(0.0),
        lambda a, t: a + t * t,
    )
    p = p.select(
        "label", "n", "nn", "k", "w", (nd * d2).alias("b")
    )
    tot = p.groupBy("nn", "k").agg(
        F.sum("w").alias("ww"), F.sum("b").alias("bb")
    )
    ch = F.when(
        (F.col("k") >= 2) & (F.col("nn") > F.col("k")) & (F.col("ww") > 0),
        (F.col("bb") / (F.col("k").cast("double") - 1.0))
        / (F.col("ww") / (F.col("nn").cast("double") - F.col("k").cast("double"))),
    )
    return (
        p.join(F.broadcast(tot.select("nn", "k", "ww", "bb")), ["nn", "k"])
        .select(
            "label",
            "n",
            F.round(F.col("w") / 1e6).cast("bigint").alias("w_e6"),
            F.round(F.col("b") / 1e6).cast("bigint").alias("b_e6"),
            F.round(ch * 1e6).cast("bigint").alias("ch_e6"),
        )
    )


def effective_rank(
    emb: DataFrame,
    dims: int = 16,
    vec_col: str = "embedding",
) -> DataFrame:
    """Participation-ratio effective rank of the embedding covariance
    over the first `dims` components: erank = tr(C)² / ‖C‖²_F =
    (Σλ)²/Σλ² — 1 when all variance collapses onto one direction,
    `dims` when perfectly isotropic. THE representation-collapse
    dial for contrastive/embedding training, and it needs NO
    eigendecomposition: tr(C) is the variance sum and ‖C‖²_F is the
    sum of squared covariances, both plain aggregates.

    One corpus scan → (1 + dims + dims·(dims+1)/2) exact e6-grid
    bigint sums (component sums + upper-triangle cross-products) →
    one finishing row; every covariance and both folds are the same
    fixed-order IEEE tree in both engines (d outer, d' ≥ d inner;
    off-diagonal squares counted twice). fro² ≤ 0 ⇒ null erank.
    Output is a single global row: (n, dims, trace_e6 in unit²,
    erank_e6)."""
    q6 = lambda x: F.round(x * 1e6).cast("bigint")  # noqa: E731
    e = emb.where(F.col(vec_col).isNotNull()).select(
        *[q6(F.col(vec_col)[d].cast("double")).alias(f"x{d}")
          for d in range(dims)]
    )
    aggs = [F.count("*").cast("bigint").alias("n")]
    aggs += [F.sum(f"x{d}").alias(f"s{d}") for d in range(dims)]
    for d in range(dims):
        for d2 in range(d, dims):
            aggs.append(
                F.sum(F.col(f"x{d}") * F.col(f"x{d2}")).alias(f"p{d}_{d2}")
            )
    a = e.groupBy().agg(*aggs)
    nd = F.col("n").cast("double")

    def cov(d, d2):
        return F.col(f"p{d}_{d2}").cast("double") / nd - (
            F.col(f"s{d}").cast("double") / nd
        ) * (F.col(f"s{d2}").cast("double") / nd)

    tr = cov(0, 0)
    for d in range(1, dims):
        tr = tr + cov(d, d)
    fro = cov(0, 0) * cov(0, 0)
    for d in range(dims):
        for d2 in range(d, dims):
            if d == 0 and d2 == 0:
                continue
            t = cov(d, d2) * cov(d, d2)
            if d2 > d:
                t = t * 2.0
            fro = fro + t
    erank = F.when(fro > 0, tr * tr / fro)
    return a.select(
        "n",
        F.lit(dims).cast("bigint").alias("dims"),
        F.round(tr / 1e6).cast("bigint").alias("trace_e6"),
        F.round(erank * 1e6).cast("bigint").alias("erank_e6"),
    )


def semdedup(
    emb: DataFrame,
    n_centroids: int = 16,
    threshold_e6: int = 400_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic dedup scoped to IVF
    clusters — the quadratic pair search runs ONLY within a cluster
    (the paper's trick that makes embedding dedup tractable at
    corpus scale: k clusters cut the pair count by ~k). For every
    within-cluster pair with cosine ≥ τ, the member SEMANTICALLY
    CLOSER TO THE CENTROID is condemned (the paper's keep-low-
    centroid-similarity rule: survivors are the diverse extremes,
    not the cluster's most typical copy); tie on the e6 cosine →
    the larger id is condemned. A vector is removed iff ANY pair
    condemns it. emb_cosine_dups reports LSH-candidate pairs; this
    is the per-vector keep/remove VERDICT with cluster context.

    Exactness: assignment reuses ivf_assign's e6-rounded argmax;
    pair and centroid cosines are the house e6 rounding of identical
    IEEE folds, so condemnation decisions are integer comparisons.

    Shapes at 100 TB: assignment is a broadcast-centroids corpus
    scan (zero corpus shuffle); ONE shuffle on cid co-locates each
    cluster; the pair join is cluster-bounded (quadratic only within
    a cell — choose k so cells fit); verdicts aggregate back on the
    same cid partitioning."""
    a = ivf_assign(emb, n_centroids=n_centroids, id_col=id_col,
                   vec_col=vec_col)
    cents = a.where(F.col("nid") < n_centroids).select(
        F.col("nid").alias("ccid"), F.col("v").alias("cv")
    )
    c2c = a.join(
        F.broadcast(cents), a["cid"] == cents["ccid"]
    ).select(
        "nid", "cid", "v",
        F.round(
            _dot(F.col("v"), F.col("cv"))
            / (_norm(F.col("v")) * _norm(F.col("cv")))
            * 1e6
        )
        .cast("bigint")
        .alias("c2c_e6"),
    )
    l = c2c.select(
        "cid", F.col("nid").alias("_na"), F.col("v").alias("_va"),
        F.col("c2c_e6").alias("_ca"),
    )
    r = c2c.select(
        "cid", F.col("nid").alias("_nb"), F.col("v").alias("_vb"),
        F.col("c2c_e6").alias("_cb"),
    )
    sim = F.round(
        _dot(F.col("_va"), F.col("_vb"))
        / (_norm(F.col("_va")) * _norm(F.col("_vb")))
        * 1e6
    ).cast("bigint")
    pairs = (
        l.join(r, "cid")
        .where(F.col("_na") < F.col("_nb"))
        .select(
            "cid", "_na", "_nb", "_ca", "_cb",
            sim.alias("_sim"),
        )
        .where(F.col("_sim") >= threshold_e6)
    )
    # condemned member: closer to centroid (higher c2c), tie -> larger id
    condemned = pairs.select(
        "cid",
        F.when(
            (F.col("_ca") > F.col("_cb"))
            | ((F.col("_ca") == F.col("_cb")) & (F.col("_na") > F.col("_nb"))),
            F.col("_na"),
        )
        .otherwise(F.col("_nb"))
        .alias("nid"),
    )
    partners = (
        pairs.select("cid", F.col("_na").alias("nid"))
        .unionAll(pairs.select("cid", F.col("_nb").alias("nid")))
        .groupBy("nid")
        .agg(F.count("*").cast("bigint").alias("n_partners"))
    )
    rem = condemned.groupBy("nid").agg(
        F.count("*").cast("bigint").alias("_nc")
    )
    return (
        c2c.join(partners, "nid", "left")
        .join(rem, "nid", "left")
        .select(
            F.col("nid").alias(id_col),
            "cid",
            "c2c_e6",
            F.coalesce("n_partners", F.lit(0))
            .cast("bigint")
            .alias("n_partners"),
            (F.coalesce("_nc", F.lit(0)) > 0).alias("removed"),
        )
    )


def matryoshka_fidelity(
    emb: DataFrame,
    dims: tuple = (8, 16, 32, 64),
    stride: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka (MRL) truncation audit: how much cosine similarity
    survives when vectors are cut to their first d dimensions?

    MRL-trained embeddings promise that a prefix slice is a usable
    cheaper vector (store 8 floats instead of 64 → 8× smaller index);
    before an index adopts a truncation dim, that promise must be
    MEASURED on the actual corpus. For each deterministic pair
    (id, id+stride) and each candidate d, this compares the truncated
    cosine against the full-dim cosine and reports per d: pair count,
    summed + max absolute cosine error, and how often the truncated
    cosine keeps the full cosine's sign (the cheapest sanity bar — a
    slice that flips similar/dissimilar verdicts is unusable).

    Exactness pins (the jl_distortion discipline): dot and both
    squared norms are e6-rounded bigints, the cosine is derived FROM
    those integers (round(1e6·dot / sqrt(na·nb)) — integer inputs make
    the quotient IEEE-identical cross-engine), and every error is an
    integer difference of two such cosines, so the per-d aggregates
    are integer-exact. Zero-norm prefixes (an all-zero slice) yield a
    null cosine and drop out of that d's pair count.

    Scale shape: one id-offset equi-join builds the pair sample (one
    pair per vector, never a cross join), the per-d work is a row-local
    explode over |dims| literals, and the output is |dims| rows — the
    only shuffle is the final |dims|-group aggregate."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = emb.select(F.col(id_col).alias("nid"), v.alias("v"))
    a = base.select(F.col("nid").alias("aid"), F.col("v").alias("va"))
    b = base.select((F.col("nid") - stride).alias("aid"), F.col("v").alias("vb"))
    pairs = a.join(b, "aid")

    def dot(u, w):
        return F.aggregate(
            F.zip_with(u, w, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )

    def cos_e6(u, w):
        d = F.round(dot(u, w) * 1e6).cast("bigint")
        na = F.round(dot(u, u) * 1e6).cast("bigint")
        nb = F.round(dot(w, w) * 1e6).cast("bigint")
        return F.when(
            (na > 0) & (nb > 0),
            F.round(
                F.lit(1e6) * d / F.sqrt(na.cast("double") * nb.cast("double"))
            ).cast("bigint"),
        )

    ex = pairs.select(
        "aid",
        cos_e6(F.col("va"), F.col("vb")).alias("cos_full"),
        F.explode(F.array(*[F.lit(d) for d in dims])).alias("dim"),
        "va",
        "vb",
    )
    cd = cos_e6(F.slice("va", 1, F.col("dim")), F.slice("vb", 1, F.col("dim")))
    scored = ex.select(
        "dim",
        "cos_full",
        cd.alias("cos_d"),
    )
    both = F.col("cos_d").isNotNull() & F.col("cos_full").isNotNull()
    err = F.when(both, F.abs(F.col("cos_d") - F.col("cos_full")))
    agree = both & (
        (F.col("cos_d") >= 0).eqNullSafe(F.col("cos_full") >= 0)
    )
    return scored.groupBy(F.col("dim").cast("bigint").alias("dim")).agg(
        F.count(F.when(both, 1)).cast("bigint").alias("n_pairs"),
        F.sum(err).cast("bigint").alias("sum_abs_err_e6"),
        F.max(err).cast("bigint").alias("max_abs_err_e6"),
        F.count(F.when(agree, 1)).cast("bigint").alias("n_sign_agree"),
    )


def isotropy(
    emb: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Per-label embedding ISOTROPY: the average pairwise cosine among
    all n·(n−1) ordered member pairs, plus the mean resultant length
    R̄ = |Σx̂|/n — without computing a single pair. A collapsed
    representation (all vectors pointing one way) reads avg-cos → 1,
    R̄ → 1; a healthy isotropic cloud reads ≈ 0. The third
    representation-quality dial next to emb_effective_rank (spectrum
    width) and label_cohesion (centroid pull): cohesion asks "do
    members agree with their centroid", this asks "do members agree
    with EACH OTHER", which sees anisotropy even when the centroid
    norm is small.

    The closed form that kills the quadratic pair join: for unit
    vectors, Σ_{i≠j} cos(i,j) = |Σx̂|² − Σ|x̂|². Components are
    normalized row-locally (sqrt and divide are IEEE-exact, identical
    both engines) and quantized to the e3 integer grid, so the per-dim
    sums S_d, the resultant square ΣS_d², and the per-row norm sum are
    ALL exact bigints — avg pairwise cosine lands at the e6 scale as
    one exact-rational division. Zero-norm vectors are excluded
    (cosine undefined — the label_cohesion pin); singleton labels emit
    an honest null avg-cos with R̄ still defined. Bound (r6 advice
    fix of an inconsistent docstring): |S_d| ≤ n·1e3, so ΣS_d² over
    64 dims stays inside int64 while n·1e3 < 2^28.5 ≈ 3.8e8, i.e.
    n ≲ 3.8e5 members/label; beyond that compute ssum in
    decimal(38,0) before relying on exactness.

    Scale shape: ONE map-side-combined agg (labels × (dim+2) exact
    sums) off a row-local projection — zero joins, zero pair frames,
    the cheapest possible plan for a quantity usually quoted as
    O(n²)."""
    e = emb.where(
        F.col(vec_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.col(label_col).alias("label"),
        F.col(vec_col).cast("array<double>").alias("x"),
    )
    nrm = F.sqrt(
        F.aggregate(
            F.transform(F.col("x"), lambda v: v * v),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )
    )
    q = e.withColumn("_nm", nrm).where(F.col("_nm") > 0).select(
        "label",
        F.transform(
            F.col("x"),
            lambda v: F.round(v / F.col("_nm") * 1000).cast("bigint"),
        ).alias("q"),
    )
    qq = F.aggregate(
        F.transform(F.col("q"), lambda c: c * c),
        F.lit(0).cast("bigint"),
        lambda acc, z: acc + z,
    )
    g = q.groupBy("label").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(qq).alias("_qs"),
        *[F.sum(F.col("q")[j]).alias(f"_s{j}") for j in range(dim)],
    )
    ssum = None
    for j in range(dim):
        t = F.col(f"_s{j}") * F.col(f"_s{j}")
        ssum = t if ssum is None else ssum + t
    n = F.col("n")
    return g.select(
        "label",
        "n",
        F.when(
            n >= 2,
            F.round(
                (ssum - F.col("_qs")).cast("double")
                / (n * (n - 1)).cast("double")
            ).cast("bigint"),
        ).alias("avg_pair_cos_e6"),
        F.round(
            F.sqrt(ssum.cast("double")) / n.cast("double") * F.lit(1000.0)
        ).cast("bigint").alias("mean_resultant_e6"),
    )


def hubness(
    emb: DataFrame,
    k: int = 5,
    q_mod: int = 37,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """k-NN in-degree histogram — the HUBNESS diagnostic. In high
    dimensions a few vectors become "hubs" that appear in everyone's
    neighbor list while most vectors are never retrieved at all; a
    heavy right tail here degrades every downstream kNN consumer
    (semdedup verdicts, hard-negative mining, ANN recall) and is
    invisible to the pairwise dials (isotropy, cohesion) because it is
    a property of the RANKING, not the geometry. Rows: in_deg →
    n_vectors, including the in_deg = 0 row (the never-retrieved mass
    — the other half of the pathology).

    Queries are the deterministic vec_id ≡ 0 (mod q_mod) sample;
    neighbor ranking reuses the cosine_topk contract exactly (e6
    cosine, id tie-break), so the histogram is exact cross-engine. At
    corpus scale, swap the modulus for a fixed-size query list — the
    plan shape (broadcast query set, one corpus scan, no corpus
    shuffle; then a neighbors-bounded degree agg) is unchanged."""
    e = emb.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    q = emb.where(F.pmod(F.col(id_col), F.lit(q_mod)) == 0).select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    j = e.crossJoin(F.broadcast(q)).where(F.col("nid") != F.col("qid"))
    sim = _dot(F.col("qv"), F.col("v")) / (_norm(F.col("qv")) * _norm(F.col("v")))
    scored = j.select(
        "qid", "nid", F.round(sim * 1e6).cast("bigint").alias("sim_e6")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim_e6"), F.asc("nid"))
    top = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
    deg = top.groupBy("nid").agg(F.count("*").cast("bigint").alias("in_deg"))
    hist = deg.groupBy("in_deg").agg(
        F.count("*").cast("bigint").alias("n_vectors")
    )
    total = emb.select(
        F.count("*").cast("bigint").alias("_t")
    )
    retrieved = deg.select(F.count("*").cast("bigint").alias("_r"))
    zero = (
        total.crossJoin(retrieved)
        .select(
            F.lit(0).cast("bigint").alias("in_deg"),
            (F.col("_t") - F.col("_r")).alias("n_vectors"),
        )
        .where(F.col("n_vectors") > 0)
    )
    return hist.unionByName(zero)


def knn_purity(
    emb: DataFrame,
    k: int = 5,
    q_mod: int = 37,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Leave-one-out k-NN label purity per label — the SUPERVISED
    embedding-quality dial: for each query in the deterministic
    mod-q_mod sample, what fraction of its k nearest neighbors share
    its label, and does its single nearest neighbor (the 1-NN
    classifier) agree? Cohesion and silhouette score geometry against
    the label CENTROIDS; purity scores the actual retrieval behavior a
    kNN consumer sees, catching the case where classes interleave at
    the boundary while both centroids sit far apart.

    Ranking reuses the cosine_topk contract exactly (e6 cosine, id
    tie-break). Per label: n_queries, Σ matching neighbors (of k
    each — exact integers), purity = matches/(q·k), and the 1-NN
    accuracy. Labels with no sampled query are absent (honest).

    Scale shape: broadcast query set over one corpus scan (no corpus
    shuffle), rank window on the queries-bounded frame, labels-bounded
    final agg."""
    e = emb.select(
        F.col(id_col).alias("nid"),
        F.col(label_col).alias("nlabel"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    q = emb.where(F.pmod(F.col(id_col), F.lit(q_mod)) == 0).select(
        F.col(id_col).alias("qid"),
        F.col(label_col).alias("qlabel"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    j = e.crossJoin(F.broadcast(q)).where(F.col("nid") != F.col("qid"))
    sim = _dot(F.col("qv"), F.col("v")) / (_norm(F.col("qv")) * _norm(F.col("v")))
    scored = j.select(
        "qid",
        "qlabel",
        "nlabel",
        F.round(sim * 1e6).cast("bigint").alias("sim_e6"),
        F.col("nid"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim_e6"), F.asc("nid"))
    top = scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )
    per_q = top.groupBy("qid", "qlabel").agg(
        F.sum(
            F.when(F.col("nlabel") == F.col("qlabel"), 1).otherwise(0)
        ).cast("bigint").alias("_m"),
        F.sum(
            F.when(
                (F.col("rank") == 1) & (F.col("nlabel") == F.col("qlabel")), 1
            ).otherwise(0)
        ).cast("bigint").alias("_nn1"),
    )
    a = per_q.groupBy(F.col("qlabel").alias("label")).agg(
        F.count("*").cast("bigint").alias("n_queries"),
        F.sum("_m").alias("n_matches"),
        F.sum("_nn1").alias("n_nn1_correct"),
    )
    return a.select(
        "label",
        "n_queries",
        "n_matches",
        "n_nn1_correct",
        F.round(
            F.col("n_matches").cast("double")
            / (F.col("n_queries") * F.lit(k)).cast("double")
            * 1e6
        ).cast("bigint").alias("purity_e6"),
    )


def mutual_knn(
    emb: DataFrame,
    k: int = 5,
    q_mod: int = 37,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Reciprocity + structure census of the k-NN graph — the
    SYMMETRY dial next to hubness (in-degree skew) and purity
    (labels): 'j is my neighbor' is not reciprocal in high
    dimensions, and the mutual-kNN subgraph (edges where BOTH ends
    retrieve each other) is exactly the graph density-based dedup and
    clustering consumers actually trust; a low reciprocity rate means
    rankings are hub-dominated and asymmetric even if recall looks
    fine. Among the deterministic mod-q_mod sample: directed arcs =
    sample→sample entries of each query's exact top-k over the FULL
    corpus (the cosine_topk contract: e6 cosine, id tie-break);
    mutual edges = reciprocated arc pairs, canonical a < b;
    reciprocity = 2·mutual/directed. The mutual graph then feeds the
    SAME dup_graph_census used for the LSH near-dup graph —
    wedge/triangle transitivity says whether reciprocal neighborhoods
    form cliques (real clusters) or fray into chains.

    All counts exact; two e6 ratios. Scale shape: broadcast query
    set over one corpus scan, rank window on the queries-bounded
    frame, arc self-join and census on the sample-bounded graph."""
    from tokens_ts import dedup

    e = emb.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    q = emb.where(F.pmod(F.col(id_col), F.lit(q_mod)) == 0).select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    j = e.crossJoin(F.broadcast(q)).where(F.col("nid") != F.col("qid"))
    sim = _dot(F.col("qv"), F.col("v")) / (
        _norm(F.col("qv")) * _norm(F.col("v"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim_e6"), F.asc("nid"))
    top = (
        j.select(
            "qid", "nid", F.round(sim * 1e6).cast("bigint").alias("sim_e6")
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
    arcs = top.where(F.pmod(F.col("nid"), F.lit(q_mod)) == 0).select(
        "qid", "nid"
    )
    rev = arcs.select(
        F.col("nid").alias("qid"), F.col("qid").alias("nid")
    )
    mut = (
        arcs.join(rev, ["qid", "nid"], "left_semi")
        .where(F.col("qid") < F.col("nid"))
        .select(F.col("qid").alias("a"), F.col("nid").alias("b"))
    )
    counts = (
        q.agg(F.count("*").cast("bigint").alias("n_queries"))
        .crossJoin(arcs.agg(F.count("*").cast("bigint").alias("n_directed")))
        .crossJoin(mut.agg(F.count("*").cast("bigint").alias("n_mutual")))
    )
    census = dedup.dup_graph_census(mut).select(
        F.col("n_nodes").alias("n_mutual_nodes"),
        "n_wedges",
        "n_triangles",
        "transitivity_e6",
    )
    return counts.crossJoin(census).select(
        "n_queries",
        "n_directed",
        "n_mutual",
        F.when(
            F.col("n_directed") > 0,
            F.round(
                2.0
                * F.col("n_mutual").cast("double")
                / F.col("n_directed").cast("double")
                * 1e6
            ).cast("bigint"),
        ).alias("reciprocity_e6"),
        "n_mutual_nodes",
        "n_wedges",
        "n_triangles",
        "transitivity_e6",
    )


def pq_recall(
    emb: DataFrame,
    k: int = 5,
    n_sub: int = 8,
    n_codes: int = 16,
    dim: int = 64,
    q_mod: int = 37,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Measured recall@k under product quantization — the number
    pq_error only bounds: err_e9 says how much geometry the codes
    destroyed, but the serving question is whether the RANKING
    survived, and reconstruction error does not translate linearly
    into rank damage (a large error orthogonal to the query costs
    nothing; a small one along it flips neighbors). For the
    deterministic mod-q_mod queries: exact top-k by full-vector
    cosine (the cosine_topk contract) vs top-k by cosine against the
    PQ RECONSTRUCTION (asymmetric distance — full query, quantized
    corpus, the standard serving configuration); recall = |∩|/k,
    summed exactly. Completes the quantization QA triptych the IVF
    side already has (ivf_balance / ivf_recall_curve).

    Codebook, assignment, and tie rules are pinned IDENTICAL to
    pq_error (first-n_codes convention, e9-integer argmin, lowest
    code id on ties), so the recall measured here is the recall of
    exactly the codes that audit emits. A zero-norm reconstruction
    ranks below every real cosine (sim := −2e6, pinned). Both
    rankings ride one scored frame, so the overlap count is exact.

    Scale shape: ONE corpus scan carrying the broadcast codebook
    (row-local argmin + reconstruction) crossed with the broadcast
    query set; two rank windows on the queries-bounded frame; a
    single-row agg. Zero corpus shuffles."""
    e = emb.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    w = dim // n_sub
    cb = (
        e.where(F.col("nid") < n_codes)
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(s).alias("s"),
                            F.col("nid").alias("cid"),
                            F.slice("v", s * w + 1, w).alias("cw"),
                        )
                        for s in range(n_sub)
                    ]
                )
            ).alias("c")
        )
        .agg(F.collect_list("c").alias("_cb"))
    )
    j = e.crossJoin(F.broadcast(cb))

    def best_cw(s):
        sub = F.slice("v", s * w + 1, w)
        cands = F.filter(F.col("_cb"), lambda c: c["s"] == s)
        d9 = lambda c: F.round(  # noqa: E731
            F.aggregate(
                F.zip_with(sub, c["cw"], lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, t: acc + t,
            )
            * 1e9
        ).cast("bigint")
        scored = F.transform(
            cands,
            lambda c: F.struct(
                d9(c).alias("d"),
                c["cid"].cast("bigint").alias("cid"),
                c["cw"].alias("cw"),
            ),
        )
        return F.aggregate(
            scored,
            F.struct(
                F.lit((1 << 62)).cast("bigint").alias("d"),
                F.lit(-1).cast("bigint").alias("cid"),
                F.array([F.lit(0.0)] * w).alias("cw"),
            ),
            lambda acc, x: F.when(
                (x["d"] < acc["d"])
                | ((x["d"] == acc["d"]) & (x["cid"] < acc["cid"])),
                x,
            ).otherwise(acc),
        )["cw"]

    recon = F.concat(*[best_cw(s) for s in range(n_sub)])
    side = j.select("nid", "v", recon.alias("r"))
    q = emb.where(F.pmod(F.col(id_col), F.lit(q_mod)) == 0).select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    sj = side.crossJoin(F.broadcast(q)).where(F.col("nid") != F.col("qid"))
    nr = _norm(F.col("r"))
    sim_ex = F.round(
        _dot(F.col("qv"), F.col("v"))
        / (_norm(F.col("qv")) * _norm(F.col("v")))
        * 1e6
    ).cast("bigint")
    sim_pq = F.when(
        nr > 0,
        F.round(
            _dot(F.col("qv"), F.col("r")) / (_norm(F.col("qv")) * nr) * 1e6
        ).cast("bigint"),
    ).otherwise(F.lit(-2000000).cast("bigint"))
    scored = sj.select(
        "qid", "nid", sim_ex.alias("se"), sim_pq.alias("sp")
    )
    wex = Window.partitionBy("qid").orderBy(F.desc("se"), F.asc("nid"))
    wpq = Window.partitionBy("qid").orderBy(F.desc("sp"), F.asc("nid"))
    r = scored.select(
        "qid",
        (F.row_number().over(wex) <= k).cast("int").alias("_ex"),
        (F.row_number().over(wpq) <= k).cast("int").alias("_pq"),
    )
    per_q = r.groupBy("qid").agg(
        F.sum(F.col("_ex") * F.col("_pq")).cast("bigint").alias("_hit")
    )
    return per_q.agg(
        F.count("*").cast("bigint").alias("n_queries"),
        F.lit(k).cast("bigint").alias("k"),
        F.sum("_hit").alias("n_hits"),
        F.round(
            F.sum("_hit").cast("double")
            / (F.count("*").cast("double") * float(k))
            * 1e6
        )
        .cast("bigint")
        .alias("recall_e6"),
    )
