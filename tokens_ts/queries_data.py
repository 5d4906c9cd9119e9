"""Driver-contract query pairs, part 2: north-rule synthetic sequences,
embedding array ops + similarity search, document text ops + dedup,
codec round-trip, multimodal plumbing.

The synthetic-sequence pairs are the strongest correctness evidence in
the suite: BOTH engines *generate* the FIXTURES.md table from the same
integer recurrences (Spark from spark.range, DuckDB from range()) and
must agree on every derived statistic — no shared input file to hide
behind.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from tokens_ts import config as C
from tokens_ts import codec, dedup, extract, grid, multimodal, packing, simsearch, synth, textops, tiers
from tokens_ts.queries_driver import ORACLES, QUERIES, _docs, _e, _emb, _ev, q

SYNTH_K, SYNTH_S = 240, 3


def _synth_cte() -> str:
    """DuckDB CTE generating the FIXTURES.md sequences table."""
    budgets = ", ".join(
        f"({s}, {C.source_budget(SYNTH_K, s)})" for s in range(SYNTH_S)
    )
    return f"""
    WITH params(s, budget) AS (VALUES {budgets}),
    ks AS (
      SELECT s, unnest(range(0, budget)) AS k FROM params
    ),
    rows_ AS (
      SELECT s, k,
             (16 + (k * {C.NTOK_MULT}) % {C.NTOK_MOD}) AS n_tok,
             ({C.A_MULT} * (2*s + 1)) % {C.V} AS a,
             ({C.B_MULT} * (4*s + 3)) % {C.V} AS b,
             s*s + 7 AS c
      FROM ks WHERE (k * {C.GAP_MULT}) % 1000 >= {C.GAP_CUT}
    ),
    seq AS (
      SELECT printf('src%02d-%012d', s, k) AS doc_id,
             printf('src%02d', s) AS source,
             s, k, n_tok,
             list_transform(range(0, n_tok),
               i -> CASE WHEN (a*k + b*i + c) % {C.V} < {C.PAD_THRESHOLD}
                         THEN {C.PAD_ID}
                         ELSE (a*k + b*i + c) % {C.V} END) AS tokens,
             {C.T0_EPOCH} + k * 60 * (1 + s % 3) AS epoch_s
      FROM rows_
    ),
    vals AS (
      SELECT *,
             list_transform(tokens,
               x -> CASE WHEN x = {C.PAD_ID} THEN NULL ELSE CAST(x AS DOUBLE) END) AS v
      FROM seq
    )
    """


def _seq(spark):
    return grid.with_event_time(synth.sequences(spark, SYNTH_K, SYNTH_S))


# ---------------------------------------------------------------------------
# S5/P4: fixture parity — generation itself cross-checked
# ---------------------------------------------------------------------------

@q(
    "seq_synth_parity",
    _synth_cte()
    + """
    SELECT doc_id, n_tok,
           CAST(list_sum(tokens) AS BIGINT) AS tok_sum,
           CAST(len(list_filter(tokens, x -> x = 0)) AS BIGINT) AS n_pad,
           epoch_s
    FROM seq
    """,
)
def seq_synth_parity(spark, sf_dir):
    s = _seq(spark)
    return s.select(
        "doc_id",
        F.col("n_tok").cast("bigint").alias("n_tok"),
        F.aggregate(
            "tokens", F.lit(0).cast("bigint"), lambda a, x: a + x.cast("bigint")
        ).alias("tok_sum"),
        F.size(F.filter("tokens", lambda x: x == C.PAD_ID)).cast("bigint").alias("n_pad"),
        (F.col("k") * grid.step_seconds_col() + C.T0_EPOCH)
        .cast("bigint")
        .alias("epoch_s"),
    )


# ---------------------------------------------------------------------------
# Flagship: full north-rule slice on the generated table (A1 + A2)
# ---------------------------------------------------------------------------

@q(
    "seq_flagship_t1m",
    _synth_cte()
    + """
    SELECT source,
           epoch_s - epoch_s % 60 AS w_epoch,
           count(list_aggregate(v, 'avg')) AS cnt,
           CAST(ROUND(sum(list_aggregate(v, 'avg')) * 1e4) AS BIGINT) AS sum_e4,
           CAST(ROUND(min(list_aggregate(v, 'avg')) * 1e6) AS BIGINT) AS min_e6,
           CAST(ROUND(max(list_aggregate(v, 'avg')) * 1e6) AS BIGINT) AS max_e6
    FROM vals
    GROUP BY 1, 2
    """,
)
def seq_flagship_t1m(spark, sf_dir):
    raw = extract.to_raw(extract.full_stats(_seq(spark), stats=["mean"]))
    t = tiers.rollup(raw, "1m")
    return t.select(
        "source",
        F.unix_timestamp("window_start").alias("w_epoch"),
        "cnt",
        _e("sum", 4).alias("sum_e4"),
        _e("min", 6).alias("min_e6"),
        _e("max", 6).alias("max_e6"),
    )


@q(
    "seq_t1h_cascade",
    _synth_cte()
    + """
    SELECT source,
           epoch_s - epoch_s % 3600 AS w_epoch,
           count(list_aggregate(v, 'avg')) AS cnt,
           CAST(ROUND(sum(list_aggregate(v, 'avg')) * 1e4) AS BIGINT) AS sum_e4
    FROM vals
    GROUP BY 1, 2
    """,
)
def seq_t1h_cascade(spark, sf_dir):
    raw = extract.to_raw(extract.full_stats(_seq(spark), stats=["mean"]))
    t1h = tiers.cascade(tiers.rollup(raw, "1m"), "1h")
    return t1h.select(
        "source",
        F.unix_timestamp("window_start").alias("w_epoch"),
        "cnt",
        _e("sum", 4).alias("sum_e4"),
    )


# ---------------------------------------------------------------------------
# P1/P2/P3: extraction selectors on the generated table
# ---------------------------------------------------------------------------

@q(
    "seq_point_p7",
    _synth_cte()
    + """
    SELECT doc_id,
           CAST(CASE WHEN n_tok > 7 THEN v[8] END AS BIGINT) AS val
    FROM vals
    """,
)
def seq_point_p7(spark, sf_dir):
    return extract.point(_seq(spark), 7).select(
        "doc_id", F.col("value").cast("bigint").alias("val")
    )


@q(
    "seq_box_stats",
    _synth_cte()
    + """
    , sel AS (
      SELECT doc_id,
             list_select(v, range(9, least(n_tok, 32) + 1)) AS bv
      FROM vals
    ),
    st AS (
      SELECT doc_id, bv,
             len(list_filter(bv, x -> x IS NOT NULL)) AS cnt,
             list_aggregate(bv, 'avg') AS m
      FROM sel
    )
    SELECT doc_id, CAST(cnt AS BIGINT) AS cnt,
           CAST(ROUND(m * 1e6) AS BIGINT) AS mean_e6,
           CAST(ROUND(sqrt(list_sum(list_transform(bv, x -> (x - m) * (x - m))) / cnt) * 1e6) AS BIGINT) AS std_e6
    FROM st
    """,
)
def seq_box_stats(spark, sf_dir):
    w = extract.box_stats(_seq(spark), 8, 32, stats=["cnt", "mean", "std"])
    return w.select(
        "doc_id",
        F.col("box_8_32_cnt").alias("cnt"),
        _e("box_8_32_mean", 6).alias("mean_e6"),
        _e("box_8_32_std", 6).alias("std_e6"),
    )


@q(
    "seq_mask_stats",
    _synth_cte()
    + """
    , sel AS (
      SELECT doc_id, list_select(v, range(1, n_tok + 1, 3)) AS mv FROM vals
    )
    SELECT doc_id,
           CAST(len(list_filter(mv, x -> x IS NOT NULL)) AS BIGINT) AS cnt,
           CAST(ROUND(list_aggregate(mv, 'avg') * 1e6) AS BIGINT) AS mean_e6
    FROM sel
    """,
)
def seq_mask_stats(spark, sf_dir):
    positions = list(range(0, 256, 3))
    w = extract.mask_stats(_seq(spark), positions, stats=["cnt", "mean"])
    return w.select(
        "doc_id",
        F.col("mask_cnt").alias("cnt"),
        _e("mask_mean", 6).alias("mean_e6"),
    )


@q(
    "seq_points_multi",
    _synth_cte()
    + """
    SELECT doc_id,
           CAST(v[4] AS BIGINT) AS p3,
           CAST(v[8] AS BIGINT) AS p7,
           CAST(v[101] AS BIGINT) AS p100
    FROM vals
    """,
)
def seq_points_multi(spark, sf_dir):
    """Multi-point extraction (reference API parity: geomatics point()
    takes a coordinate LIST → one column per point): three positions in
    one row-local scan; p100 exercises the out-of-range → null guard
    (n_tok ∈ [16, 256])."""
    w = extract.points(_seq(spark), [3, 7, 100])
    return w.select(
        "doc_id",
        F.col("point_p3").cast("bigint").alias("p3"),
        F.col("point_p7").cast("bigint").alias("p7"),
        F.col("point_p100").cast("bigint").alias("p100"),
    )


@q(
    "codec_tokens_roundtrip",
    _synth_cte()
    + """
    SELECT doc_id,
           CAST(n_tok AS BIGINT) AS n_tok,
           CAST(list_sum(tokens) AS BIGINT) AS tok_sum,
           md5(array_to_string(tokens, ',')) AS tok_md5
    FROM seq
    """,
)
def codec_tokens_roundtrip(spark, sf_dir):
    """C5 token bit-packing as an identity query: encode every
    sequence's tokens to 17-bit-packed blobs (47% of the int32 bytes)
    and decode back; the oracle computes the SAME per-doc count, sum,
    and exact md5 of the token stream directly from the generated
    table — token-array equality THROUGH the codec, value-checked
    cross-engine."""
    seq = _seq(spark).select("doc_id", "source", "n_tok", "tokens")
    back = codec.decode_token_blobs(codec.encode_token_blobs(seq))
    return back.select(
        "doc_id",
        F.size("tokens").cast("bigint").alias("n_tok"),
        F.aggregate(
            "tokens", F.lit(0).cast("bigint"), lambda a, x: a + x.cast("bigint")
        ).alias("tok_sum"),
        F.md5(
            F.array_join(F.transform("tokens", lambda x: x.cast("string")), ",")
        ).alias("tok_md5"),
    )


# ---------------------------------------------------------------------------
# Token-level corpus statistics: heavy-hitter tokens and per-source
# vocabulary coverage — the histograms a tokenizer/data-mix report needs.
# explode → map-side-combined count agg; top-k is TakeOrderedAndProject.
# ---------------------------------------------------------------------------

@q(
    "seq_token_freq_topk",
    _synth_cte()
    + """
    SELECT t AS token, CAST(count(*) AS BIGINT) AS cnt
    FROM (SELECT unnest(tokens) AS t FROM seq)
    WHERE t <> 0
    GROUP BY t
    ORDER BY cnt DESC, token ASC
    LIMIT 20
    """,
)
def seq_token_freq_topk(spark, sf_dir):
    """Heavy-hitter tokens (PAD excluded): corpus-wide frequency top-20
    with a deterministic (cnt desc, token asc) tie-break. The explode
    feeds a partial-aggregated count; the top-k plans as a distributed
    TakeOrderedAndProject, never a global window."""
    s = _seq(spark)
    return (
        s.select(F.explode("tokens").alias("token"))
        .where(F.col("token") != C.PAD_ID)
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(20)
        .select(F.col("token").cast("bigint").alias("token"), "cnt")
    )


@q(
    "seq_vocab_coverage",
    _synth_cte()
    + f"""
    SELECT source,
           CAST(count(DISTINCT t) AS BIGINT) AS n_distinct,
           CAST(ROUND(count(DISTINCT t) / {C.V}.0 * 1e6) AS BIGINT) AS frac_e6
    FROM (SELECT source, unnest(tokens) AS t FROM seq)
    WHERE t <> 0
    GROUP BY source
    """,
)
def seq_vocab_coverage(spark, sf_dir):
    """Per-source vocabulary coverage: distinct non-PAD tokens and the
    fraction of the model vocab they span — the data-mix diversity
    metric. Exact countDistinct (two-phase hash agg); the HLL++
    approximate twin pattern is already pinned by
    ts_approx_distinct_users."""
    s = _seq(spark)
    return (
        s.select("source", F.explode("tokens").alias("t"))
        .where(F.col("t") != C.PAD_ID)
        .groupBy("source")
        .agg(F.countDistinct("t").alias("n_distinct"))
        .select(
            "source",
            "n_distinct",
            _e(F.col("n_distinct").cast("double") / F.lit(float(C.V)), 6).alias(
                "frac_e6"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Sequence packing (concat-and-chunk): the training-batch assembly step.
# Spark computes global offsets WITHOUT a global window (per-source
# cumsum + broadcast prefix bases — tokens_ts/packing.py); the oracle
# re-derives them with a plain window cumsum. The tokens pair md5s the
# PACKED ARRAYS — the token-array-equality invariant THROUGH the rewrite.
# ---------------------------------------------------------------------------

_PACK_L = 512

_PACK_CTES = f"""
    , off AS (
      SELECT doc_id, n_tok, tokens,
             COALESCE(SUM(n_tok) OVER (ORDER BY s, k
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
      FROM seq
    ),
    sp AS (
      SELECT doc_id, o, n_tok, tokens,
             unnest(range(CAST(floor(o / {_PACK_L}) AS BIGINT),
                          CAST(floor((o + n_tok - 1) / {_PACK_L}) AS BIGINT) + 1)) AS chunk_id
      FROM off WHERE n_tok > 0
    ),
    spans AS (
      SELECT doc_id, chunk_id, o,
             CAST(greatest(o, chunk_id * {_PACK_L}) - o AS INT) AS start_in_doc,
             CAST(least(o + n_tok, (chunk_id + 1) * {_PACK_L})
                  - greatest(o, chunk_id * {_PACK_L}) AS INT) AS span_len,
             tokens
      FROM sp
    )
"""


@q(
    "seq_packing",
    _synth_cte()
    + _PACK_CTES
    + """
    SELECT chunk_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(span_len) AS BIGINT) AS n_filled,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc
    FROM spans GROUP BY chunk_id
    """,
)
def seq_packing(spark, sf_dir):
    """Packing manifest: per fixed-length chunk, contributing docs and
    fill — the bookkeeping a data loader needs. All shuffles on
    chunk_id / source; no global sort anywhere (plan-asserted)."""
    return packing.pack_summary(_seq(spark), chunk_len=_PACK_L).select(
        "chunk_id", "n_docs", "n_filled", "first_doc", "last_doc"
    )


@q(
    "seq_packing_tokens",
    _synth_cte()
    + _PACK_CTES
    + """
    SELECT chunk_id,
           CAST(len(toks) AS BIGINT) AS n_filled,
           CAST(n_spans AS BIGINT) AS n_spans,
           md5(array_to_string(toks, ',')) AS tok_md5
    FROM (
      SELECT chunk_id,
             flatten(list(tokens[start_in_doc + 1 : start_in_doc + span_len]
                          ORDER BY o)) AS toks,
             count(*) AS n_spans
      FROM spans GROUP BY chunk_id
    )
    """,
)
def seq_packing_tokens(spark, sf_dir):
    """Materialized packed chunks, md5 over every chunk's token array —
    cross-engine proof that concat-and-chunk preserves the token stream
    exactly (the north-rule token-array-equality invariant through this
    rewrite)."""
    p = packing.pack_tokens(_seq(spark), chunk_len=_PACK_L)
    return p.select(
        "chunk_id",
        "n_filled",
        F.col("n_spans").cast("long").alias("n_spans"),
        F.md5(
            F.array_join(F.transform("tokens", lambda x: x.cast("string")), ",")
        ).alias("tok_md5"),
    )


# ---------------------------------------------------------------------------
# A1 on the driver's embeddings table (array<float> fixture)
# ---------------------------------------------------------------------------

@q(
    "emb_point_stats",
    """
    SELECT label,
           count(embedding[9]) AS cnt,
           CAST(ROUND(avg(CAST(embedding[9] AS DOUBLE)) * 1e6) AS BIGINT) AS mean_e6,
           CAST(ROUND(min(CAST(embedding[9] AS DOUBLE)) * 1e6) AS BIGINT) AS min_e6,
           CAST(ROUND(max(CAST(embedding[9] AS DOUBLE)) * 1e6) AS BIGINT) AS max_e6
    FROM embeddings GROUP BY label
    """,
)
def emb_point_stats(spark, sf_dir):
    e = _emb(spark, sf_dir).withColumn(
        "p", F.get(F.col("embedding").cast("array<double>"), 8)
    )
    return e.groupBy("label").agg(
        F.count("p").alias("cnt"),
        _e(F.avg("p"), 6).alias("mean_e6"),
        _e(F.min("p"), 6).alias("min_e6"),
        _e(F.max("p"), 6).alias("max_e6"),
    )


@q(
    "emb_box_stats",
    """
    WITH sel AS (
      SELECT label,
             list_transform(list_select(embedding, range(9, 33)),
                            x -> CAST(x AS DOUBLE)) AS bv
      FROM embeddings
    ),
    st AS (
      SELECT label, list_aggregate(bv, 'avg') AS m FROM sel
    )
    SELECT label, count(*) AS cnt,
           CAST(ROUND(avg(m) * 1e6) AS BIGINT) AS mean_of_means_e6
    FROM st GROUP BY label
    """,
)
def emb_box_stats(spark, sf_dir):
    e = _emb(spark, sf_dir).withColumn(
        "m",
        extract.arr_mean(F.slice(F.col("embedding").cast("array<double>"), 9, 24)),
    )
    return e.groupBy("label").agg(
        F.count("*").alias("cnt"), _e(F.avg("m"), 6).alias("mean_of_means_e6")
    )


@q(
    "emb_full_stats",
    """
    SELECT vec_id,
           CAST(ROUND(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'avg') * 1e6) AS BIGINT) AS mean_e6,
           CAST(ROUND(list_min(embedding) * 1e6) AS BIGINT) AS min_e6,
           CAST(ROUND(list_max(embedding) * 1e6) AS BIGINT) AS max_e6
    FROM embeddings
    """,
)
def emb_full_stats(spark, sf_dir):
    arr = F.col("embedding").cast("array<double>")
    return _emb(spark, sf_dir).select(
        "vec_id",
        _e(extract.arr_mean(arr), 6).alias("mean_e6"),
        _e(extract.arr_min(arr), 6).alias("min_e6"),
        _e(extract.arr_max(arr), 6).alias("max_e6"),
    )


@q(
    "emb_mask_stats",
    """
    SELECT vec_id,
           CAST(ROUND(list_aggregate(list_transform(
             list_select(embedding, range(1, 65, 3)), x -> CAST(x AS DOUBLE)),
             'avg') * 1e6) AS BIGINT) AS mask_mean_e6
    FROM embeddings
    """,
)
def emb_mask_stats(spark, sf_dir):
    arr = F.filter(
        F.col("embedding").cast("array<double>"), lambda x, i: i % 3 == 0
    )
    return _emb(spark, sf_dir).select(
        "vec_id", _e(extract.arr_mean(arr), 6).alias("mask_mean_e6")
    )


# ---------------------------------------------------------------------------
# similarity search: exact brute-force + LSH-bucketed
# ---------------------------------------------------------------------------

@q(
    "emb_ann_topk",
    """
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
    c AS (
      SELECT q.qid, e.vec_id AS nid,
             list_sum(list_transform(range(1, 65),
               i -> CAST(q.qe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) AS dot,
             sqrt(list_sum(list_transform(q.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS na,
             sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nb
      FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid
    )
    SELECT qid, nid, rank, sim_e6 FROM (
      SELECT qid, nid,
             CAST(ROUND(dot / (na * nb) * 1e6) AS BIGINT) AS sim_e6,
             row_number() OVER (
               PARTITION BY qid
               ORDER BY CAST(ROUND(dot / (na * nb) * 1e6) AS BIGINT) DESC, nid
             ) AS rank
      FROM c
    ) WHERE rank <= 5
    """,
)
def emb_ann_topk(spark, sf_dir):
    return simsearch.cosine_topk(_emb(spark, sf_dir), query_ids=[0, 1, 2, 3, 4], k=5)


@q(
    "emb_lsh_buckets",
    """
    WITH planes AS (
      SELECT j, list_transform(range(1, 65),
               i -> CAST((i * 31 + j * 37) % 19 - 9 AS DOUBLE)) AS h
      FROM (SELECT unnest(range(0, 8)) AS j)
    ),
    dots AS (
      SELECT e.vec_id, p.j,
             list_sum(list_transform(range(1, 65),
               i -> p.h[i] * CAST(e.embedding[i] AS DOUBLE))) AS d
      FROM embeddings e CROSS JOIN planes p
    )
    SELECT vec_id,
           CAST(sum(CASE WHEN d > 0 THEN 1 << j ELSE 0 END) AS BIGINT) AS bucket
    FROM dots GROUP BY vec_id
    """,
)
def emb_lsh_buckets(spark, sf_dir):
    return simsearch.with_lsh_bucket(_emb(spark, sf_dir)).select(
        "vec_id", "bucket"
    )


@q(
    "emb_ann_lsh",
    """
    WITH planes AS (
      SELECT j, list_transform(range(1, 65),
               i -> CAST((i * 31 + j * 37) % 19 - 9 AS DOUBLE)) AS h
      FROM (SELECT unnest(range(0, 8)) AS j)
    ),
    dots AS (
      SELECT e.vec_id, p.j,
             list_sum(list_transform(range(1, 65),
               i -> p.h[i] * CAST(e.embedding[i] AS DOUBLE))) AS d
      FROM embeddings e CROSS JOIN planes p
    ),
    buckets AS (
      SELECT vec_id,
             CAST(sum(CASE WHEN d > 0 THEN 1 << j ELSE 0 END) AS BIGINT) AS bucket
      FROM dots GROUP BY vec_id
    ),
    cand AS (
      SELECT q.vec_id AS qid, n.vec_id AS nid
      FROM buckets q JOIN buckets n ON q.bucket = n.bucket
      WHERE q.vec_id < 20 AND n.vec_id <> q.vec_id
    ),
    scored AS (
      SELECT c.qid, c.nid,
             CAST(ROUND(
               list_sum(list_transform(range(1, 65),
                 i -> CAST(qe.embedding[i] AS DOUBLE) * CAST(ne.embedding[i] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(qe.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                * sqrt(list_sum(list_transform(ne.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
               * 1e6) AS BIGINT) AS sim_e6
      FROM cand c
      JOIN embeddings qe ON qe.vec_id = c.qid
      JOIN embeddings ne ON ne.vec_id = c.nid
    )
    SELECT qid, nid, rank, sim_e6 FROM (
      SELECT qid, nid, sim_e6,
             row_number() OVER (PARTITION BY qid ORDER BY sim_e6 DESC, nid) AS rank
      FROM scored
    ) WHERE rank <= 1
    """,
)
def emb_ann_lsh(spark, sf_dir):
    """Single-table LSH top-1 — was a declared rows-only pair in round
    1 ('composition not SQL-expressible'); it is, so it now gets the
    full value-hash check like its multi-table sibling."""
    return simsearch.lsh_topk(_emb(spark, sf_dir), query_ids=list(range(20)), k=1)


@q(
    "emb_cosine_dups",
    """
    WITH planes AS (
      SELECT j, list_transform(range(1, 65),
               i -> CAST((i * 31 + j * 37) % 19 - 9 AS DOUBLE)) AS h
      FROM (SELECT unnest(range(0, 6)) AS j)
    ),
    dots AS (
      SELECT e.vec_id, p.j,
             list_sum(list_transform(range(1, 65),
               i -> p.h[i] * CAST(e.embedding[i] AS DOUBLE))) AS d
      FROM embeddings e CROSS JOIN planes p
    ),
    buckets AS (
      SELECT vec_id,
             CAST(sum(CASE WHEN d > 0 THEN 1 << j ELSE 0 END) AS BIGINT) AS bucket
      FROM dots GROUP BY vec_id
    ),
    sized AS (
      SELECT * FROM (
        SELECT *, count(*) OVER (PARTITION BY bucket) AS bsz FROM buckets
      ) WHERE bsz >= 2 AND bsz <= 10000
    ),
    cand AS (
      SELECT a.vec_id AS a, b.vec_id AS b
      FROM sized a JOIN sized b ON a.bucket = b.bucket
      WHERE a.vec_id < b.vec_id
    )
    SELECT DISTINCT c.a, c.b,
           CAST(ROUND(
             list_sum(list_transform(range(1, 65),
               i -> CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(ea.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
              * sqrt(list_sum(list_transform(eb.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
             * 1e6) AS BIGINT) AS sim_e6
    FROM cand c
    JOIN embeddings ea ON ea.vec_id = c.a
    JOIN embeddings eb ON eb.vec_id = c.b
    WHERE CAST(ROUND(
             list_sum(list_transform(range(1, 65),
               i -> CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(ea.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
              * sqrt(list_sum(list_transform(eb.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
             * 1e6) AS BIGINT) >= 400000
    """,
)
def emb_cosine_dups(spark, sf_dir):
    """Embedding-cosine near-dup pairs: LSH-bucket candidate gen +
    exact cosine verify ≥ 0.4, fully value-checked cross-engine.
    6 planes / τ=0.4 chosen so the sf0.01 corpus yields a non-trivial
    pair set (7) — the thresholds are user dials, not semantics."""
    return simsearch.cosine_dup_pairs(
        _emb(spark, sf_dir), threshold=0.4, n_planes=6
    )


@q(
    "emb_ann_ivf",
    """
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    cents AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
    csim AS (
      SELECT e.vec_id AS nid, c.cid,
             CAST(ROUND(
               list_sum(list_transform(range(1, 65), i -> e.v[i] * c.cv[i]))
               / (sqrt(list_sum(list_transform(e.v, x -> x * x)))
                * sqrt(list_sum(list_transform(c.cv, x -> x * x))))
               * 1e6) AS BIGINT) AS s
      FROM e CROSS JOIN cents c
    ),
    assign AS (
      SELECT nid, cid FROM (
        SELECT nid, cid,
               row_number() OVER (PARTITION BY nid ORDER BY s DESC, cid) AS r
        FROM csim
      ) WHERE r = 1
    ),
    probes AS (
      SELECT nid AS qid, cid FROM (
        SELECT nid, cid,
               row_number() OVER (PARTITION BY nid ORDER BY s DESC, cid) AS r
        FROM csim WHERE nid < 20
      ) WHERE r <= 3
    ),
    cand AS (
      SELECT DISTINCT p.qid, a.nid
      FROM probes p JOIN assign a ON a.cid = p.cid
      WHERE a.nid <> p.qid
    ),
    scored AS (
      SELECT c.qid, c.nid,
             CAST(ROUND(
               list_sum(list_transform(range(1, 65), i -> qe.v[i] * ne.v[i]))
               / (sqrt(list_sum(list_transform(qe.v, x -> x * x)))
                * sqrt(list_sum(list_transform(ne.v, x -> x * x))))
               * 1e6) AS BIGINT) AS sim_e6
      FROM cand c
      JOIN e qe ON qe.vec_id = c.qid
      JOIN e ne ON ne.vec_id = c.nid
    )
    SELECT qid, nid, rank, sim_e6 FROM (
      SELECT qid, nid, sim_e6,
             row_number() OVER (PARTITION BY qid ORDER BY sim_e6 DESC, nid) AS rank
      FROM scored
    ) WHERE rank <= 3
    """,
)
def emb_ann_ivf(spark, sf_dir):
    """IVF ANN (inverted-file coarse quantization, nprobe=3 of 8
    cells) — the second scale path next to LSH, fully value-checked:
    centroid assignment, probe selection, candidate equi-join, and
    ranking all mirrored in DuckDB."""
    return simsearch.ivf_topk(
        _emb(spark, sf_dir), query_ids=list(range(20)), k=3,
        n_centroids=8, nprobe=3,
    )


_ANN_CTES = """
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 20),
    exact AS (
      SELECT qid, nid, rank FROM (
        SELECT q.qid, e.vec_id AS nid,
               row_number() OVER (
                 PARTITION BY q.qid
                 ORDER BY CAST(ROUND(
                   list_sum(list_transform(range(1, 65),
                     i -> CAST(q.qe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
                   / (sqrt(list_sum(list_transform(q.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                    * sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
                   * 1e6) AS BIGINT) DESC, e.vec_id
               ) AS rank
        FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid
      ) WHERE rank <= 5
    ),
    planes AS (
      SELECT j, list_transform(range(1, 65),
               i -> CAST((i * 31 + j * 37) % 19 - 9 AS DOUBLE)) AS h
      FROM (SELECT unnest(range(0, 36)) AS j)
    ),
    dots AS (
      SELECT e.vec_id, p.j,
             list_sum(list_transform(range(1, 65),
               i -> p.h[i] * CAST(e.embedding[i] AS DOUBLE))) AS d
      FROM embeddings e CROSS JOIN planes p
    ),
    buckets AS (
      -- 12 tables x 3 planes (planes 3t..3t+2): measured recall@5 0.93
      -- on this corpus (vs 0.70 for 8x4, 0.15 for 4x8) — wider buckets
      -- + more tables is the recall lever; at larger corpora raise
      -- n_planes with log2(N) to keep bucket occupancy bounded
      SELECT vec_id, j // 3 AS tbl,
             sum(CASE WHEN d > 0 THEN 1 << (j % 3) ELSE 0 END) AS bucket
      FROM dots GROUP BY 1, 2
    ),
    cand AS (
      SELECT DISTINCT qb.vec_id AS qid, nb.vec_id AS nid
      FROM buckets qb JOIN buckets nb ON qb.tbl = nb.tbl AND qb.bucket = nb.bucket
      WHERE qb.vec_id < 20 AND nb.vec_id <> qb.vec_id
    ),
    approx AS (
      SELECT qid, nid, rank FROM (
        SELECT c.qid, c.nid,
               row_number() OVER (
                 PARTITION BY c.qid
                 ORDER BY CAST(ROUND(
                   list_sum(list_transform(range(1, 65),
                     i -> CAST(qe.embedding[i] AS DOUBLE) * CAST(ne.embedding[i] AS DOUBLE)))
                   / (sqrt(list_sum(list_transform(qe.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                    * sqrt(list_sum(list_transform(ne.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
                   * 1e6) AS BIGINT) DESC, c.nid
               ) AS rank
        FROM cand c
        JOIN embeddings qe ON qe.vec_id = c.qid
        JOIN embeddings ne ON ne.vec_id = c.nid
      ) WHERE rank <= 5
    )
"""

_ANN_RECALL_SQL = _ANN_CTES + """
    SELECT e.qid,
           CAST(count(a.nid) AS BIGINT) AS n_hits,
           CAST(ROUND(count(a.nid) / 5.0 * 1e6) AS BIGINT) AS recall_e6
    FROM exact e LEFT JOIN approx a ON e.qid = a.qid AND e.nid = a.nid
    GROUP BY e.qid
"""


@q("emb_ann_recall", _ANN_RECALL_SQL)
def emb_ann_recall(spark, sf_dir):
    """recall@5 of multi-table LSH ANN vs exact cosine ground truth —
    the instrumentation that turns 'approximate' into a measured
    number, value-checked against an independent engine end-to-end
    (planes, buckets, candidate union, ranking, recall)."""
    emb = _emb(spark, sf_dir)
    qids = list(range(20))
    exact = simsearch.cosine_topk(emb, qids, k=5)
    approx = simsearch.lsh_topk(emb, qids, k=5, n_planes=3, n_tables=12)
    hit = approx.select("qid", "nid").withColumn("_hit", F.lit(1))
    j = exact.join(hit, ["qid", "nid"], "left")
    n_hits = F.sum(F.coalesce("_hit", F.lit(0)))
    return j.groupBy("qid").agg(
        n_hits.cast("bigint").alias("n_hits"),
        _e(n_hits / F.lit(5.0), 6).alias("recall_e6"),
    )


# ---------------------------------------------------------------------------
# documents: dedup + text analysis
# ---------------------------------------------------------------------------

@q(
    "doc_dedup_exact",
    """
    SELECT source, count(*) AS n_docs, count(DISTINCT md5(text)) AS n_distinct
    FROM documents GROUP BY source
    """,
)
def doc_dedup_exact(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(F.md5("text")).alias("n_distinct"),
    )


@q(
    "doc_token_count",
    """
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_words
    FROM documents
    """,
)
def doc_token_count(spark, sf_dir):
    return textops.with_token_count(_docs(spark, sf_dir)).select("doc_id", "n_words")


@q(
    "doc_token_count_bpe",
    r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe_tokens,
           CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_subword_est
    FROM documents
    """,
)
def doc_token_count_bpe(spark, sf_dir):
    """BPE-ish pre-tokenizer count (GPT-2-style regex pre-split) plus
    the chars/4 subword estimate — both pure regexp/arith expressions,
    mirrored exactly by DuckDB's regexp_extract_all."""
    return textops.with_token_count_bpe(_docs(spark, sf_dir)).select(
        "doc_id", "n_bpe_tokens", "n_subword_est"
    )


def _bpe_chain() -> tuple[str, str]:
    """The shared merge-table replace chain (see _bpe_oracle_sql for
    why each merge repeats its replace 6 times); returns (CTE chain
    text, final CTE name). Expects a `chunks(doc_id, ch, pos)` CTE in
    scope."""
    merges = textops.bpe_merges()
    ctes = []
    prev = "m0"
    ctes.append(
        "m0 AS (SELECT doc_id, pos, "
        "' ' || array_to_string(string_split(ch, ''), ' ') || ' ' AS s "
        "FROM chunks)"
    )
    for i, (a, b) in enumerate(merges, start=1):
        pat = f" {a} {b} ".replace("'", "''")
        rep = f" {a}{b} ".replace("'", "''")
        expr = "s"
        for _ in range(6):
            expr = f"replace({expr}, '{pat}', '{rep}')"
        ctes.append(f"m{i} AS (SELECT doc_id, pos, {expr} AS s FROM {prev})")
        prev = f"m{i}"
    return ",\n    ".join(ctes), prev


def _bpe_oracle_sql() -> str:
    """DuckDB mirror of textops.with_bpe_encode: the SAME fixture merge
    table, applied as chained replace() over space-delimited chunk
    strings. Each merge's replace repeats 6 times — left-to-right
    string replace shares boundary spaces between adjacent matches, so
    one pass can miss every other occurrence; six passes reach fixpoint
    for runs up to 2^6 tokens (chunks are single words, far shorter).
    The independence is in the ALGORITHM: Spark encodes token-list-wise
    in Python, DuckDB re-derives the identical stream string-wise.
    One CTE per merge keeps expression nesting at 6 (DuckDB's binder
    caps recursion at 128 — a single 288-deep replace chain won't
    bind)."""
    chain, prev = _bpe_chain()
    return f"""
    WITH chunks AS (
      SELECT doc_id,
             unnest(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS ch,
             generate_subscripts(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'), 1) AS pos
      FROM documents
    ),
    {chain},
    enc AS (
      SELECT doc_id, pos, trim(s) AS etoks FROM {prev}
    ),
    agg AS (
      SELECT doc_id,
             array_to_string(list(etoks ORDER BY pos), ' ') AS tokens_str
      FROM enc GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(CASE WHEN a.tokens_str IS NULL OR a.tokens_str = '' THEN 0
                ELSE len(string_split(a.tokens_str, ' ')) END AS BIGINT) AS n_bpe_real,
           md5(coalesce(a.tokens_str, '')) AS bpe_md5
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """


@q("doc_bpe_encode", _bpe_oracle_sql())
def doc_bpe_encode(spark, sf_dir):
    """REAL merge-table BPE over the documents corpus: per-doc token
    count from actual merges plus an md5 of the exact token stream —
    the honest operator behind packing / cost accounting (the regex
    count above only upper-bounds it). Arrow mapInPandas encode with
    per-batch distinct-chunk memoization."""
    return textops.with_bpe_encode(_docs(spark, sf_dir))


@q(
    "doc_quality",
    """
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM documents
    )
    SELECT doc_id,
           CAST(len(ws) AS BIGINT) AS n_words,
           CAST(ROUND(CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) * 1e6) AS BIGINT) AS ttr_e6,
           CAST(ROUND(CAST(list_sum(list_transform(ws, x -> length(x))) AS DOUBLE) / len(ws) * 1e6) AS BIGINT) AS awl_e6,
           CAST(ROUND(CAST(len(list_filter(ws, x -> x IN ('a', 'the'))) AS DOUBLE) / len(ws) * 1e6) AS BIGINT) AS stop_e6
    FROM w
    """,
)
def doc_quality(spark, sf_dir):
    d = textops.with_quality(_docs(spark, sf_dir))
    return d.select(
        "doc_id",
        "n_words",
        _e("ttr", 6).alias("ttr_e6"),
        _e("avg_word_len", 6).alias("awl_e6"),
        _e("stopword_ratio", 6).alias("stop_e6"),
    )


@q(
    "doc_langid",
    """
    WITH w AS (
      SELECT lang, string_split_regex(trim(text), '\\s+') AS ws FROM documents
    ),
    sc AS (
      SELECT lang,
             len(list_filter(ws, x -> x IN ('the', 'a'))) AS p_en,
             len(list_filter(ws, x -> x IN ('value', 'table'))) AS p_sql,
             len(list_filter(ws, x -> x IN ('query', 'scan'))) AS p_q,
             len(list_filter(ws, x -> x IN ('spark', 'data'))) AS p_data
      FROM w
    )
    SELECT lang,
           CASE
             WHEN p_en = greatest(p_en, p_sql, p_q, p_data) THEN 'p_en'
             WHEN p_sql = greatest(p_en, p_sql, p_q, p_data) THEN 'p_sql'
             WHEN p_q = greatest(p_en, p_sql, p_q, p_data) THEN 'p_q'
             ELSE 'p_data' END AS pred,
           count(*) AS cnt
    FROM sc GROUP BY 1, 2
    """,
)
def doc_langid(spark, sf_dir):
    d = textops.with_langid(_docs(spark, sf_dir))
    return d.groupBy("lang", "pred").agg(F.count("*").alias("cnt"))


@q(
    "doc_repetition",
    """
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM documents
    ),
    sh AS (
      SELECT doc_id,
             list_transform(range(1, greatest(len(ws) - 2, 1) + 1),
               i -> array_to_string(ws[i:i+2], ' ')) AS s3
      FROM w
    )
    SELECT doc_id,
           CAST(len(s3) AS BIGINT) AS n_3grams,
           CAST(ROUND(CAST(len(s3) - len(list_distinct(s3)) AS DOUBLE)
                / len(s3) * 1e6) AS BIGINT) AS dup3_e6
    FROM sh
    """,
)
def doc_repetition(spark, sf_dir):
    """Gopher-style within-doc repetition: duplicate 3-gram occurrence
    fraction — the boilerplate/spam filter a curation run applies
    before dedup even starts."""
    d = textops.with_repetition(_docs(spark, sf_dir))
    return d.select("doc_id", "n_3grams", _e("dup3_frac", 6).alias("dup3_e6"))


def _langid_trigram_sql() -> str:
    """DuckDB mirror of textops.with_langid_trigram: same profiles,
    same length-difference occurrence counts, same declaration-order
    tie-break."""
    score_cols = []
    for lang, tris in textops.TRIGRAM_PROFILES.items():
        terms = " + ".join(
            f"(length(t) - length(replace(t, '{tri}', ''))) / 3"
            for tri in tris
        )
        score_cols.append(f"CAST({terms} AS BIGINT) AS s_{lang}")
    names = [f"s_{lang}" for lang in textops.TRIGRAM_PROFILES]
    best = f"greatest({', '.join(names)})"
    cases = " ".join(
        f"WHEN {n} = {best} THEN '{n[2:]}'" for n in names
    )
    return f"""
    WITH t0 AS (
      SELECT doc_id, ' ' || lower(text) || ' ' AS t FROM documents
    ),
    sc AS (
      SELECT doc_id, {', '.join(score_cols)} FROM t0
    )
    SELECT doc_id, {', '.join(names)},
           CASE {cases} END AS pred_lang
    FROM sc
    """


@q("doc_langid_trigram", _langid_trigram_sql())
def doc_langid_trigram(spark, sf_dir):
    """Honest char-trigram language-ID (real public-knowledge profiles
    for en/de/fr/es/it, unlike the synthetic-corpus word profiles of
    doc_langid) — per-doc scores and prediction, fully value-checked
    cross-engine."""
    names = [f"s_{lang}" for lang in textops.TRIGRAM_PROFILES]
    return textops.with_langid_trigram(_docs(spark, sf_dir)).select(
        "doc_id", *names, "pred_lang"
    )


@q(
    "doc_fingerprint",
    """
    SELECT doc_id,
           list_min(list_transform(range(1, greatest(length(text) - 7, 1) + 1, 4),
                    i -> md5(text[i:i+7]))) AS fingerprint
    FROM documents
    """,
)
def doc_fingerprint(spark, sf_dir):
    return textops.with_fingerprint(_docs(spark, sf_dir)).select(
        "doc_id", "fingerprint"
    )


@q(
    "doc_ngram_jaccard",
    """
    WITH sh AS (
      -- greatest(n-2, 1) + clamped slice: a doc shorter than 3 words
      -- yields ONE whole-doc shingle, matching dedup.word_shingles
      -- (Spark slice(words, i, 3)) on short documents too
      SELECT doc_id, lang,
             list_distinct(list_transform(
               range(1, greatest(len(string_split_regex(trim(text), '\\s+')) - 2, 1) + 1),
               i -> array_to_string(string_split_regex(trim(text), '\\s+')[i:i+2], ' ')
             )) AS sh3
      FROM documents
    )
    SELECT a.doc_id AS a, b.doc_id AS b,
           CAST(ROUND(CAST(len(list_intersect(a.sh3, b.sh3)) AS DOUBLE) /
                (len(a.sh3) + len(b.sh3) - len(list_intersect(a.sh3, b.sh3))) * 1e6) AS BIGINT) AS jac_e6
    FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.sh3, b.sh3)) AS DOUBLE) /
          (len(a.sh3) + len(b.sh3) - len(list_intersect(a.sh3, b.sh3))) >= 0.05
    """,
)
def doc_ngram_jaccard(spark, sf_dir):
    d = _docs(spark, sf_dir).withColumn("sh3", dedup.word_shingles("text", 3))
    a = d.select(F.col("doc_id").alias("a"), F.col("lang").alias("lang"), F.col("sh3").alias("sa"))
    b = d.select(F.col("doc_id").alias("b"), F.col("lang").alias("lang"), F.col("sh3").alias("sb"))
    j = a.join(b, "lang").where(F.col("a") < F.col("b"))
    inter = F.size(F.array_intersect("sa", "sb")).cast("double")
    union = (F.size("sa") + F.size("sb")).cast("double") - inter
    jac = inter / union
    return j.where(jac >= 0.05).select(
        "a", "b", _e(jac, 6).alias("jac_e6")
    )


# rows-only dedup ops (xxhash64 has no DuckDB twin; their md5-hashed
# siblings below get the full cross-engine value check)
@q("doc_minhash_lsh")
def doc_minhash_lsh(spark, sf_dir):
    return dedup.lsh_candidates(_docs(spark, sf_dir), n_perm=32, bands=8)


@q("doc_simhash")
def doc_simhash(spark, sf_dir):
    return dedup.simhash64(_docs(spark, sf_dir))


# shared CTE chain: documents → md5-seeded minhash signatures → LSH
# band buckets (capped) — used by the md5 pair query AND the connected-
# components oracle below
_MD5_LSH_CTES = """
    w AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM documents
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(ws) - 2, 1) + 1),
               i -> array_to_string(ws[i:i+2], ' '))) AS sh3
      FROM w
    ),
    sig AS (
      SELECT doc_id,
             list_transform(range(0, 32), j ->
               list_min(list_transform(sh3,
                 s -> CAST(concat('0x', substr(md5(s || '#' || j), 1, 15)) AS BIGINT)))) AS mh
      FROM sh
    ),
    bandrows AS (
      SELECT doc_id, band,
             array_to_string(mh[band*4+1 : band*4+4], ',') AS bucket
      FROM sig, (SELECT unnest(range(0, 8)) AS band)
    ),
    sized AS (
      SELECT * FROM (
        SELECT *, count(*) OVER (PARTITION BY band, bucket) AS bsz FROM bandrows
      ) WHERE bsz >= 2 AND bsz <= 1000
    )
"""


@q(
    "doc_minhash_md5",
    "WITH "
    + _MD5_LSH_CTES
    + """
    SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
    FROM sized x JOIN sized y ON x.band = y.band AND x.bucket = y.bucket
    WHERE x.doc_id < y.doc_id
    """,
)
def doc_minhash_md5(spark, sf_dir):
    """MinHash-LSH candidate pairs with the md5-seeded permutation
    hashes — the fully-oracled twin of doc_minhash_lsh: signatures,
    banding, bucket capping, and the pair join all value-hash-checked
    against DuckDB (xxhash64 has no DuckDB twin; md5 does)."""
    return dedup.lsh_candidates(
        _docs(spark, sf_dir), n_perm=32, bands=8, hash_mode="md5"
    )


@q(
    "doc_minhash_incremental",
    "WITH "
    + _MD5_LSH_CTES
    + """
    SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
    FROM sized x JOIN sized y ON x.band = y.band AND x.bucket = y.bucket
    WHERE x.doc_id < y.doc_id
      AND (x.doc_id % 2 = 1 OR y.doc_id % 2 = 1)
    """,
)
def doc_minhash_incremental(spark, sf_dir):
    """Incremental LSH maintenance, value-checked: fold the odd-doc_id
    half of the corpus into an index built from the even half; the
    emitted pairs must equal the full-corpus candidates restricted to
    pairs involving the new batch (the oracle computes that restriction
    directly — for touched buckets the incremental combined sizing is
    exactly the full-corpus sizing)."""
    docs = _docs(spark, sf_dir)
    old = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 2 == 1)
    pairs, _ = dedup.lsh_incremental(
        new, dedup.band_rows(old, 32, 8, hash_mode="md5"), hash_mode="md5"
    )
    return pairs


# ---------------------------------------------------------------------------
# duplicate clusters: candidate pairs → connected components. Pairs alone
# double-keep the middle of A-B, B-C; dedup needs the transitive closure.
# Spark side: distributed min-label propagation (one shuffle join per
# round, O(component-diameter) rounds). Oracle: DuckDB recursive CTE
# computing min reachable id per node over the same md5-LSH pair graph.
# ---------------------------------------------------------------------------

@q(
    "doc_dedup_components",
    "WITH RECURSIVE "
    + _MD5_LSH_CTES
    + """
    ,
    cand AS (
      SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      FROM sized x JOIN sized y ON x.band = y.band AND x.bucket = y.bucket
      WHERE x.doc_id < y.doc_id
    ),
    edges AS (
      SELECT a AS u, b AS v FROM cand UNION SELECT b AS u, a AS v FROM cand
    ),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    )
    SELECT u AS doc_id, least(u, min(v)) AS component
    FROM reach GROUP BY u
    """,
)
def doc_dedup_components(spark, sf_dir):
    pairs = dedup.lsh_candidates(
        _docs(spark, sf_dir), n_perm=32, bands=8, hash_mode="md5"
    )
    return dedup.connected_components(pairs)


@q(
    "doc_dedup_keep_best",
    "WITH RECURSIVE "
    + _MD5_LSH_CTES
    + """
    ,
    cand AS (
      SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      FROM sized x JOIN sized y ON x.band = y.band AND x.bucket = y.bucket
      WHERE x.doc_id < y.doc_id
    ),
    edges AS (
      SELECT a AS u, b AS v FROM cand UNION SELECT b AS u, a AS v FROM cand
    ),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    comp AS (
      SELECT u AS doc_id, least(u, min(v)) AS component
      FROM reach GROUP BY u
    ),
    scored AS (
      SELECT c.component, c.doc_id,
             len(string_split_regex(trim(d.text), '\\s+')) AS n_words
      FROM comp c JOIN documents d ON d.doc_id = c.doc_id
    )
    SELECT component,
           CAST(count(*) AS BIGINT) AS n_members,
           -- ordered-aggregate row-value comparator: max words, ties ->
           -- smallest doc_id. Safe at ANY id range (no composite-scalar
           -- overflow); mirrors Spark's max_by(doc_id, struct(n_words, -doc_id)).
           CAST(first(doc_id ORDER BY n_words DESC, doc_id ASC) AS BIGINT) AS keep_doc_id,
           CAST(max(n_words) AS BIGINT) AS keep_n_words
    FROM scored GROUP BY component
    """,
)
def doc_dedup_keep_best(spark, sf_dir):
    """Survivor selection — the step after clustering that an actual
    curation pipeline runs: per duplicate component, keep the member
    with the most words (ties → smallest doc_id), report component
    size. One broadcast-scale join of the (tiny) component map onto
    the docs + one max_by aggregation; no window over the full corpus.
    Length is used as the keep-policy score because it is an INTEGER —
    an argmax over float quality scores would be tie-broken by ulps
    and unverifiable cross-engine. The tie-break is a STRUCT
    comparator (lexicographic (n_words, -doc_id)), valid at any
    production id range — no composite-scalar overflow."""
    docs = _docs(spark, sf_dir)
    pairs = dedup.lsh_candidates(docs, n_perm=32, bands=8, hash_mode="md5")
    comp = dedup.connected_components(pairs)
    scored = comp.join(docs, "doc_id").select(
        "component",
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_words"),
    )
    return dedup.survivor_selection(scored, "n_words").select(
        "component",
        "n_members",
        F.col("keep_doc_id").cast("long").alias("keep_doc_id"),
        F.col("keep_n_words").cast("long").alias("keep_n_words"),
    )


# ---------------------------------------------------------------------------
# decontamination: corpus n-gram overlap against a benchmark/eval set —
# the standard curation step that keeps eval text out of training data.
# Sandbox eval set = the deterministic doc_id % 37 == 0 slice of the
# documents table (no external data); corpus = the rest. Eval shingle
# hashes are broadcast; md5_60 keeps every value DuckDB-reproducible.
# ---------------------------------------------------------------------------

_CONTAM_CTES = """
    w AS (
      SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS ws
      FROM documents
    ),
    sh AS (
      SELECT doc_id, source,
             list_distinct(list_transform(range(1, greatest(len(ws) - 2, 1) + 1),
               i -> array_to_string(ws[i:i+2], ' '))) AS sh3
      FROM w
    ),
    ev AS (
      SELECT DISTINCT CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) AS h
      FROM (SELECT unnest(sh3) AS s FROM sh WHERE doc_id % 37 = 0)
    ),
    corpus AS (
      SELECT doc_id, source,
             CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) AS h
      FROM (SELECT doc_id, source, unnest(sh3) AS s FROM sh WHERE doc_id % 37 <> 0)
    ),
    per_doc AS (
      SELECT c.doc_id, c.source,
             count(*) AS n_shingles,
             count(e.h) AS n_hit
      FROM corpus c LEFT JOIN ev e ON c.h = e.h
      GROUP BY 1, 2
    )
"""


def _contam(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    ev = docs.where(F.col("doc_id") % 37 == 0)
    corpus = docs.where(F.col("doc_id") % 37 != 0)
    return dedup.contamination(corpus, ev, n=3, hash_mode="md5")


@q(
    "doc_contamination",
    "WITH "
    + _CONTAM_CTES
    + """
    SELECT doc_id, source,
           CAST(n_shingles AS BIGINT) AS n_shingles,
           CAST(n_hit AS BIGINT) AS n_hit,
           CAST(ROUND(CAST(n_hit AS DOUBLE) / n_shingles * 1e6) AS BIGINT) AS overlap_e6
    FROM per_doc WHERE n_hit > 0
    """,
)
def doc_contamination(spark, sf_dir):
    """Per-doc contamination listing: corpus docs sharing ≥1 3-gram
    shingle with the eval set, with their overlap fraction. Eval-set
    hashes are broadcast (plan: BroadcastHashJoin, no corpus shuffle
    until the per-doc regroup with map-side partials)."""
    c = _contam(spark, sf_dir)
    return c.where(F.col("n_hit") > 0).select(
        "doc_id",
        "source",
        F.col("n_shingles").cast("long").alias("n_shingles"),
        F.col("n_hit").cast("long").alias("n_hit"),
        _e("overlap_ratio", 6).alias("overlap_e6"),
    )


@q(
    "doc_contamination_rate",
    "WITH "
    + _CONTAM_CTES
    + """
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN CAST(n_hit AS DOUBLE) / n_shingles >= 0.2
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
           -- pooled rate (sum/sum of exact ints): deterministic cross-
           -- engine, unlike an avg of per-doc doubles whose summation
           -- order differs
           CAST(ROUND(CAST(sum(n_hit) AS DOUBLE) / sum(n_shingles) * 1e6) AS BIGINT)
             AS pooled_overlap_e6
    FROM per_doc GROUP BY source
    """,
)
def doc_contamination_rate(spark, sf_dir):
    """Per-source contamination report: how much of each source's
    shingle mass overlaps the eval set, and how many docs cross the
    20% flag threshold — the number a curation run gates on."""
    c = _contam(spark, sf_dir)
    return c.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(
            (F.col("overlap_ratio") >= 0.2).cast("long")
        ).alias("n_contaminated"),
        _e(
            F.sum("n_hit").cast("double") / F.sum("n_shingles").cast("double"), 6
        ).alias("pooled_overlap_e6"),
    )


def _simhash_sql_cte(n_bits: int = 60, bands: int = 4) -> str:
    """DuckDB mirror of dedup._simhash_expr over md5_60 word shingles."""
    bit_terms = " + ".join(
        f"(CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h >> {j}) & 1 = 1 "
        f"THEN 1 ELSE -1 END)) > 0 THEN (CAST(1 AS BIGINT) << {j}) ELSE CAST(0 AS BIGINT) END)"
        for j in range(n_bits)
    )
    r = n_bits // bands
    return f"""
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM documents
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(ws) - 2, 1) + 1),
               i -> array_to_string(ws[i:i+2], ' '))) AS sh3
      FROM w
    ),
    hv AS (
      SELECT doc_id,
             list_transform(sh3,
               s -> CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT)) AS hs
      FROM sh
    ),
    sig AS (SELECT doc_id, {bit_terms} AS simhash FROM hv),
    bandrows AS (
      SELECT doc_id, simhash, band,
             (simhash >> (band * {r})) & {(1 << r) - 1} AS bits
      FROM sig, (SELECT unnest(range(0, {bands})) AS band)
    ),
    sized AS (
      SELECT * FROM (
        SELECT *, count(*) OVER (PARTITION BY band, bits) AS bsz FROM bandrows
      ) WHERE bsz >= 2 AND bsz <= 1000
    )
    """


@q(
    "doc_simhash_pairs",
    _simhash_sql_cte()
    + """
    SELECT DISTINCT a.doc_id AS a, b.doc_id AS b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM sized a JOIN sized b ON a.band = b.band AND a.bits = b.bits
    WHERE a.doc_id < b.doc_id
      AND bit_count(xor(a.simhash, b.simhash)) <= 16
    """,
)
def doc_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs with a REAL cross-engine oracle: the
    md5_60 hash is computable in both engines, so signature bits,
    banding, bucketing, and the Hamming verify are all value-checked."""
    return dedup.simhash_candidates(
        _docs(spark, sf_dir), n_bits=60, bands=4, max_hamming=16
    )


# ---------------------------------------------------------------------------
# end-to-end curation pipeline: quality gate → exact dedup → per-source
# yield. The composition query a real training-data pipeline runs first.
# ---------------------------------------------------------------------------

@q(
    "doc_curation_pipeline",
    """
    WITH w AS (
      SELECT *, string_split_regex(trim(text), '\\s+') AS ws FROM documents
    ),
    scored AS (
      SELECT source, text, len(ws) AS n_words,
             CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) AS ttr
      FROM w
    ),
    kept AS (
      SELECT * FROM scored WHERE n_words >= 8 AND ttr >= 0.4
    ),
    deduped AS (
      SELECT source, md5(text) AS h, count(*) AS n_copies
      FROM kept GROUP BY 1, 2
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS docs_kept,
           CAST(sum(n_copies) - count(*) AS BIGINT) AS dups_dropped,
           CAST(ROUND(avg(n_copies) * 1e6) AS BIGINT) AS dup_factor_e6
    FROM deduped GROUP BY source
    """,
)
def doc_curation_pipeline(spark, sf_dir):
    """Quality filter (length + type-token ratio) → exact dedup →
    per-source yield report: the standard first pass of corpus
    curation, composed from textops + dedup primitives and checked
    end-to-end against an independent engine."""
    d = textops.with_quality(_docs(spark, sf_dir))
    kept = d.where((F.col("n_words") >= 8) & (F.col("ttr") >= 0.4))
    groups = kept.groupBy(
        "source", F.md5("text").alias("h")
    ).agg(F.count("*").alias("n_copies"))
    return groups.groupBy("source").agg(
        F.count("*").alias("docs_kept"),
        (F.sum("n_copies") - F.count("*")).cast("bigint").alias("dups_dropped"),
        _e(F.avg("n_copies"), 6).alias("dup_factor_e6"),
    )


@q(
    "doc_curation_v2",
    """
    WITH w AS (
      SELECT doc_id, source, text,
             string_split_regex(trim(text), '\\s+') AS ws
      FROM documents
    ),
    q AS (
      SELECT doc_id, source, text,
             len(ws) AS n_words,
             CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) AS ttr,
             list_transform(range(1, greatest(len(ws) - 2, 1) + 1),
               i -> array_to_string(ws[i:i+2], ' ')) AS s3raw
      FROM w
    ),
    rep AS (
      SELECT *, CAST(len(s3raw) - len(list_distinct(s3raw)) AS DOUBLE)
                / len(s3raw) AS dup3,
             list_distinct(s3raw) AS sh3
      FROM q
    ),
    ev AS (
      SELECT DISTINCT CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) AS h
      FROM (SELECT unnest(sh3) AS s FROM rep WHERE doc_id % 37 = 0)
    ),
    corpus AS (
      SELECT doc_id, CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) AS h
      FROM (SELECT doc_id, unnest(sh3) AS s FROM rep WHERE doc_id % 37 <> 0)
    ),
    contam AS (
      SELECT c.doc_id, count(*) AS n_sh, count(e.h) AS n_hit
      FROM corpus c LEFT JOIN ev e ON c.h = e.h GROUP BY 1
    ),
    kept AS (
      SELECT r.source, r.text
      FROM rep r JOIN contam c ON r.doc_id = c.doc_id
      WHERE r.doc_id % 37 <> 0
        AND r.n_words >= 8 AND r.ttr >= 0.4
        AND r.dup3 < 0.3
        AND CAST(c.n_hit AS DOUBLE) / c.n_sh < 0.2
    ),
    dd AS (SELECT source, md5(text) AS h, count(*) AS n FROM kept GROUP BY 1, 2)
    SELECT source,
           CAST(count(*) AS BIGINT) AS docs_kept,
           CAST(sum(n) - count(*) AS BIGINT) AS dups_dropped
    FROM dd GROUP BY source
    """,
)
def doc_curation_v2(spark, sf_dir):
    """Curation pipeline v2 — the full round-4 gate chain composed:
    quality (length + TTR) → repetition (dup-3-gram < 0.3) →
    decontamination (eval overlap < 0.2 against the doc_id%37 eval
    slice) → exact dedup → per-source yield. Every gate is a
    previously-oracled primitive; this pair value-checks their
    COMPOSITION end-to-end."""
    docs = _docs(spark, sf_dir)
    d = textops.with_repetition(textops.with_quality(docs))
    corpus = d.where(F.col("doc_id") % 37 != 0)
    ev = docs.where(F.col("doc_id") % 37 == 0)
    c = dedup.contamination(
        corpus.select("doc_id", "source", "text"), ev, hash_mode="md5"
    ).select("doc_id", "overlap_ratio")
    kept = (
        corpus.join(c, "doc_id")
        .where(
            (F.col("n_words") >= 8)
            & (F.col("ttr") >= 0.4)
            & (F.col("dup3_frac") < 0.3)
            & (F.col("overlap_ratio") < 0.2)
        )
    )
    groups = kept.groupBy("source", F.md5("text").alias("h")).agg(
        F.count("*").alias("n")
    )
    return groups.groupBy("source").agg(
        F.count("*").alias("docs_kept"),
        (F.sum("n") - F.count("*")).cast("bigint").alias("dups_dropped"),
    )


# ---------------------------------------------------------------------------
# codec round-trip as an identity query (C1-C4)
# ---------------------------------------------------------------------------

@q(
    "codec_roundtrip_events",
    """
    SELECT event_type AS series_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
           value
    FROM events
    """,
)
def codec_roundtrip_events(spark, sf_dir):
    raw = _ev(spark, sf_dir).select(
        F.lit("events").alias("source"),
        F.col("event_type").alias("series_id"),
        F.col("ts").alias("event_ts"),
        F.col("value"),
    )
    segs = codec.encode_segments(raw, "1d")
    back = codec.decode_segments(segs)
    return back.select(
        "series_id",
        F.date_format("event_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
        "value",
    )


# ---------------------------------------------------------------------------
# multimodal: REAL container decode. Spark synthesizes a valid 24-bit
# BMP per document and parses it back byte-for-byte (struct.unpack in
# the Arrow batch); the oracle mirrors the documented byte math (width/
# height closed forms + 4-byte row alignment + 54-byte headers), so the
# decoded dimensions and file sizes are value-checked cross-engine.
# ---------------------------------------------------------------------------

@q(
    "mm_binary_features",
    """
    WITH dims AS (
      SELECT doc_id,
             1 + strlen(text) % 64 AS w,
             1 + doc_id % 48 AS h
      FROM documents
    )
    SELECT doc_id,
           CAST(54 + h * (((3 * w + 3) // 4) * 4) AS BIGINT) AS n_bytes,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(24 AS BIGINT) AS bpp
    FROM dims
    """,
)
def mm_binary_features(spark, sf_dir):
    b = multimodal.docs_as_bmp(_docs(spark, sf_dir))
    return multimodal.extract_features(b).select(
        "doc_id", "n_bytes", "width", "height", "bpp"
    )


# ---------------------------------------------------------------------------
# §2.9 streaming: the window-agg driver twin (verdict-r4 item 8).
# The ONLY streaming-executed pair: the Spark side actually runs a
# Structured Streaming query (file source → watermarked tumbling-window
# rollup → APPEND-mode memory sink, availableNow trigger over a fixed
# file set), so the cross-engine check covers real append semantics:
# only windows finalized by the terminal watermark are emitted.
# Emission rule (pinned empirically + by this oracle):
#   window_end <= max(event_ts) − delay
# which DuckDB mirrors as w_epoch + 60 <= max(epoch_s) − 7200.
# ---------------------------------------------------------------------------

@q(
    "ts_stream_rollup_1m",
    _synth_cte()
    + """
    , roll AS (
      SELECT source,
             epoch_s - epoch_s % 60 AS w_epoch,
             count(list_aggregate(v, 'avg')) AS cnt,
             CAST(ROUND(sum(list_aggregate(v, 'avg')) * 1e4) AS BIGINT) AS sum_e4,
             CAST(ROUND(min(list_aggregate(v, 'avg')) * 1e6) AS BIGINT) AS min_e6,
             CAST(ROUND(max(list_aggregate(v, 'avg')) * 1e6) AS BIGINT) AS max_e6
      FROM vals GROUP BY 1, 2
    ),
    wm AS (SELECT max(epoch_s) - 7200 AS w FROM vals)
    SELECT r.source, r.w_epoch, r.cnt, r.sum_e4, r.min_e6, r.max_e6
    FROM roll r, wm WHERE r.w_epoch + 60 <= wm.w
    """,
)
def ts_stream_rollup_1m(spark, sf_dir):
    """streaming.stream_window_agg run to completion (availableNow)
    over the deterministic synth fixture written as a fixed parquet
    file set; the final append-mode output must equal the batch rollup
    restricted to watermark-finalized windows — computed independently
    by DuckDB from the same recurrences."""
    import tempfile
    import uuid

    from tokens_ts import streaming

    seq = synth.sequences(spark, SYNTH_K, SYNTH_S)
    d = tempfile.mkdtemp(prefix="stream_pair_")
    seq.write.mode("overwrite").parquet(d + "/in")
    schema = spark.read.parquet(d + "/in").schema
    src = spark.readStream.schema(schema).parquet(d + "/in")
    out = streaming.stream_window_agg(
        src, watermark="2 hours", window="1 minute"
    )
    name = "stream_rollup_" + uuid.uuid4().hex[:8]
    sq = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", d + "/ck")
        .start()
    )
    sq.awaitTermination(600)
    return spark.table(name).select(
        "source",
        F.unix_timestamp("window_start").alias("w_epoch"),
        "cnt",
        _e("sum", 4).alias("sum_e4"),
        _e("min", 6).alias("min_e6"),
        _e("max", 6).alias("max_e6"),
    )


# ---------------------------------------------------------------------------
# text → REAL BPE ids → concat-and-chunk packing → 17-bit token codec
# round trip — the full training-data assembly line composed end-to-end
# (verdict-r4 item 9). The oracle re-derives the BPE id streams from
# the merge table + vocab, rebuilds the global (source, doc_id)
# concatenation with a window prefix-sum, and md5s each chunk's id
# list; Spark must match AFTER its chunks additionally round-trip
# through encode/decode_token_blobs — so a codec bit-flip, a packing
# reorder, or a vocab drift all fail this one pair.
# ---------------------------------------------------------------------------

_BPE_PACK_L = 256


def _bpe_pack_sql() -> str:
    chain, prev = _bpe_chain()
    vocab = textops.bpe_vocab()
    vals = ", ".join(
        f"('{tok.replace(chr(39), chr(39) * 2)}', {vid})"
        for tok, vid in sorted(vocab.items(), key=lambda kv: kv[1])
    )
    return f"""
    WITH chunks AS (
      SELECT doc_id,
             unnest(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS ch,
             generate_subscripts(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'), 1) AS pos
      FROM documents
    ),
    {chain},
    enc AS (SELECT doc_id, pos, trim(s) AS etoks FROM {prev} WHERE trim(s) <> ''),
    toks AS (
      SELECT doc_id, pos AS cpos,
             unnest(string_split(etoks, ' ')) AS tok,
             generate_subscripts(string_split(etoks, ' '), 1) AS tpos
      FROM enc
    ),
    vocab(tok, id) AS (VALUES {vals}),
    ids AS (
      SELECT t.doc_id, t.cpos, t.tpos, COALESCE(v.id, 0) AS id
      FROM toks t LEFT JOIN vocab v USING (tok)
    ),
    streams AS (
      SELECT doc_id, list(id ORDER BY cpos, tpos) AS ids FROM ids GROUP BY doc_id
    ),
    docs2 AS (
      SELECT d.source, d.doc_id, s.ids, len(s.ids) AS n
      FROM documents d JOIN streams s USING (doc_id)
    ),
    offs AS (
      SELECT source, doc_id, ids,
             COALESCE(sum(n) OVER (
               ORDER BY source, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS off0
      FROM docs2 WHERE n > 0
    ),
    flat AS (
      SELECT off0 + generate_subscripts(ids, 1) - 1 AS gpos,
             unnest(ids) AS id
      FROM offs
    )
    SELECT CAST(gpos // {_BPE_PACK_L} AS BIGINT) AS chunk_id,
           CAST(count(*) AS BIGINT) AS n_filled,
           md5(string_agg(CAST(id AS VARCHAR), ',' ORDER BY gpos)) AS tok_md5
    FROM flat GROUP BY 1
    """


@q("doc_bpe_pack_roundtrip", _bpe_pack_sql())
def doc_bpe_pack_roundtrip(spark, sf_dir):
    """with_bpe_ids → pack_tokens(256) → encode_token_blobs →
    decode_token_blobs; per packed chunk: id count + md5 over the
    comma-joined decoded ids. Token-array equality holds through the
    tokenizer, the packer, AND the bit-packing codec — cross-engine."""
    seq = textops.with_bpe_ids(_docs(spark, sf_dir))
    packed = packing.pack_tokens(seq, chunk_len=_BPE_PACK_L)
    as_seq = packed.select(
        F.col("chunk_id").cast("string").alias("doc_id"),
        F.lit("packed").alias("source"),
        F.col("n_filled").cast("int").alias("n_tok"),
        "tokens",
    )
    dec = codec.decode_token_blobs(codec.encode_token_blobs(as_seq))
    return dec.select(
        F.col("doc_id").cast("bigint").alias("chunk_id"),
        F.size("tokens").cast("bigint").alias("n_filled"),
        F.md5(
            F.concat_ws(",", F.col("tokens").cast("array<string>"))
        ).alias("tok_md5"),
    )


# ---------------------------------------------------------------------------
# Retention ENFORCEMENT cross-engine pair (round 5): the write-side
# operator itself — not just the read-side filter twin. Spark builds a
# deterministic 6-day × 2-source raw warehouse in a temp dir, runs
# tiers.enforce_retention (Hadoop-FS whole-partition drops + lineage
# row), and returns what SURVIVES on disk; DuckDB generates the same
# grid and applies the documented day-granularity rule
# (day < date(now − keep) drops) arithmetically. If enforcement ever
# dropped a boundary day, kept a stale one, or rewrote surviving rows,
# the per-day counts/sums here diverge.
# ---------------------------------------------------------------------------

_RET_DAYS, _RET_PTS = 6, 48  # points per (source, day)


@q(
    "ts_retention_enforced",
    f"""
    WITH pts AS (
      SELECT unnest(range(0, {_RET_DAYS} * 2 * {_RET_PTS})) AS id
    ),
    g AS (
      SELECT id % 2 AS s,
             (id // 2) % {_RET_DAYS} AS d,
             (id // (2 * {_RET_DAYS})) AS p,
             CAST((id * 2654435761) % 1000000 AS DOUBLE) / 1e3 AS value
      FROM pts
    )
    SELECT CASE WHEN s = 0 THEN 'srcA' ELSE 'srcB' END AS source,
           CAST({C.T0_EPOCH} + d * 86400 AS BIGINT) AS day_epoch,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(ROUND(sum(value) * 1e3) AS BIGINT) AS sum_e3
    FROM g
    WHERE d >= {_RET_DAYS} - 3  -- keep '3 days' from now = t0 + {_RET_DAYS} days
    GROUP BY 1, 2
    """,
)
def ts_retention_enforced(spark, sf_dir):
    """Enforce a 3-day keep policy on a synthesized 6-day raw table,
    then report what remains per (source, day) — the on-disk state
    after whole-partition drops, value-checked cross-engine."""
    import tempfile

    from tokens_ts.io.catalog import Catalog

    n = _RET_DAYS * 2 * _RET_PTS
    df = spark.range(0, n).select(
        F.when(F.col("id") % 2 == 0, "srcA").otherwise("srcB").alias("source"),
        F.lit("series_0").alias("series_id"),
        F.timestamp_seconds(
            F.lit(C.T0_EPOCH)
            + ((F.col("id") / 2).cast("bigint") % _RET_DAYS) * 86400
            + (F.col("id") / (2 * _RET_DAYS)).cast("bigint") * 60
        ).alias("event_ts"),
        (((F.col("id") * 2654435761) % 1_000_000) / 1e3).alias("value"),
    ).withColumn("day", F.to_date("event_ts"))

    root = tempfile.mkdtemp(prefix="ret_pair_")
    cat = Catalog(root)
    cat.overwrite_partitions(df, "raw", ["source", "day"])
    now_epoch = C.T0_EPOCH + _RET_DAYS * 86400
    now = spark.sql(
        f"SELECT CAST(timestamp_seconds({now_epoch}) AS STRING) AS s"
    ).collect()[0]["s"]
    tiers.enforce_retention(spark, cat, {"raw": "3 days"}, now=now)
    return (
        cat.read(spark, "raw")
        .groupBy("source", "day")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            _e(F.sum("value"), 3).alias("sum_e3"),
        )
        .select(
            "source",
            (F.unix_timestamp(F.col("day").cast("timestamp")))
            .cast("bigint")
            .alias("day_epoch"),
            "n_rows",
            "sum_e3",
        )
    )


# ---------------------------------------------------------------------------
# Lloyd-refined IVF — full cross-engine pair (round 5). The DuckDB
# oracle UNROLLS the deterministic 2-iteration k-means: seed cells =
# first 8 vectors, assign = e6-rounded max-cosine (ties → lowest cid),
# update = per-cell per-dim avg with empty cells keeping their
# centroid, then runs the same nprobe=3 top-k over the refined cells.
# Everything is closed-form, so both engines must agree bit-for-bit on
# the e6-rounded output.
# ---------------------------------------------------------------------------


def _ivf_refined_sql() -> str:
    sim = (
        "CAST(ROUND(list_sum(list_transform(range(1, 65), i -> ev.v[i] * c.cv[i]))"
        " / (sqrt(list_sum(list_transform(ev.v, x -> x * x)))"
        " * sqrt(list_sum(list_transform(c.cv, x -> x * x)))) * 1e6) AS BIGINT)"
    )

    def assign(cents, out):
        return f"""
    {out}_s AS (
      SELECT ev.vec_id AS nid, c.cid, {sim} AS s
      FROM e ev CROSS JOIN {cents} c
    ),
    {out} AS (
      SELECT nid, cid FROM (
        SELECT nid, cid,
               row_number() OVER (PARTITION BY nid ORDER BY s DESC, cid) AS r
        FROM {out}_s
      ) WHERE r = 1
    )"""

    def update(assign_name, prev_cents, out):
        return f"""
    {out}_m AS (
      SELECT a.cid, t.i, avg(ev.v[t.i]) AS m
      FROM {assign_name} a
      JOIN e ev ON ev.vec_id = a.nid
      CROSS JOIN (SELECT unnest(range(1, 65)) AS i) t
      GROUP BY 1, 2
    ),
    {out}_l AS (
      SELECT cid, list(m ORDER BY i) AS cv FROM {out}_m GROUP BY cid
    ),
    {out} AS (
      SELECT p.cid, COALESCE(l.cv, p.cv) AS cv
      FROM {prev_cents} p LEFT JOIN {out}_l l USING (cid)
    )"""

    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    c0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
    {assign("c0", "a0")},
    {update("a0", "c0", "c1")},
    {assign("c1", "a1")},
    {update("a1", "c1", "c2")},
    {assign("c2", "afinal")},
    probes AS (
      SELECT nid AS qid, cid FROM (
        SELECT ev.vec_id AS nid, c.cid, {sim} AS s,
               row_number() OVER (
                 PARTITION BY ev.vec_id ORDER BY {sim} DESC, c.cid
               ) AS r
        FROM e ev CROSS JOIN c2 c WHERE ev.vec_id < 20
      ) WHERE r <= 3
    ),
    cand AS (
      SELECT DISTINCT p.qid, a.nid
      FROM probes p JOIN afinal a ON a.cid = p.cid
      WHERE a.nid <> p.qid
    ),
    scored AS (
      SELECT c.qid, c.nid,
             CAST(ROUND(
               list_sum(list_transform(range(1, 65), i -> qe.v[i] * ne.v[i]))
               / (sqrt(list_sum(list_transform(qe.v, x -> x * x)))
                * sqrt(list_sum(list_transform(ne.v, x -> x * x))))
               * 1e6) AS BIGINT) AS sim_e6
      FROM cand c
      JOIN e qe ON qe.vec_id = c.qid
      JOIN e ne ON ne.vec_id = c.nid
    )
    SELECT qid, nid, rank, sim_e6 FROM (
      SELECT qid, nid, sim_e6,
             row_number() OVER (PARTITION BY qid ORDER BY sim_e6 DESC, nid) AS rank
      FROM scored
    ) WHERE rank <= 3
    """


@q("emb_ann_ivf_refined", _ivf_refined_sql())
def emb_ann_ivf_refined(spark, sf_dir):
    """IVF top-k over Lloyd-refined cells (2 deterministic iterations,
    simsearch.lloyd_centroids) — centroid refinement, assignment, probe
    selection and ranking ALL mirrored in DuckDB."""
    emb = _emb(spark, sf_dir)
    cents = simsearch.lloyd_centroids(emb, n_centroids=8, n_iter=2)
    return simsearch.ivf_topk(
        emb, query_ids=list(range(20)), k=3, n_centroids=8, nprobe=3,
        centroids=cents,
    )


# ---------------------------------------------------------------------------
# Round-5 analytics operators over the events table: arbitrary-interval
# rollup, finite-horizon EWMA, counter-reset rate, native session
# windows (tokens_ts/analytics.py, tiers.rollup_interval).
# ---------------------------------------------------------------------------

from tokens_ts import analytics
from tokens_ts.queries_driver import _events_raw, _fmt


@q(
    "ts_rollup_5m_interval",
    """
    SELECT event_type AS series_id,
           strftime(to_timestamp(epoch(ts) - epoch(ts) % 300),
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           count(value) AS cnt,
           CAST(ROUND(sum(value) * 1e4) AS BIGINT) AS sum_e4,
           min(value) AS min,
           max(value) AS max
    FROM events
    GROUP BY 1, 2
    """,
)
def ts_rollup_5m_interval(spark, sf_dir):
    """tiers.rollup_interval('5 minutes') — the arbitrary-width
    continuous-aggregate surface (time_bucket analog); F.window's
    epoch-aligned buckets vs DuckDB's epoch arithmetic."""
    t = tiers.rollup_interval(_events_raw(spark, sf_dir), "5 minutes")
    return t.select(
        "series_id",
        _fmt("window_start").alias("window_start"),
        "cnt",
        _e("sum", 4).alias("sum_e4"),
        "min",
        "max",
    )


def _ewma_sql(alpha: float = 0.25, horizon: int = 8) -> str:
    """DuckDB mirror of analytics.with_ewma with the IDENTICAL
    left-fold term order, so the doubles agree bit-for-bit."""
    decay = 1.0 - alpha
    num = "(value * 1.0)"
    den = "(CASE WHEN value IS NOT NULL THEN 1.0 END)"
    for k in range(1, horizon):
        wk = repr(decay**k)
        num = f"({num} + COALESCE(lag(value, {k}) OVER w * {wk}, 0.0))"
        den = (
            f"({den} + COALESCE(CASE WHEN lag(value, {k}) OVER w "
            f"IS NOT NULL THEN {wk} END, 0.0))"
        )
    return f"""
    SELECT event_id,
           CAST(ROUND({num} / {den} * 1e6) AS BIGINT) AS ewma_e6
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    """


@q("ts_ewma", _ewma_sql())
def ts_ewma(spark, sf_dir):
    """Finite-horizon EWMA (W=8, α=0.25) per series — the bounded-
    window form that scales (no sequential scan, no (1−α)^−n
    overflow); per-event smoothed value, fold order pinned so both
    engines produce the identical double before e6 rounding."""
    ev = _ev(spark, sf_dir)
    out = analytics.with_ewma(
        ev, keys=["event_type"], ts_col="ts", value_col="value",
        alpha=0.25, horizon=8, order_cols=["event_id"],
    )
    return out.select("event_id", _e("ewma", 6).alias("ewma_e6"))


@q(
    "ts_counter_rate",
    """
    WITH d AS (
      SELECT event_id, value,
             lag(value) OVER w AS pv,
             (epoch_us(ts) - epoch_us(lag(ts) OVER w)) / 1e6 AS dt_s
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    )
    SELECT event_id,
           CAST(CASE WHEN pv IS NOT NULL THEN ROUND(
             (CASE WHEN value - pv >= 0 THEN value - pv ELSE value END) * 1e4
           ) END AS BIGINT) AS increase_e4,
           CAST(CASE WHEN pv IS NOT NULL AND dt_s > 0 THEN ROUND(
             (CASE WHEN value - pv >= 0 THEN value - pv ELSE value END)
             / dt_s * 1e4
           ) END AS BIGINT) AS rate_e4
    FROM d
    """,
)
def ts_counter_rate(spark, sf_dir):
    """Prometheus-style increase/rate with counter-reset handling
    (negative delta → the counter restarted, increase = new value) —
    per-event, reset branch exercised heavily by the non-monotonic
    fixture values."""
    ev = _ev(spark, sf_dir)
    out = analytics.with_counter_rate(
        ev, keys=["event_type"], ts_col="ts", value_col="value",
        order_cols=["event_id"],
    )
    return out.select(
        "event_id",
        _e("increase", 4).alias("increase_e4"),
        _e("rate_per_s", 4).alias("rate_e4"),
    )


@q(
    "ts_session_window_native",
    """
    WITH lagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT user_id, ts,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM lagged
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts) + INTERVAL 30 MINUTE,
                    '%Y-%m-%d %H:%M:%S') AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
)
def ts_session_window_native(spark, sf_dir):
    """Native F.session_window sessions (gap 30 min, end = last event
    + gap, only a STRICTLY larger gap splits) vs an independent
    gaps-and-islands derivation — the batch twin of stream_sessionize
    as ONE built-in grouping."""
    ev = _ev(spark, sf_dir)
    out = analytics.session_windows(
        ev, keys=["user_id"], ts_col="ts", gap="30 minutes"
    )
    return out.select(
        "user_id",
        _fmt("session_start").alias("session_start"),
        _fmt("session_end").alias("session_end"),
        "n_events",
    )


# ---------------------------------------------------------------------------
# Tier-routed serving pair (round 5): synthesize raw, build the t1m
# tier in a temp warehouse, answer a 15-minute-resolution range query
# THROUGH tiers.query_windows (router → partition-pruned tier scan →
# cascade-merge → finish); DuckDB answers the same query directly from
# the generated points. Any routing, pruning, merge, or finisher bug
# diverges the counts/means.
# ---------------------------------------------------------------------------


@q(
    "ts_tier_routed_query",
    f"""
    WITH pts AS (SELECT unnest(range(0, 2 * 1440)) AS id),
    g AS (
      SELECT CASE WHEN id % 2 = 0 THEN 'srcA' ELSE 'srcB' END AS source,
             {C.T0_EPOCH} + (id // 2) * 60 AS epoch_s,
             CAST((id * 2654435761) % 1000000 AS DOUBLE) / 1e3 AS value
      FROM pts
    )
    SELECT source,
           CAST(epoch_s - epoch_s % 900 AS BIGINT) AS w_epoch,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(ROUND(sum(value) * 1e4) AS BIGINT) AS sum_e4,
           CAST(ROUND(avg(value) * 1e6) AS BIGINT) AS mean_e6
    FROM g
    WHERE epoch_s >= {C.T0_EPOCH} + 3600 AND epoch_s < {C.T0_EPOCH} + 10800
    GROUP BY 1, 2
    """,
)
def ts_tier_routed_query(spark, sf_dir):
    """One day of minute points → t1m tier table → query_windows over
    [t0+1h, t0+3h) at 15-min resolution. The routed path must equal
    DuckDB's direct aggregation of the same generated points."""
    import tempfile

    from tokens_ts.io.catalog import Catalog

    raw = spark.range(0, 2 * 1440).select(
        F.when(F.col("id") % 2 == 0, "srcA").otherwise("srcB").alias("source"),
        F.lit("series_0").alias("series_id"),
        F.timestamp_seconds(
            F.lit(C.T0_EPOCH) + (F.col("id") / 2).cast("bigint") * 60
        ).alias("event_ts"),
        (((F.col("id") * 2654435761) % 1_000_000) / 1e3).alias("value"),
    )
    root = tempfile.mkdtemp(prefix="route_pair_")
    cat = Catalog(root)
    t1m = tiers.rollup(raw, "1m").withColumn("day", F.to_date("window_start"))
    cat.overwrite_partitions(t1m, "t1m", ["source", "day"])
    start = spark.sql(
        f"SELECT CAST(timestamp_seconds({C.T0_EPOCH + 3600}) AS STRING) s"
    ).collect()[0]["s"]
    end = spark.sql(
        f"SELECT CAST(timestamp_seconds({C.T0_EPOCH + 10800}) AS STRING) s"
    ).collect()[0]["s"]
    out = tiers.query_windows(spark, cat, start, end, resolution_s=900)
    return out.select(
        "source",
        F.unix_timestamp("window_start").alias("w_epoch"),
        "cnt",
        _e("sum", 4).alias("sum_e4"),
        _e("mean", 6).alias("mean_e6"),
    )


# ---------------------------------------------------------------------------
# Round-5b analytics operators: time-weighted average, regression
# trend, reset aggregation, seasonal-baseline z-score, heartbeat
# uptime, level-shift detection (tokens_ts/analytics.py) — the
# TimescaleDB/PromQL analytics surface beyond plain rollups.
# ---------------------------------------------------------------------------


@q(
    "ts_twa_1h",
    """
    WITH seg AS (
      SELECT event_type, date_trunc('hour', ts) AS b, value,
             epoch_us(ts) AS t,
             lead(value) OVER w AS nv,
             epoch_us(lead(ts) OVER w) AS nt
      FROM events WHERE value IS NOT NULL
      WINDOW w AS (PARTITION BY event_type, date_trunc('hour', ts)
                   ORDER BY ts)
    )
    SELECT event_type AS series_id,
           strftime(b, '%Y-%m-%d %H:%M:%S') AS window_start,
           count(value) AS n_samples,
           CAST(ROUND(CASE
             WHEN (max(t) - min(t)) / 1e6 > 0
             THEN sum((value + nv) / 2 * ((nt - t) / 1e6))
                  / ((max(t) - min(t)) / 1e6)
             ELSE avg(value) END * 1e6) AS BIGINT) AS twa_e6
    FROM seg GROUP BY 1, 2
    """,
)
def ts_twa_1h(spark, sf_dir):
    """Time-weighted average per series per hour — trapezoidal
    integral over irregular samples ÷ observed span (TimescaleDB
    time_weight('Linear')); single-sample/zero-span buckets degrade
    to the plain mean (both engines mirror the rule)."""
    out = analytics.time_weighted_avg(
        _ev(spark, sf_dir), keys=["event_type"], ts_col="ts",
        value_col="value", interval="1 hour",
    )
    return out.select(
        F.col("event_type").alias("series_id"),
        _fmt("window_start").alias("window_start"),
        "n_samples",
        _e("twa", 6).alias("twa_e6"),
    )


@q(
    "ts_trend_1h",
    """
    WITH seg AS (
      SELECT event_type, date_trunc('hour', ts) AS b,
             (epoch_us(ts) - epoch_us(date_trunc('hour', ts))) / 1e6 AS x,
             value AS y
      FROM events WHERE value IS NOT NULL
    ),
    g AS (
      SELECT event_type, b,
             CAST(count(*) AS DOUBLE) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM seg GROUP BY 1, 2
    )
    SELECT event_type AS series_id,
           strftime(b, '%Y-%m-%d %H:%M:%S') AS window_start,
           CAST(n AS BIGINT) AS n_samples,
           CAST(CASE WHEN n * sxx - sx * sx != 0 THEN ROUND(
             (n * sxy - sx * sy) / (n * sxx - sx * sx) * 1e6
           ) END AS BIGINT) AS slope_e6,
           CAST(CASE WHEN n * sxx - sx * sx != 0 THEN ROUND(
             (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n * 1e4
           ) END AS BIGINT) AS intercept_e4
    FROM g
    """,
)
def ts_trend_1h(spark, sf_dir):
    """Least-squares slope + intercept per series per hour (PromQL
    deriv analog). Normal equations written as explicit sum
    aggregates in BOTH engines with x = relative seconds (epoch-scale
    x would cancel catastrophically in the n·Σx² − (Σx)² term)."""
    out = analytics.trend(
        _ev(spark, sf_dir), keys=["event_type"], ts_col="ts",
        value_col="value", interval="1 hour",
    )
    return out.select(
        F.col("event_type").alias("series_id"),
        _fmt("window_start").alias("window_start"),
        "n_samples",
        _e("slope_per_s", 6).alias("slope_e6"),
        _e("intercept", 4).alias("intercept_e4"),
    )


@q(
    "ts_resets_1h",
    """
    WITH d AS (
      SELECT event_type, ts, value,
             lag(value) OVER w AS pv
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    )
    SELECT event_type AS series_id,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           CAST(sum(CASE WHEN value - pv < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_resets,
           CAST(ROUND(sum(CASE WHEN pv IS NULL THEN NULL
                 WHEN value - pv >= 0 THEN value - pv
                 ELSE value END) * 1e4) AS BIGINT) AS total_increase_e4,
           CAST(count(*) AS BIGINT) AS n_points
    FROM d GROUP BY 1, 2
    """,
)
def ts_resets_1h(spark, sf_dir):
    """PromQL resets()/increase() rolled to hours: deltas over the
    FULL series order (first delta of an hour reaches into the
    previous hour — Prometheus's continuity rule), grouped by the
    current point's bucket."""
    out = analytics.reset_stats(
        _ev(spark, sf_dir), keys=["event_type"], ts_col="ts",
        value_col="value", interval="1 hour", order_cols=["event_id"],
    )
    return out.select(
        F.col("event_type").alias("series_id"),
        _fmt("window_start").alias("window_start"),
        "n_resets",
        _e("total_increase", 4).alias("total_increase_e4"),
        "n_points",
    )


@q(
    "ts_seasonal_z",
    """
    WITH prof AS (
      SELECT event_type, hour(ts) AS hod,
             avg(value) AS m, stddev_pop(value) AS s
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT e.event_id,
           CAST(hour(e.ts) AS BIGINT) AS hod,
           CAST(CASE WHEN p.s > 0 THEN ROUND((e.value - p.m) / p.s * 1e4)
                END AS BIGINT) AS z_e4
    FROM events e LEFT JOIN prof p
      ON e.event_type = p.event_type AND hour(e.ts) = p.hod
    """,
)
def ts_seasonal_z(spark, sf_dir):
    """Hour-of-day seasonal-baseline z-score per event: the profile
    (keys×24 rows) is broadcast back onto the facts, catching
    'normal at 3pm, anomalous at 3am' which the global z-score pair
    (ts_anomaly_zscore) cannot."""
    out = analytics.seasonal_zscore(
        _ev(spark, sf_dir), keys=["event_type"], ts_col="ts",
        value_col="value",
    )
    return out.select(
        "event_id",
        F.col("hod").cast("bigint").alias("hod"),
        _e("seasonal_z", 4).alias("z_e4"),
    )


@q(
    "ts_heartbeat_daily",
    """
    WITH seg AS (
      SELECT user_id, date_trunc('day', ts) AS d,
             epoch_us(ts) AS t,
             epoch_us(lead(ts) OVER w) AS nt
      FROM events
      WINDOW w AS (PARTITION BY user_id, date_trunc('day', ts)
                   ORDER BY ts)
    )
    SELECT user_id,
           strftime(d, '%Y-%m-%d %H:%M:%S') AS day,
           CAST(count(*) AS BIGINT) AS n_beats,
           CAST(ROUND(sum(CASE
             WHEN nt IS NOT NULL THEN least((nt - t) / 1e6, 3600.0)
             ELSE least(3600.0,
                        (epoch_us(d + INTERVAL 1 DAY) - t) / 1e6)
           END) * 1e4) AS BIGINT) AS live_s_e4
    FROM seg GROUP BY 1, 2
    """,
)
def ts_heartbeat_daily(spark, sf_dir):
    """Heartbeat/uptime per user per day (TimescaleDB heartbeat_agg
    analog): each event keeps the user live for 1h; chained coverage
    capped at the day boundary — the bucket-local rule both engines
    pin."""
    out = analytics.heartbeat_uptime(
        _ev(spark, sf_dir), keys=["user_id"], ts_col="ts",
        tolerance_s=3600.0,
    )
    return out.select(
        "user_id",
        _fmt("day").alias("day"),
        "n_beats",
        _e("live_s", 4).alias("live_s_e4"),
    )


@q(
    "ts_level_shift",
    """
    SELECT event_id,
           CAST(CASE WHEN count(value) OVER tr = 16
                      AND count(value) OVER ld = 16
                THEN ROUND((avg(value) OVER ld - avg(value) OVER tr) * 1e4)
                END AS BIGINT) AS shift_e4
    FROM events
    WINDOW tr AS (PARTITION BY event_type ORDER BY ts, event_id
                  ROWS BETWEEN 15 PRECEDING AND CURRENT ROW),
           ld AS (PARTITION BY event_type ORDER BY ts, event_id
                  ROWS BETWEEN 1 FOLLOWING AND 16 FOLLOWING)
    """,
)
def ts_level_shift(spark, sf_dir):
    """Level-shift (changepoint candidate) score per event: mean of
    the next 16 values minus mean of the trailing 16, null unless
    both frames are full. Bounded ROWS frames only — O(n) sliding
    evaluation, never the O(n²) unbounded-following shape."""
    out = analytics.with_level_shift(
        _ev(spark, sf_dir), keys=["event_type"], ts_col="ts",
        value_col="value", width=16, order_cols=["event_id"],
    )
    return out.select("event_id", _e("level_shift", 4).alias("shift_e4"))


@q(
    "seq_position_stats",
    _synth_cte()
    + """
    , pos AS (SELECT unnest(range(1, 9)) AS p)
    SELECT source, CAST(p - 1 AS BIGINT) AS pos,
           CAST(count(v[p]) AS BIGINT) AS cnt,
           CAST(ROUND(avg(v[p]) * 1e6) AS BIGINT) AS mean_e6,
           CAST(min(v[p]) AS BIGINT) AS min,
           CAST(max(v[p]) AS BIGINT) AS max
    FROM vals, pos
    WHERE p <= n_tok
    GROUP BY 1, 2
    """,
)
def seq_position_stats(spark, sf_dir):
    """Positional (array-axis) aggregation across rows: per source,
    per token position 0..7, count/mean/min/max of the PAD-masked
    value at that position over every sequence — the cross-row
    complement of the within-row A1 stats. posexplode of an 8-slice
    keeps the explode factor constant (8×) regardless of n_tok, then
    one partial-agg shuffle on (source, pos)."""
    s = _seq(spark)
    v = extract.masked(F.col("tokens"))
    ex = s.select(
        "source", F.posexplode(F.slice(v, 1, 8)).alias("pos", "val")
    )
    return ex.groupBy("source", F.col("pos").cast("bigint").alias("pos")).agg(
        F.count("val").alias("cnt"),
        _e(F.avg("val"), 6).alias("mean_e6"),
        F.min("val").cast("bigint").alias("min"),
        F.max("val").cast("bigint").alias("max"),
    )


@q(
    "ts_cohort_retention",
    """
    WITH cohort AS (
      SELECT user_id, min(date_trunc('day', ts)) AS cohort_day
      FROM events GROUP BY 1
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS act_day FROM events
    )
    SELECT strftime(cohort_day, '%Y-%m-%d %H:%M:%S') AS cohort_day,
           CAST(date_diff('day', cohort_day, act_day) AS BIGINT) AS day_offset,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
    FROM activity a JOIN cohort c USING (user_id)
    WHERE date_diff('day', cohort_day, act_day) BETWEEN 0 AND 30
    GROUP BY 1, 2
    """,
)
def ts_cohort_retention(spark, sf_dir):
    """Cohort retention matrix: users cohorted by first-event day,
    n_active per (cohort_day, day_offset) — two user-keyed aggregates
    + one user join, never a window over raw facts."""
    out = analytics.cohort_retention(
        _ev(spark, sf_dir), user_col="user_id", ts_col="ts",
        max_offset_days=30,
    )
    return out.select(
        _fmt("cohort_day").alias("cohort_day"),
        F.col("day_offset").cast("bigint").alias("day_offset"),
        "n_active",
    )


@q(
    "ts_funnel_click_purchase",
    """
    WITH entered AS (
      SELECT user_id, min(ts) AS t_enter
      FROM events WHERE event_type = 'click' GROUP BY 1
    ),
    conv AS (
      SELECT DISTINCT b.user_id
      FROM events b JOIN entered e USING (user_id)
      WHERE b.event_type = 'purchase' AND b.ts > e.t_enter
        AND epoch_us(b.ts) <= epoch_us(e.t_enter) + 3600000000
    )
    SELECT strftime(date_trunc('day', t_enter),
                    '%Y-%m-%d %H:%M:%S') AS entry_day,
           CAST(count(*) AS BIGINT) AS n_entered,
           CAST(sum(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_converted
    FROM entered e LEFT JOIN conv c USING (user_id)
    GROUP BY 1
    """,
)
def ts_funnel_click_purchase(spark, sf_dir):
    """Two-step funnel (click → purchase within 1h of the FIRST
    click), per entry day. Strictly-after boundary rule pinned in
    both engines; the as-of pair (ts_asof_click_purchase) is the
    per-event cousin, this is the cohort aggregate."""
    out = analytics.funnel(
        _ev(spark, sf_dir), "click", "purchase", user_col="user_id",
        type_col="event_type", ts_col="ts", horizon_s=3600.0,
    )
    return out.select(
        _fmt("entry_day").alias("entry_day"), "n_entered", "n_converted"
    )


@q(
    "ts_series_ratio",
    """
    WITH l AS (
      SELECT date_trunc('hour', ts) AS w, CAST(count(*) AS DOUBLE) AS v
      FROM events WHERE event_type = 'click' GROUP BY 1
    ),
    r AS (
      SELECT date_trunc('hour', ts) AS w, CAST(count(*) AS DOUBLE) AS v
      FROM events WHERE event_type = 'view' GROUP BY 1
    )
    SELECT strftime(l.w, '%Y-%m-%d %H:%M:%S') AS window_start,
           CAST(CASE WHEN r.v != 0 THEN ROUND(l.v / r.v * 1e6) END
                AS BIGINT) AS ratio_e6
    FROM l JOIN r ON l.w = r.w
    """,
)
def ts_series_ratio(spark, sf_dir):
    """PromQL-style binary op between two series: clicks/views per
    hour via series_binary_op (inner alignment join of two per-bucket
    aggregates, null on zero denominator)."""
    ev = _ev(spark, sf_dir)

    def hourly(t):
        return (
            ev.where(F.col("event_type") == t)
            .groupBy(F.date_trunc("hour", "ts").alias("window_start"))
            .agg(F.count("*").cast("double").alias("value"))
        )

    out = analytics.series_binary_op(hourly("click"), hourly("view"), "ratio")
    return out.select(
        _fmt("window_start").alias("window_start"),
        _e("ratio", 6).alias("ratio_e6"),
    )


@q(
    "ts_topn_daily_users",
    """
    WITH c AS (
      SELECT date_trunc('day', ts) AS d, user_id, count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    rk AS (
      SELECT d, user_id, n,
             row_number() OVER (PARTITION BY d ORDER BY n DESC, user_id) AS rank
      FROM c
    )
    SELECT strftime(d, '%Y-%m-%d %H:%M:%S') AS day, user_id,
           CAST(n AS BIGINT) AS n_events, CAST(rank AS BIGINT) AS rank
    FROM rk WHERE rank <= 3
    """,
)
def ts_topn_daily_users(spark, sf_dir):
    """Top-3 users per day by event count — the rank-filter shape
    (per-group window, no global sort), ties broken by user_id so
    both engines agree row-for-row."""
    ev = _ev(spark, sf_dir)
    counts = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    ).agg(F.count("*").cast("bigint").alias("n_events"))
    out = analytics.top_n_per_group(
        counts, ["day"], "n_events", n=3, tie_cols=["user_id"]
    )
    return out.select(
        _fmt("day").alias("day"),
        "user_id",
        "n_events",
        F.col("rank").cast("bigint").alias("rank"),
    )


@q(
    "ts_gap_stats",
    """
    WITH seg AS (
      SELECT event_type, date_trunc('day', ts) AS d,
             (epoch_us(lead(ts) OVER w) - epoch_us(ts)) / 1e6 AS gap_s
      FROM events
      WINDOW w AS (PARTITION BY event_type, date_trunc('day', ts)
                   ORDER BY ts)
    )
    SELECT event_type AS series_id,
           strftime(d, '%Y-%m-%d %H:%M:%S') AS day,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(ROUND(max(gap_s) * 1e4) AS BIGINT) AS max_gap_e4,
           CAST(sum(CASE WHEN gap_s > 600.0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_gaps_over
    FROM seg GROUP BY 1, 2
    """,
)
def ts_gap_stats(spark, sf_dir):
    """Largest silent interval + gaps-over-threshold per series per
    day — the dual of heartbeat_uptime, same bucket-local day rule."""
    out = analytics.gap_stats(
        _ev(spark, sf_dir).withColumnRenamed("event_type", "series_id"),
        keys=["series_id"], ts_col="ts", threshold_s=600.0,
    )
    return out.select(
        "series_id",
        _fmt("day").alias("day"),
        "n_events",
        _e("max_gap_s", 4).alias("max_gap_e4"),
        "n_gaps_over",
    )


@q(
    "doc_unigram_logprob",
    """
    WITH words AS (
      SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS w
      FROM documents
    ),
    w2 AS (SELECT doc_id, w FROM words WHERE w != ''),
    counts AS (SELECT w, count(*) AS wc FROM w2 GROUP BY 1),
    tot AS (SELECT CAST(sum(wc) AS DOUBLE) AS t FROM counts)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(ROUND(avg(ln(wc / t)) * 1e4) AS BIGINT) AS mean_logprob_e4
    FROM w2 JOIN counts USING (w) CROSS JOIN tot
    GROUP BY 1
    """,
)
def doc_unigram_logprob(spark, sf_dir):
    """Per-doc mean log-probability under the corpus unigram MLE —
    the statistical stand-in for model-based quality filtering; both
    engines build the LM from the same corpus and score it back."""
    out = textops.unigram_logprob(_docs(spark, sf_dir))
    return out.select(
        "doc_id",
        "n_words",
        _e("mean_logprob", 4).alias("mean_logprob_e4"),
    )


@q(
    "doc_tfidf_topterms",
    """
    WITH words AS (
      SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS w
      FROM documents
    ),
    w2 AS (SELECT doc_id, w FROM words WHERE w != ''),
    tf AS (SELECT doc_id, w, count(*) AS tf FROM w2 GROUP BY 1, 2),
    dfc AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.w, tf.tf,
             CAST(ROUND(tf.tf * ln(n_docs / df) * 1e6) AS BIGINT) AS score_e6
      FROM tf JOIN dfc USING (w) CROSS JOIN n
    ),
    rk AS (
      SELECT doc_id, w, tf, score_e6,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score_e6 DESC, w ASC) AS rank
      FROM scored
    )
    SELECT doc_id, w AS term, CAST(tf AS BIGINT) AS tf, score_e6,
           CAST(rank AS BIGINT) AS rank
    FROM rk WHERE rank <= 3
    """,
)
def doc_tfidf_topterms(spark, sf_dir):
    """Top-3 TF-IDF terms per doc. Both engines rank on the
    E6-ROUNDED score (2·ln4 vs 4·ln2 are mathematically equal but can
    differ by an ulp — ranking the raw double would let an ulp flip
    top-k membership), then break exact ties by term ASC."""
    out = textops.tfidf_top_terms(_docs(spark, sf_dir), k=3)
    return out.select(
        "doc_id",
        "term",
        F.col("tf").cast("bigint").alias("tf"),
        "score_e6",
        F.col("rank").cast("bigint").alias("rank"),
    )


# ---------------------------------------------------------------------------
# Token-distribution shape: Zipf slope per source + bigram PMI top-k —
# the data-mix drift detector and the collocation miner
# (tokens_ts/textops.py zipf_slope / bigram_pmi_topk).
# ---------------------------------------------------------------------------

@q(
    "seq_zipf_slope",
    _synth_cte()
    + """
    , uni AS (
      SELECT source, t, count(*) AS c
      FROM (SELECT source, unnest(tokens) AS t FROM seq)
      WHERE t <> 0 GROUP BY 1, 2
    ),
    rk AS (
      SELECT source, t, c,
             row_number() OVER (PARTITION BY source
                                ORDER BY c DESC, t ASC) AS r
      FROM uni
    ),
    xy AS (
      SELECT source, ln(CAST(r AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y
      FROM rk WHERE r <= 256
    ),
    ag AS (
      SELECT source, CAST(count(*) AS DOUBLE) AS n,
             sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy, sum(x*x) AS sxx
      FROM xy GROUP BY 1
    )
    SELECT source, CAST(n AS BIGINT) AS n_ranked,
           CASE WHEN n*sxx - sx*sx = 0 THEN NULL
                ELSE CAST(ROUND((n*sxy - sx*sy) / (n*sxx - sx*sx) * 1e6)
                          AS BIGINT) END AS slope_e6
    FROM ag
    """,
)
def seq_zipf_slope(spark, sf_dir):
    """Zipf-law slope of the per-source token frequency distribution
    (OLS over ln freq vs ln rank, top-256 non-PAD tokens, count-desc /
    token-asc deterministic ranking). Slope lands via the five OLS
    sums — e6-rounded, the same summation-ulp budget ts_trend_1h
    pinned. Ranking window is vocab-bounded per source, never
    corpus-bounded."""
    out = textops.zipf_slope(_seq(spark), by="source", pad_id=C.PAD_ID)
    return out.select("source", "n_ranked", _e("zipf_slope", 6).alias("slope_e6"))


@q(
    "seq_bigram_pmi",
    _synth_cte()
    + """
    , bg AS (
      SELECT tokens[i] AS a, tokens[i + 1] AS b
      FROM seq, unnest(range(1, len(tokens))) AS u(i)
      WHERE tokens[i] <> 0 AND tokens[i + 1] <> 0
    ),
    uni AS (
      SELECT t, count(*) AS c
      FROM (SELECT unnest(tokens) AS t FROM seq)
      WHERE t <> 0 GROUP BY 1
    ),
    tu AS (SELECT CAST(sum(c) AS DOUBLE) AS tu FROM uni),
    tb AS (SELECT CAST(count(*) AS DOUBLE) AS tb FROM bg),
    bgc AS (
      SELECT a, b, count(*) AS cnt FROM bg GROUP BY 1, 2
      HAVING count(*) >= 2
    )
    SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
           CAST(cnt AS BIGINT) AS cnt,
           CAST(ROUND((ln(cnt) - ln(tb) - ln(ua.c) - ln(ub.c) + 2*ln(tu))
                      * 1e6) AS BIGINT) AS pmi_e6
    FROM bgc
    JOIN uni ua ON bgc.a = ua.t
    JOIN uni ub ON bgc.b = ub.t
    CROSS JOIN tb CROSS JOIN tu
    ORDER BY pmi_e6 DESC, a ASC, b ASC
    LIMIT 20
    """,
)
def seq_bigram_pmi(spark, sf_dir):
    """Top-20 adjacent-token bigrams by PMI (support ≥ 2 — the
    synthetic vocab is 131 072 tokens, so specific bigrams are rare
    by construction and the operator's production default of 5 would
    return an empty frame at test scale), ranked on
    the e6-rounded score with (a, b) tie-break — collocation mining
    over the token stream. The bigram stream is built row-locally
    (transform over positions; DuckDB mirrors with a 1-indexed lateral
    range); T_bi is counted before the support filter in BOTH
    engines (pinned rule)."""
    return textops.bigram_pmi_topk(_seq(spark), pad_id=C.PAD_ID, k=20, min_count=2)


# ---------------------------------------------------------------------------
# Token-distribution evolution over time: hour-over-hour Jensen-Shannon
# drift + Heaps'-law vocabulary growth (tokens_ts/textops.py dist_drift /
# vocab_growth) — the tokens-axis × time-axis fusion operators.
# ---------------------------------------------------------------------------

@q(
    "seq_jsd_drift",
    _synth_cte()
    + """
    , ex AS (
      SELECT source, epoch_s - epoch_s % 3600 AS ep, unnest(tokens) AS t
      FROM seq
    ),
    nz AS (SELECT * FROM ex WHERE t <> 0),
    cnt AS (SELECT source, ep, t, count(*) AS c FROM nz GROUP BY 1, 2, 3),
    tot AS (SELECT source, ep, sum(c) AS tot FROM cnt GROUP BY 1, 2),
    j AS (
      SELECT coalesce(cur.source, prv.source) AS source,
             coalesce(cur.ep, prv.ep + 3600) AS ep,
             coalesce(cur.c, 0) AS cc, coalesce(prv.c, 0) AS cp
      FROM cnt cur FULL OUTER JOIN cnt prv
        ON cur.source = prv.source AND cur.t = prv.t
       AND cur.ep = prv.ep + 3600
    ),
    sc AS (
      SELECT j.source, j.ep,
             CAST(cc AS DOUBLE) / tc.tot AS p,
             CAST(cp AS DOUBLE) / tp.tot AS q
      FROM j
      JOIN tot tc ON tc.source = j.source AND tc.ep = j.ep
      JOIN tot tp ON tp.source = j.source AND tp.ep + 3600 = j.ep
    )
    SELECT source, ep AS bucket_ep,
           CAST(ROUND(sum(
             (CASE WHEN p > 0 THEN p * ln(p / ((p + q) / 2)) ELSE 0 END +
              CASE WHEN q > 0 THEN q * ln(q / ((p + q) / 2)) ELSE 0 END) / 2
           ) * 1e6) AS BIGINT) AS jsd_e6,
           count(*) AS n_union
    FROM sc GROUP BY 1, 2
    """,
)
def seq_jsd_drift(spark, sf_dir):
    """Hour-over-hour Jensen-Shannon divergence of each source's token
    distribution — the data-mix drift monitor. Pinned rules mirrored
    in the oracle: a bucket is scored only when the bucket exactly one
    hour earlier has non-PAD tokens (both totals join inner); tokens
    absent on one side contribute p·ln 2 one-sidedly. JSD is e6-
    rounded (summation-order ulp budget)."""
    out = textops.dist_drift(_seq(spark), by="source", pad_id=C.PAD_ID, trunc="hour")
    return out.select(
        "source",
        F.unix_timestamp("bucket_ts").alias("bucket_ep"),
        _e("jsd", 6).alias("jsd_e6"),
        "n_union",
    )


@q(
    "seq_vocab_growth",
    _synth_cte()
    + """
    , ex AS (
      SELECT source, epoch_s - epoch_s % 3600 AS ep, unnest(tokens) AS t
      FROM seq
    ),
    nz AS (SELECT * FROM ex WHERE t <> 0),
    fs AS (SELECT source, t, min(ep) AS ep FROM nz GROUP BY 1, 2),
    nb AS (SELECT source, ep, count(*) AS new_tokens FROM fs GROUP BY 1, 2),
    sp AS (SELECT DISTINCT source, ep FROM nz)
    SELECT sp.source, sp.ep AS bucket_ep,
           CAST(coalesce(nb.new_tokens, 0) AS BIGINT) AS new_tokens,
           CAST(sum(coalesce(nb.new_tokens, 0)) OVER (
             PARTITION BY sp.source ORDER BY sp.ep) AS BIGINT) AS cum_vocab
    FROM sp LEFT JOIN nb ON nb.source = sp.source AND nb.ep = sp.ep
    """,
)
def seq_vocab_growth(spark, sf_dir):
    """Heaps'-law vocabulary growth per source per hour: new-token
    count (first-occurrence bucket pinning) + running cumulative
    distinct vocabulary. Integer-exact — no rounding grain at all."""
    out = textops.vocab_growth(_seq(spark), by="source", pad_id=C.PAD_ID, trunc="hour")
    return out.select(
        "source",
        F.unix_timestamp("bucket_ts").alias("bucket_ep"),
        "new_tokens",
        "cum_vocab",
    )


# ---------------------------------------------------------------------------
# Series shape analysis: SAX symbolization (series → token words) and
# gap-correct ACF (tokens_ts/analytics.py sax_symbols / acf).
# ---------------------------------------------------------------------------

@q(
    "ts_sax_words",
    """
    WITH paa AS (
      SELECT event_type AS series_id, date_trunc('minute', ts) AS seg,
             avg(value) AS paa
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    st AS (
      SELECT series_id, avg(paa) AS mu, stddev_pop(paa) AS sd
      FROM paa GROUP BY 1
    ),
    sy AS (
      SELECT p.series_id, date_trunc('hour', seg) AS b, seg,
             CASE WHEN st.sd IS NULL OR st.sd = 0 THEN 0
                  ELSE CAST(ROUND((p.paa - st.mu) / st.sd * 1e6) AS BIGINT)
             END AS z6
      FROM paa p JOIN st ON st.series_id = p.series_id
    ),
    s2 AS (
      SELECT series_id, b, seg,
             CASE WHEN z6 < -674490 THEN 'a' WHEN z6 < 0 THEN 'b'
                  WHEN z6 < 674490 THEN 'c' ELSE 'd' END AS sym
      FROM sy
    )
    SELECT series_id, strftime(b, '%Y-%m-%d %H:%M:%S') AS bucket_ts,
           string_agg(sym, '' ORDER BY seg) AS sax_word,
           count(*) AS n_seg
    FROM s2 GROUP BY 1, 2
    """,
)
def ts_sax_words(spark, sf_dir):
    """SAX symbolization: minute-PAA → per-series z-normalization
    (ddof=0, std=0 ⇒ z=0) → alphabet-4 symbols on the e6-rounded z
    against integer breakpoint cuts (±674490, 0 — an ulp cannot flip
    a symbol) → hourly words in segment order. The series-to-tokens
    bridge: SAX words feed the same n-gram/dedup/drift machinery as
    real token streams."""
    out = analytics.sax_symbols(
        _ev(spark, sf_dir), keys=["event_type"], ts_col="ts",
        value_col="value", paa_trunc="minute", word_trunc="hour",
    )
    return out.select(
        F.col("event_type").alias("series_id"),
        _fmt("bucket_ts").alias("bucket_ts"),
        "sax_word",
        "n_seg",
    )


@q(
    "ts_acf",
    """
    WITH b AS (
      SELECT event_type AS series_id,
             CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS ep,
             avg(value) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    l AS (
      SELECT series_id, ep, v AS x, lg.lag
      FROM b CROSS JOIN (SELECT unnest(range(1, 6)) AS lag) lg
    ),
    p AS (
      SELECT l.series_id, l.lag, l.x, r.v AS y
      FROM l JOIN b r ON r.series_id = l.series_id
                     AND r.ep = l.ep + l.lag * 60
    ),
    a AS (
      SELECT series_id, lag, CAST(count(*) AS DOUBLE) AS n,
             sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy,
             sum(x*x) AS sxx, sum(y*y) AS syy
      FROM p GROUP BY 1, 2
    )
    SELECT series_id, CAST(lag AS BIGINT) AS lag,
           CAST(n AS BIGINT) AS n_pairs,
           CASE WHEN n >= 2 AND n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
                THEN CAST(ROUND((n*sxy - sx*sy)
                     / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy)) * 1e6)
                     AS BIGINT)
           END AS acf_e6
    FROM a
    """,
)
def ts_acf(spark, sf_dir):
    """Gap-correct autocorrelation per series at minute-bucket lags
    1..5: pairing on bucket-EPOCH arithmetic (a missing bucket breaks
    only the lags it touches — lag(row) would silently pair
    non-adjacent samples), Pearson r via the five explicit sums
    (trend() rule), e6-rounded; degenerate variance ⇒ null."""
    out = analytics.acf(
        _ev(spark, sf_dir), keys=["event_type"], ts_col="ts",
        value_col="value", trunc="minute", max_lag=5,
    )
    return out.select(
        F.col("event_type").alias("series_id"),
        "lag",
        "n_pairs",
        _e("acf", 6).alias("acf_e6"),
    )


# ---------------------------------------------------------------------------
# Head-of-distribution drift + burst detection on token streams
# (tokens_ts/textops.py topk_turnover / token_burst).
# ---------------------------------------------------------------------------

@q(
    "seq_topk_turnover",
    _synth_cte()
    + """
    , ex AS (
      SELECT source, epoch_s - epoch_s % 3600 AS ep, unnest(tokens) AS t
      FROM seq
    ),
    nz AS (SELECT * FROM ex WHERE t <> 0),
    cnt AS (SELECT source, ep, t, count(*) AS c FROM nz GROUP BY 1, 2, 3),
    tk AS (
      SELECT source, ep, t,
             row_number() OVER (PARTITION BY source, ep
                                ORDER BY c DESC, t ASC) AS rn
      FROM cnt
    ),
    topk AS (SELECT source, ep, t FROM tk WHERE rn <= 16),
    sz AS (SELECT source, ep, count(*) AS n FROM topk GROUP BY 1, 2),
    sc AS (
      SELECT c.source, c.ep, c.n AS n_cur, p.n AS n_prev
      FROM sz c JOIN sz p
        ON p.source = c.source AND p.ep + 3600 = c.ep
    ),
    iv AS (
      SELECT c.source, c.ep, count(*) AS n_inter
      FROM topk c JOIN topk p
        ON p.source = c.source AND p.t = c.t AND p.ep + 3600 = c.ep
      GROUP BY 1, 2
    )
    SELECT sc.source, sc.ep AS bucket_ep,
           CAST(sc.n_cur AS BIGINT) AS n_cur,
           CAST(sc.n_prev AS BIGINT) AS n_prev,
           CAST(coalesce(iv.n_inter, 0) AS BIGINT) AS n_inter,
           CAST(ROUND(CAST(coalesce(iv.n_inter, 0) AS DOUBLE)
             / (sc.n_cur + sc.n_prev - coalesce(iv.n_inter, 0)) * 1e6)
             AS BIGINT) AS jaccard_e6
    FROM sc LEFT JOIN iv ON iv.source = sc.source AND iv.ep = sc.ep
    """,
)
def seq_topk_turnover(spark, sf_dir):
    """Hour-over-hour Jaccard turnover of each source's top-16 token
    set. Pinned rules mirrored in the oracle: rank by (count DESC,
    token ASC) row_number; score only buckets whose predecessor
    exists; Jaccard e6-rounded."""
    out = textops.topk_turnover(
        _seq(spark), by="source", pad_id=C.PAD_ID, trunc="hour", k=16
    )
    return out.select(
        "source",
        F.unix_timestamp("bucket_ts").alias("bucket_ep"),
        "n_cur",
        "n_prev",
        "n_inter",
        _e("jaccard", 6).alias("jaccard_e6"),
    )


@q(
    "seq_token_burst",
    _synth_cte()
    + """
    , ex AS (
      SELECT source, epoch_s - epoch_s % 3600 AS ep, unnest(tokens) AS t
      FROM seq
    ),
    nz AS (SELECT source, ep, 1 + t % 64 AS t FROM ex WHERE t <> 0),
    cnt AS (SELECT source, ep, t, count(*) AS c FROM nz GROUP BY 1, 2, 3),
    tot AS (SELECT source, ep, sum(c) AS tot FROM cnt GROUP BY 1, 2),
    nb AS (SELECT source, count(*) AS n_buckets FROM tot GROUP BY 1),
    sh AS (
      SELECT cnt.source, cnt.t, cnt.c,
             CAST(cnt.c AS DOUBLE) / tot.tot AS share
      FROM cnt JOIN tot ON tot.source = cnt.source AND tot.ep = cnt.ep
    ),
    pt AS (
      SELECT source, t, sum(c) AS total_c, max(share) AS max_share,
             sum(share) AS sum_share, count(*) AS n_present
      FROM sh GROUP BY 1, 2
    ),
    scored AS (
      SELECT pt.source, pt.t, pt.total_c, pt.n_present,
             CAST(ROUND(pt.max_share / (pt.sum_share / nb.n_buckets) * 1e6)
                  AS BIGINT) AS burst_e6
      FROM pt JOIN nb ON nb.source = pt.source
      WHERE pt.total_c >= 4
    )
    SELECT source, CAST(t AS BIGINT) AS token,
           CAST(total_c AS BIGINT) AS total_c,
           CAST(n_present AS BIGINT) AS n_present,
           burst_e6,
           CAST(row_number() OVER (PARTITION BY source
                ORDER BY burst_e6 DESC, t ASC) AS BIGINT) AS rank
    FROM scored
    QUALIFY rank <= 10
    """,
)
def seq_token_burst(spark, sf_dir):
    """Top-10 bursty token BUCKETS per source (tokens coarsened to
    `1 + t % 64` before the operator — the synthetic vocab is so wide
    that raw tokens appear ≤2×, which would make burst vacuous; the
    coarsening is applied identically in both engines and PAD stays
    PAD): peak bucket share over mean share across ALL of the
    source's data buckets, min 4 total occurrences, ranked on the
    e6-rounded burst score (token ASC tie-break) — both engines rank
    integers, an ulp cannot flip."""
    s = _seq(spark)
    coarse = s.withColumn(
        "tokens",
        F.transform(
            "tokens",
            lambda x: F.when(x == C.PAD_ID, x).otherwise(1 + (x % 64)),
        ),
    )
    return textops.token_burst(
        coarse, by="source", pad_id=C.PAD_ID, trunc="hour",
        k=10, min_count=4,
    )


# ---------------------------------------------------------------------------
# Lead-lag detection + forecast-baseline backtest on the events series
# (tokens_ts/analytics.py ccf / seasonal_naive_error).
# ---------------------------------------------------------------------------

@q(
    "ts_ccf",
    """
    WITH b AS (
      SELECT event_type AS sid,
             CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS ep,
             avg(value) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    l AS (
      SELECT b.sid AS series_a, b.ep, b.v AS x, lg.lag
      FROM b CROSS JOIN (SELECT unnest(range(-5, 6)) AS lag) lg
    ),
    p AS (
      SELECT l.series_a, r.sid AS series_b, l.lag, l.x, r.v AS y
      FROM l JOIN b r ON r.ep = l.ep + l.lag * 60
      WHERE l.series_a < r.sid
    ),
    a AS (
      SELECT series_a, series_b, lag, CAST(count(*) AS DOUBLE) AS n,
             sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy,
             sum(x*x) AS sxx, sum(y*y) AS syy
      FROM p GROUP BY 1, 2, 3
    )
    SELECT series_a, series_b, CAST(lag AS BIGINT) AS lag,
           CAST(n AS BIGINT) AS n_pairs,
           CASE WHEN n >= 2 AND n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
                THEN CAST(ROUND((n*sxy - sx*sy)
                     / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy)) * 1e6)
                     AS BIGINT)
           END AS ccf_e6
    FROM a
    """,
)
def ts_ccf(spark, sf_dir):
    """Cross-correlation between every ordered-distinct pair of event
    types at minute-bucket lags −5..+5 — gap-correct epoch pairing,
    Pearson r via the five explicit sums, e6-rounded."""
    out = analytics.ccf(
        _ev(spark, sf_dir), key_col="event_type", ts_col="ts",
        value_col="value", trunc="minute", max_lag=5,
    )
    return out.select(
        "series_a", "series_b", "lag", "n_pairs",
        _e("ccf", 6).alias("ccf_e6"),
    )


@q(
    "ts_mase_backtest",
    """
    WITH b AS (
      SELECT event_type AS sid,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ep,
             avg(value) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    nv AS (
      SELECT c.sid, count(*) AS n, avg(abs(c.v - p.v)) AS mae
      FROM b c JOIN b p ON p.sid = c.sid AND p.ep + 3600 = c.ep
      GROUP BY 1
    ),
    sn AS (
      SELECT c.sid, count(*) AS n, avg(abs(c.v - p.v)) AS mae
      FROM b c JOIN b p ON p.sid = c.sid AND p.ep + 86400 = c.ep
      GROUP BY 1
    )
    SELECT coalesce(nv.sid, sn.sid) AS series_id,
           CAST(coalesce(nv.n, 0) AS BIGINT) AS n_naive,
           CAST(coalesce(sn.n, 0) AS BIGINT) AS n_seasonal,
           CAST(ROUND(nv.mae * 1e6) AS BIGINT) AS mae_naive_e6,
           CAST(ROUND(sn.mae * 1e6) AS BIGINT) AS mae_seasonal_e6,
           CASE WHEN nv.mae > 0 AND sn.mae IS NOT NULL
                THEN CAST(ROUND(sn.mae / nv.mae * 1e6) AS BIGINT)
           END AS mase_e6
    FROM nv FULL OUTER JOIN sn ON sn.sid = nv.sid
    """,
)
def ts_mase_backtest(spark, sf_dir):
    """Naive vs seasonal-naive MAE backtest per series at hourly
    buckets (season = same hour previous day): inner-join forecast
    pairing (no imputation), e6-rounded MAEs and ratio — the MASE
    denominator every forecast eval needs."""
    out = analytics.seasonal_naive_error(
        _ev(spark, sf_dir), keys=["event_type"], ts_col="ts",
        value_col="value", trunc="hour", season="day",
    )
    return out.select(
        F.col("event_type").alias("series_id"),
        "n_naive",
        "n_seasonal",
        _e("mae_naive", 6).alias("mae_naive_e6"),
        _e("mae_seasonal", 6).alias("mae_seasonal_e6"),
        _e("mase", 6).alias("mase_e6"),
    )


# ---------------------------------------------------------------------------
# Inherently-sequential smoothing (the sanctioned Arrow-stateful path)
# + motif mining over SAX words (tokens_ts/analytics.py holt_linear /
# sax_symbols composition).
# ---------------------------------------------------------------------------

@q(
    "ts_holt",
    """
    WITH RECURSIVE b AS (
      SELECT event_type AS sid,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ep,
             avg(value) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    o AS (
      SELECT sid, ep, v,
             row_number() OVER (PARTITION BY sid ORDER BY ep) AS rn,
             lead(v) OVER (PARTITION BY sid ORDER BY ep) AS v2,
             count(*) OVER (PARTITION BY sid) AS n
      FROM b
    ),
    r AS (
      SELECT sid, ep, rn, v,
             v AS level,
             CASE WHEN n >= 2 THEN v2 - v ELSE 0.0 END AS trend,
             CAST(NULL AS DOUBLE) AS fitted
      FROM o WHERE rn = 1
      UNION ALL
      SELECT o.sid, o.ep, o.rn, o.v,
             0.5 * o.v + 0.5 * (r.level + r.trend),
             0.25 * ((0.5 * o.v + 0.5 * (r.level + r.trend)) - r.level)
               + 0.75 * r.trend,
             r.level + r.trend
      FROM r JOIN o ON o.sid = r.sid AND o.rn = r.rn + 1
    )
    SELECT sid AS series_id, ep,
           CAST(ROUND(v * 1e6) AS BIGINT) AS v_e6,
           CAST(ROUND(level * 1e6) AS BIGINT) AS level_e6,
           CAST(ROUND(trend * 1e6) AS BIGINT) AS trend_e6,
           CAST(ROUND(fitted * 1e6) AS BIGINT) AS fitted_e6
    FROM r
    """,
)
def ts_holt(spark, sf_dir):
    """Holt linear smoothing per series at hourly buckets — the
    inherently-sequential recursion runs as an Arrow applyInPandas
    stage in Spark and as a RECURSIVE CTE in DuckDB; both evaluate
    the identical α=0.5/β=0.25 expression shapes (binary-exact
    coefficients) on the same epoch-ordered buckets, e6-rounded.
    Init pinned: l₁=y₁, b₁=y₂−y₁, fitted₁=null."""
    out = analytics.holt_linear(
        _ev(spark, sf_dir), keys=["event_type"], ts_col="ts",
        value_col="value", trunc="hour", alpha=0.5, beta=0.25,
    )
    return out.select(
        F.col("event_type").alias("series_id"),
        "ep",
        _e("v", 6).alias("v_e6"),
        _e("level", 6).alias("level_e6"),
        _e("trend", 6).alias("trend_e6"),
        _e("fitted", 6).alias("fitted_e6"),
    )


@q(
    "ts_sax_motifs",
    """
    WITH paa AS (
      SELECT event_type AS series_id, date_trunc('minute', ts) AS seg,
             avg(value) AS paa
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    st AS (
      SELECT series_id, avg(paa) AS mu, stddev_pop(paa) AS sd
      FROM paa GROUP BY 1
    ),
    sy AS (
      SELECT p.series_id, date_trunc('hour', seg) AS b, seg,
             CASE WHEN st.sd IS NULL OR st.sd = 0 THEN 0
                  ELSE CAST(ROUND((p.paa - st.mu) / st.sd * 1e6) AS BIGINT)
             END AS z6
      FROM paa p JOIN st ON st.series_id = p.series_id
    ),
    s2 AS (
      SELECT series_id, b, seg,
             CASE WHEN z6 < -674490 THEN 'a' WHEN z6 < 0 THEN 'b'
                  WHEN z6 < 674490 THEN 'c' ELSE 'd' END AS sym
      FROM sy
    ),
    words AS (
      SELECT series_id, b, string_agg(sym, '' ORDER BY seg) AS sax_word
      FROM s2 GROUP BY 1, 2
    ),
    mc AS (
      SELECT series_id, sax_word, count(*) AS n_occur
      FROM words GROUP BY 1, 2
    )
    SELECT series_id, sax_word, CAST(n_occur AS BIGINT) AS n_occur,
           CAST(row_number() OVER (PARTITION BY series_id
                ORDER BY n_occur DESC, sax_word ASC) AS BIGINT) AS rank
    FROM mc
    QUALIFY rank <= 3
    """,
)
def ts_sax_motifs(spark, sf_dir):
    """Motif mining as a SAX composition: the top-3 recurring hourly
    SAX words per series (count DESC, word ASC row_number) — repeated
    shapes in a numeric series found by exact string grouping, the
    payoff of the series→tokens bridge. Ranking is over the
    words-bounded frame (≤ buckets rows per series)."""
    words = analytics.sax_symbols(
        _ev(spark, sf_dir), keys=["event_type"], ts_col="ts",
        value_col="value", paa_trunc="minute", word_trunc="hour",
    )
    mc = words.groupBy("event_type", "sax_word").agg(
        F.count("*").cast("bigint").alias("n_occur")
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("event_type").orderBy(
        F.desc("n_occur"), F.asc("sax_word")
    )
    return (
        mc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select(
            F.col("event_type").alias("series_id"),
            "sax_word",
            "n_occur",
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


@q(
    "seq_drift_tier_served",
    _synth_cte()
    + """
    , ex AS (
      SELECT source, epoch_s - epoch_s % 3600 AS ep, unnest(tokens) AS t
      FROM seq
    ),
    nz AS (SELECT * FROM ex WHERE t <> 0),
    cnt AS (SELECT source, ep, t, count(*) AS c FROM nz GROUP BY 1, 2, 3),
    tot AS (SELECT source, ep, sum(c) AS tot FROM cnt GROUP BY 1, 2),
    j AS (
      SELECT coalesce(cur.source, prv.source) AS source,
             coalesce(cur.ep, prv.ep + 3600) AS ep,
             coalesce(cur.c, 0) AS cc, coalesce(prv.c, 0) AS cp
      FROM cnt cur FULL OUTER JOIN cnt prv
        ON cur.source = prv.source AND cur.t = prv.t
       AND cur.ep = prv.ep + 3600
    ),
    sc AS (
      SELECT j.source, j.ep,
             CAST(cc AS DOUBLE) / tc.tot AS p,
             CAST(cp AS DOUBLE) / tp.tot AS q
      FROM j
      JOIN tot tc ON tc.source = j.source AND tc.ep = j.ep
      JOIN tot tp ON tp.source = j.source AND tp.ep + 3600 = j.ep
    )
    SELECT source, ep AS bucket_ep,
           CAST(ROUND(sum(
             (CASE WHEN p > 0 THEN p * ln(p / ((p + q) / 2)) ELSE 0 END +
              CASE WHEN q > 0 THEN q * ln(q / ((p + q) / 2)) ELSE 0 END) / 2
           ) * 1e6) AS BIGINT) AS jsd_e6,
           count(*) AS n_union
    FROM sc GROUP BY 1, 2
    """,
)
def seq_drift_tier_served(spark, sf_dir):
    """dist_drift SERVED FROM THE TOKEN-HISTOGRAM TIER (counts= path):
    the tier is built once by textops.token_histogram and handed to
    the monitor, which must produce row-for-row the same drift as the
    direct corpus computation — the oracle is therefore identical to
    seq_jsd_drift (the tier is an implementation detail, like the
    bucketed gapfill twin). pytest additionally pins the served≡direct
    equality through a real parquet round trip for all four
    tier-served monitors."""
    s = _seq(spark)
    tier = textops.token_histogram(s, by="source", pad_id=C.PAD_ID, trunc="hour")
    out = textops.dist_drift(s, by="source", trunc="hour", counts=tier)
    return out.select(
        "source",
        F.unix_timestamp("bucket_ts").alias("bucket_ep"),
        _e("jsd", 6).alias("jsd_e6"),
        "n_union",
    )


_HIST_CTE = """
    , ex AS (
      SELECT source, epoch_s - epoch_s % 3600 AS ep, unnest(tokens) AS t
      FROM seq
    ),
    nz AS (SELECT * FROM ex WHERE t <> 0),
    cnt AS (SELECT source, ep, t, count(*) AS c FROM nz GROUP BY 1, 2, 3)
"""


@q(
    "seq_decay_topk",
    _synth_cte()
    + _HIST_CTE
    + """
    , latest AS (SELECT source, max(ep) AS mep FROM cnt GROUP BY 1),
    aged AS (
      SELECT c.source, c.t, c.c,
             CAST((l.mep - c.ep) / 3600 AS BIGINT) AS age
      FROM cnt c JOIN latest l USING (source)
    ),
    sc AS (
      SELECT source, t, sum(c * power(0.5, age)) AS score,
             CAST(sum(c) AS BIGINT) AS total_c
      FROM aged GROUP BY 1, 2
    ),
    r AS (
      SELECT source, t, total_c,
             CAST(ROUND(score * 1e6) AS BIGINT) AS score_e6,
             row_number() OVER (
               PARTITION BY source
               ORDER BY ROUND(score * 1e6) DESC, t ASC) AS rank
      FROM sc
    )
    SELECT source, CAST(t AS BIGINT) AS token, total_c, score_e6,
           CAST(rank AS BIGINT) AS rank
    FROM r WHERE rank <= 10
    """,
)
def seq_decay_topk(spark, sf_dir):
    """Recency-weighted trending tokens: decay=0.5 per hourly bucket
    makes every weight an exact power of two, so the score is
    cross-engine EXACT before the e6 canonicalization. Served from
    the token_histogram tier (counts=) to keep the tier path under
    the driver gate too."""
    s = _seq(spark)
    tier = textops.token_histogram(s, by="source", pad_id=C.PAD_ID, trunc="hour")
    return textops.decay_topk(s, by="source", trunc="hour", counts=tier)


@q(
    "seq_token_novelty",
    _synth_cte()
    + _HIST_CTE
    + """
    , fs AS (SELECT source, t, min(ep) AS fep FROM cnt GROUP BY 1, 2),
    nov AS (
      SELECT c.source, c.ep, CAST(sum(c.c) AS BIGINT) AS novel_c
      FROM cnt c
      JOIN fs ON fs.source = c.source AND fs.t = c.t AND fs.fep = c.ep
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT source, ep, CAST(sum(c) AS BIGINT) AS total_c
      FROM cnt GROUP BY 1, 2
    )
    SELECT tot.source, tot.ep AS bucket_ep,
           CAST(coalesce(novel_c, 0) AS BIGINT) AS novel_c, total_c,
           CAST(ROUND(coalesce(novel_c, 0) * 1.0 / total_c * 1e6) AS BIGINT)
             AS novelty_e6
    FROM tot LEFT JOIN nov ON nov.source = tot.source AND nov.ep = tot.ep
    """,
)
def seq_token_novelty(spark, sf_dir):
    """Occurrence-weighted novelty rate per (source, hour) — the
    'how much of this hour is genuinely new text' monitor; the
    type-count twin is seq_vocab_growth."""
    return textops.token_novelty(_seq(spark), by="source", trunc="hour")


@q(
    "seq_dist_entropy",
    _synth_cte()
    + _HIST_CTE
    + """
    SELECT source, ep AS bucket_ep,
           CAST(sum(c) AS BIGINT) AS total_c,
           count(*) AS n_distinct,
           CAST(ROUND((ln(sum(c)) - sum(c * ln(c)) / sum(c)) * 1e6)
             AS BIGINT) AS entropy_e6,
           CASE WHEN count(*) > 1 THEN
             CAST(ROUND((ln(sum(c)) - sum(c * ln(c)) / sum(c))
                        / ln(count(*)) * 1e6) AS BIGINT)
           END AS norm_entropy_e6
    FROM cnt GROUP BY 1, 2
    """,
)
def seq_dist_entropy(spark, sf_dir):
    """Shannon + normalized entropy of each (source, hour) token
    distribution via the join-free H = ln(tot) − Σc·ln(c)/tot form —
    the mode-collapse monitor."""
    return textops.dist_entropy(_seq(spark), by="source", trunc="hour")


@q(
    "seq_source_similarity",
    _synth_cte()
    + _HIST_CTE
    + """
    , vec AS (SELECT source, t, sum(c) AS c FROM cnt GROUP BY 1, 2),
    norms AS (SELECT source, sum(c * c) AS sq FROM vec GROUP BY 1),
    dots AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(sum(a.c * b.c) AS BIGINT) AS dot
      FROM vec a JOIN vec b ON a.t = b.t AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT src_a, src_b, dot,
           CAST(ROUND(dot / (sqrt(na.sq) * sqrt(nb.sq)) * 1e6) AS BIGINT)
             AS cos_e6
    FROM dots
    JOIN norms na ON na.source = src_a
    JOIN norms nb ON nb.source = src_b
    """,
)
def seq_source_similarity(spark, sf_dir):
    """Pairwise cosine between sources' token-count vectors — corpus
    mix-shift monitor; integer dot products are cross-engine exact."""
    return textops.source_similarity(_seq(spark), by="source")


@q(
    "ts_cusum",
    """
    WITH b AS (
      SELECT event_type AS sid,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ep,
             avg(value) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    st AS (SELECT sid, avg(v) AS mu, stddev_pop(v) AS sd FROM b GROUP BY 1),
    z AS (
      SELECT b.sid, ep, v,
             CASE WHEN sd > 0 THEN (v - mu) / sd ELSE 0.0 END AS z
      FROM b JOIN st USING (sid)
    ),
    p AS (
      SELECT sid, ep, z,
             sum(z - 0.5) OVER w AS pu,
             sum(-z - 0.5) OVER w AS pd
      FROM z
      WINDOW w AS (PARTITION BY sid ORDER BY ep
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    m AS (
      SELECT sid, ep, z,
             pu - least(0, min(pu) OVER w) AS s_up,
             pd - least(0, min(pd) OVER w) AS s_dn
      FROM p
      WINDOW w AS (PARTITION BY sid ORDER BY ep
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT sid AS series_id, ep,
           CAST(ROUND(z * 1e6) AS BIGINT) AS z_e6,
           CAST(ROUND(s_up * 1e4) AS BIGINT) AS s_up_e4,
           CAST(ROUND(s_dn * 1e4) AS BIGINT) AS s_dn_e4,
           (CAST(ROUND(s_up * 1e4) AS BIGINT) > 40000
            OR CAST(ROUND(s_dn * 1e4) AS BIGINT) > 40000) AS alarm
    FROM m
    """,
)
def ts_cusum(spark, sf_dir):
    """Two-sided CUSUM per event_type at hourly buckets — the
    sequential recurrence rewritten as the prefix-min reflection
    identity, so BOTH engines run the identical two cumulative window
    passes (no recursion anywhere). The alarm flag is derived from
    the e4-rounded scores in both engines, making the threshold
    boundary deterministic by construction."""
    out = analytics.cusum(
        _ev(spark, sf_dir), keys=["event_type"], ts_col="ts",
        value_col="value", trunc="hour", slack=0.5, threshold=4.0,
    )
    up4 = _e("s_up", 4)
    dn4 = _e("s_dn", 4)
    return out.select(
        F.col("event_type").alias("series_id"),
        "ep",
        _e("z", 6).alias("z_e6"),
        up4.alias("s_up_e4"),
        dn4.alias("s_dn_e4"),
        ((up4 > 40000) | (dn4 > 40000)).alias("alarm"),
    )


@q(
    "ts_robust_z",
    """
    WITH med AS (
      SELECT event_type, median(value) AS med
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    mad AS (
      SELECT e.event_type, median(abs(value - med)) AS mad
      FROM events e JOIN med USING (event_type)
      WHERE value IS NOT NULL GROUP BY 1
    )
    SELECT event_id,
           CASE WHEN mad > 0 THEN
             CAST(ROUND((value - med) / (1.4826 * mad) * 1e4) AS BIGINT)
           END AS rz_e4,
           CASE WHEN mad > 0 AND value IS NOT NULL THEN
             (abs(CAST(ROUND((value - med) / (1.4826 * mad) * 1e4)
                  AS BIGINT)) > 35000)
           END AS is_outlier
    FROM events
    LEFT JOIN med USING (event_type)
    LEFT JOIN mad USING (event_type)
    """,
)
def ts_robust_z(spark, sf_dir):
    """Median/MAD robust z-score per event against its event_type —
    both engines use exact interpolated medians (Spark `median` ≡
    DuckDB quantile_cont(0.5)); the outlier flag is derived from the
    e4-rounded score so the |rz| > 3.5 boundary cannot ulp-flip."""
    out = analytics.robust_zscore(
        _ev(spark, sf_dir), keys=["event_type"], value_col="value",
        clip=3.5,
    )
    rz4 = _e("robust_z", 4)
    return out.select(
        "event_id",
        rz4.alias("rz_e4"),
        F.when(rz4.isNotNull(), F.abs(rz4) > 35000).alias("is_outlier"),
    )


@q(
    "ts_rolling_median",
    """
    SELECT event_id,
           CAST(count(value) OVER w AS BIGINT) AS roll_n,
           CAST(ROUND(median(value) OVER w * 1e6) AS BIGINT) AS med_e6
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                 ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
    """,
)
def ts_rolling_median(spark, sf_dir):
    """Exact trailing-10-row median per event_type — Spark sorts the
    bounded frame array and interpolates the middle, DuckDB runs its
    native windowed median; both exclude nulls from the frame
    population. Ordering made total with (ts, event_id)."""
    out = analytics.rolling_median(
        _ev(spark, sf_dir), keys=["event_type"], ts_col="ts",
        value_col="value", n_preceding=9, order_cols=["ts", "event_id"],
    )
    return out.select(
        "event_id",
        "roll_n",
        _e("roll_median", 6).alias("med_e6"),
    )


@q(
    "ts_lttb",
    """
    WITH b AS (
      SELECT event_type AS sid, date_trunc('hour', ts) AS wts,
             avg(value) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    p AS (
      SELECT sid, wts, epoch_us(wts) AS x, v,
             row_number() OVER (PARTITION BY sid ORDER BY wts) AS rn,
             count(*) OVER (PARTITION BY sid) AS n
      FROM b
    ),
    g AS (
      SELECT *, CASE WHEN rn = 1 THEN -1 WHEN rn = n THEN 22
                     ELSE CAST(floor((rn - 2) * 22.0 / (n - 2)) AS BIGINT)
                END AS g
      FROM p
    ),
    cent AS (
      SELECT sid, g, avg(CAST(x AS DOUBLE)) AS cx, avg(v) AS cy
      FROM g GROUP BY 1, 2
    ),
    mid AS (
      SELECT g.sid, g.g, g.wts, g.x, g.v,
             a.cx AS ax, a.cy AS ay, c.cx AS cx2, c.cy AS cy2
      FROM g
      LEFT JOIN cent a ON a.sid = g.sid AND a.g = g.g - 1
      LEFT JOIN cent c ON c.sid = g.sid AND c.g = g.g + 1
      WHERE g.g >= 0 AND g.g < 22
    ),
    sel AS (
      SELECT sid, g, wts, v,
             row_number() OVER (
               PARTITION BY sid, g
               ORDER BY ROUND(abs((ax - cx2) * (v - ay)
                          - (ax - CAST(x AS DOUBLE)) * (cy2 - ay)) * 1e6)
                        DESC, wts ASC) AS r
      FROM mid
    ),
    outp AS (
      SELECT sid, g, wts, v FROM sel WHERE r = 1
      UNION ALL
      SELECT sid, g, wts, v FROM g WHERE g = -1 OR g = 22
    )
    SELECT sid AS series_id, g AS bucket,
           CAST(epoch(wts) AS BIGINT) AS ep,
           CAST(ROUND(v * 1e6) AS BIGINT) AS v_e6
    FROM outp
    """,
)
def ts_lttb(spark, sf_dir):
    """Static-anchor LTTB decimation of the hourly mean tier to 24
    plot points per series — both engines bucket by identical integer
    arithmetic, pick by identical e6-rounded triangle areas with
    earlier-timestamp tie-break, and keep both endpoints."""
    hourly = (
        _ev(spark, sf_dir)
        .where(F.col("value").isNotNull())
        .groupBy(
            F.col("event_type").alias("sid"),
            F.date_trunc("hour", "ts").alias("wts"),
        )
        .agg(F.avg("value").alias("v"))
    )
    out = tiers.downsample_lttb(
        hourly, n_out=24, keys=["sid"], ts_col="wts", value_col="v"
    )
    return out.select(
        F.col("sid").alias("series_id"),
        "bucket",
        F.unix_timestamp("event_ts").alias("ep"),
        _e("value", 6).alias("v_e6"),
    )


@q(
    "seq_token_gini",
    _synth_cte()
    + _HIST_CTE
    + """
    , r AS (
      SELECT source, ep, c,
             row_number() OVER (PARTITION BY source, ep
                                ORDER BY c ASC, t ASC) AS i
      FROM cnt
    )
    SELECT source, ep AS bucket_ep,
           CAST(sum(c) AS BIGINT) AS total_c,
           count(*) AS n_distinct,
           CAST(ROUND(CAST(2 * sum(i * c) - (count(*) + 1) * sum(c)
                           AS DOUBLE)
                      / (count(*) * sum(c)) * 1e6) AS BIGINT) AS gini_e6
    FROM r GROUP BY 1, 2
    """,
)
def seq_token_gini(spark, sf_dir):
    """Gini concentration of each (source, hour)'s token counts —
    rank-sum formula over integer sums, cross-engine exact before the
    e6 canonicalization."""
    return textops.token_gini(_seq(spark), by="source", trunc="hour")


@q(
    "ts_bollinger",
    """
    WITH w_ AS (
      SELECT event_id, value,
             avg(value) OVER w AS mid,
             stddev_pop(value) OVER w AS sd
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    ),
    r AS (
      SELECT event_id, value,
             CAST(ROUND(mid * 1e4) AS BIGINT) AS mid_e4,
             CAST(ROUND((mid + 2 * sd) * 1e4) AS BIGINT) AS up_e4,
             CAST(ROUND((mid - 2 * sd) * 1e4) AS BIGINT) AS dn_e4
      FROM w_
    )
    SELECT event_id, mid_e4, up_e4, dn_e4,
           CASE WHEN value IS NULL THEN NULL
                WHEN CAST(ROUND(value * 1e4) AS BIGINT) > up_e4 THEN 1
                WHEN CAST(ROUND(value * 1e4) AS BIGINT) < dn_e4 THEN -1
                ELSE 0 END AS breach
    FROM r
    """,
)
def ts_bollinger(spark, sf_dir):
    """Bollinger bands per event_type over the trailing 20 rows —
    the breach side is re-derived from e4-rounded band/value integers
    in both engines so the band boundary cannot ulp-flip."""
    out = analytics.bollinger(
        _ev(spark, sf_dir), keys=["event_type"], ts_col="ts",
        value_col="value", n_preceding=19, width=2.0,
        order_cols=["ts", "event_id"],
    )
    v4 = _e("value", 4)
    up4 = _e("bb_up", 4)
    dn4 = _e("bb_dn", 4)
    return out.select(
        "event_id",
        _e("bb_mid", 4).alias("mid_e4"),
        up4.alias("up_e4"),
        dn4.alias("dn_e4"),
        F.when(F.col("value").isNull(), F.lit(None).cast("int"))
        .when(v4 > up4, F.lit(1))
        .when(v4 < dn4, F.lit(-1))
        .otherwise(F.lit(0))
        .alias("breach"),
    )


@q(
    "ts_corr_matrix",
    """
    WITH b AS (
      SELECT event_type AS k,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ep,
             avg(value) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    j AS (
      SELECT a.k AS ka, b2.k AS kb, a.v AS x, b2.v AS y
      FROM b a JOIN b b2 ON a.ep = b2.ep AND a.k < b2.k
    ),
    agg AS (
      SELECT ka, kb, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
      FROM j GROUP BY 1, 2
    )
    SELECT ka, kb, CAST(n AS BIGINT) AS n,
           CASE WHEN n >= 2 AND (n * sxx - sx * sx) > 0
                     AND (n * syy - sy * sy) > 0 THEN
             CAST(ROUND((n * sxy - sx * sy)
                        / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
                        * 1e4) AS BIGINT)
           END AS r_e4
    FROM agg
    """,
)
def ts_corr_matrix(spark, sf_dir):
    """All-pairs Pearson correlation of event_type series at hourly
    buckets — algebraic sums mirrored term-for-term; e4-rounded."""
    out = analytics.corr_matrix(
        _ev(spark, sf_dir), keys=["event_type"], ts_col="ts",
        value_col="value", trunc="hour",
    )
    return out.select("ka", "kb", "n", _e("pearson_r", 4).alias("r_e4"))


@q(
    "ts_ewma_irregular",
    """
    WITH RECURSIVE p AS (
      SELECT event_type AS sid, ts, event_id,
             epoch_us(ts) / 1e6 AS tsec, value AS v,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) AS rn
      FROM events
      WHERE value IS NOT NULL AND event_id % 97 = 0
    ),
    r AS (
      SELECT sid, rn, event_id, tsec, v, v AS l FROM p WHERE rn = 1
      UNION ALL
      SELECT p.sid, p.rn, p.event_id, p.tsec, p.v,
             power(2, -(p.tsec - r.tsec) / 3600.0) * r.l
             + (1 - power(2, -(p.tsec - r.tsec) / 3600.0)) * p.v
      FROM r JOIN p ON p.sid = r.sid AND p.rn = r.rn + 1
    )
    SELECT sid AS series_id, event_id,
           CAST(ROUND(v * 1e6) AS BIGINT) AS v_e6,
           CAST(ROUND(l * 1e6) AS BIGINT) AS ewma_e6
    FROM r
    """,
)
def ts_ewma_irregular(spark, sf_dir):
    """Time-aware EWMA on a 1-in-97 systematic sample of events —
    irregular gaps by construction (the whole point of the operator).
    The Arrow stage's sequential recurrence is mirrored by a
    recursive CTE evaluating the identical 2^(-dt/hl) weights; the
    sample bounds the oracle's recursion depth."""
    ev = _ev(spark, sf_dir).where(F.col("event_id") % 97 == 0)
    out = analytics.ewma_irregular(
        ev, keys=["event_type"], ts_col="ts", value_col="value",
        halflife_s=3600.0, order_cols=["event_id"],
    )
    return out.select(
        F.col("event_type").alias("series_id"),
        "event_id",
        _e("v", 6).alias("v_e6"),
        _e("ewma", 6).alias("ewma_e6"),
    )


@q(
    "ts_holt_winters",
    """
    WITH RECURSIVE b AS (
      SELECT event_type AS sid,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ep,
             avg(value) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    o AS (
      SELECT sid, ep, v,
             row_number() OVER (PARTITION BY sid ORDER BY ep) AS rn,
             count(*) OVER (PARTITION BY sid) AS n
      FROM b
    ),
    init AS (
      SELECT sid,
             avg(v) FILTER (WHERE rn <= 24) AS m1,
             avg(v) FILTER (WHERE rn > 24 AND rn <= 48) AS m2
      FROM o WHERE n >= 48 GROUP BY sid
    ),
    sl AS (
      SELECT o.sid, list(o.v - i.m1 ORDER BY o.rn) AS s0, i.m1, i.m2
      FROM o JOIN init i ON i.sid = o.sid
      WHERE o.rn <= 24
      GROUP BY o.sid, i.m1, i.m2
    ),
    r AS (
      SELECT sid, 24 AS t, m1 AS l, (m2 - m1) / 24.0 AS tr, s0 AS s,
             CAST(NULL AS DOUBLE) AS fitted, CAST(NULL AS DOUBLE) AS yv,
             CAST(NULL AS BIGINT) AS ep, CAST(NULL AS DOUBLE) AS snew
      FROM sl
      UNION ALL
      SELECT o.sid, r.t + 1,
             0.5 * (o.v - r.s[1]) + 0.5 * (r.l + r.tr),
             0.25 * ((0.5 * (o.v - r.s[1]) + 0.5 * (r.l + r.tr)) - r.l)
               + 0.75 * r.tr,
             list_append(
               r.s[2:],
               0.25 * (o.v - (0.5 * (o.v - r.s[1]) + 0.5 * (r.l + r.tr)))
                 + 0.75 * r.s[1]
             ),
             r.l + r.tr + r.s[1],
             o.v, o.ep,
             0.25 * (o.v - (0.5 * (o.v - r.s[1]) + 0.5 * (r.l + r.tr)))
               + 0.75 * r.s[1]
      FROM r JOIN o ON o.sid = r.sid AND o.rn = r.t + 1
    )
    SELECT sid AS series_id, ep,
           CAST(ROUND(yv * 1e6) AS BIGINT) AS v_e6,
           CAST(ROUND(l * 1e6) AS BIGINT) AS level_e6,
           CAST(ROUND(tr * 1e6) AS BIGINT) AS trend_e6,
           CAST(ROUND(snew * 1e6) AS BIGINT) AS seasonal_e6,
           CAST(ROUND(fitted * 1e6) AS BIGINT) AS fitted_e6
    FROM r WHERE t > 24
    """,
)
def ts_holt_winters(spark, sf_dir):
    """Holt-Winters additive seasonal smoothing (P=24 hour-of-day)
    per event_type — the oracle's recursive CTE carries the seasonal
    vector as a LIST and evaluates the identical binary-exact
    a=.5/B=.25/g=.25 expression shapes; init m1/m2/(m2-m1)/P and the
    emit-from-bucket-P+1 rule pinned on both sides."""
    out = analytics.holt_winters(
        _ev(spark, sf_dir), keys=["event_type"], ts_col="ts",
        value_col="value", trunc="hour", period=24,
        alpha=0.5, beta=0.25, gamma=0.25,
    )
    return out.select(
        F.col("event_type").alias("series_id"),
        "ep",
        _e("v", 6).alias("v_e6"),
        _e("level", 6).alias("level_e6"),
        _e("trend", 6).alias("trend_e6"),
        _e("seasonal", 6).alias("seasonal_e6"),
        _e("fitted", 6).alias("fitted_e6"),
    )


@q(
    "ts_sliding_1h",
    """
    SELECT event_id,
           CAST(count(value) OVER w AS BIGINT) AS win_n,
           CAST(ROUND(sum(value) OVER w * 1e4) AS BIGINT) AS sum_e4,
           CAST(ROUND(CAST(ROUND(sum(value) OVER w * 1e4) AS BIGINT)
                      * 100.0 / count(value) OVER w) AS BIGINT) AS mean_e6
    FROM (
      SELECT event_id, value,
             event_type, epoch_us(ts) AS ep
      FROM events
    )
    WINDOW w AS (PARTITION BY event_type ORDER BY ep
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def ts_sliding_1h(spark, sf_dir):
    """Trailing 1-hour RANGE-frame stats as of every event — the
    time-based moving frame (ROWS frames and bucket rollups cannot
    express 'the past hour as of this exact event'). Same-timestamp
    rows share identical frames, so the result is deterministic
    without a tie-break column."""
    out = analytics.sliding_window_stats(
        _ev(spark, sf_dir), keys=["event_type"], ts_col="ts",
        value_col="value", window_s=3600,
    )
    s4 = _e("win_sum", 4)
    # canonical mean from the ROUNDED integer sum: the raw frame sums
    # differ in ulps across engines (incremental vs segment-tree
    # sliding aggregation), and sum/32 lands exactly on .5 e6 ticks
    return out.select(
        "event_id",
        "win_n",
        s4.alias("sum_e4"),
        F.round(s4 * 100.0 / F.col("win_n")).cast("bigint").alias("mean_e6"),
    )


@q(
    "ts_winsorized_1h",
    """
    WITH pts AS (
      SELECT event_type, date_trunc('hour', ts) AS w, value AS v
      FROM events WHERE value IS NOT NULL
    ),
    cuts AS (
      SELECT event_type, w,
             quantile_cont(v, 0.05) AS lo, quantile_cont(v, 0.95) AS hi
      FROM pts GROUP BY 1, 2
    )
    SELECT p.event_type AS series_id,
           CAST(epoch(p.w) AS BIGINT) AS ep,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(ROUND(avg(greatest(least(p.v, c.hi), c.lo)) * 1e6)
             AS BIGINT) AS win_mean_e6,
           CAST(ROUND(avg(p.v) * 1e6) AS BIGINT) AS raw_mean_e6,
           CAST(ROUND(any_value(c.lo) * 1e6) AS BIGINT) AS p_lo_e6,
           CAST(ROUND(any_value(c.hi) * 1e6) AS BIGINT) AS p_hi_e6
    FROM pts p JOIN cuts c ON c.event_type = p.event_type AND c.w = p.w
    GROUP BY 1, 2
    """,
)
def ts_winsorized_1h(spark, sf_dir):
    """Winsorized hourly mean per event_type: per-bucket exact
    [p05, p95] clamp then average, plain mean alongside — Spark
    F.percentile and DuckDB quantile_cont share the interpolated
    definition."""
    out = analytics.winsorized_mean(
        _ev(spark, sf_dir), keys=["event_type"], ts_col="ts",
        value_col="value", trunc="hour", p_lo=0.05, p_hi=0.95,
    )
    return out.select(
        F.col("event_type").alias("series_id"),
        F.unix_timestamp("window_start").alias("ep"),
        "cnt",
        _e("win_mean", 6).alias("win_mean_e6"),
        _e("raw_mean", 6).alias("raw_mean_e6"),
        _e("p_lo", 6).alias("p_lo_e6"),
        _e("p_hi", 6).alias("p_hi_e6"),
    )


@q(
    "ts_spearman_matrix",
    """
    WITH b AS (
      SELECT event_type AS k,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ep,
             avg(value) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    j AS (
      SELECT a.k AS ka, b2.k AS kb, a.v AS x, b2.v AS y
      FROM b a JOIN b b2 ON a.ep = b2.ep AND a.k < b2.k
    ),
    ranked AS (
      SELECT ka, kb,
             rank() OVER (PARTITION BY ka, kb ORDER BY x)
               + (count(*) OVER (PARTITION BY ka, kb, x) - 1) / 2.0 AS rx,
             rank() OVER (PARTITION BY ka, kb ORDER BY y)
               + (count(*) OVER (PARTITION BY ka, kb, y) - 1) / 2.0 AS ry
      FROM j
    ),
    agg AS (
      SELECT ka, kb, count(*) AS n, sum(rx) AS sx, sum(ry) AS sy,
             sum(rx * ry) AS sxy, sum(rx * rx) AS sxx, sum(ry * ry) AS syy
      FROM ranked GROUP BY 1, 2
    )
    SELECT ka, kb, CAST(n AS BIGINT) AS n,
           CASE WHEN n >= 2 AND (n * sxx - sx * sx) > 0
                     AND (n * syy - sy * sy) > 0 THEN
             CAST(ROUND((n * sxy - sx * sy)
                        / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
                        * 1e4) AS BIGINT)
           END AS rho_e4
    FROM agg
    """,
)
def ts_spearman_matrix(spark, sf_dir):
    """All-pairs Spearman rank correlation (per-pair re-rank over the
    common buckets, average-rank ties) — corr_matrix's robust twin;
    rank sums are near-integer so the five-sum Pearson on ranks is
    ulp-stable at e4."""
    out = analytics.spearman_matrix(
        _ev(spark, sf_dir), keys=["event_type"], ts_col="ts",
        value_col="value", trunc="hour",
    )
    return out.select("ka", "kb", "n", _e("spearman_rho", 4).alias("rho_e4"))


@q(
    "ts_theil_sen",
    """
    WITH sub AS (
      SELECT event_type AS k, date_trunc('day', ts) AS w,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ep,
             avg(value) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2, 3
    ),
    pairs AS (
      SELECT a.k, a.w, (b.v - a.v) / ((b.ep - a.ep) / 3600.0) AS s
      FROM sub a JOIN sub b
        ON a.k = b.k AND a.w = b.w AND a.ep < b.ep
    ),
    sl AS (
      SELECT k, w, count(*) AS n_pairs, median(s) AS slope
      FROM pairs GROUP BY 1, 2
    ),
    nb AS (SELECT k, w, count(*) AS n_buckets FROM sub GROUP BY 1, 2)
    SELECT nb.k AS series_id, CAST(epoch(nb.w) AS BIGINT) AS ep,
           CAST(nb.n_buckets AS BIGINT) AS n_buckets,
           CAST(coalesce(sl.n_pairs, 0) AS BIGINT) AS n_pairs,
           CAST(ROUND(sl.slope * 1e6) AS BIGINT) AS slope_e6
    FROM nb LEFT JOIN sl ON sl.k = nb.k AND sl.w = nb.w
    """,
)
def ts_theil_sen(spark, sf_dir):
    """Theil-Sen robust daily trend per event_type from hourly means
    — pairwise-slope median (<=276 pairs per group, calendar-bounded
    self-join), exact interpolated median both sides."""
    out = analytics.theil_sen(
        _ev(spark, sf_dir), keys=["event_type"], ts_col="ts",
        value_col="value", trunc="hour", per="day",
    )
    return out.select(
        F.col("event_type").alias("series_id"),
        F.unix_timestamp("window_start").alias("ep"),
        "n_buckets",
        "n_pairs",
        _e("slope_per_h", 6).alias("slope_e6"),
    )


@q(
    "ts_decompose",
    """
    WITH b AS (
      SELECT event_type AS sid,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ep,
             avg(value) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    t AS (
      SELECT sid, ep, v,
             CASE WHEN count(*) OVER w = 25 THEN avg(v) OVER w END AS trend
      FROM b
      WINDOW w AS (PARTITION BY sid ORDER BY ep
                   ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
    ),
    det AS (
      SELECT *, v - trend AS detr,
             CAST(EXTRACT(hour FROM to_timestamp(ep)) AS INT) AS hod
      FROM t
    ),
    prof AS (
      SELECT sid, hod, avg(detr) AS s_raw
      FROM det WHERE detr IS NOT NULL GROUP BY 1, 2
    ),
    pm AS (SELECT sid, avg(s_raw) AS s_mean FROM prof GROUP BY 1),
    pc AS (
      SELECT p.sid, p.hod, p.s_raw - m.s_mean AS seasonal
      FROM prof p JOIN pm m ON m.sid = p.sid
    )
    SELECT d.sid AS series_id, d.ep,
           CAST(ROUND(d.v * 1e6) AS BIGINT) AS v_e6,
           CAST(ROUND(d.trend * 1e6) AS BIGINT) AS trend_e6,
           CAST(ROUND(pc.seasonal * 1e6) AS BIGINT) AS seasonal_e6,
           CAST(ROUND((d.v - d.trend - pc.seasonal) * 1e6) AS BIGINT)
             AS residual_e6
    FROM det d LEFT JOIN pc ON pc.sid = d.sid AND pc.hod = d.hod
    """,
)
def ts_decompose(spark, sf_dir):
    """STL-lite decomposition per event_type: full-frame-only
    centered MA trend, zero-centered hour-of-day seasonal profile,
    residual = the anomaly feed."""
    out = analytics.decompose(
        _ev(spark, sf_dir), keys=["event_type"], ts_col="ts",
        value_col="value", trunc="hour", half_window=12,
    )
    return out.select(
        F.col("event_type").alias("series_id"),
        "ep",
        _e("v", 6).alias("v_e6"),
        _e("trend", 6).alias("trend_e6"),
        _e("seasonal", 6).alias("seasonal_e6"),
        _e("residual", 6).alias("residual_e6"),
    )


@q(
    "seq_hapax_rate",
    _synth_cte()
    + _HIST_CTE
    + """
    SELECT source, ep AS bucket_ep,
           count(*) AS n_distinct,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hapax,
           CAST(sum(c) AS BIGINT) AS total_c,
           CAST(ROUND(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1.0
                      / count(*) * 1e6) AS BIGINT) AS hapax_e6
    FROM cnt GROUP BY 1, 2
    """,
)
def seq_hapax_rate(spark, sf_dir):
    """Hapax legomena rate per (source, hour) — integer-exact from
    the token-histogram tier."""
    return textops.hapax_rate(_seq(spark), by="source", trunc="hour")


@q(
    "ts_ks_drift",
    """
    WITH b AS (
      SELECT event_type AS k, date_trunc('day', ts) AS w, value AS v
      FROM events WHERE value IS NOT NULL
    ),
    u AS (
      SELECT k, w AS cw, 1 AS is_cur, v FROM b
      UNION ALL
      SELECT k, w + INTERVAL 1 DAY AS cw, 0 AS is_cur, v FROM b
    ),
    c AS (
      SELECT k, cw, v,
             sum(is_cur) AS c_cur, sum(1 - is_cur) AS c_prev
      FROM u GROUP BY 1, 2, 3
    ),
    e AS (
      SELECT k, cw,
             abs(sum(c_cur) OVER (PARTITION BY k, cw ORDER BY v)
                   / sum(c_cur) OVER (PARTITION BY k, cw)
               - sum(c_prev) OVER (PARTITION BY k, cw ORDER BY v)
                   / sum(c_prev) OVER (PARTITION BY k, cw)) AS d,
             sum(c_cur) OVER (PARTITION BY k, cw) AS n_cur,
             sum(c_prev) OVER (PARTITION BY k, cw) AS n_prev
      FROM c
    )
    SELECT k AS series_id, CAST(epoch(cw) AS BIGINT) AS ep,
           CAST(max(n_prev) AS BIGINT) AS n_prev,
           CAST(max(n_cur) AS BIGINT) AS n_cur,
           CAST(ROUND(max(d) * 1e9) AS BIGINT) AS ks_e9
    FROM e GROUP BY 1, 2
    HAVING max(n_prev) > 0 AND max(n_cur) > 0
    """,
)
def ts_ks_drift(spark, sf_dir):
    """Exact two-sample KS statistic, each day vs its predecessor per
    event_type — counts-ratio arithmetic is IEEE-exact cross-engine,
    so the e9 hash carries the full double precision."""
    out = analytics.ks_drift(
        _ev(spark, sf_dir), keys=["event_type"], ts_col="ts",
        value_col="value", trunc="day",
    )
    return out.select(
        F.col("event_type").alias("series_id"),
        F.unix_timestamp("window_start").alias("ep"),
        "n_prev",
        "n_cur",
        _e("ks_stat", 9).alias("ks_e9"),
    )


@q(
    "ts_psi_drift",
    """
    WITH b AS (
      SELECT event_type AS k, date_trunc('day', ts) AS w,
             CASE WHEN value < 0.0 THEN 0
                  WHEN value >= 500.0 THEN 21
                  ELSE CAST(floor(value / 500.0 * 20) AS BIGINT) + 1
             END AS bucket
      FROM events WHERE value IS NOT NULL
    ),
    u AS (
      SELECT k, w AS cw, 1 AS is_cur, bucket FROM b
      UNION ALL
      SELECT k, w + INTERVAL 1 DAY AS cw, 0 AS is_cur, bucket FROM b
    ),
    c AS (
      SELECT k, cw, bucket,
             sum(is_cur) AS c_cur, sum(1 - is_cur) AS c_prev
      FROM u GROUP BY 1, 2, 3
    ),
    e AS (
      SELECT k, cw,
             ((c_cur + 0.5) / (sum(c_cur) OVER pw + 0.5 * count(*) OVER pw)
              - (c_prev + 0.5)
                  / (sum(c_prev) OVER pw + 0.5 * count(*) OVER pw))
             * ln(((c_cur + 0.5)
                     / (sum(c_cur) OVER pw + 0.5 * count(*) OVER pw))
                  / ((c_prev + 0.5)
                     / (sum(c_prev) OVER pw + 0.5 * count(*) OVER pw)))
               AS term,
             sum(c_cur) OVER pw AS n_cur,
             sum(c_prev) OVER pw AS n_prev
      FROM c WINDOW pw AS (PARTITION BY k, cw)
    )
    SELECT k AS series_id, CAST(epoch(cw) AS BIGINT) AS ep,
           CAST(max(n_prev) AS BIGINT) AS n_prev,
           CAST(max(n_cur) AS BIGINT) AS n_cur,
           CAST(ROUND(sum(term) * 1e6) AS BIGINT) AS psi_e6
    FROM e GROUP BY 1, 2
    HAVING max(n_prev) > 0 AND max(n_cur) > 0
    """,
)
def ts_psi_drift(spark, sf_dir):
    """Population Stability Index day-over-day per event_type over
    width_bucket(0, 500, 20) value bins with 0.5 additive smoothing;
    the ≤22-term ln sum hashes at e6."""
    out = analytics.psi_drift(
        _ev(spark, sf_dir), keys=["event_type"], ts_col="ts",
        value_col="value", trunc="day", lo=0.0, hi=500.0, nbins=20,
        smooth=0.5,
    )
    return out.select(
        F.col("event_type").alias("series_id"),
        F.unix_timestamp("window_start").alias("ep"),
        "n_prev",
        "n_cur",
        _e("psi", 6).alias("psi_e6"),
    )


@q(
    "ts_completeness",
    """
    WITH slots AS (
      SELECT DISTINCT event_type AS k,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS slot
      FROM events
    ),
    present AS (
      SELECT k, slot - slot % 86400 AS day, count(*) AS np
      FROM slots GROUP BY 1, 2
    ),
    span AS (SELECT k, min(slot) AS s0, max(slot) AS s1 FROM slots GROUP BY 1),
    days AS (
      SELECT k, s0, s1,
             unnest(range(s0 - s0 % 86400,
                          s1 - s1 % 86400 + 86400, 86400)) AS day
      FROM span
    ),
    calc AS (
      SELECT d.k, d.day,
             (least(d.day + 86400 - 3600, d.s1)
              - greatest(d.day, d.s0)) // 3600 + 1 AS ne,
             coalesce(p.np, 0) AS npres
      FROM days d LEFT JOIN present p ON p.k = d.k AND p.day = d.day
    )
    SELECT k AS series_id, day AS day_ep,
           CAST(ne AS BIGINT) AS slots_expected,
           CAST(npres AS BIGINT) AS slots_present,
           CAST(ROUND(npres * 1.0 / ne * 1e9) AS BIGINT) AS coverage_e9
    FROM calc
    """,
)
def ts_completeness(spark, sf_dir):
    """Hour-slot completeness per (event_type, UTC day) incl.
    zero-coverage days from the per-series day spine — integer epoch
    math throughout, the coverage ratio is IEEE-exact."""
    out = analytics.completeness(
        _ev(spark, sf_dir), keys=["event_type"], ts_col="ts", trunc="hour"
    )
    return out.select(
        F.col("event_type").alias("series_id"),
        F.unix_timestamp("day_ts").alias("day_ep"),
        "slots_expected",
        "slots_present",
        _e("coverage", 9).alias("coverage_e9"),
    )


@q(
    "doc_mixture_sample",
    """
    WITH u AS (
      SELECT doc_id, source,
             CAST(concat('0x',
               substr(md5(concat_ws('#', 'mix',
                                    CAST(doc_id AS VARCHAR))), 1, 15))
               AS BIGINT) / 1152921504606846976.0 AS u
      FROM documents
    )
    SELECT doc_id, source,
           CAST(ROUND(u * 1e9) AS BIGINT) AS u_e9
    FROM u
    WHERE u < (CAST(substr(source, 4) AS INT) % 4 + 1) * 0.2
    """,
)
def doc_mixture_sample(spark, sf_dir):
    """Deterministic mixture sampling of documents at per-source
    rates 0.2/0.4/0.6/0.8 (source number mod 4) — md5_60-derived
    uniform, broadcast rate dim, membership stable across engines
    and re-runs."""
    rates = spark.createDataFrame(
        [(f"src{i}", ((i % 4) + 1) * 0.2) for i in range(20)],
        "source string, rate double",
    )
    out = textops.mixture_sample(_docs(spark, sf_dir), rates, seed="mix")
    return out.select("doc_id", "source", _e("u", 9).alias("u_e9"))


@q(
    "seq_dup_ngram",
    _synth_cte()
    + """
    SELECT doc_id,
           CAST(len(tokens) - 3 AS BIGINT) AS n_grams,
           CAST(len(list_distinct(list_transform(
                  range(0, len(tokens) - 3),
                  i -> array_to_string(tokens[i+1:i+4], ',')
                ))) AS BIGINT) AS n_distinct_grams,
           CAST(ROUND((1.0 - len(list_distinct(list_transform(
                  range(0, len(tokens) - 3),
                  i -> array_to_string(tokens[i+1:i+4], ',')
                ))) * 1.0 / (len(tokens) - 3)) * 1e9) AS BIGINT)
             AS dup_frac_e9
    FROM seq
    """,
)
def seq_dup_ngram(spark, sf_dir):
    """Token-level duplicate 4-gram fraction per sequence — Gopher
    repetition on token ids, row-local, zero shuffles."""
    out = textops.with_dup_ngram(_seq(spark), n=4)
    return out.select(
        "doc_id",
        F.col("n_grams").cast("bigint").alias("n_grams"),
        F.col("n_distinct_grams").cast("bigint").alias("n_distinct_grams"),
        _e("dup_frac", 9).alias("dup_frac_e9"),
    )


@q(
    "seq_countmin_est",
    _synth_cte()
    + _HIST_CTE
    + """
    , tc AS (SELECT t, CAST(sum(c) AS BIGINT) AS exact_c FROM cnt GROUP BY 1),
    js AS (SELECT unnest(range(0, 4)) AS j),
    sk AS (
      SELECT j,
             CAST(concat('0x', substr(md5(concat_ws('#',
               CAST(j AS VARCHAR), CAST(t AS VARCHAR))), 1, 15))
               AS BIGINT) % 64 AS bucket,
             sum(exact_c) AS cnt
      FROM tc CROSS JOIN js GROUP BY 1, 2
    ),
    top AS (SELECT t, exact_c FROM tc ORDER BY exact_c DESC, t LIMIT 20),
    qe AS (
      SELECT tp.t, tp.exact_c, js.j,
             CAST(concat('0x', substr(md5(concat_ws('#',
               CAST(js.j AS VARCHAR), CAST(tp.t AS VARCHAR))), 1, 15))
               AS BIGINT) % 64 AS bucket
      FROM top tp CROSS JOIN js
    )
    SELECT qe.t AS token, max(qe.exact_c) AS exact_c,
           CAST(min(sk.cnt) AS BIGINT) AS est_c
    FROM qe JOIN sk ON sk.j = qe.j AND sk.bucket = qe.bucket
    GROUP BY 1
    """,
)
def seq_countmin_est(spark, sf_dir):
    """Count-min sketch (4×64, md5_60 rows) built from the token
    histogram tier, point-queried for the top-20 tokens — estimates
    are integer-exact cross-engine and ≥ the true counts by
    construction."""
    from tokens_ts import sketch

    hist = textops.token_histogram(_seq(spark))
    tc = hist.groupBy("t").agg(F.sum("c").cast("bigint").alias("exact_c"))
    sk = sketch.count_min(tc, "t", weight_col="exact_c", depth=4, width=64)
    top = tc.orderBy(F.desc("exact_c"), "t").limit(20)
    est = sketch.cm_estimate(sk, top, "t", depth=4, width=64)
    return (
        top.join(est, "t")
        .select(
            F.col("t").alias("token"),
            "exact_c",
            "est_c",
        )
    )


@q(
    "seq_token_contamination",
    _synth_cte()
    + """
    , clean AS (
      SELECT doc_id, source, s, k,
             list_filter(tokens, x -> x <> 0) AS ct
      FROM seq
    ),
    evg AS (
      SELECT DISTINCT CAST(concat('0x', substr(md5(g), 1, 15))
               AS BIGINT) AS h
      FROM (
        SELECT unnest(list_transform(range(0, len(ct) - 7),
                 i -> array_to_string(ct[i+1:i+8], ','))) AS g
        FROM clean WHERE s = 0 AND k % 37 = 0 AND len(ct) >= 8
      )
    ),
    cg AS (
      SELECT doc_id, unnest(list_transform(range(0, len(ct) - 7),
               i -> array_to_string(ct[i+1:i+8], ','))) AS g
      FROM clean WHERE len(ct) >= 8
    ),
    hits AS (
      SELECT doc_id, count(*) AS n_hit
      FROM cg JOIN evg
        ON evg.h = CAST(concat('0x', substr(md5(cg.g), 1, 15)) AS BIGINT)
      GROUP BY 1
    )
    SELECT c.doc_id, c.source,
           CAST(CASE WHEN len(c.ct) >= 8 THEN len(c.ct) - 7 ELSE 0 END
             AS BIGINT) AS n_grams,
           CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
           CASE WHEN len(c.ct) >= 8 THEN
             CAST(ROUND(coalesce(h.n_hit, 0) * 1.0 / (len(c.ct) - 7) * 1e9)
               AS BIGINT)
           END AS overlap_e9
    FROM clean c LEFT JOIN hits h USING (doc_id)
    """,
)
def seq_token_contamination(spark, sf_dir):
    """Decontamination on token IDS: 8-gram overlap of every synth
    sequence against the deterministic eval subset (src00, k % 37 == 0)
    — PAD-stripped, md5_60-hashed, eval grams broadcast."""
    seq = _seq(spark)
    ev = seq.where((F.col("source") == "src00") & (F.col("k") % 37 == 0))
    out = dedup.token_contamination(seq, ev, n=8)
    return out.select(
        "doc_id",
        "source",
        "n_grams",
        "n_hit",
        _e("overlap_ratio", 9).alias("overlap_e9"),
    )


@q(
    "ts_pettitt",
    """
    WITH b AS (
      SELECT event_type AS k,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ep,
             avg(value) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    r AS (
      SELECT k, ep,
             2 * rank() OVER (PARTITION BY k ORDER BY v)
               + count(*) OVER (PARTITION BY k, v) - 1 AS m2,
             count(*) OVER (PARTITION BY k) AS n
      FROM b
    ),
    u AS (
      SELECT k, ep, n,
             sum(m2) OVER (PARTITION BY k ORDER BY ep)
               - row_number() OVER (PARTITION BY k ORDER BY ep) * (n + 1)
               AS u_t,
             row_number() OVER (PARTITION BY k ORDER BY ep) AS t
      FROM r
    ),
    m AS (SELECT k, ep, n, abs(u_t) AS au FROM u WHERE t < n),
    x AS (SELECT k, max(n) AS n, max(au) AS k_stat FROM m GROUP BY 1)
    SELECT m.k AS series_id,
           CAST(x.n AS BIGINT) AS n,
           CAST(x.k_stat AS BIGINT) AS k_stat,
           CAST(min(m.ep) AS BIGINT) AS cp_ep,
           CAST(ROUND(LEAST(1.0,
                 2.0 * exp(-6.0 * x.k_stat * x.k_stat
                           / (CAST(x.n AS DOUBLE) * x.n * x.n
                              + CAST(x.n AS DOUBLE) * x.n))) * 1e6)
             AS BIGINT) AS p_e6
    FROM m JOIN x ON m.k = x.k AND m.au = x.k_stat
    GROUP BY m.k, x.n, x.k_stat
    """,
)
def ts_pettitt(spark, sf_dir):
    """Pettitt rank changepoint per event_type over hourly means —
    integer-exact U_t via the midrank identity (no O(n²) pair sum)."""
    return analytics.pettitt(
        _ev(spark, sf_dir), keys=["event_type"], ts_col="ts",
        value_col="value", trunc="hour",
    ).select(
        F.col("event_type").alias("series_id"), "n", "k_stat", "cp_ep", "p_e6"
    )


@q(
    "ts_interval_coverage",
    """
    WITH iv AS (
      SELECT event_type AS k,
             CAST(floor(epoch(ts)) AS BIGINT) AS s,
             CAST(floor(epoch(ts)) AS BIGINT)
               + GREATEST(1, LEAST(300, CAST(floor(value) AS BIGINT))) AS e
      FROM events WHERE value IS NOT NULL
    ),
    g AS (
      SELECT k, s - s % 86400 AS bucket_ep, s, e,
             max(e) OVER (PARTITION BY k, s - s % 86400 ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS pe
      FROM iv
    )
    SELECT k AS series_id, bucket_ep,
           count(*) AS n_intervals,
           CAST(sum(GREATEST(0, e - GREATEST(s, COALESCE(pe, s))))
             AS BIGINT) AS covered_s,
           CAST(sum(CASE WHEN pe IS NULL OR s > pe THEN 1 ELSE 0 END)
             AS BIGINT) AS n_islands
    FROM g GROUP BY 1, 2
    """,
)
def ts_interval_coverage(spark, sf_dir):
    """Interval-union coverage per (event_type, day): each event spans
    [ts, ts + clamp(floor(value), 1, 300)) seconds; overlaps must not
    double-count. Gaps-and-islands via one cummax window, no self-join."""
    ev = _ev(spark, sf_dir).where(F.col("value").isNotNull())
    iv = ev.select(
        F.col("event_type").alias("series_id"),
        F.unix_timestamp("ts").alias("start_s"),
        (
            F.unix_timestamp("ts")
            + F.greatest(
                F.lit(1).cast("long"),
                F.least(F.lit(300).cast("long"), F.floor("value").cast("long")),
            )
        ).alias("end_s"),
    )
    return analytics.interval_coverage(
        iv, keys=["series_id"], start_col="start_s", end_col="end_s",
        trunc_s=86400,
    )


@q(
    "seq_good_turing",
    _synth_cte()
    + """
    , cnt AS (
      SELECT source, t, count(*) AS c
      FROM (SELECT source, unnest(tokens) AS t FROM seq)
      WHERE t <> 0 GROUP BY 1, 2
    ),
    coc AS (SELECT source, c AS r, count(*) AS n_r FROM cnt GROUP BY 1, 2)
    SELECT a.source, CAST(a.r AS BIGINT) AS r, CAST(a.n_r AS BIGINT) AS n_r,
           CAST(ROUND((a.r + 1) * 1.0 * b.n_r / a.n_r * 1e6) AS BIGINT)
             AS r_star_e6
    FROM coc a LEFT JOIN coc b ON a.source = b.source AND b.r = a.r + 1
    """,
)
def seq_good_turing(spark, sf_dir):
    """Good-Turing counts-of-counts per source with the r* estimate —
    integer-ratio exact, vocab-bounded after one explode."""
    out = textops.good_turing(_seq(spark), by="source", pad_id=C.PAD_ID)
    return out.select(
        "source", "r", "n_r", _e("r_star", 6).alias("r_star_e6")
    )


@q(
    "seq_bigram_logprob",
    _synth_cte()
    + """
    , bg AS (
      SELECT doc_id, tokens[i] AS a, tokens[i + 1] AS b
      FROM seq, unnest(range(1, len(tokens))) AS u(i)
      WHERE tokens[i] <> 0 AND tokens[i + 1] <> 0
    ),
    bgc AS (SELECT a, b, count(*) AS cab FROM bg GROUP BY 1, 2),
    ua AS (SELECT a, sum(cab) AS ca FROM bgc GROUP BY 1),
    vv AS (
      SELECT CAST(count(DISTINCT t) AS DOUBLE) AS v
      FROM (SELECT unnest(tokens) AS t FROM seq) WHERE t <> 0
    )
    SELECT bg.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(ROUND(sum(ln((bgc.cab + 0.5) / (ua.ca + 0.5 * vv.v)))
                      * 1e6) AS BIGINT) AS lp_e6,
           CAST(ROUND(-sum(ln((bgc.cab + 0.5) / (ua.ca + 0.5 * vv.v)))
                      / count(*) * 1e6) AS BIGINT) AS nll_e6
    FROM bg JOIN bgc USING (a, b) JOIN ua USING (a) CROSS JOIN vv
    GROUP BY 1
    """,
)
def seq_bigram_logprob(spark, sf_dir):
    """Per-doc log-likelihood under the corpus add-0.5 bigram LM —
    the order-sensitive fluency score (shuffled docs drop, repeated
    boilerplate rises); docs with <2 non-PAD tokens are absent."""
    out = textops.bigram_logprob(_seq(spark), pad_id=C.PAD_ID, k=0.5)
    return out.select(
        "doc_id",
        "n_bigrams",
        _e("logprob", 6).alias("lp_e6"),
        _e("avg_nll", 6).alias("nll_e6"),
    )


@q(
    "doc_bm25_topk",
    """
    WITH base AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
               AS dl,
             text
      FROM documents
    ),
    st AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM base
    ),
    tfl AS (
      SELECT doc_id, dl, t.term,
             len(list_filter(string_split_regex(text, '\\s+'),
                             x -> x = t.term)) AS tf
      FROM base, (VALUES ('fast'), ('merge'), ('query')) t(term)
    ),
    kept AS (SELECT * FROM tfl WHERE tf > 0),
    dfc AS (SELECT term, count(*) AS df FROM kept GROUP BY 1)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_terms,
           CAST(ROUND(sum(
             ln(1.0 + (st.n_docs - dfc.df + 0.5) / (dfc.df + 0.5))
             * (kept.tf * 2.2)
               / (kept.tf + 1.2 * (0.25 + 0.75 * kept.dl / st.avgdl))
           ) * 1e6) AS BIGINT) AS score_e6
    FROM kept JOIN dfc USING (term) CROSS JOIN st
    GROUP BY doc_id
    ORDER BY score_e6 DESC, doc_id ASC
    LIMIT 10
    """,
)
def doc_bm25_topk(spark, sf_dir):
    """BM25 top-10 for the fixed query {fast, merge, query} — Lucene
    idf, k1=1.2 / b=0.75, row-local tf (no vocab shuffle), ranked on
    the e6-rounded score with doc_id tie-break."""
    return textops.bm25_topk(
        _docs(spark, sf_dir), terms=["fast", "merge", "query"],
        k=10, k1=1.2, b=0.75,
    )


@q(
    "doc_winnowing",
    """
    WITH h AS (
      SELECT doc_id,
             list_transform(range(1, length(text) - 8 + 2),
               i -> CAST(concat('0x', substr(md5(text[i:i+7]), 1, 15))
                      AS BIGINT)) AS hs
      FROM documents WHERE length(text) >= 11
    ),
    f AS (
      SELECT doc_id, len(hs) AS n_grams,
             list_distinct(list_transform(range(1, len(hs) - 4 + 2),
               j -> list_min(hs[j:j+3]))) AS fps
      FROM h
    )
    SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
           CAST(len(fps) AS BIGINT) AS n_fp,
           md5(array_to_string(list_sort(fps), ',')) AS fp_md5
    FROM f
    """,
)
def doc_winnowing(spark, sf_dir):
    """Winnowing (MOSS) fingerprints, 8-char grams × window 4 — the
    full selected-hash set digested per doc, value-checked
    cross-engine (md5_60 grams in both engines)."""
    return dedup.winnowing_fingerprints(_docs(spark, sf_dir), k=8, w=4)


@q(
    "doc_normalized_dedup",
    """
    WITH aug AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000,
             upper(text) || '!!  ' || chr(10)
      FROM documents WHERE doc_id % 7 = 0
    ),
    c AS (
      SELECT doc_id,
             md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
               AS canon_md5
      FROM aug
    )
    SELECT canon_md5, CAST(count(*) AS BIGINT) AS n_docs,
           min(doc_id) AS keep_id
    FROM c GROUP BY 1 HAVING count(*) >= 2
    """,
)
def doc_normalized_dedup(spark, sf_dir):
    """Canonicalized exact dedup (lower + punctuation/whitespace
    collapse): duplicate groups with min-doc_id survivor — the cheap
    fuzzy tier between byte-exact and MinHash. The corpus has no
    native case/punct variants, so both engines plant the same
    deterministic ones (every doc_id % 7 == 0 doc re-ingested
    uppercased with trailing junk) — the operator must fold each
    planted variant onto its original."""
    d = _docs(spark, sf_dir)
    aug = d.select("doc_id", "text").unionByName(
        d.where(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.upper("text"), F.lit("!!  \n")).alias("text"),
        )
    )
    return dedup.normalized_dedup(aug)


@q(
    "ts_ljung_box",
    """
    WITH b AS (
      SELECT event_type AS series_id,
             CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS ep,
             avg(value) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    nn AS (SELECT series_id, count(*) AS n FROM b GROUP BY 1),
    l AS (
      SELECT series_id, ep, v AS x, lg.lag
      FROM b CROSS JOIN (SELECT unnest(range(1, 6)) AS lag) lg
    ),
    p AS (
      SELECT l.series_id, l.lag, l.x, r.v AS y
      FROM l JOIN b r ON r.series_id = l.series_id
                     AND r.ep = l.ep + l.lag * 60
    ),
    a AS (
      SELECT series_id, lag, CAST(count(*) AS DOUBLE) AS n,
             sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy,
             sum(x*x) AS sxx, sum(y*y) AS syy
      FROM p GROUP BY 1, 2
    ),
    rho AS (
      SELECT series_id, lag,
             CASE WHEN n >= 2 AND n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
                  THEN (n*sxy - sx*sy)
                       / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy))
             END AS r
      FROM a
    ),
    t AS (
      SELECT rho.series_id, nn.n, rho.r, rho.lag
      FROM rho JOIN nn USING (series_id)
      WHERE rho.r IS NOT NULL AND nn.n > rho.lag
    )
    SELECT series_id, CAST(max(n) AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS h,
           CAST(ROUND(CAST(max(n) AS DOUBLE) * (CAST(max(n) AS DOUBLE) + 2)
                 * sum(r * r / (CAST(n AS DOUBLE) - lag)) * 1e6)
             AS BIGINT) AS q_e6,
           CAST(max(n) AS DOUBLE) * (CAST(max(n) AS DOUBLE) + 2)
             * sum(r * r / (CAST(n AS DOUBLE) - lag))
             > (CASE count(*) WHEN 1 THEN 3.841 WHEN 2 THEN 5.991
                WHEN 3 THEN 7.815 WHEN 4 THEN 9.488 WHEN 5 THEN 11.070 END)
             AS alarm
    FROM t GROUP BY 1
    """,
)
def ts_ljung_box(spark, sf_dir):
    """Ljung-Box whiteness Q per series over minute buckets, lags
    1..5, composed on the gap-correct ACF; alarm vs χ²₀.₉₅(h)."""
    out = analytics.ljung_box(
        _ev(spark, sf_dir), keys=["event_type"], ts_col="ts",
        value_col="value", trunc="minute", max_lag=5,
    )
    return out.select(
        F.col("event_type").alias("series_id"),
        "n",
        "h",
        _e("q_lb", 6).alias("q_e6"),
        "alarm",
    )


@q(
    "ts_perm_entropy",
    """
    WITH base AS (
      SELECT event_type AS k, ts, event_id, value AS v,
             CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_ep
      FROM events WHERE value IS NOT NULL
    ),
    tr AS (
      SELECT k, day_ep,
             CAST((sign(lead(v, 1) OVER w - v) + 1) * 9
                + (sign(lead(v, 2) OVER w - lead(v, 1) OVER w) + 1) * 3
                + (sign(lead(v, 2) OVER w - v) + 1) AS INT) AS code,
             lead(v, 1) OVER w AS v1, lead(v, 2) OVER w AS v2
      FROM base WINDOW w AS (PARTITION BY k ORDER BY ts, event_id)
    ),
    cnt AS (
      SELECT k, day_ep, code, count(*) AS c FROM tr
      WHERE v1 IS NOT NULL AND v2 IS NOT NULL GROUP BY 1, 2, 3
    ),
    agg AS (
      SELECT k, day_ep, sum(c) AS n, sum(c * ln(c)) AS clnc
      FROM cnt GROUP BY 1, 2
    )
    SELECT k AS series_id, day_ep AS bucket_ep, CAST(n AS BIGINT) AS n_triples,
           CAST(ROUND((ln(CAST(n AS DOUBLE)) - clnc / n) * 1e6) AS BIGINT)
             AS pe_e6,
           CAST(ROUND((ln(CAST(n AS DOUBLE)) - clnc / n) / ln(6.0) * 1e6)
             AS BIGINT) AS pe_norm_e6
    FROM agg
    """,
)
def ts_perm_entropy(spark, sf_dir):
    """Order-3 permutation entropy per (series, day): ordinal codes of
    consecutive non-null value triples (ties are first-class codes),
    H = ln n − Σc·ln c / n, normalized by ln 6; duplicate timestamps
    disambiguated by event_id in BOTH engines."""
    out = analytics.permutation_entropy(
        _ev(spark, sf_dir), keys=["event_type"], ts_col="ts",
        value_col="value", order_cols=["event_id"], trunc="day",
    )
    return out.select(
        F.col("event_type").alias("series_id"),
        "bucket_ep",
        "n_triples",
        _e("pe", 6).alias("pe_e6"),
        _e("pe_norm", 6).alias("pe_norm_e6"),
    )


@q(
    "ts_dtw_daily",
    """
    WITH RECURSIVE
    h AS (
      SELECT event_type AS k,
             CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_ep,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hr,
             ROUND(avg(value) * 1e6) / 1e6 AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2, 3
    ),
    vec AS (
      SELECT k, day_ep, list(v ORDER BY hr) AS vec FROM h GROUP BY 1, 2
    ),
    pr AS (
      SELECT a.k, b.day_ep AS d, a.vec AS va, b.vec AS vb,
             len(a.vec) AS na, len(b.vec) AS nb
      FROM vec a JOIN vec b ON a.k = b.k AND b.day_ep = a.day_ep + 86400
    ),
    dp AS (
      SELECT k, d, va, vb, na, nb,
             1 AS i, 1 AS j,
             CAST([] AS DOUBLE[]) AS prev_row,
             [abs(va[1] - vb[1])] AS cur_row
      FROM pr
      UNION ALL
      SELECT k, d, va, vb, na, nb,
             CASE WHEN j = nb THEN i + 1 ELSE i END,
             CASE WHEN j = nb THEN 1 ELSE j + 1 END,
             CASE WHEN j = nb THEN cur_row ELSE prev_row END,
             CASE WHEN j = nb
                  THEN [abs(va[i + 1] - vb[1]) + cur_row[1]]
                  ELSE list_append(cur_row,
                    abs(va[i] - vb[j + 1]) +
                    CASE WHEN i = 1 THEN cur_row[j]
                         ELSE least(prev_row[j + 1], prev_row[j], cur_row[j])
                    END)
             END
      FROM dp WHERE NOT (i = na AND j = nb)
    )
    SELECT k AS series_id, d AS day_ep,
           CAST(na AS BIGINT) AS n_prev, CAST(nb AS BIGINT) AS n_cur,
           CAST(ROUND(cur_row[nb] * 1e6) AS BIGINT) AS dtw_e6
    FROM dp WHERE i = na AND j = nb
    """,
)
def ts_dtw_daily(spark, sf_dir):
    """DTW distance between each day's hourly-mean profile and the
    previous day's, per series — Arrow DP stage in Spark, the SAME
    row-major recurrence replayed by a recursive CTE in DuckDB
    (e6-rounded input means pin the vectors bit-identical first)."""
    out = analytics.dtw_daily(
        _ev(spark, sf_dir), keys=["event_type"], ts_col="ts",
        value_col="value",
    )
    return out.select(
        F.col("event_type").alias("series_id"),
        "day_ep",
        "n_prev",
        "n_cur",
        _e("dtw", 6).alias("dtw_e6"),
    )


@q(
    "ts_spectral_power",
    """
    WITH b AS (
      SELECT event_type AS k,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ep,
             avg(value) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    m AS (SELECT k, avg(v) AS mu FROM b GROUP BY 1),
    d AS (
      SELECT b.k, b.ep, b.v - m.mu AS vd, p.period_s
      FROM b JOIN m USING (k), (VALUES (86400), (43200)) p(period_s)
    ),
    a AS (
      SELECT k, period_s, count(*) AS n,
             sum(vd * sin(2 * pi() * (ep % period_s) / period_s)) AS s,
             sum(vd * cos(2 * pi() * (ep % period_s) / period_s)) AS c
      FROM d GROUP BY 1, 2
    )
    SELECT k AS series_id, CAST(period_s AS BIGINT) AS period_s,
           CAST(n AS BIGINT) AS n,
           CAST(ROUND((s*s + c*c) / (CAST(n AS DOUBLE) * n) * 1e6)
             AS BIGINT) AS power_e6,
           CAST(ROUND(2.0 * sqrt(s*s + c*c) / CAST(n AS DOUBLE) * 1e6)
             AS BIGINT) AS amplitude_e6
    FROM a
    """,
)
def ts_spectral_power(spark, sf_dir):
    """DFT projection at the 24 h and 12 h periods per series over
    demeaned hourly means — gap-correct seasonality strength (no FFT,
    no zero-fill: missing buckets contribute no term)."""
    out = analytics.spectral_power(
        _ev(spark, sf_dir), keys=["event_type"], periods_s=[86400, 43200],
        ts_col="ts", value_col="value", trunc="hour",
    )
    return out.select(
        F.col("event_type").alias("series_id"),
        "period_s",
        "n",
        _e("power", 6).alias("power_e6"),
        _e("amplitude", 6).alias("amplitude_e6"),
    )


@q(
    "seq_run_length",
    _synth_cte()
    + """
    , st AS (
      SELECT doc_id, len(tokens) AS n,
             list_filter(range(1, len(tokens) + 1),
               i -> i = 1 OR tokens[i] <> tokens[i - 1]) AS starts
      FROM seq WHERE len(tokens) > 0
    )
    SELECT doc_id, CAST(n AS BIGINT) AS n_tok,
           CAST(len(starts) AS BIGINT) AS n_runs,
           CAST(list_max(list_transform(range(1, len(starts) + 1),
             k -> (CASE WHEN k < len(starts) THEN starts[k + 1]
                        ELSE n + 1 END) - starts[k])) AS BIGINT) AS max_run,
           CAST(ROUND(n * 1.0 / len(starts) * 1e6) AS BIGINT) AS mean_run_e6
    FROM st
    """,
)
def seq_run_length(spark, sf_dir):
    """Run-length degeneracy stats per sequence (runs over the raw
    array, PAD included): n_runs, longest run, mean run — row-local
    Catalyst, no explode."""
    out = textops.run_length_stats(_seq(spark))
    return out.select(
        "doc_id", "n_tok", "n_runs", "max_run",
        _e("mean_run", 6).alias("mean_run_e6"),
    )


@q(
    "seq_cond_entropy",
    _synth_cte()
    + """
    , bg AS (
      SELECT source, tokens[i] AS a, tokens[i + 1] AS b
      FROM seq, unnest(range(1, len(tokens))) AS u(i)
      WHERE tokens[i] <> 0 AND tokens[i + 1] <> 0
    ),
    bgc AS (SELECT source, a, b, count(*) AS cab FROM bg GROUP BY 1, 2, 3),
    ua AS (SELECT source, a, sum(cab) AS ca FROM bgc GROUP BY 1, 2)
    SELECT bgc.source,
           CAST(sum(cab) AS BIGINT) AS n_bigrams,
           CAST(count(DISTINCT bgc.a) AS BIGINT) AS v_left,
           CAST(ROUND(sum(cab * (ln(ca) - ln(cab))) / sum(cab) * 1e6)
             AS BIGINT) AS h_cond_e6
    FROM bgc JOIN ua ON bgc.source = ua.source AND bgc.a = ua.a
    GROUP BY 1
    """,
)
def seq_cond_entropy(spark, sf_dir):
    """Conditional bigram entropy H(next|prev) per source in nats —
    sequence predictability; PAD breaks adjacency (pmi rule)."""
    out = textops.cond_entropy(_seq(spark), by="source", pad_id=C.PAD_ID)
    return out.select(
        "source", "n_bigrams", "v_left", _e("h_cond", 6).alias("h_cond_e6")
    )


@q(
    "ts_interarrival",
    """
    WITH g AS (
      SELECT event_type AS k,
             CAST(floor(epoch(ts)) AS BIGINT)
               - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
                   PARTITION BY event_type, user_id
                   ORDER BY ts, event_id) AS gap
      FROM events
    )
    SELECT k AS series_id,
           CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(ROUND(quantile_cont(gap, 0.5) * 1e6) AS BIGINT) AS p50_e6,
           CAST(ROUND(quantile_cont(gap, 0.95) * 1e6) AS BIGINT) AS p95_e6,
           CAST(max(gap) AS BIGINT) AS max_s
    FROM g WHERE gap IS NOT NULL GROUP BY 1
    """,
)
def ts_interarrival(spark, sf_dir):
    """Per-type inter-arrival gap distribution pooled over users:
    (event_type, user) windows — the natural parallelism unit — then
    exact interpolated p50/p95 over integer-second gaps."""
    out = analytics.interarrival_stats(
        _ev(spark, sf_dir), keys=["event_type"], user_col="user_id",
        ts_col="ts", order_cols=["event_id"],
    )
    return out.select(
        F.col("event_type").alias("series_id"),
        "n_gaps",
        _e("p50_s", 6).alias("p50_e6"),
        _e("p95_s", 6).alias("p95_e6"),
        "max_s",
    )


@q(
    "ts_hurst",
    """
    WITH b AS (
      SELECT event_type AS k,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ep,
             avg(value) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    ix AS (
      SELECT k, v,
             row_number() OVER (PARTITION BY k ORDER BY ep) - 1 AS idx
      FROM b
    ),
    e AS (
      SELECT k, v, idx, w.w, CAST(floor(idx / w.w) AS BIGINT) AS block
      FROM ix, (VALUES (8), (16), (32)) w(w)
    ),
    mo AS (
      SELECT k, w, block, idx, v,
             count(*) OVER pb AS nb,
             stddev_pop(v) OVER pb AS sd,
             avg(v) OVER pb AS mu
      FROM e WINDOW pb AS (PARTITION BY k, w, block)
    ),
    cm AS (
      SELECT k, w, block, sd,
             sum(v - mu) OVER (PARTITION BY k, w, block ORDER BY idx
                               ROWS UNBOUNDED PRECEDING) AS cum
      FROM mo WHERE nb = w
    ),
    bl AS (
      SELECT k, w, block, max(cum) - min(cum) AS r, max(sd) AS s
      FROM cm GROUP BY 1, 2, 3 HAVING max(sd) > 0
    ),
    ps AS (
      SELECT k, w, count(*) AS n_blocks, avg(r / s) AS rs_mean
      FROM bl GROUP BY 1, 2
    ),
    hh AS (
      SELECT k,
             CASE WHEN count(*) >= 2
                   AND count(*) * sum(ln(w) * ln(w))
                       - sum(ln(w)) * sum(ln(w)) > 0
                  THEN (count(*) * sum(ln(w) * ln(rs_mean))
                        - sum(ln(w)) * sum(ln(rs_mean)))
                       / (count(*) * sum(ln(w) * ln(w))
                          - sum(ln(w)) * sum(ln(w)))
             END AS hurst
      FROM (SELECT k, CAST(w AS DOUBLE) AS w, rs_mean FROM ps) GROUP BY 1
    )
    SELECT ps.k AS series_id, CAST(ps.w AS BIGINT) AS w,
           CAST(ps.n_blocks AS BIGINT) AS n_blocks,
           CAST(ROUND(ps.rs_mean * 1e6) AS BIGINT) AS rs_e6,
           CAST(ROUND(hh.hurst * 1e6) AS BIGINT) AS hurst_e6
    FROM ps JOIN hh ON ps.k = hh.k
    """,
)
def ts_hurst(spark, sf_dir):
    """Hurst exponent via R/S at block sizes {8,16,32} hourly buckets
    per series: per-size mean rescaled range plus the ln-ln OLS slope
    repeated per row (the scaling line stays auditable)."""
    out = analytics.hurst_rs(
        _ev(spark, sf_dir), keys=["event_type"], ts_col="ts",
        value_col="value", trunc="hour", sizes=(8, 16, 32),
    )
    return out.select(
        F.col("event_type").alias("series_id"),
        "w",
        "n_blocks",
        _e("rs_mean", 6).alias("rs_e6"),
        _e("hurst", 6).alias("hurst_e6"),
    )


def _pca_sql(dim: int = 64) -> str:
    """Unrolled 3-iteration power-iteration oracle (the Lloyd-unrolled
    contract): DuckDB replays mean-subtraction, three dot/sum/normalize
    rounds from the exact-binary 1/8 start vector, λ and explained
    variance — value-for-value against simsearch.pca_top_component."""
    sums = ", ".join(f"sum(d[{j}] * dot)" for j in range(1, dim + 1))
    avgs = ", ".join(f"avg(x[{j}])" for j in range(1, dim + 1))
    v0 = ", ".join(["0.125"] * dim)
    norm = (
        "list_transform(nv, z -> z / sqrt(list_sum("
        "list_transform(nv, y -> y*y))))"
    )
    return f"""
    WITH e AS (
      SELECT CAST(embedding AS DOUBLE[]) AS x FROM embeddings
      WHERE embedding IS NOT NULL
    ),
    mu AS (SELECT [{avgs}] AS mu FROM e),
    d AS (
      SELECT list_transform(range(1, {dim + 1}), j -> x[j] - mu.mu[j]) AS d
      FROM e, mu
    ),
    s1 AS (SELECT d, list_dot_product(d, [{v0}]) AS dot FROM d),
    i1 AS (SELECT count(*) AS n, [{sums}] AS nv FROM s1),
    n1 AS (SELECT {norm} AS v FROM i1),
    s2 AS (SELECT d.d AS d, list_dot_product(d.d, n1.v) AS dot FROM d, n1),
    i2 AS (SELECT count(*) AS n, [{sums}] AS nv FROM s2),
    n2 AS (SELECT {norm} AS v FROM i2),
    s3 AS (SELECT d.d AS d, list_dot_product(d.d, n2.v) AS dot FROM d, n2),
    i3 AS (SELECT count(*) AS n, [{sums}] AS nv FROM s3),
    lamc AS (
      SELECT list_dot_product(n2.v, i3.nv) / i3.n AS lam, i3.n AS n
      FROM n2, i3
    ),
    vf AS (SELECT {norm} AS v FROM i3),
    tv AS (
      SELECT avg(list_sum(list_transform(d, z -> z*z))) AS tv FROM d
    )
    SELECT u.j AS dim,
           CAST(ROUND(vf.v[u.j] * 1e6) AS BIGINT) AS loading_e6,
           CAST(ROUND(lamc.lam * 1e4) AS BIGINT) AS eig_e4,
           CAST(ROUND(lamc.lam / tv.tv * 1e6) AS BIGINT) AS explained_e6,
           CAST(lamc.n AS BIGINT) AS n
    FROM vf, lamc, tv, (SELECT unnest(range(1, {dim + 1})) AS j) u
    """


@q("emb_pca_top", _pca_sql())
def emb_pca_top(spark, sf_dir):
    """Top principal component of the embedding cloud (3 power
    iterations, deterministic 1/8 start): per-dimension loadings, λ,
    explained-variance ratio — embedding-collapse / drift probe."""
    out = simsearch.pca_top_component(_emb(spark, sf_dir))
    return out.select(
        "dim",
        _e("loading", 6).alias("loading_e6"),
        _e("eigenvalue", 4).alias("eig_e4"),
        _e("explained", 6).alias("explained_e6"),
        "n",
    )


@q(
    "seq_nll_drift",
    _synth_cte()
    + """
    , bgd AS (
      SELECT source, epoch_s - epoch_s % 3600 AS ep,
             tokens[i] AS a, tokens[i + 1] AS b
      FROM seq, unnest(range(1, len(tokens))) AS u(i)
      WHERE tokens[i] <> 0 AND tokens[i + 1] <> 0
    ),
    bgc AS (
      SELECT source, ep, a, b, count(*) AS cab FROM bgd GROUP BY 1, 2, 3, 4
    ),
    ua AS (SELECT source, ep, a, sum(cab) AS ca FROM bgc GROUP BY 1, 2, 3),
    vv AS (
      SELECT source, ep, CAST(count(DISTINCT t) AS DOUBLE) AS v
      FROM (SELECT source, epoch_s - epoch_s % 3600 AS ep,
                   unnest(tokens) AS t FROM seq)
      WHERE t <> 0 GROUP BY 1, 2
    ),
    scored AS (
      SELECT bgd.source, bgd.ep, pb.cab AS p_cab, pu.ca AS p_ca, pv.v AS p_v
      FROM bgd
      JOIN (SELECT source, ep + 3600 AS ep, v FROM vv) pv
        USING (source, ep)
      LEFT JOIN (SELECT source, ep + 3600 AS ep, a, ca FROM ua) pu
        USING (source, ep, a)
      LEFT JOIN (SELECT source, ep + 3600 AS ep, a, b, cab FROM bgc) pb
        USING (source, ep, a, b)
    )
    SELECT source, CAST(ep AS BIGINT) AS ep,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(ROUND(sum(-ln((coalesce(p_cab, 0) + 0.5)
                              / (coalesce(p_ca, 0) + 0.5 * p_v)))
                      / count(*) * 1e6) AS BIGINT) AS nll_e6,
           CAST(ROUND(sum(CASE WHEN p_cab IS NULL THEN 1 ELSE 0 END) * 1.0
                      / count(*) * 1e9) AS BIGINT) AS oov_e9
    FROM scored GROUP BY 1, 2
    """,
)
def seq_nll_drift(spark, sf_dir):
    """Hour-over-hour model-space drift: each hour's mean bigram NLL
    under the PREVIOUS hour's add-0.5 LM per source, with OOV-bigram
    rate — structure drift that value/unigram monitors miss."""
    out = textops.nll_drift(
        _seq(spark), by="source", pad_id=C.PAD_ID, k=0.5, trunc="hour",
    )
    return out.select(
        "source",
        "ep",
        "n_bigrams",
        _e("avg_nll", 6).alias("nll_e6"),
        _e("oov_rate", 9).alias("oov_e9"),
    )


@q(
    "doc_containment",
    """
    WITH sh AS (
      SELECT doc_id, lang,
             list_distinct(list_transform(
               range(1, greatest(len(string_split_regex(trim(text), '\\s+')) - 2, 1) + 1),
               i -> array_to_string(string_split_regex(trim(text), '\\s+')[i:i+2], ' ')
             )) AS s3
      FROM documents
    )
    SELECT a.doc_id AS a, b.doc_id AS b,
           CAST(len(list_intersect(a.s3, b.s3)) AS BIGINT) AS n_common,
           CAST(ROUND(len(list_intersect(a.s3, b.s3)) * 1.0
                      / len(a.s3) * 1e9) AS BIGINT) AS cont_a_e9,
           CAST(ROUND(len(list_intersect(a.s3, b.s3)) * 1.0
                      / len(b.s3) * 1e9) AS BIGINT) AS cont_b_e9
    FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.s3, b.s3)) * 1.0 / len(a.s3) >= 0.3
       OR len(list_intersect(a.s3, b.s3)) * 1.0 / len(b.s3) >= 0.3
    """,
)
def doc_containment(spark, sf_dir):
    """Asymmetric shingle containment both directions (threshold 0.3
    either way) — the subset/quote detector Jaccard misses."""
    out = dedup.containment_pairs(_docs(spark, sf_dir), threshold=0.3)
    return out.select(
        "a", "b", "n_common",
        _e("cont_a_in_b", 9).alias("cont_a_e9"),
        _e("cont_b_in_a", 9).alias("cont_b_e9"),
    )


def _cohesion_sql(dim: int = 64) -> str:
    avgs = ", ".join(f"avg(x[{j}])" for j in range(1, dim + 1))
    return f"""
    WITH e AS (
      SELECT label, CAST(embedding AS DOUBLE[]) AS x FROM embeddings
      WHERE embedding IS NOT NULL AND label IS NOT NULL
    ),
    c AS (
      SELECT label, count(*) AS n, [{avgs}] AS c FROM e GROUP BY 1
    ),
    s AS (
      SELECT e.label, c.n,
             sqrt(list_dot_product(c.c, c.c)) AS cn,
             CASE WHEN list_dot_product(e.x, e.x) > 0
                   AND list_dot_product(c.c, c.c) > 0
                  THEN list_dot_product(e.x, c.c)
                       / (sqrt(list_dot_product(e.x, e.x))
                          * sqrt(list_dot_product(c.c, c.c)))
             END AS cos
      FROM e JOIN c USING (label)
    )
    SELECT label, CAST(max(n) AS BIGINT) AS n,
           CAST(ROUND(max(cn) * 1e6) AS BIGINT) AS centroid_norm_e6,
           CAST(ROUND(avg(cos) * 1e6) AS BIGINT) AS cohesion_e6
    FROM s GROUP BY 1
    """


@q("emb_label_cohesion", _cohesion_sql())
def emb_label_cohesion(spark, sf_dir):
    """Per-label centroid norm + mean member-to-centroid cosine —
    labeled-embedding QA (mislabeled/bimodal classes sag here)."""
    out = simsearch.label_cohesion(_emb(spark, sf_dir))
    return out.select(
        F.col("label").cast("bigint").alias("label"),
        "n",
        _e("centroid_norm", 6).alias("centroid_norm_e6"),
        _e("cohesion", 6).alias("cohesion_e6"),
    )


def _quant_sql(dim: int = 64) -> str:
    maxes = ", ".join(f"max(abs(x[{j}]))" for j in range(1, dim + 1))
    return f"""
    WITH e AS (
      SELECT CAST(embedding AS DOUBLE[]) AS x FROM embeddings
      WHERE embedding IS NOT NULL
    ),
    sc AS (SELECT [{maxes}] AS s FROM e),
    er AS (
      SELECT u.j, sc.s[u.j] AS scale,
             e.x[u.j] - CASE WHEN sc.s[u.j] > 0
               THEN GREATEST(-127.0, LEAST(127.0,
                      ROUND(e.x[u.j] * 127.0 / sc.s[u.j])))
                    * sc.s[u.j] / 127.0
               ELSE 0.0 END AS err
      FROM e, sc, (SELECT unnest(range(1, {dim + 1})) AS j) u
    )
    SELECT j AS dim,
           CAST(ROUND(max(scale) * 1e6) AS BIGINT) AS scale_e6,
           CAST(ROUND(avg(err * err) * 1e9) AS BIGINT) AS mse_e9,
           CAST(ROUND(max(abs(err)) * 1e9) AS BIGINT) AS maxerr_e9,
           CAST(count(*) AS BIGINT) AS n
    FROM er GROUP BY 1
    """


@q("emb_quantize_error", _quant_sql())
def emb_quantize_error(spark, sf_dir):
    """Symmetric per-dim int8 quantization error table (scale =
    max |x_j|, exact order-independent agg): MSE + max abs error per
    dimension — the 4×-smaller-index cost sheet."""
    out = simsearch.quantize_error(_emb(spark, sf_dir))
    return out.select(
        "dim",
        _e("scale", 6).alias("scale_e6"),
        _e("mse", 9).alias("mse_e9"),
        _e("max_abs_err", 9).alias("maxerr_e9"),
        "n",
    )


# ---------------------------------------------------------------------------
# Round-5g: Kalman local-level filter (Arrow recursion, recursive-CTE
# oracle — same sanctioned-stateful family as ts_holt).
# ---------------------------------------------------------------------------

@q(
    "ts_kalman",
    """
    WITH RECURSIVE b AS (
      SELECT event_type AS sid,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ep,
             avg(value) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    o AS (
      SELECT sid, ep, v,
             row_number() OVER (PARTITION BY sid ORDER BY ep) AS rn
      FROM b
    ),
    r AS (
      SELECT sid, ep, rn, v,
             v AS level, CAST(1.0 AS DOUBLE) AS pvar,
             CAST(NULL AS DOUBLE) AS gain,
             CAST(NULL AS DOUBLE) AS fitted,
             CAST(NULL AS DOUBLE) AS innovation
      FROM o WHERE rn = 1
      UNION ALL
      SELECT o.sid, o.ep, o.rn, o.v,
             r.level + ((r.pvar + 0.25) / (r.pvar + 0.25 + 1.0))
               * (o.v - r.level),
             (1.0 - (r.pvar + 0.25) / (r.pvar + 0.25 + 1.0))
               * (r.pvar + 0.25),
             (r.pvar + 0.25) / (r.pvar + 0.25 + 1.0),
             r.level,
             o.v - r.level
      FROM r JOIN o ON o.sid = r.sid AND o.rn = r.rn + 1
    )
    SELECT sid AS series_id, ep,
           CAST(ROUND(v * 1e6) AS BIGINT) AS v_e6,
           CAST(ROUND(level * 1e6) AS BIGINT) AS level_e6,
           CAST(ROUND(pvar * 1e9) AS BIGINT) AS pvar_e9,
           CAST(ROUND(gain * 1e9) AS BIGINT) AS gain_e9,
           CAST(ROUND(fitted * 1e6) AS BIGINT) AS fitted_e6,
           CAST(ROUND(innovation * 1e6) AS BIGINT) AS innovation_e6
    FROM r
    """,
)
def ts_kalman(spark, sf_dir):
    """Scalar Kalman local-level filter per series at hourly buckets
    (q=0.25, r=1, P1=1 — binary-exact params): the gain-adaptive
    smoother. Arrow applyInPandas recursion in Spark, recursive CTE in
    DuckDB, identical expression shapes on IEEE doubles; init pinned
    l1=y1, P1=p0, gain/fitted/innovation null at t=1."""
    out = analytics.kalman_level(
        _ev(spark, sf_dir), keys=["event_type"], ts_col="ts",
        value_col="value", trunc="hour", q=0.25, r=1.0, p0=1.0,
    )
    return out.select(
        F.col("event_type").alias("series_id"),
        "ep",
        _e("v", 6).alias("v_e6"),
        _e("level", 6).alias("level_e6"),
        _e("pvar", 9).alias("pvar_e9"),
        _e("gain", 9).alias("gain_e9"),
        _e("fitted", 6).alias("fitted_e6"),
        _e("innovation", 6).alias("innovation_e6"),
    )


@q(
    "ts_variance_ratio",
    """
    WITH b AS (
      SELECT event_type AS sid,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ep,
             avg(value) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    d AS (
      SELECT sid,
             v - lag(v, 1) OVER (PARTITION BY sid ORDER BY ep) AS d1,
             v - lag(v, 4) OVER (PARTITION BY sid ORDER BY ep) AS dq
      FROM b
    ),
    a AS (
      SELECT sid,
             count(d1) + 1 AS n_buckets,
             count(d1) AS n1,
             count(dq) AS nq,
             var_pop(d1) AS var1,
             var_pop(dq) AS varq
      FROM d GROUP BY 1
    )
    SELECT sid AS series_id,
           CAST(n_buckets AS BIGINT) AS n_buckets,
           CAST(n1 AS BIGINT) AS n1,
           CAST(nq AS BIGINT) AS nq,
           CAST(ROUND(var1 * 1e6) AS BIGINT) AS var1_e6,
           CAST(ROUND(varq * 1e6) AS BIGINT) AS varq_e6,
           CASE WHEN nq >= 1 AND var1 > 0
                THEN CAST(ROUND(varq / (4.0 * var1) * 1e6) AS BIGINT)
           END AS vr_e6
    FROM a
    """,
)
def ts_variance_ratio(spark, sf_dir):
    """Variance-ratio VR(4) per series at hourly buckets — the
    random-walk / mean-reversion / persistence diagnostic; population
    variances of row-lag diffs, degenerate rules pinned (var1=0 or
    no q-lag pairs -> null)."""
    out = analytics.variance_ratio(
        _ev(spark, sf_dir), keys=["event_type"], ts_col="ts",
        value_col="value", trunc="hour", q=4,
    )
    return out.select(
        F.col("event_type").alias("series_id"),
        "n_buckets", "n1", "nq",
        _e("var1", 6).alias("var1_e6"),
        _e("varq", 6).alias("varq_e6"),
        _e("vr", 6).alias("vr_e6"),
    )


@q(
    "ts_kendall_matrix",
    """
    WITH b AS (
      SELECT event_type AS k,
             strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ep,
             CAST(ROUND(avg(value) * 1e6) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2, 3
    ),
    j AS (
      SELECT a.k AS ka, bb.k AS kb, a.day, a.ep, a.v AS x, bb.v AS y
      FROM b a JOIN b bb ON a.day = bb.day AND a.ep = bb.ep
      WHERE a.k < bb.k
    ),
    p AS (
      SELECT j1.ka, j1.kb, j1.day,
             j1.x - j2.x AS dx, j1.y - j2.y AS dy
      FROM j j1 JOIN j j2
        ON j1.ka = j2.ka AND j1.kb = j2.kb AND j1.day = j2.day
       AND j1.ep < j2.ep
    ),
    a AS (
      SELECT ka, kb, day,
             count(*) AS n0,
             sum(CASE WHEN dx * dy > 0 THEN 1 ELSE 0 END) AS nc,
             sum(CASE WHEN dx * dy < 0 THEN 1 ELSE 0 END) AS nd,
             sum(CASE WHEN dx = 0 AND dy != 0 THEN 1 ELSE 0 END) AS tx,
             sum(CASE WHEN dy = 0 AND dx != 0 THEN 1 ELSE 0 END) AS ty,
             sum(CASE WHEN dx = 0 AND dy = 0 THEN 1 ELSE 0 END) AS txy
      FROM p GROUP BY 1, 2, 3
    )
    SELECT ka, kb, day,
           CAST(n0 AS BIGINT) AS n0,
           CAST(nc AS BIGINT) AS nc,
           CAST(nd AS BIGINT) AS nd,
           CAST(tx AS BIGINT) AS tx,
           CAST(ty AS BIGINT) AS ty,
           CAST(txy AS BIGINT) AS txy,
           CASE WHEN n0 - tx - txy > 0 AND n0 - ty - txy > 0
                THEN CAST(ROUND((nc - nd)
                       / sqrt(CAST(n0 - tx - txy AS DOUBLE)
                              * CAST(n0 - ty - txy AS DOUBLE)) * 1e6)
                     AS BIGINT)
           END AS tau_e6
    FROM a
    """,
)
def ts_kendall_matrix(spark, sf_dir):
    """Per-day Kendall tau-b matrix over hourly bucket means — rank
    co-movement with integer-exact tie classification (bucket means
    pre-rounded to the e6 grid in BOTH engines before comparison)."""
    out = analytics.kendall_matrix(
        _ev(spark, sf_dir), keys=["event_type"], ts_col="ts",
        value_col="value", trunc="hour", grain=6,
    )
    return out.select(
        "ka", "kb", "day", "n0", "nc", "nd", "tx", "ty", "txy",
        _e("tau_b", 6).alias("tau_e6"),
    )


@q(
    "doc_keyness_g2",
    """
    WITH words AS (
      SELECT source AS g,
             unnest(regexp_split_to_array(text, '\\s+')) AS w
      FROM documents
    ),
    w2 AS (SELECT g, w FROM words WHERE w != ''),
    gw AS (SELECT g, w, count(*) AS a FROM w2 GROUP BY 1, 2),
    gtot AS (SELECT g, sum(a) AS c FROM gw GROUP BY 1),
    wtot AS (SELECT w, sum(a) AS ab FROM gw GROUP BY 1),
    tot AS (SELECT sum(a) AS t FROM gw),
    j AS (
      SELECT gw.g, gw.w, gw.a, wtot.ab - gw.a AS b,
             gtot.c, tot.t - gtot.c AS d, tot.t, wtot.ab
      FROM gw JOIN wtot USING (w) JOIN gtot USING (g) CROSS JOIN tot
    ),
    scored AS (
      SELECT g, w, a, b,
             2.0 * (
               CASE WHEN a > 0 THEN a * ln(CAST(a AS DOUBLE) * t / (CAST(c AS DOUBLE) * ab)) ELSE 0.0 END
             + CASE WHEN b > 0 THEN b * ln(CAST(b AS DOUBLE) * t / (CAST(d AS DOUBLE) * ab)) ELSE 0.0 END
             ) AS g2,
             a * d > b * c AS overused
      FROM j
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY g
        ORDER BY CAST(ROUND(g2 * 1e6) AS BIGINT) DESC, w ASC) AS rank
      FROM scored
    )
    SELECT g AS source, w, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
           CAST(ROUND(g2 * 1e6) AS BIGINT) AS g2_e6,
           CAST(overused AS BIGINT) AS overused,
           CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 10
    """,
)
def doc_keyness_g2(spark, sf_dir):
    """Top-10 Dunning G² keyness words per source vs the rest of the
    corpus — integer cross-product direction flag, e6-ranked."""
    out = textops.keyness_g2(_docs(spark, sf_dir), top_k=10)
    return out.select(
        "source", "w", "a", "b",
        _e("g2", 6).alias("g2_e6"),
        F.col("overused").cast("bigint").alias("overused"),
        "rank",
    )


@q(
    "doc_mattr",
    """
    WITH d AS (
      SELECT doc_id, source,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         w -> w != '') AS ws
      FROM documents
    ),
    d2 AS (
      SELECT doc_id, source, ws, len(ws) AS n
      FROM d WHERE len(ws) >= 1
    ),
    scored AS (
      SELECT doc_id, source, n,
             CASE WHEN n >= 10 THEN n - 10 + 1 ELSE 0 END AS n_windows,
             CAST(len(list_distinct(ws)) AS DOUBLE) / n AS ttr,
             CASE WHEN n >= 10 THEN
               CAST(list_sum(list_transform(range(1, n - 10 + 2),
                 p -> len(list_distinct(ws[p : p + 9])))) AS DOUBLE)
               / (10.0 * (n - 10 + 1))
             ELSE CAST(len(list_distinct(ws)) AS DOUBLE) / n END AS mattr
      FROM d2
    )
    SELECT doc_id, source,
           CAST(n AS BIGINT) AS n_words,
           CAST(n_windows AS BIGINT) AS n_windows,
           CAST(ROUND(ttr * 1e6) AS BIGINT) AS ttr_e6,
           CAST(ROUND(mattr * 1e6) AS BIGINT) AS mattr_e6
    FROM scored
    """,
)
def doc_mattr(spark, sf_dir):
    """MATTR lexical diversity (window 10) + plain TTR per doc —
    length-robust vocabulary-richness QA; integer span-distinct sums
    make the rational identical cross-engine."""
    out = textops.mattr(_docs(spark, sf_dir), window=10)
    return out.select(
        "doc_id", "source", "n_words", "n_windows",
        _e("ttr", 6).alias("ttr_e6"),
        _e("mattr", 6).alias("mattr_e6"),
    )


def _textrank_sql(iters: int = 3, damping: float = 0.85, top_k: int = 10) -> str:
    """Unrolled TextRank rounds as chained CTEs (same design as the
    emb_pca_top unrolled power iteration)."""
    rounds = []
    prev = "r0"
    for i in range(1, iters + 1):
        rounds.append(f"""
    r{i} AS (
      SELECT ew.g, ew.b AS node,
             1.0 - {damping} + {damping} * sum(ew.w * p.r / ew.deg) AS r
      FROM ew JOIN {prev} p ON ew.g = p.g AND ew.a = p.node
      GROUP BY 1, 2
    )""")
        prev = f"r{i}"
    return f"""
    WITH d AS (
      SELECT source AS g,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         w -> w != '') AS ws
      FROM documents
    ),
    bigr AS (
      SELECT g, unnest(list_transform(range(1, len(ws)),
               i -> struct_pack(a := ws[i], b := ws[i + 1]))) AS e
      FROM d WHERE len(ws) >= 2
    ),
    pairs AS (
      SELECT g, e.a AS a, e.b AS b FROM bigr WHERE e.a != e.b
    ),
    sym AS (
      SELECT g, a, b FROM pairs
      UNION ALL SELECT g, b, a FROM pairs
    ),
    edges AS (
      SELECT g, a, b, CAST(count(*) AS DOUBLE) AS w
      FROM sym GROUP BY 1, 2, 3
    ),
    deg AS (SELECT g, a, sum(w) AS deg FROM edges GROUP BY 1, 2),
    ew AS (
      SELECT e.g, e.a, e.b, e.w, deg.deg
      FROM edges e JOIN deg ON e.g = deg.g AND e.a = deg.a
    ),
    r0 AS (SELECT g, a AS node, 1.0 AS r FROM deg),{",".join(rounds)},
    ranked AS (
      SELECT g, node, r, row_number() OVER (
        PARTITION BY g
        ORDER BY CAST(ROUND(r * 1e6) AS BIGINT) DESC, node ASC) AS rank
      FROM {prev}
    )
    SELECT g AS source, node AS w,
           CAST(ROUND(r * 1e6) AS BIGINT) AS textrank_e6,
           CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {top_k}
    """


@q("doc_textrank", _textrank_sql())
def doc_textrank(spark, sf_dir):
    """Top-10 TextRank keywords per source — 3 unrolled PageRank
    rounds over the symmetrized word-adjacency graph, d=0.85, e6
    ranking; DuckDB replays the identical rounds as chained CTEs."""
    out = textops.textrank_keywords(
        _docs(spark, sf_dir), damping=0.85, iters=3, top_k=10
    )
    return out.select(
        "source", "w",
        _e("textrank", 6).alias("textrank_e6"),
        "rank",
    )


def _silhouette_sql(dim: int = 64) -> str:
    avgs = ", ".join(f"avg(x[{j}])" for j in range(1, dim + 1))
    return f"""
    WITH e AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS x
      FROM embeddings
      WHERE embedding IS NOT NULL AND label IS NOT NULL
    ),
    c AS (
      SELECT label, [{avgs}] AS c FROM e GROUP BY 1
    ),
    dists AS (
      SELECT e.vec_id, e.label, c.label AS cl,
             sqrt(list_sum(list_transform(range(1, {dim + 1}),
               k -> (e.x[k] - c.c[k]) * (e.x[k] - c.c[k])))) AS d
      FROM e CROSS JOIN c
    ),
    per_row AS (
      SELECT vec_id, label,
             max(CASE WHEN cl = label THEN d END) AS a,
             min(CASE WHEN cl != label THEN d END) AS b
      FROM dists GROUP BY 1, 2
    ),
    scored AS (
      SELECT label, a, b,
             CASE WHEN b IS NOT NULL THEN
               CASE WHEN greatest(a, b) > 0
                    THEN (b - a) / greatest(a, b) ELSE 0.0 END
             END AS s
      FROM per_row
    )
    SELECT label, CAST(count(*) AS BIGINT) AS n,
           CAST(ROUND(avg(a) * 1e6) AS BIGINT) AS mean_own_e6,
           CAST(ROUND(avg(b) * 1e6) AS BIGINT) AS mean_other_e6,
           CAST(ROUND(avg(s) * 1e6) AS BIGINT) AS silhouette_e6
    FROM scored GROUP BY 1
    """


@q("emb_silhouette", _silhouette_sql())
def emb_silhouette(spark, sf_dir):
    """Centroid-based silhouette per label: separation QA that charges
    a class for sitting close to a NEIGHBORING class (cohesion alone
    misses that failure mode)."""
    out = simsearch.silhouette_centroid(_emb(spark, sf_dir))
    return out.select(
        F.col("label").cast("bigint").alias("label"),
        "n",
        _e("mean_own_dist", 6).alias("mean_own_e6"),
        _e("mean_other_dist", 6).alias("mean_other_e6"),
        _e("silhouette", 6).alias("silhouette_e6"),
    )


@q(
    "emb_knn_outlier",
    """
    WITH e AS (
      SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    q AS (
      SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE embedding IS NOT NULL AND vec_id % 37 = 0
    ),
    scored AS (
      SELECT q.qid, e.nid,
             CAST(ROUND(list_dot_product(q.qv, e.v)
               / (sqrt(list_dot_product(q.qv, q.qv))
                  * sqrt(list_dot_product(e.v, e.v))) * 1e6) AS BIGINT)
               AS sim_e6
      FROM q CROSS JOIN e WHERE e.nid != q.qid
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY qid ORDER BY sim_e6 DESC, nid ASC) AS rank
      FROM scored
    ),
    top AS (SELECT * FROM ranked WHERE rank <= 5)
    SELECT qid,
           CAST(count(*) AS BIGINT) AS n_found,
           max_by(nid, rank) AS kth_nid,
           CAST(ROUND(min(sim_e6) / 1e6 * 1e6) AS BIGINT) AS kth_sim_e6,
           CAST(ROUND(avg(sim_e6) / 1e6 * 1e6) AS BIGINT) AS mean_topk_e6,
           CAST(ROUND((1.0 - min(sim_e6) / 1e6) * 1e6) AS BIGINT) AS outlier_e6
    FROM top GROUP BY 1
    """,
)
def emb_knn_outlier(spark, sf_dir):
    """k-NN-distance outlier scores for the deterministic 1-in-37
    query sample: cosine distance to the 5th nearest neighbor, exact
    brute-force over the corpus (the audit path; lsh_topk is the
    full-volume path)."""
    out = simsearch.knn_outlier(_emb(spark, sf_dir), sample_mod=37, k=5)
    return out.select(
        "qid", "n_found", "kth_nid",
        _e("kth_sim", 6).alias("kth_sim_e6"),
        _e("mean_topk_sim", 6).alias("mean_topk_e6"),
        _e("outlier_score", 6).alias("outlier_e6"),
    )


@q(
    "ts_ar1_half_life",
    """
    WITH b AS (
      SELECT event_type AS sid,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ep,
             avg(value) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    p AS (
      SELECT sid, v AS y,
             lag(v, 1) OVER (PARTITION BY sid ORDER BY ep) AS x
      FROM b
    ),
    p2 AS (SELECT * FROM p WHERE x IS NOT NULL),
    a AS (
      SELECT sid, count(*) AS n_pairs,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM p2 GROUP BY 1
    ),
    r AS (
      SELECT sid, n_pairs,
             CASE WHEN n_pairs >= 3 AND n_pairs * sxx - sx * sx > 0
                  THEN (n_pairs * sxy - sx * sy) / (n_pairs * sxx - sx * sx)
             END AS rho
      FROM a
    )
    SELECT sid AS series_id,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(ROUND(rho * 1e6) AS BIGINT) AS rho_e6,
           CASE WHEN rho > 0 AND rho < 1
                THEN CAST(ROUND(-ln(2.0) / ln(rho) * 1e6) AS BIGINT)
           END AS half_life_e6
    FROM r
    """,
)
def ts_ar1_half_life(spark, sf_dir):
    """AR(1) half-life per series at hourly buckets — how fast a
    deviation decays; rho outside (0,1) has no half-life (null,
    pinned)."""
    out = analytics.ar1_half_life(
        _ev(spark, sf_dir), keys=["event_type"], ts_col="ts",
        value_col="value", trunc="hour",
    )
    return out.select(
        F.col("event_type").alias("series_id"),
        "n_pairs",
        _e("rho", 6).alias("rho_e6"),
        _e("half_life", 6).alias("half_life_e6"),
    )


def _ngram_uniq_sql(max_n: int = 4) -> str:
    legs = []
    for n in range(1, max_n + 1):
        legs.append(f"""
      SELECT source AS g, {n} AS n,
             array_to_string(list_transform(tokens[p : p + {n - 1}],
               x -> CAST(x AS VARCHAR)), ',') AS gram
      FROM seq, (SELECT unnest(range(1, 258)) AS p) ps  -- n_tok <= 16+240 = 256
      WHERE p <= len(tokens) - {n} + 1
        AND len(list_filter(tokens[p : p + {n - 1}], x -> x = 0)) = 0""")
    union = " UNION ALL ".join(legs)
    return (
        _synth_cte()
        + f""",
    grams AS ({union}),
    counts AS (
      SELECT g, n, gram, count(*) AS cnt FROM grams GROUP BY 1, 2, 3
    )
    SELECT g AS source, CAST(n AS INT) AS n,
           CAST(sum(cnt) AS BIGINT) AS total,
           CAST(count(*) AS BIGINT) AS distinct_grams,
           CAST(ROUND(count(*) * 1e6 / sum(cnt)) AS BIGINT) AS uniq_ratio_e6
    FROM counts GROUP BY 1, 2
    """
    )


@q("seq_ngram_uniqueness", _ngram_uniq_sql())
def seq_ngram_uniqueness(spark, sf_dir):
    """Unique-n-gram ratio curve (n=1..4) per source over the
    synthetic token streams — the corpus dedup-health monitor; PAD
    breaks adjacency, ',' serialization separator-safe on int ids."""
    out = textops.ngram_uniqueness(_seq(spark), max_n=4)
    return out.select(
        "source",
        F.col("n").cast("int").alias("n"),
        "total", "distinct_grams",
        F.round(F.col("distinct_grams") * 1e6 / F.col("total"))
        .cast("bigint")
        .alias("uniq_ratio_e6"),
    )


def _mmr_sql(k: int = 5, pool: int = 20, sample_mod: int = 97) -> str:
    """Unrolled greedy MMR steps as chained CTEs (integer 4x-score:
    3*sim_e6 - max-selected-sim_e6, ties nid asc)."""
    steps = []
    prev = "s1"
    for i in range(2, k + 1):
        steps.append(f"""
    m{i} AS (
      SELECT p.qid, p.a AS nid, max(p.p_e6) AS mx
      FROM pairs p JOIN {prev} s ON p.qid = s.qid AND p.b = s.nid
      GROUP BY 1, 2
    ),
    r{i} AS (
      SELECT c.qid, c.nid, c.sim_e6,
             row_number() OVER (PARTITION BY c.qid
               ORDER BY 3 * c.sim_e6 - m.mx DESC, c.nid ASC) AS rn
      FROM cand c JOIN m{i} m ON c.qid = m.qid AND c.nid = m.nid
      WHERE NOT EXISTS (SELECT 1 FROM {prev} s
                        WHERE s.qid = c.qid AND s.nid = c.nid)
    ),
    p{i} AS (SELECT qid, nid, {i} AS step, sim_e6 FROM r{i} WHERE rn = 1),
    s{i} AS (SELECT * FROM {prev} UNION ALL SELECT * FROM p{i})""")
        prev = f"s{i}"
    return f"""
    WITH e AS (
      SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    q AS (
      SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE embedding IS NOT NULL AND vec_id % {sample_mod} = 0
    ),
    scored AS (
      SELECT q.qid, e.nid, e.v,
             CAST(ROUND(list_dot_product(q.qv, e.v)
               / (sqrt(list_dot_product(q.qv, q.qv))
                  * sqrt(list_dot_product(e.v, e.v))) * 1e6) AS BIGINT)
               AS sim_e6
      FROM q CROSS JOIN e WHERE e.nid != q.qid
    ),
    cand AS (
      SELECT * FROM (
        SELECT qid, nid, v, sim_e6, row_number() OVER (
          PARTITION BY qid ORDER BY sim_e6 DESC, nid ASC) AS rank
        FROM scored
      ) WHERE rank <= {pool}
    ),
    pairs AS (
      SELECT a.qid, a.nid AS a, b.nid AS b,
             CAST(ROUND(list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v))
                  * sqrt(list_dot_product(b.v, b.v))) * 1e6) AS BIGINT)
               AS p_e6
      FROM cand a JOIN cand b ON a.qid = b.qid AND a.nid != b.nid
    ),
    s1 AS (
      SELECT qid, nid, 1 AS step, sim_e6 FROM cand WHERE rank = 1
    ),{",".join(steps)}
    SELECT qid, nid, CAST(step AS BIGINT) AS step, sim_e6
    FROM {prev}
    """


@q("emb_mmr_topk", _mmr_sql())
def emb_mmr_topk(spark, sf_dir):
    """MMR-diversified top-5 from a brute top-20 pool for the 1-in-97
    query sample — greedy redundancy-penalized re-ranking, integer
    4x-score determinism, k-1 unrolled selection rounds replayed as
    chained CTEs."""
    out = simsearch.mmr_topk(_emb(spark, sf_dir), sample_mod=97, k=5, pool=20)
    return out.select("qid", "nid", "step", "sim_e6")


def _confusion_sql(dim: int = 64) -> str:
    avgs = ", ".join(f"avg(x[{j}])" for j in range(1, dim + 1))
    return f"""
    WITH e AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS x
      FROM embeddings
      WHERE embedding IS NOT NULL AND label IS NOT NULL
    ),
    c AS (SELECT label, [{avgs}] AS c FROM e GROUP BY 1),
    dists AS (
      SELECT e.vec_id, e.label, c.label AS pred,
             CAST(ROUND(sqrt(list_sum(list_transform(range(1, {dim + 1}),
               k -> (e.x[k] - c.c[k]) * (e.x[k] - c.c[k])))) * 1e9) AS BIGINT)
               AS d9
      FROM e CROSS JOIN c
    ),
    picked AS (
      SELECT vec_id, label, pred FROM (
        SELECT *, row_number() OVER (
          PARTITION BY vec_id ORDER BY d9 ASC, pred ASC) AS rn
        FROM dists
      ) WHERE rn = 1
    )
    SELECT label, pred, CAST(count(*) AS BIGINT) AS n
    FROM picked GROUP BY 1, 2
    """


@q("emb_centroid_confusion", _confusion_sql())
def emb_centroid_confusion(spark, sf_dir):
    """Nearest-centroid confusion matrix over labeled embeddings —
    e9-rounded argmin with pred-asc ties; hot off-diagonal cells name
    the confusable class pairs."""
    out = simsearch.centroid_confusion(_emb(spark, sf_dir))
    return out.select(
        F.col("label").cast("bigint").alias("label"),
        F.col("pred").cast("bigint").alias("pred"),
        "n",
    )


@q(
    "ts_benford",
    """
    WITH v AS (
      SELECT event_type AS sid,
             CAST(ROUND(abs(value) * 1e9) AS BIGINT) AS s
      FROM events WHERE value IS NOT NULL
    ),
    d AS (
      SELECT sid, CAST(substring(CAST(s AS VARCHAR), 1, 1) AS INT) AS digit
      FROM v WHERE s >= 1
    ),
    obs AS (SELECT sid, digit, count(*) AS obs FROM d GROUP BY 1, 2),
    keyn AS (SELECT sid, count(*) AS n FROM d GROUP BY 1),
    spine AS (
      SELECT unnest(range(1, 10)) AS digit
    ),
    full_ AS (
      SELECT k.sid, s.digit, k.n,
             COALESCE(o.obs, 0) AS obs,
             log10(1.0 + 1.0 / s.digit) AS p
      FROM keyn k CROSS JOIN spine s
      LEFT JOIN obs o ON o.sid = k.sid AND o.digit = s.digit
    ),
    cells AS (
      SELECT *, (obs - n * p) * (obs - n * p) / (n * p) AS cell
      FROM full_
    ),
    chi AS (SELECT sid, sum(cell) AS chi2 FROM cells GROUP BY 1)
    SELECT c.sid AS series_id,
           CAST(c.digit AS INT) AS digit,
           CAST(c.n AS BIGINT) AS n,
           CAST(c.obs AS BIGINT) AS obs,
           CAST(ROUND(c.p * 1e6) AS BIGINT) AS benford_p_e6,
           CAST(ROUND(chi.chi2 * 1e6) AS BIGINT) AS chi2_e6,
           CAST(chi.chi2 > 15.507 AS BIGINT) AS alarm
    FROM cells c JOIN chi USING (sid)
    """,
)
def ts_benford(spark, sf_dir):
    """Benford first-digit audit per series: engine-stable digit
    extraction via the e9-bigint decimal string, all 9 digit rows
    emitted, chi-square 0.95 alarm."""
    out = analytics.benford_digits(
        _ev(spark, sf_dir).withColumnRenamed("event_type", "series_id"),
        keys=["series_id"],
    )
    return out.select(
        "series_id",
        F.col("digit").cast("int").alias("digit"),
        "n", "obs",
        _e("benford_p", 6).alias("benford_p_e6"),
        _e("chi2", 6).alias("chi2_e6"),
        F.col("alarm").cast("bigint").alias("alarm"),
    )


@q(
    "doc_burrows_delta",
    """
    WITH words AS (
      SELECT source AS g,
             unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
      FROM documents
    ),
    w2 AS (SELECT g, w FROM words WHERE w != ''),
    gw AS (SELECT g, w, count(*) AS cnt FROM w2 GROUP BY 1, 2),
    panel AS (
      SELECT w FROM (
        SELECT w, row_number() OVER (
          ORDER BY sum(cnt) DESC, w ASC) AS rk
        FROM gw GROUP BY w
      ) WHERE rk <= 30
    ),
    gtot AS (SELECT g, sum(cnt) AS gt FROM gw GROUP BY 1),
    cells AS (
      SELECT gtot.g, panel.w,
             COALESCE(gw.cnt, 0) * 1.0 / gtot.gt AS f
      FROM gtot CROSS JOIN panel
      LEFT JOIN gw ON gw.g = gtot.g AND gw.w = panel.w
    ),
    stats AS (
      SELECT w, avg(f) AS mu, stddev_pop(f) AS sd
      FROM cells GROUP BY 1 HAVING stddev_pop(f) > 0
    ),
    z AS (
      SELECT c.g, c.w, (c.f - s.mu) / s.sd AS z
      FROM cells c JOIN stats s USING (w)
    )
    SELECT a.g AS ga, b.g AS gb,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(ROUND(avg(abs(a.z - b.z)) * 1e6) AS BIGINT) AS delta_e6
    FROM z a JOIN z b ON a.w = b.w AND a.g < b.g
    GROUP BY 1, 2
    """,
)
def doc_burrows_delta(spark, sf_dir):
    """Burrows' Delta between every source pair over the corpus
    top-30 word panel — z-scored relative-frequency L1 stylometry."""
    out = textops.burrows_delta(_docs(spark, sf_dir), top_m=30)
    return out.select(
        "ga", "gb", "n_words",
        _e("delta", 6).alias("delta_e6"),
    )


@q(
    "seq_positional_entropy",
    _synth_cte()
    + """,
    ex AS (
      SELECT source AS g, tokens[p] AS t, p - 1 AS pos
      FROM seq, (SELECT unnest(range(1, 258)) AS p) ps  -- n_tok <= 256
      WHERE p <= len(tokens) AND tokens[p] != 0
    ),
    banded AS (
      SELECT g, CAST(floor(pos / 8) AS BIGINT) AS band, t FROM ex
    ),
    counts AS (
      SELECT g, band, t, count(*) AS c FROM banded GROUP BY 1, 2, 3
    )
    SELECT g AS source, band,
           CAST(sum(c) AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS distinct_tokens,
           CAST(ROUND((ln(CAST(sum(c) AS DOUBLE))
             - sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) / sum(c))
             * 1e6) AS BIGINT) AS entropy_e6
    FROM counts GROUP BY 1, 2
    """,
)
def seq_positional_entropy(spark, sf_dir):
    """Per-source token entropy by 8-wide position band over the
    synthetic sequences — the templated-prefix detector; exact
    integer-count ln-form, PAD excluded."""
    out = textops.positional_entropy(_seq(spark), bucket=8)
    return out.select(
        "source", "band", "n", "distinct_tokens",
        _e("entropy", 6).alias("entropy_e6"),
    )


@q(
    "doc_readability",
    """
    WITH d AS (
      SELECT doc_id, source,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         w -> w != '') AS ws,
             greatest(len(list_filter(regexp_split_to_array(text, '[.!?]+'),
                         s -> trim(s) != '')), 1) AS n_sentences
      FROM documents
    ),
    d2 AS (
      SELECT doc_id, source, len(ws) AS n_words, n_sentences,
             list_sum(list_transform(ws,
               w -> greatest(len(regexp_extract_all(lower(w), '[aeiouy]+')), 1)))
               AS n_syllables
      FROM d WHERE len(ws) >= 1
    )
    SELECT doc_id, source,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_sentences AS BIGINT) AS n_sentences,
           CAST(n_syllables AS BIGINT) AS n_syllables,
           CAST(ROUND((206.835
             - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
             - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words)) * 1e4)
             AS BIGINT) AS flesch_e4
    FROM d2
    """,
)
def doc_readability(spark, sf_dir):
    """Flesch Reading Ease per doc — deterministic vowel-group
    syllable estimate, integer counts, row-local only."""
    out = textops.readability(_docs(spark, sf_dir))
    return out.select(
        "doc_id", "source", "n_words", "n_sentences", "n_syllables",
        _e("flesch", 4).alias("flesch_e4"),
    )


@q(
    "ts_hampel",
    """
    WITH b AS (
      SELECT event_type AS sid,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ep,
             avg(value) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    fr AS (
      SELECT sid, ep, v,
             list_sort(list(v) OVER (PARTITION BY sid ORDER BY ep
               ROWS BETWEEN 4 PRECEDING AND 4 FOLLOWING)) AS arr
      FROM b
    ),
    med AS (
      SELECT sid, ep, v, arr, len(arr) AS m,
             CASE WHEN len(arr) % 2 = 1
                  THEN arr[len(arr) // 2 + 1]
                  ELSE (arr[len(arr) // 2]
                        + arr[len(arr) // 2 + 1]) / 2.0
             END AS hm
      FROM fr
    ),
    sig AS (
      SELECT sid, ep, v, m, hm,
             list_sort(list_transform(arr, x -> abs(x - hm))) AS devs
      FROM med
    ),
    sig2 AS (
      SELECT sid, ep, v, m, hm,
             1.4826 * CASE WHEN len(devs) % 2 = 1
                  THEN devs[len(devs) // 2 + 1]
                  ELSE (devs[len(devs) // 2]
                        + devs[len(devs) // 2 + 1]) / 2.0
             END AS sigma
      FROM sig
    )
    SELECT sid AS series_id, ep,
           CAST(ROUND(v * 1e6) AS BIGINT) AS v_e6,
           CAST(m AS BIGINT) AS hampel_n,
           CAST(ROUND(hm * 1e6) AS BIGINT) AS median_e6,
           CAST(ROUND(sigma * 1e6) AS BIGINT) AS sigma_e6,
           CAST(CAST(ROUND(abs(v - hm) * 1e9) AS BIGINT)
                > CAST(ROUND(3.0 * sigma * 1e9) AS BIGINT) AS BIGINT) AS flag,
           CAST(ROUND(CASE WHEN CAST(ROUND(abs(v - hm) * 1e9) AS BIGINT)
                > CAST(ROUND(3.0 * sigma * 1e9) AS BIGINT)
                THEN hm ELSE v END * 1e6) AS BIGINT) AS repaired_e6
    FROM sig2
    """,
)
def ts_hampel(spark, sf_dir):
    """Hampel despike per series at hourly buckets (centered ±4
    window, k=3, e9-grain boundary): flags + repaired values."""
    out = analytics.hampel_filter(
        _ev(spark, sf_dir), keys=["event_type"], ts_col="ts",
        value_col="value", trunc="hour", half=4, k=3.0,
    )
    return out.select(
        F.col("event_type").alias("series_id"),
        "ep",
        _e("v", 6).alias("v_e6"),
        "hampel_n",
        _e("hampel_median", 6).alias("median_e6"),
        _e("hampel_sigma", 6).alias("sigma_e6"),
        F.col("hampel_flag").cast("bigint").alias("flag"),
        _e("hampel_value", 6).alias("repaired_e6"),
    )


@q(
    "ts_spc_rules",
    """
    WITH b AS (
      SELECT event_type AS sid,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ep,
             CAST(ROUND(avg(value) * 1e6) AS BIGINT) AS v6
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    st AS (
      SELECT sid, ep, v6,
             COUNT(*) OVER w AS n,
             SUM(CAST(v6 AS HUGEINT)) OVER w AS s,
             SUM(CAST(v6 AS HUGEINT) * v6) OVER w AS q
      FROM b WINDOW w AS (PARTITION BY sid)
    ),
    d AS (
      SELECT sid, ep, v6, n, s,
             CAST(v6 AS HUGEINT) * n - s AS a,
             n * q - s * s AS bb
      FROM st
    ),
    f AS (
      SELECT sid, ep, v6, n, s, bb, a, a * a AS a2,
             CASE WHEN a > 0 THEN 1 WHEN a < 0 THEN -1 ELSE 0 END AS side,
             CAST(a > 0 AND a * a > 4 * bb AS INT) AS p2,
             CAST(a < 0 AND a * a > 4 * bb AS INT) AS m2,
             CAST(a > 0 AND a * a > 1 * bb AS INT) AS p1,
             CAST(a < 0 AND a * a > 1 * bb AS INT) AS m1
      FROM d
    )
    SELECT sid AS series_id, ep, v6 AS v_e6,
           CAST(n AS BIGINT) AS spc_n,
           CAST(ROUND(CAST(s AS DOUBLE) / n) AS BIGINT) AS center_e6,
           CAST(ROUND(sqrt(CAST(bb AS DOUBLE)) / n) AS BIGINT) AS sigma_e6,
           CAST(side AS BIGINT) AS side,
           CAST(a2 > 9 * bb AS BIGINT) AS r1,
           CAST(sum(p2) OVER w3 >= 2 OR sum(m2) OVER w3 >= 2 AS BIGINT) AS r2,
           CAST(sum(p1) OVER w5 >= 4 OR sum(m1) OVER w5 >= 4 AS BIGINT) AS r3,
           CAST(count(*) OVER w8 = 8
                AND min(side) OVER w8 = max(side) OVER w8
                AND side != 0 AS BIGINT) AS r4
    FROM f
    WINDOW
      w3 AS (PARTITION BY sid ORDER BY ep ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
      w5 AS (PARTITION BY sid ORDER BY ep ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
      w8 AS (PARTITION BY sid ORDER BY ep ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
    """,
)
def ts_spc_rules(spark, sf_dir):
    """Western Electric SPC rules per series at hourly buckets —
    all four rule flags integer-exact (A² > k²·B over e6-grid
    bucket means; see analytics.spc_rules)."""
    out = analytics.spc_rules(
        _ev(spark, sf_dir), keys=["event_type"], ts_col="ts",
        value_col="value", trunc="hour",
    )
    return out.select(
        F.col("event_type").alias("series_id"),
        "ep",
        _e("v", 6).alias("v_e6"),
        "spc_n",
        F.col("spc_center_e6").alias("center_e6"),
        F.col("spc_sigma_e6").alias("sigma_e6"),
        F.col("spc_side").cast("bigint").alias("side"),
        F.col("spc_r1").cast("bigint").alias("r1"),
        F.col("spc_r2").cast("bigint").alias("r2"),
        F.col("spc_r3").cast("bigint").alias("r3"),
        F.col("spc_r4").cast("bigint").alias("r4"),
    )


@q(
    "doc_edit_dups",
    "WITH "
    + _MD5_LSH_CTES
    + """
    , cand AS (
      SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      FROM sized x JOIN sized y ON x.band = y.band AND x.bucket = y.bucket
      WHERE x.doc_id < y.doc_id
    ),
    v AS (
      SELECT c.a, c.b,
             CAST(levenshtein(da.text, db.text) AS BIGINT) AS lev,
             CAST(greatest(length(da.text), length(db.text)) AS BIGINT) AS max_len
      FROM cand c
      JOIN documents da ON da.doc_id = c.a
      JOIN documents db ON db.doc_id = c.b
    )
    SELECT a, b, lev, max_len,
           CAST(ROUND((1 - CAST(lev AS DOUBLE) / max_len) * 1e6) AS BIGINT) AS sim_e6
    FROM v WHERE lev * 100 <= 20 * max_len
    """,
)
def doc_edit_dups(spark, sf_dir):
    """Edit-distance-verified near-dup pairs: md5-LSH candidates →
    exact character Levenshtein, integer-exact >=0.8 similarity cut
    (lev*100 <= 20*max_len, boundary inclusive)."""
    return dedup.edit_similarity_pairs(
        _docs(spark, sf_dir), n_perm=32, bands=8,
        hash_mode="md5", min_sim_pct=80,
    )


_PII_AUG_SQL = """
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN text
                  ELSE text || ' contact user' || CAST(doc_id AS VARCHAR)
                       || '@ex' || CAST(doc_id % 7 AS VARCHAR)
                       || '.org ip 10.' || CAST(doc_id % 200 AS VARCHAR)
                       || '.0.' || CAST((doc_id * 3) % 250 AS VARCHAR)
                       || ' ref ' || CAST(900000000 + doc_id AS VARCHAR)
             END AS text
      FROM documents
"""


@q(
    "doc_pii_redact",
    "WITH aug AS ("
    + _PII_AUG_SQL
    + """
    ),
    r AS (
      SELECT doc_id, text,
             len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_email,
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
               '<EMAIL>', 'g') AS t1
      FROM aug
    ),
    r2 AS (
      SELECT doc_id, n_email,
             len(regexp_extract_all(t1,
               '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS n_ip,
             regexp_replace(t1,
               '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b',
               '<IP>', 'g') AS t2
      FROM r
    ),
    r3 AS (
      SELECT doc_id, n_email, n_ip,
             len(regexp_extract_all(t2, '\\d{9,}')) AS n_num,
             regexp_replace(t2, '\\d{9,}', '<NUM>', 'g') AS t3
      FROM r2
    )
    SELECT doc_id,
           CAST(n_email AS BIGINT) AS pii_email_n,
           CAST(n_ip AS BIGINT) AS pii_ip_n,
           CAST(n_num AS BIGINT) AS pii_num_n,
           md5(t3) AS red_md5,
           CAST(length(t3) AS BIGINT) AS red_len
    FROM r3
    """,
)
def doc_pii_redact(spark, sf_dir):
    """PII scrub counts + redacted-text md5 over a deterministically
    PII-augmented corpus (emails/IPv4/9+-digit refs synthesized from
    doc_id on BOTH engines; doc_id%5==0 docs stay clean as the
    zero-count control). Chained replace order pinned in textops."""
    docs = _docs(spark, sf_dir)
    aug = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0, F.col("text")).otherwise(
            F.concat(
                F.col("text"),
                F.lit(" contact user"), F.col("doc_id").cast("string"),
                F.lit("@ex"), (F.col("doc_id") % 7).cast("string"),
                F.lit(".org ip 10."), (F.col("doc_id") % 200).cast("string"),
                F.lit(".0."), ((F.col("doc_id") * 3) % 250).cast("string"),
                F.lit(" ref "), (F.col("doc_id") + 900000000).cast("string"),
            )
        ).alias("text"),
    )
    out = textops.pii_redact(aug)
    return out.select(
        "doc_id", "pii_email_n", "pii_ip_n", "pii_num_n",
        F.md5("redacted").alias("red_md5"),
        F.length("redacted").cast("bigint").alias("red_len"),
    )


@q(
    "doc_hybrid_rrf",
    """
    WITH base AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
               AS dl,
             text
      FROM documents
    ),
    st AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM base
    ),
    tfl AS (
      SELECT doc_id, dl, t.term,
             len(list_filter(string_split_regex(text, '\\s+'),
                             x -> x = t.term)) AS tf
      FROM base, (VALUES ('fast'), ('merge'), ('query')) t(term)
    ),
    kept AS (SELECT * FROM tfl WHERE tf > 0),
    dfc AS (SELECT term, count(*) AS df FROM kept GROUP BY 1),
    bm_scores AS (
      SELECT doc_id,
             CAST(ROUND(sum(
               ln(1.0 + (st.n_docs - dfc.df + 0.5) / (dfc.df + 0.5))
               * (kept.tf * 2.2)
                 / (kept.tf + 1.2 * (0.25 + 0.75 * kept.dl / st.avgdl))
             ) * 1e6) AS BIGINT) AS score_e6
      FROM kept JOIN dfc USING (term) CROSS JOIN st
      GROUP BY doc_id
    ),
    bm AS (
      SELECT doc_id, rank FROM (
        SELECT doc_id,
               row_number() OVER (ORDER BY score_e6 DESC, doc_id ASC) AS rank
        FROM bm_scores
      ) WHERE rank <= 20
    ),
    q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id = 7),
    c AS (
      SELECT q.qid, e.vec_id AS nid,
             list_sum(list_transform(range(1, 65),
               i -> CAST(q.qe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) AS dot,
             sqrt(list_sum(list_transform(q.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS na,
             sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nb
      FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid
    ),
    vr AS (
      SELECT nid AS doc_id, rank FROM (
        SELECT nid,
               row_number() OVER (
                 ORDER BY CAST(ROUND(dot / (na * nb) * 1e6) AS BIGINT) DESC,
                          nid ASC
               ) AS rank
        FROM c
      ) WHERE rank <= 20
    ),
    f AS (
      SELECT COALESCE(b.doc_id, v.doc_id) AS doc_id,
             b.rank AS bm_rank, v.rank AS emb_rank
      FROM bm b FULL OUTER JOIN vr v ON b.doc_id = v.doc_id
    ),
    scored AS (
      SELECT doc_id,
             CAST(bm_rank AS BIGINT) AS bm_rank,
             CAST(emb_rank AS BIGINT) AS emb_rank,
             CAST(CASE WHEN bm_rank IS NOT NULL THEN 1 ELSE 0 END
                + CASE WHEN emb_rank IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
               AS n_lists,
             CAST(ROUND((
               COALESCE(CAST(1 AS DOUBLE) / (60 + bm_rank), 0)
               + COALESCE(CAST(1 AS DOUBLE) / (60 + emb_rank), 0)
             ) * 1e9) AS BIGINT) AS rrf_e9
      FROM f
    )
    SELECT doc_id, bm_rank, emb_rank, n_lists, rrf_e9,
           CAST(fused_rank AS BIGINT) AS fused_rank
    FROM (
      SELECT *,
             row_number() OVER (ORDER BY rrf_e9 DESC, doc_id ASC) AS fused_rank
      FROM scored
    ) WHERE fused_rank <= 10
    """,
)
def doc_hybrid_rrf(spark, sf_dir):
    """Hybrid retrieval: BM25 top-20 ({fast, merge, query}) + brute
    cosine top-20 (query vector = embedding of vec_id 7; doc_id ≡
    vec_id) fused with reciprocal-rank fusion (k=60), top-10. Fused
    score is a fixed-arity sum of exact-integer divisions — rrf_e9 is
    cross-engine identical (see simsearch.rrf_fuse)."""
    out = simsearch.hybrid_rrf(
        _docs(spark, sf_dir), _emb(spark, sf_dir),
        terms=["fast", "merge", "query"], query_vec_id=7,
        pool=20, topk=10, rrf_k=60,
    )
    return out.select(
        "doc_id", "bm_rank", "emb_rank", "n_lists", "rrf_e9",
        F.col("fused_rank").cast("bigint").alias("fused_rank"),
    )


@q(
    "ts_quantile_norm",
    """
    WITH b AS (
      SELECT event_type AS sid,
             CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ep,
             CAST(ROUND(avg(value) * 1e6) AS BIGINT) AS v6
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2, 3
    ),
    ranked AS (
      SELECT sid, day, ep, v6,
             row_number() OVER (PARTITION BY sid, day ORDER BY v6, ep) AS r,
             count(*) OVER (PARTITION BY sid, day) AS ns,
             count(*) OVER (PARTITION BY day) AS nn,
             row_number() OVER (PARTITION BY day ORDER BY v6, sid, ep) AS pr
      FROM b
    ),
    lpos AS (
      SELECT sid, day, ep, v6, r, ns,
             CASE WHEN ns > 1 THEN 1 + (r - 1) * (nn - 1) // (ns - 1)
                  ELSE 1 + (nn - 1) // 2 END AS pos
      FROM ranked
    ),
    pooled AS (SELECT day, pr AS pos, v6 AS qn6 FROM ranked)
    SELECT l.sid AS series_id, l.day, l.ep, l.v6 AS v_e6,
           CAST(l.r AS BIGINT) AS qn_rank, CAST(l.ns AS BIGINT) AS qn_n,
           p.qn6 AS qn_e6
    FROM lpos l JOIN pooled p ON p.day = l.day AND p.pos = l.pos
    """,
)
def ts_quantile_norm(spark, sf_dir):
    """Per-day quantile normalization of each series' hourly-mean
    distribution onto the pooled day distribution — integer-exact
    rank mapping (see analytics.quantile_normalize)."""
    out = analytics.quantile_normalize(
        _ev(spark, sf_dir), keys=["event_type"], ts_col="ts",
        value_col="value", trunc="hour",
    )
    return out.select(
        F.col("event_type").alias("series_id"),
        "day", "ep",
        _e("v", 6).alias("v_e6"),
        F.col("qn_rank").cast("bigint").alias("qn_rank"),
        F.col("qn_n").cast("bigint").alias("qn_n"),
        _e("qn_value", 6).alias("qn_e6"),
    )


@q(
    "ts_croston",
    """
    WITH RECURSIVE b AS (
      SELECT event_type AS sid,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ep,
             count(*) AS q
      FROM events WHERE value IS NOT NULL AND value > 100.0 GROUP BY 1, 2
    ),
    o AS (
      SELECT sid, ep, q,
             (ep - lag(ep) OVER (PARTITION BY sid ORDER BY ep)) // 3600 AS gap,
             row_number() OVER (PARTITION BY sid ORDER BY ep) AS rn
      FROM b
    ),
    r AS (
      SELECT sid, ep, q, gap, rn,
             CAST(q AS DOUBLE) AS z, CAST(1.0 AS DOUBLE) AS p
      FROM o WHERE rn = 1
      UNION ALL
      SELECT o.sid, o.ep, o.q, o.gap, o.rn,
             r.z + 0.25 * (o.q - r.z),
             r.p + 0.25 * (o.gap - r.p)
      FROM r JOIN o ON o.sid = r.sid AND o.rn = r.rn + 1
    )
    SELECT sid AS series_id, ep,
           CAST(q AS BIGINT) AS q,
           CAST(gap AS BIGINT) AS gap,
           CAST(ROUND(z * 1e6) AS BIGINT) AS size_e6,
           CAST(ROUND(p * 1e6) AS BIGINT) AS interval_e6,
           CAST(ROUND(z / p * 1e6) AS BIGINT) AS forecast_e6,
           CAST(ROUND(0.875 * (z / p) * 1e6) AS BIGINT) AS sba_e6
    FROM r
    """,
)
def ts_croston(spark, sf_dir):
    """Croston intermittent-demand smoother per series (demand =
    hourly count of value>100 events — 33% nonzero hours at sf0.01;
    α=0.25, init z1=q1 p1=1, SBA 0.875 correction). Arrow recursion
    vs recursive CTE, identical IEEE expression shapes."""
    out = analytics.croston(
        _ev(spark, sf_dir), keys=["event_type"], ts_col="ts",
        value_col="value", trunc="hour", threshold=100.0, alpha=0.25,
    )
    return out.select(
        F.col("event_type").alias("series_id"),
        "ep", "q", "gap",
        _e("cr_size", 6).alias("size_e6"),
        _e("cr_interval", 6).alias("interval_e6"),
        _e("cr_forecast", 6).alias("forecast_e6"),
        _e("cr_sba", 6).alias("sba_e6"),
    )


@q(
    "ts_rfm",
    """
    WITH per AS (
      SELECT user_id,
             CAST(max(floor(epoch(ts))) AS BIGINT) AS last_s,
             count(*) AS freq,
             sum(CAST(ROUND(value * 100) AS BIGINT)) AS monetary_c
      FROM events WHERE user_id IS NOT NULL GROUP BY 1
    ),
    g AS (SELECT max(last_s) AS tmax FROM per),
    r AS (
      SELECT p.user_id, g.tmax - p.last_s AS recency_s, p.freq, p.monetary_c
      FROM per p CROSS JOIN g
    ),
    qs AS (
      SELECT quantile_cont(recency_s, 0.25) AS r1, quantile_cont(recency_s, 0.5) AS r2,
             quantile_cont(recency_s, 0.75) AS r3,
             quantile_cont(freq, 0.25) AS f1, quantile_cont(freq, 0.5) AS f2,
             quantile_cont(freq, 0.75) AS f3,
             quantile_cont(monetary_c, 0.25) AS m1, quantile_cont(monetary_c, 0.5) AS m2,
             quantile_cont(monetary_c, 0.75) AS m3
      FROM r
    ),
    s AS (
      SELECT r.user_id, r.recency_s, CAST(r.freq AS BIGINT) AS freq, r.monetary_c,
             1 + CAST(r.recency_s < qs.r1 AS INT) + CAST(r.recency_s < qs.r2 AS INT)
               + CAST(r.recency_s < qs.r3 AS INT) AS r_score,
             1 + CAST(r.freq > qs.f1 AS INT) + CAST(r.freq > qs.f2 AS INT)
               + CAST(r.freq > qs.f3 AS INT) AS f_score,
             1 + CAST(r.monetary_c > qs.m1 AS INT) + CAST(r.monetary_c > qs.m2 AS INT)
               + CAST(r.monetary_c > qs.m3 AS INT) AS m_score
      FROM r CROSS JOIN qs
    )
    SELECT user_id, recency_s, freq, monetary_c,
           CAST(r_score AS INT) AS r_score, CAST(f_score AS INT) AS f_score,
           CAST(m_score AS INT) AS m_score,
           CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT) AS rfm_segment
    FROM s
    """,
)
def ts_rfm(spark, sf_dir):
    """RFM quartile segmentation per user — cents-grid integer
    monetary, broadcast exact quartile boundaries, strict-comparison
    scores (see analytics.rfm_scores)."""
    out = analytics.rfm_scores(
        _ev(spark, sf_dir), user_col="user_id", ts_col="ts", value_col="value"
    )
    return out.select(
        "user_id", "recency_s", "freq", "monetary_c",
        "r_score", "f_score", "m_score", "rfm_segment",
    )


@q(
    "ts_max_drawdown",
    """
    WITH b AS (
      SELECT event_type AS k,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ep,
             CAST(ROUND(avg(value) * 1e6) AS BIGINT) AS v_e6
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    r0 AS (
      SELECT k, ep, v_e6,
             max(v_e6) OVER (PARTITION BY k ORDER BY ep
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS runmax
      FROM b
    ),
    r AS (
      SELECT *,
             lag(runmax) OVER (PARTITION BY k ORDER BY ep) AS prevmax
      FROM r0
    ),
    p AS (
      SELECT *,
             last_value(CASE WHEN prevmax IS NULL OR runmax > prevmax
                             THEN ep END IGNORE NULLS) OVER wr AS peak_ep,
             runmax - v_e6 AS dd_e6
      FROM r
      WINDOW wr AS (PARTITION BY k ORDER BY ep
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    s AS (
      SELECT *,
             sum(CASE WHEN dd_e6 > 0 THEN 1 ELSE 0 END) OVER (PARTITION BY k)
               AS underwater_buckets,
             count(*) OVER (PARTITION BY k) AS n_buckets,
             row_number() OVER (PARTITION BY k ORDER BY dd_e6 DESC, ep)
               AS rn
      FROM p
    )
    SELECT k AS event_type, dd_e6 AS mdd_e6, peak_ep, ep AS trough_ep,
           ep - peak_ep AS dur_s,
           CAST(underwater_buckets AS BIGINT) AS underwater_buckets,
           CAST(n_buckets AS BIGINT) AS n_buckets
    FROM s WHERE rn = 1
    """,
)
def ts_max_drawdown(spark, sf_dir):
    """Max drawdown per event_type over e6-grid hourly means —
    integer-exact peak/trough/depth, first-trough and first-peak tie
    rules pinned (see analytics.max_drawdown)."""
    return analytics.max_drawdown(
        _ev(spark, sf_dir), keys=["event_type"], ts_col="ts",
        value_col="value", trunc="hour",
    )


@q(
    "seq_kneser_ney",
    _synth_cte()
    + """
    , bg AS (
      SELECT doc_id, tokens[i] AS a, tokens[i + 1] AS b
      FROM seq, unnest(range(1, len(tokens))) AS u(i)
      WHERE tokens[i] <> 0 AND tokens[i + 1] <> 0
    ),
    bgc AS (SELECT a, b, count(*) AS cab FROM bg GROUP BY 1, 2),
    ua AS (SELECT a, sum(cab) AS ca, count(*) AS n1pa FROM bgc GROUP BY 1),
    ub AS (SELECT b, count(*) AS n1pb FROM bgc GROUP BY 1),
    tt AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM bgc)
    SELECT bg.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(ROUND(sum(ln((bgc.cab - 0.75) / ua.ca
                             + 0.75 * ua.n1pa / ua.ca * (ub.n1pb / tt.t)))
                      * 1e6) AS BIGINT) AS kn_lp_e6,
           CAST(ROUND(-sum(ln((bgc.cab - 0.75) / ua.ca
                              + 0.75 * ua.n1pa / ua.ca * (ub.n1pb / tt.t)))
                      / count(*) * 1e6) AS BIGINT) AS kn_nll_e6
    FROM bg JOIN bgc USING (a, b) JOIN ua USING (a) JOIN ub USING (b)
         CROSS JOIN tt
    GROUP BY 1
    """,
)
def seq_kneser_ney(spark, sf_dir):
    """Per-doc log-likelihood under the corpus interpolated
    Kneser-Ney bigram LM (d=0.75) — continuation-probability
    smoothing vs seq_bigram_logprob's add-k (see
    textops.kneser_ney_logprob for the pinned rules)."""
    out = textops.kneser_ney_logprob(_seq(spark), pad_id=C.PAD_ID, d=0.75)
    return out.select(
        "doc_id",
        "n_bigrams",
        _e("logprob", 6).alias("kn_lp_e6"),
        _e("avg_nll", 6).alias("kn_nll_e6"),
    )


@q(
    "emb_ann_ndcg",
    _ANN_CTES
    + """
    SELECT e.qid,
           CAST(count(a.nid) AS BIGINT) AS n_hits,
           CAST(ROUND(
             sum(CASE WHEN a.rank IS NOT NULL
                      THEN (6 - e.rank) / ln(a.rank + 1.0)
                      ELSE 0.0 END)
             / (5.0/ln(2.0) + 4.0/ln(3.0) + 3.0/ln(4.0)
                + 2.0/ln(5.0) + 1.0/ln(6.0))
             * 1e6) AS BIGINT) AS ndcg_e6
    FROM exact e LEFT JOIN approx a ON e.qid = a.qid AND e.nid = a.nid
    GROUP BY e.qid
    """,
)
def emb_ann_ndcg(spark, sf_dir):
    """NDCG@5 of the 12x3 LSH ranking vs exact cosine ground truth —
    position-discounted ranking quality alongside emb_ann_recall's
    set-overlap (see simsearch.ndcg_topk for the grading pins)."""
    return simsearch.ndcg_topk(
        _emb(spark, sf_dir), list(range(20)), k=5, n_planes=3, n_tables=12
    )


@q(
    "doc_chunk_sliding",
    r"""
    WITH w AS (
      SELECT doc_id,
             string_split_regex(trim(text), '\s+') AS words
      FROM documents
    ),
    c AS (
      -- pinned chunk rule: 1 + ceil(max(n-32,0)/24) in integer form
      SELECT doc_id, words,
             1 + (greatest(len(words) - 32, 0) + 23) // 24 AS nch
      FROM w
    ),
    ex AS (
      SELECT doc_id, words, unnest(range(0, nch)) AS ci FROM c
    )
    SELECT doc_id,
           CAST(ci AS INT) AS chunk_idx,
           CAST(ci * 24 AS BIGINT) AS start_word,
           CAST(len(list_slice(words, ci*24 + 1, ci*24 + 32)) AS BIGINT) AS n_words,
           md5(array_to_string(list_slice(words, ci*24 + 1, ci*24 + 32), ' ')) AS chunk_md5
    FROM ex
    """,
)
def doc_chunk_sliding(spark, sf_dir):
    """RAG chunker: width-32 stride-24 word windows per doc, md5 per
    chunk — both engines must cut identical window boundaries AND
    identical chunk contents (see textops.chunk_sliding pins)."""
    return textops.chunk_sliding(
        _docs(spark, sf_dir), width=32, stride=24
    )


@q(
    "doc_split_hash",
    """
    WITH b AS (
      SELECT source, doc_id, text,
             CAST('0x' || substring(md5(text), 1, 8) AS BIGINT) % 100 AS bucket
      FROM documents
    )
    SELECT source,
           CASE WHEN bucket < 96 THEN 'train'
                WHEN bucket < 98 THEN 'val'
                ELSE 'test' END AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(doc_id) AS BIGINT) AS id_sum,
           CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_texts
    FROM b
    GROUP BY source, 2
    """,
)
def doc_split_hash(spark, sf_dir):
    """Content-hash train/val/test split (96/2/2), summarized per
    (source, split): count + id-sum + distinct-text count. The split
    key is md5(text) so byte-identical dupes can never straddle
    train/eval (textops.split_assign pins the bucket rule)."""
    d = textops.split_assign(_docs(spark, sf_dir), train_pct=96, val_pct=2)
    return d.groupBy("source", "split").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("doc_id").cast("bigint").alias("id_sum"),
        F.countDistinct(F.md5("text")).cast("bigint").alias("n_texts"),
    )


_BLOCKLIST = ["slow", "merge batch", "big vector"]


@q(
    "doc_blocklist",
    r"""
    WITH p AS (
      SELECT source,
             ' ' || regexp_replace(trim(text), '\s+', ' ', 'g') || ' ' AS pt
      FROM documents
    ),
    hits AS (
      SELECT source, 'slow' AS phrase,
             (len(pt) - len(replace(pt, ' slow ', ''))) // len(' slow ') AS h
      FROM p
      UNION ALL
      SELECT source, 'merge batch',
             (len(pt) - len(replace(pt, ' merge batch ', ''))) // len(' merge batch ')
      FROM p
      UNION ALL
      SELECT source, 'big vector',
             (len(pt) - len(replace(pt, ' big vector ', ''))) // len(' big vector ')
      FROM p
    )
    SELECT source, phrase,
           CAST(sum(CASE WHEN h > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
           CAST(sum(h) AS BIGINT) AS hits
    FROM hits
    GROUP BY source, phrase
    """,
)
def doc_blocklist(spark, sf_dir):
    """Blocklist phrase histogram per source: docs-hit + total
    occurrences for each banned word/phrase, word-boundary matched
    (textops.blocklist_tag pins the left-to-right non-overlapping
    counting rule both engines share)."""
    d = textops.blocklist_tag(_docs(spark, sf_dir), _BLOCKLIST)
    pairs = []
    for p in _BLOCKLIST:
        c = f"hits_{p.replace(' ', '_')}"
        pairs.extend([F.lit(p), F.col(c)])
    ex = d.select(
        "source", F.explode(F.create_map(*pairs)).alias("phrase", "h")
    )
    return ex.groupBy("source", "phrase").agg(
        F.sum(F.when(F.col("h") > 0, 1).otherwise(0)).cast("bigint").alias("n_docs"),
        F.sum("h").cast("bigint").alias("hits"),
    )


@q(
    "ts_scd2",
    """
    WITH d AS (
      SELECT event_type AS k, ts,
             max(CASE WHEN value IS NULL THEN -1
                      WHEN value < 10 THEN 0 ELSE 1 END) AS st
      FROM events GROUP BY 1, 2
    ),
    c AS (
      SELECT k, ts, st,
             CASE WHEN st IS DISTINCT FROM
                       lag(st) OVER (PARTITION BY k ORDER BY ts)
                  THEN 1 ELSE 0 END AS chg
      FROM d
    ),
    i AS (
      SELECT k, ts, st,
             sum(chg) OVER (PARTITION BY k ORDER BY ts
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS ver
      FROM c
    ),
    g AS (
      SELECT k, ver, st, min(ts) AS vf, count(*) AS n
      FROM i GROUP BY 1, 2, 3
    )
    SELECT k AS event_type,
           CAST(ver AS INT) AS version,
           CAST(st AS INT) AS state,
           strftime(vf, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(lead(vf) OVER (PARTITION BY k ORDER BY ver),
                    '%Y-%m-%d %H:%M:%S') AS valid_to,
           CAST(n AS BIGINT) AS n_events,
           lead(vf) OVER (PARTITION BY k ORDER BY ver) IS NULL AS is_current
    FROM g
    """,
)
def ts_scd2(spark, sf_dir):
    """SCD type-2 history per event_type over the 3-state value
    discretization (null / <10 / >=10) — half-open validity intervals,
    duplicate-ts max-state collapse and null-is-a-state run rules
    pinned (see analytics.scd2_history)."""
    ev = _ev(spark, sf_dir).select(
        "event_type",
        F.col("ts").alias("event_ts"),
        F.when(F.col("value").isNull(), -1)
        .when(F.col("value") < 10, 0)
        .otherwise(1)
        .cast("int")
        .alias("state"),
    )
    h = analytics.scd2_history(
        ev, keys=["event_type"], ts_col="event_ts", state_col="state"
    )
    return h.select(
        "event_type",
        "version",
        "state",
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        "n_events",
        "is_current",
    )


@q(
    "ts_prop_drift",
    """
    WITH b AS (
      SELECT event_type AS k,
             CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS ep,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN value >= 10.0 THEN 1 ELSE 0 END) AS BIGINT)
               AS s
      FROM events GROUP BY 1, 2
    ),
    r AS (
      SELECT *, lag(n) OVER w AS n0, lag(s) OVER w AS s0
      FROM b WINDOW w AS (PARTITION BY k ORDER BY ep)
    ),
    z AS (
      SELECT *,
             CASE WHEN n0 IS NOT NULL AND s + s0 > 0 AND s + s0 < n + n0
                  THEN (CAST(s AS DOUBLE) / n - CAST(s0 AS DOUBLE) / n0)
                       / sqrt(((s + s0) / CAST(n + n0 AS DOUBLE))
                              * (1.0 - (s + s0) / CAST(n + n0 AS DOUBLE))
                              * (1.0 / n + 1.0 / n0))
             END AS zz
      FROM r
    )
    SELECT k AS event_type, ep, n, s, n0, s0,
           CAST(ROUND(zz * 1e6) AS BIGINT) AS z_e6,
           coalesce(abs(zz) > 1.96, false) AS drifted
    FROM z
    """,
)
def ts_prop_drift(spark, sf_dir):
    """Two-proportion z-test day-over-day per event_type (success =
    value >= 10): identical bigint counts through an identical IEEE
    expression tree in both engines, degenerate pooled rates null
    (see analytics.proportion_drift)."""
    return analytics.proportion_drift(
        _ev(spark, sf_dir),
        keys=["event_type"],
        ts_col="ts",
        value_col="value",
        threshold=10.0,
        trunc="day",
    )


def _jl_sql(out_dim: int = 16, dim: int = 64, stride: int = 7) -> str:
    # The sign matrix enters as a 16-row VALUES relation (one list
    # literal per row, materialized ONCE) rather than a nested 16x64
    # literal indexed inside the projection lambda — the oracle engine
    # re-builds a literal list on every [j][i] access, which turns a
    # 2k-row projection into ~2e9 element constructions (measured:
    # minutes at sf0.1; milliseconds this way).
    signs = simsearch.jl_signs(out_dim, dim)
    svalues = ",\n        ".join(
        f"({j + 1}, [{', '.join(f'{float(s):.1f}' for s in row)}])"
        for j, row in enumerate(signs)
    )
    return f"""
    WITH sgn(j, srow) AS (
      VALUES
        {svalues}
    ),
    e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    pj AS (
      SELECT e.vec_id, s.j,
             list_sum(list_transform(range(1, {dim + 1}),
                      i -> s.srow[i] * e.v[i])) AS yj
      FROM e CROSS JOIN sgn s
    ),
    py AS (
      SELECT vec_id, list(yj ORDER BY j) AS y FROM pj GROUP BY vec_id
    ),
    p AS (
      SELECT e.vec_id, e.v, py.y FROM e JOIN py USING (vec_id)
    ),
    pr AS (
      SELECT a.vec_id AS aid, b.vec_id AS bid,
             CAST(ROUND(list_sum(list_transform(range(1, {dim + 1}),
                    i -> (a.v[i] - b.v[i]) * (a.v[i] - b.v[i]))) * 1e6)
               AS BIGINT) AS d2x_e6,
             CAST(ROUND(list_sum(list_transform(range(1, {out_dim + 1}),
                    j -> (a.y[j] - b.y[j]) * (a.y[j] - b.y[j]))) * 1e6)
               AS BIGINT) AS d2y_e6
      FROM p a JOIN p b ON b.vec_id = a.vec_id + {stride}
    )
    SELECT aid, bid, d2x_e6, d2y_e6,
           CASE WHEN d2x_e6 > 0
                THEN CAST(ROUND(1e4 * d2y_e6 / ({out_dim} * d2x_e6)) AS BIGINT)
           END AS ratio_e4
    FROM pr
    """


@q("emb_jl_distortion", _jl_sql())
def emb_jl_distortion(spark, sf_dir):
    """JL ±1 projection 64→16 with measured pairwise distance
    distortion on the deterministic (id, id+7) pair sample — ratio
    derived from e6-rounded integer distances so the quotient is
    cross-engine exact (see simsearch.jl_distortion)."""
    return simsearch.jl_distortion(_emb(spark, sf_dir))


@q(
    "emb_ivf_balance",
    """
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    cents AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
    csim AS (
      SELECT e.vec_id AS nid, c.cid,
             CAST(ROUND(
               list_sum(list_transform(range(1, 65), i -> e.v[i] * c.cv[i]))
               / (sqrt(list_sum(list_transform(e.v, x -> x * x)))
                * sqrt(list_sum(list_transform(c.cv, x -> x * x))))
               * 1e6) AS BIGINT) AS s
      FROM e CROSS JOIN cents c
    ),
    assign AS (
      SELECT nid, cid FROM (
        SELECT nid, cid,
               row_number() OVER (PARTITION BY nid ORDER BY s DESC, cid) AS r
        FROM csim
      ) WHERE r = 1
    ),
    sz AS (
      SELECT cid, count(*) AS n, min(nid) AS mn, max(nid) AS mx
      FROM assign GROUP BY 1
    )
    SELECT CAST(cid AS BIGINT) AS cid,
           CAST(n AS BIGINT) AS n_vecs,
           CAST(ROUND(n * 1e6 / sum(n) OVER ()) AS BIGINT) AS share_e6,
           CAST(ROUND(n * 8.0 * 1e6 / sum(n) OVER ()) AS BIGINT) AS load_e6,
           CAST(mn AS BIGINT) AS min_id,
           CAST(mx AS BIGINT) AS max_id
    FROM sz
    """,
)
def emb_ivf_balance(spark, sf_dir):
    """IVF posting-list balance audit over the default 8-cell index:
    size / corpus share / load factor per cell (load 1e6 = perfectly
    balanced), the partitioned-index skew monitor (see
    simsearch.ivf_balance)."""
    return simsearch.ivf_balance(_emb(spark, sf_dir), n_centroids=8)


@q(
    "seq_span_corruption",
    _synth_cte()
    + f"""
    , mk AS (
      SELECT doc_id, len(tokens) AS n, tokens,
             list_transform(range(1, len(tokens) + 1),
               i -> CASE WHEN tokens[i] <> {C.PAD_ID}
                          AND (tokens[i] * 31 + i) % 7 = 0
                         THEN 1 ELSE 0 END) AS m
      FROM seq WHERE len(tokens) > 0
    )
    SELECT doc_id, CAST(n AS BIGINT) AS n_tok,
           CAST(list_sum(m) AS BIGINT) AS n_noised,
           CAST(list_sum(list_transform(range(1, n + 1),
             i -> CASE WHEN m[i] = 1 AND (i = 1 OR m[i - 1] = 0)
                       THEN 1 ELSE 0 END)) AS BIGINT) AS n_spans,
           CAST(n - list_sum(m)
                + list_sum(list_transform(range(1, n + 1),
                    i -> CASE WHEN m[i] = 1 AND (i = 1 OR m[i - 1] = 0)
                              THEN 1 ELSE 0 END)) AS BIGINT) AS input_len,
           CAST(list_sum(m)
                + list_sum(list_transform(range(1, n + 1),
                    i -> CASE WHEN m[i] = 1 AND (i = 1 OR m[i - 1] = 0)
                              THEN 1 ELSE 0 END)) + 1 AS BIGINT) AS target_len,
           CASE WHEN len(list_filter(tokens, x -> x <> {C.PAD_ID})) > 0
                THEN CAST(ROUND(CAST(list_sum(m) AS DOUBLE)
                       / len(list_filter(tokens, x -> x <> {C.PAD_ID}))
                       * 1e6) AS BIGINT)
           END AS noise_rate_e6
    FROM mk
    """,
)
def seq_span_corruption(spark, sf_dir):
    """T5-style span-corruption plan per sequence: content-addressed
    mask (t_i*31 + i) % 7 == 0 on non-PAD positions, adjacent noised
    positions merged into sentinel spans, encoder/decoder lengths
    derived (see textops.span_corruption_plan)."""
    return textops.span_corruption_plan(_seq(spark), pad_id=C.PAD_ID)


@q(
    "emb_hard_negatives",
    """
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
             CAST(label AS BIGINT) AS lab
      FROM embeddings
    ),
    q AS (SELECT vec_id AS qid, v AS qv, lab AS qlab FROM e WHERE vec_id % 37 = 0),
    s AS (
      SELECT q.qid, q.qlab, e.vec_id AS nid, e.lab AS nlab,
             CAST(ROUND(
               list_sum(list_transform(range(1, 65), i -> q.qv[i] * e.v[i]))
               / (sqrt(list_sum(list_transform(q.qv, x -> x * x)))
                * sqrt(list_sum(list_transform(e.v, x -> x * x))))
               * 1e6) AS BIGINT) AS sim_e6
      FROM q CROSS JOIN e WHERE e.vec_id <> q.qid
    ),
    pos AS (
      SELECT qid, nid, sim_e6,
             row_number() OVER (PARTITION BY qid ORDER BY sim_e6 DESC, nid) AS r
      FROM s WHERE nlab = qlab
    ),
    neg AS (
      SELECT qid, nid, sim_e6,
             row_number() OVER (PARTITION BY qid ORDER BY sim_e6 DESC, nid) AS r
      FROM s WHERE nlab <> qlab
    )
    SELECT q.qid, q.qlab AS q_label,
           p.nid AS pos_id, p.sim_e6 AS pos_sim_e6,
           n.nid AS neg_id, n.sim_e6 AS neg_sim_e6,
           p.sim_e6 - n.sim_e6 AS margin_e6
    FROM q
    LEFT JOIN (SELECT * FROM pos WHERE r = 1) p USING (qid)
    LEFT JOIN (SELECT * FROM neg WHERE r = 1) n USING (qid)
    """,
)
def emb_hard_negatives(spark, sf_dir):
    """Hard-negative mining on the deterministic 1-in-37 query sample:
    most-similar other-label vector, hardest same-label positive, and
    the margin between them (see simsearch.hard_negatives)."""
    return simsearch.hard_negatives(_emb(spark, sf_dir))


def _zorder_sql(bits: int = 8, prefix_bits: int = 6) -> str:
    zterms = " + ".join(
        f"(((u >> {i}) & 1) << {2 * i}) + (((h >> {i}) & 1) << {2 * i + 1})"
        for i in range(bits)
    )
    mask = (1 << bits) - 1
    return f"""
    WITH b AS (
      SELECT (user_id & {mask}) AS u,
             ((CAST(floor(epoch(ts)) AS BIGINT) // 3600) & {mask}) AS h
      FROM events
    ),
    z AS (SELECT u, h, ({zterms}) AS zv FROM b)
    SELECT CAST(zv >> {2 * bits - prefix_bits} AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(u) AS BIGINT) AS u_min,
           CAST(max(u) AS BIGINT) AS u_max,
           CAST(min(h) AS BIGINT) AS h_min,
           CAST(max(h) AS BIGINT) AS h_max,
           CAST(max(u) - min(u) AS BIGINT) AS u_span,
           CAST(max(h) - min(h) AS BIGINT) AS h_span
    FROM z GROUP BY 1
    """


@q("ts_zorder_layout", _zorder_sql())
def ts_zorder_layout(spark, sf_dir):
    """Morton/Z-order clustering key over (user, hour) with the layout
    audit: per z-prefix bucket (≈ one file under a z-sorted write),
    row count and the bounding rectangle in (user, hour) space — both
    spans bounded by the z-curve closed form (see
    tiers.zorder_layout)."""
    return tiers.zorder_layout(_ev(spark, sf_dir))


@q(
    "seq_length_buckets",
    _synth_cte()
    + """
    , lb AS (
      SELECT CASE WHEN n_tok <= 16 THEN 16 WHEN n_tok <= 32 THEN 32
                  WHEN n_tok <= 64 THEN 64 WHEN n_tok <= 128 THEN 128
                  WHEN n_tok <= 256 THEN 256 WHEN n_tok <= 512 THEN 512
                  WHEN n_tok <= 1024 THEN 1024 ELSE 2048 END AS bucket,
             n_tok, CASE WHEN n_tok > 2048 THEN 1 ELSE 0 END AS ovf
      FROM seq WHERE n_tok > 0
    ),
    ag AS (
      SELECT bucket, count(*) AS cnt, sum(n_tok) AS real, sum(ovf) AS novf
      FROM lb GROUP BY 1
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(cnt AS BIGINT) AS n_seqs,
           CAST(real AS BIGINT) AS real_tokens,
           CAST(bucket * cnt AS BIGINT) AS padded_tokens,
           CAST(ROUND(CAST(bucket * cnt - real AS DOUBLE)
                  / (bucket * cnt) * 1e6) AS BIGINT) AS waste_rate_e6,
           CAST(novf AS BIGINT) AS n_overflow
    FROM ag
    """,
)
def seq_length_buckets(spark, sf_dir):
    """Padding-waste audit for length-bucketed batching: smallest
    power-of-two bucket per sequence, exact real-vs-padded token
    accounting per bucket (see packing.length_buckets — the baseline
    sequence packing must beat)."""
    return packing.length_buckets(_seq(spark))


@q(
    "doc_mixture_weights",
    r"""
    WITH w AS (
      SELECT source, string_split_regex(trim(text), '\s+') AS ws FROM documents
    ),
    p AS (
      SELECT source, len(ws) AS nw FROM w
      WHERE len(ws) >= 5 AND 10 * len(list_distinct(ws)) > 3 * len(ws)
    ),
    s AS (
      SELECT source, count(*) AS n_docs, sum(nw) AS avail FROM p GROUP BY 1
    ),
    t AS (SELECT count(*) AS ns FROM s)
    SELECT source,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(avail AS BIGINT) AS avail_tokens,
           CAST(50000 // ns AS BIGINT) AS target_tokens,
           least(CAST(1000000 AS BIGINT),
                 CAST(ROUND(CAST(50000 // ns AS DOUBLE) / avail * 1e6)
                   AS BIGINT)) AS weight_e6,
           least(CAST(avail AS BIGINT), CAST(50000 // ns AS BIGINT))
             AS sampled_tokens
    FROM s CROSS JOIN t
    """,
)
def doc_mixture_weights(spark, sf_dir):
    """Per-source curation mixture plan for a 50k-token budget split
    equally across sources with ≥1 quality-passing doc: weight =
    min(1, target/avail) (see textops.mixture_weights)."""
    return textops.mixture_weights(_docs(spark, sf_dir))


@q(
    "ts_dispersion",
    """
    WITH c AS (
      SELECT event_type,
             CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS ep,
             count(*) AS c
      FROM events GROUP BY 1, 2
    ),
    a AS (
      SELECT event_type, sum(c) AS s, sum(c * c) AS q, count(*) AS nz,
             (max(ep) - min(ep)) // 3600 + 1 AS n
      FROM c GROUP BY 1
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_buckets,
           CAST(nz AS BIGINT) AS n_nonzero,
           CAST(s AS BIGINT) AS n_events,
           CAST(ROUND(1e6 * (n * q - s * s) / (n * s)) AS BIGINT) AS fano_e6,
           CAST(ROUND(1e6
                  * (sqrt(CAST(n * q - s * s AS DOUBLE)) / n
                     - CAST(s AS DOUBLE) / n)
                  / (sqrt(CAST(n * q - s * s AS DOUBLE)) / n
                     + CAST(s AS DOUBLE) / n)) AS BIGINT) AS burstiness_e6,
           CAST(ROUND(CAST(n - nz AS DOUBLE) / n * 1e6) AS BIGINT)
             AS zero_frac_e6
    FROM a
    """,
)
def ts_dispersion(spark, sf_dir):
    """Fano factor + burstiness per series over the FULL hourly grid
    (empty buckets included without a spine join — zeros add nothing
    to the sums; see analytics.dispersion_stats)."""
    return analytics.dispersion_stats(_ev(spark, sf_dir), ["event_type"])


@q(
    "emb_centroid_drift",
    """
    WITH e AS (
      SELECT vec_id % 2 AS half, CAST(label AS BIGINT) AS label,
             list_transform(embedding,
               x -> CAST(ROUND(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS qv
      FROM embeddings
      WHERE embedding IS NOT NULL AND label IS NOT NULL
    ),
    cnts AS (SELECT half, label, count(*) AS n FROM e GROUP BY 1, 2),
    u AS (
      SELECT half, label, j, sum(qv[j]) AS s
      FROM e CROSS JOIN range(1, 65) t(j) GROUP BY 1, 2, 3
    ),
    sv AS (
      SELECT half, label, list(s ORDER BY j) AS v FROM u GROUP BY 1, 2
    ),
    a AS (
      SELECT sv.label, n AS n_even, v AS va
      FROM sv JOIN cnts USING (half, label) WHERE half = 0
    ),
    b AS (
      SELECT sv.label, n AS n_odd, v AS vb
      FROM sv JOIN cnts USING (half, label) WHERE half = 1
    ),
    j AS (
      SELECT COALESCE(a.label, b.label) AS label,
             COALESCE(n_even, 0) AS n_even, COALESCE(n_odd, 0) AS n_odd,
             CAST(ROUND(
               1e6 * list_sum(list_transform(range(1, 65),
                                k -> va[k] * vb[k]))
               / (sqrt(CAST(list_sum(list_transform(va, x -> x * x))
                       AS DOUBLE))
                * sqrt(CAST(list_sum(list_transform(vb, x -> x * x))
                       AS DOUBLE)))) AS BIGINT) AS cos_e6
      FROM a FULL JOIN b ON a.label = b.label
    )
    SELECT label, CAST(n_even AS BIGINT) AS n_even,
           CAST(n_odd AS BIGINT) AS n_odd, cos_e6,
           CAST(1000000 - cos_e6 AS BIGINT) AS drift_e6
    FROM j
    """,
)
def emb_centroid_drift(spark, sf_dir):
    """Per-label centroid cosine between the even-id and odd-id
    cohorts — the embedding-space A/B null test, exact via e6-integer
    component sums whose counts cancel in the cosine (see
    simsearch.centroid_drift)."""
    return simsearch.centroid_drift(_emb(spark, sf_dir))


@q(
    "doc_lang_mix",
    """
    WITH c AS (
      SELECT source, lang, count(*) AS c FROM documents GROUP BY 1, 2
    ),
    a AS (
      SELECT source, sum(c) AS n, count(*) AS nl,
             ln(CAST(sum(c) AS DOUBLE))
               - sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) / sum(c)
               AS ent
      FROM c GROUP BY 1
    ),
    t AS (
      SELECT source, lang, c FROM (
        SELECT source, lang, c,
               row_number() OVER (PARTITION BY source
                                  ORDER BY c DESC, lang) AS r
        FROM c
      ) WHERE r = 1
    )
    SELECT a.source, CAST(n AS BIGINT) AS n_docs,
           CAST(nl AS BIGINT) AS n_langs,
           t.lang AS top_lang, CAST(t.c AS BIGINT) AS top_n,
           CAST(ROUND(CAST(t.c AS DOUBLE) / n * 1e6) AS BIGINT)
             AS top_share_e6,
           CAST(ROUND(ent * 1e6) AS BIGINT) AS entropy_e6
    FROM a JOIN t USING (source)
    """,
)
def doc_lang_mix(spark, sf_dir):
    """Language-mix diagnostics per source: n_langs, dominant language
    + share (ties to the lexicographically smallest), Shannon entropy
    of the mix (see textops.lang_mix)."""
    return textops.lang_mix(_docs(spark, sf_dir))


@q(
    "ts_week_phase",
    """
    WITH c AS (
      SELECT event_type,
             (CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) // 3600)
               % 168 AS phase,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    a AS (
      SELECT event_type, sum(n) AS ne, count(*) AS np FROM c GROUP BY 1
    ),
    p AS (
      SELECT event_type, phase, n FROM (
        SELECT *, row_number() OVER (PARTITION BY event_type
                                     ORDER BY n DESC, phase) AS r
        FROM c
      ) WHERE r = 1
    ),
    t AS (
      SELECT event_type, phase, n FROM (
        SELECT *, row_number() OVER (PARTITION BY event_type
                                     ORDER BY n ASC, phase) AS r
        FROM c
      ) WHERE r = 1
    )
    SELECT a.event_type, CAST(ne AS BIGINT) AS n_events,
           CAST(np AS BIGINT) AS n_phases,
           CAST(p.phase AS BIGINT) AS peak_phase,
           CAST(p.n AS BIGINT) AS peak_n,
           CAST(ROUND(CAST(p.n AS DOUBLE) / ne * 1e6) AS BIGINT)
             AS peak_share_e6,
           CAST(t.phase AS BIGINT) AS trough_phase,
           CAST(t.n AS BIGINT) AS trough_n
    FROM a JOIN p USING (event_type) JOIN t USING (event_type)
    """,
)
def ts_week_phase(spark, sf_dir):
    """Hour-of-week load fingerprint per series: peak/trough week
    phase and shares, phase anchored at the Unix epoch origin — pure
    integer arithmetic, no calendar functions (see
    analytics.week_phase_profile)."""
    return analytics.week_phase_profile(_ev(spark, sf_dir), ["event_type"])


@q(
    "emb_pq_error",
    """
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    cb AS (
      SELECT s, vec_id AS cid, v[8 * s + 1 : 8 * s + 8] AS cw
      FROM e CROSS JOIN range(0, 8) t(s) WHERE vec_id < 16
    ),
    d AS (
      SELECT e.vec_id AS nid, c.s, c.cid,
             CAST(ROUND(list_sum(list_transform(range(1, 9),
                    i -> (e.v[8 * c.s + i] - c.cw[i])
                       * (e.v[8 * c.s + i] - c.cw[i]))) * 1e9)
               AS BIGINT) AS d9
      FROM e CROSS JOIN cb c
    ),
    b AS (
      SELECT nid, s, cid, d9 FROM (
        SELECT *, row_number() OVER (PARTITION BY nid, s
                                     ORDER BY d9, cid) AS r
        FROM d
      ) WHERE r = 1
    )
    SELECT nid, string_agg(CAST(cid AS VARCHAR), ',' ORDER BY s) AS codes,
           CAST(sum(d9) AS BIGINT) AS err_e9
    FROM b GROUP BY nid
    """,
)
def emb_pq_error(spark, sf_dir):
    """Product-quantization audit over the deterministic first-16
    per-subspace codebook: 8 codes per vector (argmin ties to the
    lowest code id on e9 integers) plus the exact total reconstruction
    error (see simsearch.pq_error)."""
    return simsearch.pq_error(_emb(spark, sf_dir))


@q(
    "seq_cdc_chunks",
    _synth_cte()
    + """
    , bd AS (
      SELECT doc_id, len(tokens) AS n,
             list_filter(range(4, len(tokens)),
               i -> ((CAST(tokens[i] AS BIGINT)
                      + 31 * CAST(tokens[i - 1] AS BIGINT)
                      + 961 * CAST(tokens[i - 2] AS BIGINT)
                      + 29791 * CAST(tokens[i - 3] AS BIGINT))
                     % 1000003) % 64 = 0) AS b
      FROM seq WHERE len(tokens) > 0
    )
    SELECT doc_id, CAST(n AS BIGINT) AS n_tok,
           CAST(len(b) + 1 AS BIGINT) AS n_chunks,
           CAST(list_max(list_transform(range(1, len(b) + 2),
             k -> (CASE WHEN k <= len(b) THEN b[k] ELSE n END)
                - (CASE WHEN k = 1 THEN 1 ELSE b[k - 1] + 1 END) + 1))
             AS BIGINT) AS max_chunk,
           CAST(ROUND(CAST(n AS DOUBLE) / (len(b) + 1) * 1e6) AS BIGINT)
             AS mean_chunk_e6,
           md5(COALESCE(array_to_string(b, ','), '')) AS boundaries_md5
    FROM bd
    """,
)
def seq_cdc_chunks(spark, sf_dir):
    """Content-defined chunking of the raw token stream (rolling
    4-token polynomial hash, cut at hash % 64 == 0): chunk counts,
    extremes, and the boundary-set md5 so both engines must cut
    identical positions (see textops.cdc_chunks)."""
    return textops.cdc_chunks(_seq(spark))


@q(
    "ts_burn_rate",
    """
    WITH c AS (
      SELECT date_trunc('hour', ts) AS h,
             sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS err,
             count(*) AS tot
      FROM events GROUP BY 1
    ),
    w AS (
      SELECT h, err, tot,
             sum(err) OVER (ORDER BY h
               ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS errl,
             sum(tot) OVER (ORDER BY h
               ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS totl
      FROM c
    ),
    f AS (
      SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
             CAST(err AS BIGINT) AS err_n, CAST(tot AS BIGINT) AS tot_n,
             CAST(ROUND(1e6 * err / (0.25 * tot)) AS BIGINT) AS burn1_e6,
             CAST(errl AS BIGINT) AS err_long,
             CAST(totl AS BIGINT) AS tot_long,
             CAST(ROUND(1e6 * errl / (0.25 * totl)) AS BIGINT)
               AS burn_long_e6
      FROM w
    )
    SELECT *, CAST(CASE WHEN burn1_e6 > 1000000 AND burn_long_e6 > 1000000
                        THEN 1 ELSE 0 END AS INT) AS alert
    FROM f
    """,
)
def ts_burn_rate(spark, sf_dir):
    """Multiwindow SLO burn-rate alerts on the hourly error share
    (slo = 0.25, 1 h + trailing-6 h windows, alert only when BOTH
    burn > 1; see analytics.burn_rate)."""
    return analytics.burn_rate(_ev(spark, sf_dir))


@q(
    "ts_markov_transitions",
    """
    WITH o AS (
      SELECT user_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS ep,
             lag(event_type) OVER w AS from_type,
             lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w AS pep
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    c AS (
      SELECT from_type, event_type AS to_type, count(*) AS n
      FROM o WHERE from_type IS NOT NULL AND ep - pep <= 1800
      GROUP BY 1, 2
    )
    SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
           CAST(ROUND(CAST(n AS DOUBLE)
                  / sum(n) OVER (PARTITION BY from_type) * 1e6) AS BIGINT)
             AS p_e6
    FROM c
    """,
)
def ts_markov_transitions(spark, sf_dir):
    """Session-bounded first-order event-type transition matrix with
    per-from probabilities — every next-step funnel at once (see
    analytics.markov_transitions)."""
    return analytics.markov_transitions(_ev(spark, sf_dir))


@q(
    "seq_neg_sampling",
    _synth_cte()
    + """
    , c AS (
      SELECT t, count(*) AS c FROM (
        SELECT unnest(tokens) AS t FROM seq
      ) WHERE t <> 0 GROUP BY 1
    ),
    tot AS (SELECT sum(c) AS total FROM c),
    top AS (
      SELECT t, c FROM c ORDER BY c DESC, t LIMIT 64
    )
    SELECT CAST(t AS BIGINT) AS token, CAST(c AS BIGINT) AS c,
           CAST(ROUND(CAST(c AS DOUBLE) / total * 1e6) AS BIGINT)
             AS share_e6,
           CAST(ROUND(sqrt(CAST(c AS DOUBLE))
                      * sqrt(sqrt(CAST(c AS DOUBLE))) * 1e6) AS BIGINT)
             AS w34_e6
    FROM top CROSS JOIN tot
    """,
)
def seq_neg_sampling(spark, sf_dir):
    """Top-64 of the word2vec negative-sampling table: exact counts,
    count shares, and the 3/4-power weight via the libm-free
    sqrt(c)·sqrt(sqrt(c)) form (see textops.neg_sampling_table)."""
    return textops.neg_sampling_table(_seq(spark))


@q(
    "doc_prefix_compression",
    """
    WITH o AS (
      SELECT source, text, length(text) AS la,
             lag(text) OVER (PARTITION BY source
                             ORDER BY text, doc_id) AS p
      FROM documents
    ),
    l AS (
      SELECT source, la,
             CASE WHEN p IS NULL THEN 0
                  ELSE COALESCE(
                    list_filter(range(1, least(la, length(p)) + 1),
                      i -> text[i:i] <> p[i:i])[1] - 1,
                    least(la, length(p)))
             END AS lcp
      FROM o
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(la) AS BIGINT) AS total_chars,
           CAST(sum(lcp) AS BIGINT) AS total_lcp,
           CAST(max(lcp) AS BIGINT) AS max_lcp,
           CAST(ROUND(CAST(sum(lcp) AS DOUBLE) / sum(la) * 1e6) AS BIGINT)
             AS savings_e6
    FROM l GROUP BY 1
    """,
)
def doc_prefix_compression(spark, sf_dir):
    """Front-coding savings estimator per source over (text, doc_id)-
    sorted documents: Σ lcp / Σ len plus the max lcp (see
    textops.prefix_compression)."""
    return textops.prefix_compression(_docs(spark, sf_dir))


@q(
    "ts_lateness_audit",
    """
    WITH a AS (
      SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS ep,
             (event_id * 2654435761) % 4294967296 AS arr
      FROM events
    ),
    l AS (
      SELECT event_type,
             COALESCE(greatest(CAST(0 AS BIGINT),
               max(ep) OVER (PARTITION BY event_type ORDER BY arr
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - ep),
               0) AS lt
      FROM a
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(max(lt) AS BIGINT) AS max_late_s,
           CAST(ROUND(CAST(sum(lt) AS DOUBLE) / count(*) * 1e6) AS BIGINT)
             AS mean_late_e6,
           CAST(ROUND(CAST(sum(CASE WHEN lt > 60 THEN 1 ELSE 0 END)
             AS DOUBLE) / count(*) * 1e6) AS BIGINT) AS late_60s_e6,
           CAST(ROUND(CAST(sum(CASE WHEN lt > 300 THEN 1 ELSE 0 END)
             AS DOUBLE) / count(*) * 1e6) AS BIGINT) AS late_300s_e6,
           CAST(ROUND(CAST(sum(CASE WHEN lt > 900 THEN 1 ELSE 0 END)
             AS DOUBLE) / count(*) * 1e6) AS BIGINT) AS late_900s_e6
    FROM l GROUP BY 1
    """,
)
def ts_lateness_audit(spark, sf_dir):
    """Watermark-lateness audit per stream key under a deterministic
    ADVERSARIAL arrival permutation (arr = id·2654435761 mod 2³² — the
    driver table arrives in event-time order, which would make the
    audit vacuously zero; production passes the real ingest id; see
    analytics.lateness_audit)."""
    ev = _ev(spark, sf_dir).withColumn(
        "arr",
        F.pmod(
            F.col("event_id") * F.lit(2654435761), F.lit(4294967296)
        ).cast("bigint"),
    )
    return analytics.lateness_audit(ev, ["event_type"], arrival_col="arr")


@q(
    "ts_mannwhitney",
    """
    WITH b AS (
      SELECT event_type,
             CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS ep,
             CAST(ROUND(avg(value) * 1e6) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    r AS (
      SELECT event_type, v,
             row_number() OVER (PARTITION BY event_type ORDER BY ep) AS i,
             count(*) OVER (PARTITION BY event_type) AS n,
             2 * rank() OVER (PARTITION BY event_type ORDER BY v)
               + count(*) OVER (PARTITION BY event_type, v) - 1 AS m2
      FROM b
    ),
    a AS (
      SELECT event_type, max(n) AS n,
             sum(CASE WHEN 2 * i <= n THEN 1 ELSE 0 END) AS n_a,
             sum(CASE WHEN 2 * i <= n THEN m2 ELSE 0 END) AS sm2a
      FROM r GROUP BY 1
    ),
    t AS (
      SELECT event_type, sum(t * t * t - t) AS ties FROM (
        SELECT event_type, v, count(*) AS t FROM b GROUP BY 1, 2
      ) GROUP BY 1
    ),
    f AS (
      SELECT a.event_type, a.n, a.n_a, a.n - a.n_a AS n_b,
             a.sm2a - a.n_a * (a.n_a + 1) AS u2a, t.ties
      FROM a JOIN t USING (event_type) WHERE a.n >= 2
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_buckets,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(u2a AS BIGINT) AS u2_a,
           CASE WHEN CAST(n_a * n_b AS DOUBLE)
                     * (CAST(n + 1 AS DOUBLE)
                        - CAST(ties AS DOUBLE) / (n * (n - 1))) / 3.0 > 0
                THEN CAST(ROUND(1e6 * (u2a - n_a * n_b)
                       / sqrt(CAST(n_a * n_b AS DOUBLE)
                              * (CAST(n + 1 AS DOUBLE)
                                 - CAST(ties AS DOUBLE) / (n * (n - 1)))
                              / 3.0)) AS BIGINT)
           END AS z_e6
    FROM f
    """,
)
def ts_mannwhitney(spark, sf_dir):
    """Mann-Whitney U first-half-vs-second-half distribution drift per
    series over e6-grid hourly means, integer midrank identity + exact
    tie correction (see analytics.mannwhitney_drift)."""
    return analytics.mannwhitney_drift(_ev(spark, sf_dir), ["event_type"])


@q(
    "doc_token_cube",
    r"""
    SELECT CAST(GROUPING(source, lang) AS BIGINT) AS gid, source, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
             AS n_tokens
    FROM documents
    GROUP BY CUBE(source, lang)
    """,
)
def doc_token_cube(spark, sf_dir):
    """Token-accounting CUBE over (source, lang): every aggregation
    level in one pass with the grouping id disambiguating (see
    textops.token_cube)."""
    return textops.token_cube(_docs(spark, sf_dir))


def _ivf_curve_sql(nprobes=(1, 2, 3), k: int = 3) -> str:
    sim = (
        "CAST(ROUND(list_sum(list_transform(range(1, 65), "
        "i -> {a}.v[i] * {b}.v[i])) "
        "/ (sqrt(list_sum(list_transform({a}.v, x -> x * x))) "
        "* sqrt(list_sum(list_transform({b}.v, x -> x * x)))) * 1e6) "
        "AS BIGINT)"
    )
    blocks, unions = [], []
    for np_ in nprobes:
        blocks.append(f"""
    cand{np_} AS (
      SELECT DISTINCT p.qid, a.nid
      FROM prank p JOIN assign a ON a.cid = p.cid
      WHERE p.r <= {np_} AND a.nid <> p.qid
    ),
    top{np_} AS (
      SELECT qid, nid FROM (
        SELECT c.qid, c.nid,
               row_number() OVER (PARTITION BY c.qid
                 ORDER BY {sim.format(a='qe', b='ne')} DESC, c.nid) AS rank
        FROM cand{np_} c
        JOIN e qe ON qe.vec_id = c.qid
        JOIN e ne ON ne.vec_id = c.nid
      ) WHERE rank <= {k}
    ),
    hit{np_} AS (
      SELECT CAST({np_} AS BIGINT) AS nprobe, count(*) AS hits
      FROM exact x JOIN top{np_} t ON x.qid = t.qid AND x.nid = t.nid
    )""")
        unions.append(f"SELECT * FROM hit{np_}")
    return (
        f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    cents AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
    csim AS (
      SELECT e.vec_id AS nid, c.cid,
             CAST(ROUND(
               list_sum(list_transform(range(1, 65), i -> e.v[i] * c.cv[i]))
               / (sqrt(list_sum(list_transform(e.v, x -> x * x)))
                * sqrt(list_sum(list_transform(c.cv, x -> x * x))))
               * 1e6) AS BIGINT) AS s
      FROM e CROSS JOIN cents c
    ),
    assign AS (
      SELECT nid, cid FROM (
        SELECT nid, cid,
               row_number() OVER (PARTITION BY nid ORDER BY s DESC, cid) AS r
        FROM csim
      ) WHERE r = 1
    ),
    prank AS (
      SELECT nid AS qid, cid, r FROM (
        SELECT nid, cid,
               row_number() OVER (PARTITION BY nid ORDER BY s DESC, cid) AS r
        FROM csim WHERE nid < 20
      ) WHERE r <= {max(nprobes)}
    ),
    exact AS (
      SELECT qid, nid FROM (
        SELECT q.vec_id AS qid, n.vec_id AS nid,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY {sim.format(a='q', b='n')} DESC, n.vec_id) AS rank
        FROM e q CROSS JOIN e n
        WHERE q.vec_id < 20 AND n.vec_id <> q.vec_id
      ) WHERE rank <= {k}
    ),
    tot AS (SELECT count(*) AS t FROM exact),"""
        + ",".join(blocks)
        + """,
    u AS ("""
        + " UNION ALL ".join(unions)
        + """)
    SELECT nprobe, CAST(hits AS BIGINT) AS hits,
           CAST(t AS BIGINT) AS n_exact,
           CAST(ROUND(CAST(hits AS DOUBLE) / t * 1e6) AS BIGINT)
             AS recall_e6
    FROM u CROSS JOIN tot
    """
    )


@q("emb_ivf_recall_curve", _ivf_curve_sql())
def emb_ivf_recall_curve(spark, sf_dir):
    """Measured recall@3 vs nprobe ∈ {1,2,3} for the 8-cell IVF index
    — the probe-width tuning curve, hits/denominator both exact
    integers (see simsearch.ivf_recall_curve)."""
    return simsearch.ivf_recall_curve(_emb(spark, sf_dir), list(range(20)))


@q(
    "seq_packing_sweep",
    _synth_cte()
    + """
    , tot AS (
      SELECT sum(n_tok) AS t, count(*) AS n FROM seq
    )
    SELECT CAST(cl AS BIGINT) AS chunk_len,
           CAST(n AS BIGINT) AS n_seqs,
           CAST(t AS BIGINT) AS total_tokens,
           CAST(ceil(t / CAST(cl AS DOUBLE)) AS BIGINT) AS n_chunks,
           CAST(CAST(ceil(t / CAST(cl AS DOUBLE)) AS BIGINT) * cl - t
             AS BIGINT) AS waste_tokens,
           CAST(ROUND(CAST(t AS DOUBLE)
                  / (CAST(ceil(t / CAST(cl AS DOUBLE)) AS BIGINT) * cl)
                  * 1e6) AS BIGINT) AS fill_e6
    FROM tot CROSS JOIN (VALUES (512), (1024), (2048), (4096)) v(cl)
    """,
)
def seq_packing_sweep(spark, sf_dir):
    """Closed-form chunk-length sweep for the global concat-and-pack
    path: n_chunks = ceil(total/len), fill, tail waste per candidate
    length (see packing.packing_sweep)."""
    return packing.packing_sweep(_seq(spark))


@q(
    "doc_dedup_funnel",
    r"""
    WITH d AS (
      SELECT source,
             len(string_split_regex(trim(text), '\s+')) AS nw,
             md5(text) AS h,
             md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
               AS c
      FROM documents
    ),
    g1 AS (
      SELECT source, h, c, count(*) AS g, min(nw) AS nw
      FROM d GROUP BY 1, 2, 3
    ),
    g2 AS (
      SELECT source, c, count(*) AS ng, sum((g - 1) * nw) AS exact_tok,
             sum(g) AS raw, sum(nw) AS surv_tok, min(nw) AS min_tok
      FROM g1 GROUP BY 1, 2
    )
    SELECT source, CAST(sum(raw) AS BIGINT) AS n_raw,
           CAST(sum(ng) AS BIGINT) AS n_exact_unique,
           CAST(count(*) AS BIGINT) AS n_canon_unique,
           CAST(sum(exact_tok) AS BIGINT) AS exact_removed_tokens,
           CAST(sum(surv_tok) - sum(min_tok) AS BIGINT)
             AS canon_removed_tokens_ub
    FROM g2 GROUP BY 1
    """,
)
def doc_dedup_funnel(spark, sf_dir):
    """Per-source dedup funnel: raw → byte-exact unique → canon-unique
    with removed doc/token mass priced at each stage (see
    dedup.dedup_funnel)."""
    return dedup.dedup_funnel(_docs(spark, sf_dir))


@q(
    "ts_regularity",
    """
    WITH g AS (
      SELECT user_id,
             CAST(floor(epoch(ts)) AS BIGINT)
               - lag(CAST(floor(epoch(ts)) AS BIGINT))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS g
      FROM events
    ),
    a AS (
      SELECT user_id, count(*) AS n, sum(g) AS s, sum(g * g) AS q
      FROM g WHERE g IS NOT NULL GROUP BY 1
    ),
    f AS (
      SELECT user_id, n, s,
             CASE WHEN s > 0
                  THEN CAST(ROUND(1e6 * (n * q - s * s) / (s * s)) AS BIGINT)
             END AS cv2
      FROM a
    )
    SELECT user_id, CAST(n + 1 AS BIGINT) AS n_events,
           CAST(n AS BIGINT) AS n_gaps,
           CAST(ROUND(CAST(s AS DOUBLE) / n * 1e6) AS BIGINT)
             AS mean_gap_e6,
           cv2 AS cv2_e6,
           CAST(CASE WHEN cv2 < 100000 AND n >= 20 THEN 1
                     WHEN cv2 IS NULL THEN 0 ELSE 0 END AS INT) AS is_regular
    FROM f
    """,
)
def ts_regularity(spark, sf_dir):
    """Per-user inter-event CV² regularity (bot/cron detector) from
    exact bigint gap sums (see analytics.regularity_score)."""
    return analytics.regularity_score(_ev(spark, sf_dir))


@q(
    "ts_haar_energy",
    """
    WITH b AS (
      SELECT event_type,
             CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS ep,
             CAST(ROUND(avg(value) * 1e3) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    b0 AS (
      SELECT event_type, v AS s,
             row_number() OVER (PARTITION BY event_type ORDER BY ep) AS r
      FROM b
    ),
    l1 AS (
      SELECT event_type, (r + 1) // 2 AS p,
             sum(CASE WHEN r % 2 = 1 THEN s ELSE -s END) AS d,
             sum(s) AS s
      FROM b0 GROUP BY 1, 2 HAVING count(*) = 2
    ),
    b1 AS (
      SELECT event_type, s,
             row_number() OVER (PARTITION BY event_type ORDER BY p) AS r
      FROM l1
    ),
    l2 AS (
      SELECT event_type, (r + 1) // 2 AS p,
             sum(CASE WHEN r % 2 = 1 THEN s ELSE -s END) AS d,
             sum(s) AS s
      FROM b1 GROUP BY 1, 2 HAVING count(*) = 2
    ),
    b2 AS (
      SELECT event_type, s,
             row_number() OVER (PARTITION BY event_type ORDER BY p) AS r
      FROM l2
    ),
    l3 AS (
      SELECT event_type, (r + 1) // 2 AS p,
             sum(CASE WHEN r % 2 = 1 THEN s ELSE -s END) AS d,
             sum(s) AS s
      FROM b2 GROUP BY 1, 2 HAVING count(*) = 2
    ),
    u AS (
      SELECT event_type, 1 AS level, count(*) AS n_pairs,
             sum(d * d) AS raw FROM l1 GROUP BY 1
      UNION ALL
      SELECT event_type, 2, count(*), sum(d * d) FROM l2 GROUP BY 1
      UNION ALL
      SELECT event_type, 3, count(*), sum(d * d) FROM l3 GROUP BY 1
    ),
    c AS (
      SELECT *, raw * (CASE level WHEN 1 THEN 16 WHEN 2 THEN 4
                                  ELSE 1 END) AS com
      FROM u
    )
    SELECT event_type, CAST(level AS BIGINT) AS level,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(raw AS BIGINT) AS raw_energy,
           CAST(ROUND(CAST(raw AS DOUBLE) / pow(4.0, level)) AS BIGINT)
             AS norm_energy,
           CASE WHEN sum(com) OVER (PARTITION BY event_type) > 0
                THEN CAST(ROUND(CAST(com AS DOUBLE)
                       / sum(com) OVER (PARTITION BY event_type) * 1e6)
                     AS BIGINT)
           END AS share_e6
    FROM c
    """,
)
def ts_haar_energy(spark, sf_dir):
    """Haar multi-resolution detail energy per series (levels 1-3 over
    hourly e3-grid means): which time scale moves the series, with
    integer-exact energies and common-denominator shares (see
    analytics.haar_energy)."""
    return analytics.haar_energy(_ev(spark, sf_dir), ["event_type"])


@q(
    "seq_pad_profile",
    _synth_cte()
    + """
    , p AS (
      SELECT source, len(tokens) AS n,
             len(tokens) - COALESCE(list_max(list_filter(
               range(1, len(tokens) + 1), i -> tokens[i] <> 0)), 0)
               AS trail,
             COALESCE(list_position(tokens, 0), 0) AS fp,
             len(list_filter(tokens, x -> x = 0)) AS np,
             CASE WHEN tokens[1] = 0 THEN 1 ELSE 0 END AS lead
      FROM seq WHERE len(tokens) > 0
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_seqs,
           CAST(ROUND(CAST(sum(CASE WHEN trail > 0 THEN 1 ELSE 0 END)
             AS DOUBLE) / count(*) * 1e6) AS BIGINT) AS trailing_pad_e6,
           CAST(ROUND(CAST(sum(lead) AS DOUBLE) / count(*) * 1e6)
             AS BIGINT) AS leading_pad_e6,
           CAST(ROUND(CAST(sum(trail) AS DOUBLE) / count(*) * 1e6)
             AS BIGINT) AS mean_trail_run_e6,
           CASE WHEN sum(CASE WHEN fp > 0 THEN 1 ELSE 0 END) > 0
                THEN CAST(ROUND(CAST(sum(CASE WHEN fp > 0 THEN fp ELSE 0 END)
                       AS DOUBLE)
                       / sum(CASE WHEN fp > 0 THEN 1 ELSE 0 END) * 1e6)
                     AS BIGINT)
           END AS mean_first_pad_e6,
           CAST(ROUND(CAST(sum(np) AS DOUBLE) / sum(n) * 1e6) AS BIGINT)
             AS pad_rate_e6
    FROM p GROUP BY 1
    """,
)
def seq_pad_profile(spark, sf_dir):
    """PAD-structure QA per source: trailing/leading pad shares, mean
    trailing run, mean first-PAD position, overall pad rate (see
    textops.pad_profile)."""
    return textops.pad_profile(_seq(spark))


@q(
    "ts_typical_day",
    """
    WITH b AS (
      SELECT event_type,
             CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS ep,
             CAST(ROUND(avg(value) * 1e6) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    )
    SELECT event_type, CAST((ep // 3600) % 24 AS BIGINT) AS hour_of_day,
           CAST(count(*) AS BIGINT) AS n_obs,
           CAST(ROUND(quantile_cont(v, 0.1)) AS BIGINT) AS p10_e6,
           CAST(ROUND(quantile_cont(v, 0.5)) AS BIGINT) AS p50_e6,
           CAST(ROUND(quantile_cont(v, 0.9)) AS BIGINT) AS p90_e6
    FROM b GROUP BY 1, 2
    """,
)
def ts_typical_day(spark, sf_dir):
    """Typical-day p10/p50/p90 envelope per series at each hour-of-day
    over e6-grid hourly means — the seasonal anomaly band (see
    analytics.typical_day)."""
    return analytics.typical_day(_ev(spark, sf_dir), ["event_type"])


@q(
    "ts_funnel3",
    """
    WITH e AS (
      SELECT user_id, event_type, event_id, ts,
             CAST(floor(epoch(ts)) AS BIGINT) AS ep
      FROM events
    ),
    a AS (
      SELECT *,
             last_value(CASE WHEN event_type = 'click' THEN ep END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS pc
      FROM e
    ),
    b AS (
      SELECT *,
             last_value(CASE WHEN event_type = 'signup' AND pc IS NOT NULL
                              AND ep - pc <= 21600 THEN pc END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS pa
      FROM a
    ),
    p AS (
      SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, user_id,
             CASE WHEN pa IS NOT NULL AND ep - pa <= 21600
                  THEN 1 ELSE 0 END AS conv
      FROM b WHERE event_type = 'purchase'
    )
    SELECT day, CAST(count(*) AS BIGINT) AS n_step3,
           CAST(sum(conv) AS BIGINT) AS n_converted,
           CAST(count(DISTINCT CASE WHEN conv = 1 THEN user_id END)
             AS BIGINT) AS n_users_converted,
           CAST(ROUND(CAST(sum(conv) AS DOUBLE) / count(*) * 1e6)
             AS BIGINT) AS conversion_e6
    FROM p GROUP BY 1
    """,
)
def ts_funnel3(spark, sf_dir):
    """Three-step ordered funnel (click → signup → purchase, all
    within 6 h of the anchoring click) per day — greedy latest-anchor
    matching, provably equivalent to chain existence (see
    analytics.funnel3)."""
    return analytics.funnel3(_ev(spark, sf_dir), window_s=21600)


@q(
    "doc_phrase_search",
    r"""
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
      FROM documents
    )
    SELECT doc_id,
           CAST(len(list_filter(range(1, len(ws)),
             i -> ws[i] = 'table' AND ws[i + 1] = 'hash')) AS BIGINT)
             AS n_matches
    FROM w
    WHERE len(list_filter(range(1, len(ws)),
            i -> ws[i] = 'table' AND ws[i + 1] = 'hash')) > 0
    """,
)
def doc_phrase_search(spark, sf_dir):
    """Exact phrase search for "table hash" via positional posting-
    list intersection; the oracle counts the same phrase row-locally
    by position scan — two independent algorithms, identical counts
    (see textops.phrase_search)."""
    return textops.phrase_search(_docs(spark, sf_dir), "table hash")


@q(
    "ts_peak_concurrency",
    """
    WITH l AS (
      SELECT user_id, ts, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS ep,
             CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                       - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w > 1800
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS nw
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id,
             sum(nw) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid,
             ep
      FROM l
    ),
    iv AS (
      SELECT user_id, sid, min(ep) AS s, max(ep) AS e
      FROM sess GROUP BY 1, 2
    ),
    pts AS (
      SELECT strftime(to_timestamp(s), '%Y-%m-%d') AS day, s AS t,
             1 AS d, user_id AS u FROM iv
      UNION ALL
      SELECT strftime(to_timestamp(s), '%Y-%m-%d'), e, -1, user_id FROM iv
    ),
    run AS (
      SELECT day, t, d,
             sum(d) OVER (PARTITION BY day ORDER BY t, d DESC, u
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
      FROM pts
    ),
    pk AS (
      SELECT day, t, d, c, max(c) OVER (PARTITION BY day) AS peak
      FROM run
    )
    SELECT day,
           CAST(sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_sessions,
           CAST(max(c) AS BIGINT) AS peak_concurrency,
           strftime(to_timestamp(min(CASE WHEN c = peak THEN t END)),
                    '%Y-%m-%d %H:%M:%S') AS peak_ts
    FROM pk GROUP BY 1
    """,
)
def ts_peak_concurrency(spark, sf_dir):
    """Peak concurrent sessions per day via the endpoint sweep over
    gap-sessionized intervals — starts before ends at equal instants,
    session owned by its start day, earliest peak instant (see
    analytics.peak_concurrency)."""
    return analytics.peak_concurrency(_ev(spark, sf_dir))


@q(
    "ts_token_bucket",
    """
    WITH RECURSIVE ev AS (
      SELECT user_id, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS ep,
             CAST(row_number() OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS BIGINT) AS rn
      FROM events
    ),
    tb AS (
      SELECT user_id, event_id, ep, rn,
             CAST(CASE WHEN 86400 >= 28800 THEN 86400 - 28800
                       ELSE 86400 END AS BIGINT) AS lvl,
             CAST(CASE WHEN 86400 >= 28800 THEN 1 ELSE 0 END
               AS BIGINT) AS admitted
      FROM ev WHERE rn = 1
      UNION ALL
      SELECT e.user_id, e.event_id, e.ep, e.rn,
             CASE WHEN least(86400, t.lvl + (e.ep - t.ep)) >= 28800
                  THEN least(86400, t.lvl + (e.ep - t.ep)) - 28800
                  ELSE least(86400, t.lvl + (e.ep - t.ep)) END,
             CASE WHEN least(86400, t.lvl + (e.ep - t.ep)) >= 28800
                  THEN 1 ELSE 0 END
      FROM tb t JOIN ev e
        ON e.user_id = t.user_id AND e.rn = t.rn + 1
    )
    SELECT user_id, event_id, ep, lvl AS level_after, admitted FROM tb
    """,
)
def ts_token_bucket(spark, sf_dir):
    """Token-bucket rate-limiter replay per user (cap 86400 units,
    cost 28800, refill 1 unit/s): per-event admit/reject decision and
    post-event bucket level, Spark walking the integer recurrence in
    an Arrow loop, the oracle replaying it as a recursive CTE (see
    analytics.token_bucket)."""
    return analytics.token_bucket(_ev(spark, sf_dir), keys=["user_id"], ts_col="ts")


@q(
    "ts_pivot_dow_hour",
    """
    WITH e AS (
      SELECT event_type,
             CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) // 3600
               AS eh
      FROM events
    ),
    b AS (
      SELECT event_type, eh % 24 AS hour, ((eh // 24) + 3) % 7 AS dow
      FROM e
    )
    SELECT event_type, CAST(hour AS BIGINT) AS hour,
           CAST(sum(CASE WHEN dow = 0 THEN 1 ELSE 0 END) AS BIGINT) AS dow0,
           CAST(sum(CASE WHEN dow = 1 THEN 1 ELSE 0 END) AS BIGINT) AS dow1,
           CAST(sum(CASE WHEN dow = 2 THEN 1 ELSE 0 END) AS BIGINT) AS dow2,
           CAST(sum(CASE WHEN dow = 3 THEN 1 ELSE 0 END) AS BIGINT) AS dow3,
           CAST(sum(CASE WHEN dow = 4 THEN 1 ELSE 0 END) AS BIGINT) AS dow4,
           CAST(sum(CASE WHEN dow = 5 THEN 1 ELSE 0 END) AS BIGINT) AS dow5,
           CAST(sum(CASE WHEN dow = 6 THEN 1 ELSE 0 END) AS BIGINT) AS dow6,
           CAST(count(*) AS BIGINT) AS n_events
    FROM b GROUP BY 1, 2
    """,
)
def ts_pivot_dow_hour(spark, sf_dir):
    """Day-of-week × hour-of-day event-count matrix per event type,
    WIDE via the relational PIVOT with declared output columns; the
    oracle rebuilds the same matrix as conditional sums (see
    analytics.dow_hour_pivot)."""
    return analytics.dow_hour_pivot(_ev(spark, sf_dir))


@q(
    "seq_fim_plan",
    _synth_cte()
    + """
    , f AS (
      SELECT doc_id, n_tok, tokens,
             list_sum(list_transform(range(1, n_tok + 1),
               i -> i * CAST(tokens[i] AS BIGINT))) AS h1,
             list_sum(list_transform(range(1, n_tok + 1),
               i -> i * i * CAST(tokens[i] AS BIGINT))) AS h2
      FROM seq
    ),
    c AS (
      SELECT doc_id, n_tok, tokens,
             h1 % (n_tok + 1) AS c1,
             (h1 % (n_tok + 1))
               + h2 % (n_tok - (h1 % (n_tok + 1)) + 1) AS c2
      FROM f
    )
    SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
           CAST(c1 AS BIGINT) AS prefix_len,
           CAST(c2 - c1 AS BIGINT) AS middle_len,
           CAST(n_tok - c2 AS BIGINT) AS suffix_len,
           md5(array_to_string(list_concat(list_concat(
             list_slice(tokens, 1, c1),
             list_slice(tokens, c2 + 1, n_tok)),
             list_slice(tokens, c1 + 1, c2)), ',')) AS psm_md5
    FROM c
    """,
)
def seq_fim_plan(spark, sf_dir):
    """Fill-in-the-middle PSM split plan per sequence: content-
    addressed cuts, segment lengths, and the md5 of the reordered
    [prefix][suffix][middle] token array (see textops.fim_plan)."""
    return textops.fim_plan(_seq(spark))


@q(
    "ts_mutual_info",
    """
    WITH e AS (
      SELECT event_type,
             CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) // 3600
               AS h
      FROM events
    ),
    hc AS (SELECT event_type, h, count(*) AS c FROM e GROUP BY 1, 2),
    span AS (
      SELECT max(h) - min(h) + 1 AS n,
             count(DISTINCT h) AS present
      FROM e
    ),
    hrs AS (SELECT DISTINCT h FROM e),
    types AS (SELECT DISTINCT event_type AS t FROM e),
    pairs AS (
      SELECT a.t AS ta, b.t AS tb FROM types a JOIN types b ON a.t < b.t
    ),
    pres AS (
      SELECT p.ta, p.tb,
             least(coalesce(x.c, 0), 3) AS ba,
             least(coalesce(y.c, 0), 3) AS bb
      FROM pairs p CROSS JOIN hrs hh
      LEFT JOIN hc x ON x.h = hh.h AND x.event_type = p.ta
      LEFT JOIN hc y ON y.h = hh.h AND y.event_type = p.tb
    ),
    cells0 AS (
      SELECT ta, tb, ba, bb, count(*) AS n FROM pres GROUP BY 1, 2, 3, 4
      UNION ALL
      SELECT p.ta, p.tb, 0, 0, (SELECT n - present FROM span)
      FROM pairs p WHERE (SELECT n - present FROM span) > 0
    ),
    cells AS (
      SELECT ta, tb, ba, bb, sum(n) AS n FROM cells0 GROUP BY 1, 2, 3, 4
    ),
    jr AS (SELECT ta, tb, sum(n * ln(n)) AS j FROM cells GROUP BY 1, 2),
    ra AS (
      SELECT ta, tb, sum(s * ln(s)) AS r
      FROM (SELECT ta, tb, ba, sum(n) AS s FROM cells GROUP BY 1, 2, 3)
      GROUP BY 1, 2
    ),
    ca AS (
      SELECT ta, tb, sum(s * ln(s)) AS c
      FROM (SELECT ta, tb, bb, sum(n) AS s FROM cells GROUP BY 1, 2, 3)
      GROUP BY 1, 2
    )
    SELECT jr.ta AS type_a, jr.tb AS type_b,
           CAST((SELECT n FROM span) AS BIGINT) AS n_hours,
           CAST(round((ln((SELECT n FROM span))
             + (j - r - c) / (SELECT n FROM span)) * 1e6) AS BIGINT)
             AS mi_e6,
           CAST(round((ln((SELECT n FROM span))
             - r / (SELECT n FROM span)) * 1e6) AS BIGINT) AS h_a_e6,
           CAST(round((ln((SELECT n FROM span))
             - c / (SELECT n FROM span)) * 1e6) AS BIGINT) AS h_b_e6
    FROM jr
    JOIN ra ON ra.ta = jr.ta AND ra.tb = jr.tb
    JOIN ca ON ca.ta = jr.ta AND ca.tb = jr.tb
    """,
)
def ts_mutual_info(spark, sf_dir):
    """Binned mutual information (bins = hourly count clamped at 3)
    between every event-type pair over the shared hourly span, with
    marginal entropies — ln-form from exact bigint contingency cells
    (see analytics.mutual_info)."""
    return analytics.mutual_info(_ev(spark, sf_dir))


@q(
    "seq_curriculum",
    _synth_cte()
    + """
    SELECT doc_id, source, CAST(n_tok AS BIGINT) AS n_tok,
           CAST(n_tok // 32 AS BIGINT) AS rung,
           CAST(row_number() OVER (
             ORDER BY n_tok // 32, source, md5(doc_id), doc_id)
             AS BIGINT) AS step
    FROM seq
    """,
)
def seq_curriculum(spark, sf_dir):
    """Length-curriculum global training schedule (rung-major,
    source blocks, md5-shuffled within block), built without a global
    sort via (rung, source) windows + driver-prefix-summed block
    offsets; the oracle IS the global sort — equality proves the
    blocked construction reproduces it (see packing.curriculum)."""
    return packing.curriculum(_seq(spark))


_SESS_CTE = """
    WITH l AS (
      SELECT user_id, event_id, event_type, ts,
             CAST(floor(epoch(ts)) AS BIGINT) AS ep,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR CAST(floor(epoch(ts)) AS BIGINT)
                     - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w > 1800
                  THEN 1 ELSE 0 END AS nw
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, event_id, event_type, ts, ep,
             sum(nw) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM l
    )
"""


@q(
    "ts_basket_lift",
    _SESS_CTE
    + """
    , items AS (SELECT DISTINCT user_id, sid, event_type FROM sess),
    nb AS (SELECT count(*) AS n FROM (SELECT DISTINCT user_id, sid FROM sess)),
    isup AS (SELECT event_type, count(*) AS n_item FROM items GROUP BY 1),
    pc AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*) AS n_ab
      FROM items a JOIN items b
        ON a.user_id = b.user_id AND a.sid = b.sid
       AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT type_a, type_b, CAST(n_ab AS BIGINT) AS n_ab,
           CAST(ia.n_item AS BIGINT) AS n_a,
           CAST(ib.n_item AS BIGINT) AS n_b,
           CAST((SELECT n FROM nb) AS BIGINT) AS n_baskets,
           CAST(round(CAST(n_ab AS DOUBLE) / (SELECT n FROM nb) * 1e6)
             AS BIGINT) AS support_e6,
           CAST(round(CAST(n_ab AS DOUBLE) / ia.n_item * 1e6)
             AS BIGINT) AS conf_ab_e6,
           CAST(round(CAST(n_ab AS DOUBLE) / ib.n_item * 1e6)
             AS BIGINT) AS conf_ba_e6,
           CAST(round(CAST(n_ab * (SELECT n FROM nb) AS DOUBLE)
             / CAST(ia.n_item * ib.n_item AS DOUBLE) * 1e6)
             AS BIGINT) AS lift_e6
    FROM pc
    JOIN isup ia ON ia.event_type = pc.type_a
    JOIN isup ib ON ib.event_type = pc.type_b
    """,
)
def ts_basket_lift(spark, sf_dir):
    """Market-basket association rules between event types co-present
    in a gap-session: pair support, both confidences, and lift — the
    co-presence complement of the Markov adjacency matrix (see
    analytics.basket_lift)."""
    return analytics.basket_lift(_ev(spark, sf_dir))


@q(
    "ts_session_nll",
    _SESS_CTE
    + """
    , tr AS (
      SELECT user_id, sid, event_type AS to_type,
             lag(event_type) OVER w2 AS from_type,
             ep - lag(ep) OVER w2 AS gap
      FROM sess
      WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    trans AS (
      SELECT user_id, sid, from_type, to_type FROM tr
      WHERE from_type IS NOT NULL AND gap <= 1800
    ),
    m AS (SELECT from_type, to_type, count(*) AS n FROM trans GROUP BY 1, 2),
    rt AS (SELECT from_type, sum(n) AS tot FROM m GROUP BY 1),
    t9 AS (
      SELECT m.from_type, m.to_type,
             CAST(round(ln(CAST(tot AS DOUBLE) / CAST(n AS DOUBLE)) * 1e9)
               AS BIGINT) AS t9
      FROM m JOIN rt USING (from_type)
    )
    SELECT user_id, CAST(sid AS BIGINT) AS sid,
           CAST(count(*) AS BIGINT) AS n_steps,
           CAST(sum(t9) AS BIGINT) AS nll_e9,
           CAST(round(CAST(sum(t9) AS DOUBLE) / count(*) / 1e3) AS BIGINT)
             AS avg_nll_e6
    FROM trans JOIN t9 USING (from_type, to_type)
    GROUP BY 1, 2
    """,
)
def ts_session_nll(spark, sf_dir):
    """Per-session negative log-likelihood under the corpus Markov
    transition matrix — the anomalous-journey score; per-step terms
    e9-quantized BEFORE summing so the session sum is an order-free
    exact integer (see analytics.session_nll)."""
    return analytics.session_nll(_ev(spark, sf_dir))


@q(
    "seq_nextfit_bins",
    _synth_cte().replace("WITH ", "WITH RECURSIVE ", 1)
    + """
    , ev AS (
      SELECT source, doc_id, CAST(n_tok AS BIGINT) AS n_tok,
             CAST(row_number() OVER (PARTITION BY source
                    ORDER BY n_tok DESC, doc_id) AS BIGINT) AS rn
      FROM seq
    ),
    nf AS (
      SELECT source, doc_id, n_tok, rn,
             CAST(1 AS BIGINT) AS bin_idx, n_tok AS fill_after
      FROM ev WHERE rn = 1
      UNION ALL
      SELECT e.source, e.doc_id, e.n_tok, e.rn,
             CASE WHEN t.fill_after > 0
                       AND t.fill_after + e.n_tok > 2048
                  THEN t.bin_idx + 1 ELSE t.bin_idx END,
             CASE WHEN t.fill_after > 0
                       AND t.fill_after + e.n_tok > 2048
                  THEN e.n_tok ELSE t.fill_after + e.n_tok END
      FROM nf t JOIN ev e ON e.source = t.source AND e.rn = t.rn + 1
    )
    SELECT source, doc_id, n_tok, bin_idx, fill_after FROM nf
    """,
)
def seq_nextfit_bins(spark, sf_dir):
    """No-split next-fit-decreasing packing of whole sequences into
    2048-token bins per source; Spark walks the recurrence in an
    Arrow loop, the oracle replays it as a recursive CTE (see
    packing.nextfit_bins)."""
    return packing.nextfit_bins(_seq(spark))


@q(
    "ts_seasonal_strength",
    """
    WITH e AS (
      SELECT event_type,
             (CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) // 3600)
               % 24 AS h,
             CAST(round(value * 1e3) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL
    ),
    cells AS (
      SELECT event_type, h,
             CAST(count(*) AS BIGINT) AS n_h,
             CAST(sum(v) AS BIGINT) AS s_h,
             CAST(sum(v * v) AS BIGINT) AS q_h
      FROM e GROUP BY 1, 2
    ),
    agg AS (
      SELECT event_type,
             CAST(sum(n_h) AS BIGINT) AS n,
             CAST(sum(s_h) AS BIGINT) AS s,
             CAST(sum(q_h) AS BIGINT) AS q,
             CAST(count(*) AS BIGINT) AS k_cells,
             sum(CAST(s_h AS DOUBLE) * CAST(s_h AS DOUBLE)
                 / CAST(n_h AS DOUBLE)) AS sb
      FROM cells GROUP BY 1
    )
    SELECT event_type, n, k_cells,
           CASE WHEN CAST(q AS DOUBLE)
                     - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                       / CAST(n AS DOUBLE) > 0
                THEN CAST(round((sb - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                       / CAST(n AS DOUBLE))
                     / (CAST(q AS DOUBLE) - CAST(s AS DOUBLE)
                       * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * 1e6)
                     AS BIGINT) END AS eta2_e6,
           CASE WHEN k_cells > 1 AND n > k_cells
                     AND CAST(q AS DOUBLE) - sb > 0
                THEN CAST(round(((sb - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                       / CAST(n AS DOUBLE)) / (CAST(k_cells AS DOUBLE) - 1))
                     / ((CAST(q AS DOUBLE) - sb)
                       / (CAST(n AS DOUBLE) - CAST(k_cells AS DOUBLE)))
                     * 1e6) AS BIGINT) END AS f_e6
    FROM agg
    """,
)
def ts_seasonal_strength(spark, sf_dir):
    """One-way ANOVA of value on hour-of-day per series: eta-squared
    seasonal strength + F statistic from exact e3-grid integer sums
    (see analytics.seasonal_strength)."""
    return analytics.seasonal_strength(
        _ev(spark, sf_dir), keys=["event_type"]
    )


def _db_oracle_sql(dim: int = 64) -> str:
    """DuckDB mirror of simsearch.davies_bouldin — the 64 component
    sums and both folds unrolled with the identical left-to-right
    expression trees. Component sums are named cs{j} (NOT s{j}: the
    scatter alias s2 would collide with component 2's sum and DuckDB
    silently binds the ambiguous name — caught by the first verify
    run)."""
    q6 = lambda expr: f"CAST(round({expr} * 1e6) AS BIGINT)"  # noqa: E731
    s_cols = ",\n        ".join(
        f"CAST(sum({q6(f'x[{j + 1}]')}) AS BIGINT) AS cs{j}"
        for j in range(dim)
    )
    cent2 = " + ".join(
        f"(CAST(cs{j} AS DOUBLE) / CAST(n AS DOUBLE))"
        f" * (CAST(cs{j} AS DOUBLE) / CAST(n AS DOUBLE))"
        for j in range(dim)
    )
    d2 = " + ".join(
        f"(CAST(a.cs{j} AS DOUBLE) / CAST(a.n AS DOUBLE)"
        f" - CAST(b.cs{j} AS DOUBLE) / CAST(b.n AS DOUBLE))"
        f" * (CAST(a.cs{j} AS DOUBLE) / CAST(a.n AS DOUBLE)"
        f" - CAST(b.cs{j} AS DOUBLE) / CAST(b.n AS DOUBLE))"
        for j in range(dim)
    )
    cs_list = ", ".join(f"cs{j}" for j in range(dim))
    return f"""
    WITH e AS (
      SELECT CAST(label AS BIGINT) AS label, embedding AS x
      FROM embeddings
      WHERE embedding IS NOT NULL AND label IS NOT NULL
    ),
    sums AS (
      SELECT label, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(list_sum(list_transform(x,
          c -> {q6('c')} * {q6('c')}))) AS BIGINT) AS q,
        {s_cols}
      FROM e GROUP BY 1
    ),
    lab AS (
      SELECT label, n,
             CAST(q AS DOUBLE) / CAST(n AS DOUBLE) - ({cent2}) AS s2,
             {cs_list}
      FROM sums
    ),
    p AS (
      SELECT a.label AS li, a.s2 AS s2i, b.label AS lj, b.s2 AS s2j,
             ({d2}) AS d2
      FROM lab a JOIN lab b ON a.label != b.label
    ),
    r AS (
      SELECT li, lj,
             CAST(round((s2i + s2j) / d2 * 1e9) AS BIGINT) AS r9
      FROM p WHERE d2 > 0
    ),
    w AS (
      SELECT li, lj, r9,
             row_number() OVER (PARTITION BY li
               ORDER BY r9 DESC, lj ASC) AS rn
      FROM r
    )
    SELECT lab.label, lab.n,
           CAST(round(lab.s2 / 1e6) AS BIGINT) AS s2_e6,
           w.lj AS worst_label,
           CAST(round(CAST(w.r9 AS DOUBLE) / 1e3) AS BIGINT) AS r_e6
    FROM lab LEFT JOIN w ON w.li = lab.label AND w.rn = 1
    """


@q("emb_davies_bouldin", _db_oracle_sql())
def emb_davies_bouldin(spark, sf_dir):
    """Per-label Davies-Bouldin rows: within-cluster scatter, worst
    neighbor, and the DB ratio from exact e6-grid integer sums (see
    simsearch.davies_bouldin)."""
    return simsearch.davies_bouldin(_emb(spark, sf_dir))


@q(
    "ts_seq_patterns",
    _SESS_CTE
    + """
    , pos AS (
      SELECT user_id, sid, event_type,
             row_number() OVER (PARTITION BY user_id, sid
               ORDER BY ts, event_id) AS rn
      FROM sess
    ),
    pr AS (
      SELECT DISTINCT a.user_id, a.sid,
             a.event_type AS ta, b.event_type AS tb
      FROM pos a JOIN pos b
        ON a.user_id = b.user_id AND a.sid = b.sid AND a.rn < b.rn
    ),
    nb AS (
      SELECT count(*) AS n FROM (SELECT DISTINCT user_id, sid FROM sess)
    )
    SELECT ta AS type_a, tb AS type_b,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST((SELECT n FROM nb) AS BIGINT) AS n_total,
           CAST(round(CAST(count(*) AS DOUBLE) / (SELECT n FROM nb) * 1e6)
             AS BIGINT) AS support_e6
    FROM pr GROUP BY 1, 2
    """,
)
def ts_seq_patterns(spark, sf_dir):
    """Ordered sequential patterns per session: directed type pairs
    (a strictly before b, any gap) with session support — eventual
    reachability, vs markov's adjacency and basket's co-presence
    (see analytics.seq_patterns)."""
    return analytics.seq_patterns(_ev(spark, sf_dir))


@q(
    "doc_inverted_index",
    r"""
    WITH d AS (
      SELECT doc_id, trim(text) AS tx FROM documents WHERE trim(text) != ''
    ),
    n AS (SELECT count(*) AS c FROM d),
    w AS (
      SELECT doc_id, unnest(string_split_regex(tx, '\s+')) AS term FROM d
    ),
    tf AS (
      SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
      FROM w WHERE term != '' GROUP BY 1, 2
    )
    SELECT term,
           CAST(count(*) AS BIGINT) AS df,
           CAST(sum(tf) AS BIGINT) AS cf,
           -- ordered-aggregate comparator (the keep_best idiom):
           -- max tf, ties -> smallest doc_id
           CAST(first(doc_id ORDER BY tf DESC, doc_id ASC) AS BIGINT)
             AS champion_doc,
           CAST(max(tf) AS BIGINT) AS champion_tf,
           CAST(round(ln(1.0 + (CAST((SELECT c FROM n) AS DOUBLE)
             - CAST(count(*) AS DOUBLE) + 0.5)
             / (CAST(count(*) AS DOUBLE) + 0.5)) * 1e6) AS BIGINT)
             AS idf_e6
    FROM tf GROUP BY 1
    """,
)
def doc_inverted_index(spark, sf_dir):
    """Inverted-index term statistics: df, cf, champion document
    (max tf, ties to smallest id), BM25 idf (see
    textops.inverted_index)."""
    return textops.inverted_index(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# Round-5k analytics: Wasserstein drift, runs test, PACF
# (tokens_ts/analytics.py wasserstein_drift / runs_test / pacf).
# ---------------------------------------------------------------------------

@q(
    "ts_wasserstein",
    """
    WITH b AS (
      SELECT event_type AS k, date_trunc('day', ts) AS w,
             CAST(round(value * 1e3) AS BIGINT) AS v3
      FROM events WHERE value IS NOT NULL
    ),
    u AS (
      SELECT k, w AS cw, 1 AS is_cur, v3 FROM b
      UNION ALL
      SELECT k, w + INTERVAL 1 DAY AS cw, 0 AS is_cur, v3 FROM b
    ),
    c AS (
      SELECT k, cw, v3,
             sum(is_cur) AS c_cur, sum(1 - is_cur) AS c_prev
      FROM u GROUP BY 1, 2, 3
    ),
    e AS (
      SELECT k, cw,
             abs(sum(c_cur) OVER (PARTITION BY k, cw ORDER BY v3)
                   / sum(c_cur) OVER (PARTITION BY k, cw)
               - sum(c_prev) OVER (PARTITION BY k, cw ORDER BY v3)
                   / sum(c_prev) OVER (PARTITION BY k, cw))
             * (CAST(COALESCE(lead(v3) OVER (PARTITION BY k, cw
                                             ORDER BY v3) - v3, 0)
                     AS DOUBLE) / 1e3) AS t,
             sum(c_cur) OVER (PARTITION BY k, cw) AS n_cur,
             sum(c_prev) OVER (PARTITION BY k, cw) AS n_prev
      FROM c
    )
    SELECT k AS series_id, CAST(epoch(cw) AS BIGINT) AS ep,
           CAST(ROUND(sum(t) * 1e6) AS BIGINT) AS w1_e6,
           CAST(max(n_cur) AS BIGINT) AS n_cur,
           CAST(max(n_prev) AS BIGINT) AS n_prev
    FROM e GROUP BY 1, 2
    HAVING max(n_prev) > 0 AND max(n_cur) > 0
    """,
)
def ts_wasserstein(spark, sf_dir):
    """Exact 1-D earth-mover distance, each day vs its predecessor per
    event_type: Σ |ECDF gap| · value-gap over pooled e3-grid distinct
    values — drift magnitude in value units where KS gives only the
    worst single gap (see analytics.wasserstein_drift)."""
    out = analytics.wasserstein_drift(
        _ev(spark, sf_dir), keys=["event_type"], ts_col="ts",
        value_col="value", trunc="day",
    )
    return out.select(
        F.col("event_type").alias("series_id"),
        F.unix_timestamp("cw").alias("ep"),
        "w1_e6",
        "n_cur",
        "n_prev",
    )


@q(
    "ts_runs_test",
    """
    WITH b AS (
      SELECT event_type AS k,
             CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS ep,
             CAST(ROUND(avg(value) * 1e6) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    r AS (
      SELECT k, ep, v,
             row_number() OVER (PARTITION BY k ORDER BY v, ep) AS rn,
             count(*) OVER (PARTITION BY k) AS nb
      FROM b
    ),
    m AS (
      SELECT k, ep,
             2 * v
             - (sum(CASE WHEN rn = CAST(floor((nb + 1) / 2) AS BIGINT)
                         THEN v ELSE 0 END) OVER (PARTITION BY k)
                + sum(CASE WHEN rn = CAST(floor(nb / 2 + 1) AS BIGINT)
                           THEN v ELSE 0 END) OVER (PARTITION BY k)) AS d
      FROM r
    ),
    s AS (
      SELECT k, d, lag(d) OVER (PARTITION BY k ORDER BY ep) AS pd
      FROM m WHERE d <> 0
    ),
    a AS (
      SELECT k,
             sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS n1,
             sum(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS n2,
             sum(CASE WHEN pd IS NULL OR ((d > 0) <> (pd > 0))
                 THEN 1 ELSE 0 END) AS runs
      FROM s GROUP BY 1
    )
    SELECT k AS event_type,
           CAST(n1 + n2 AS BIGINT) AS n_kept,
           CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           CAST(runs AS BIGINT) AS runs,
           CASE WHEN n1 > 0 AND n2 > 0 AND n1 + n2 >= 2
                     AND CAST(2 * n1 * n2 AS DOUBLE)
                         * CAST(2 * n1 * n2 - (n1 + n2) AS DOUBLE) > 0
                THEN CAST(ROUND(
                  1e6 * CAST(runs * (n1 + n2) - 2 * n1 * n2 - (n1 + n2)
                             AS DOUBLE)
                  / sqrt(CAST(2 * n1 * n2 AS DOUBLE)
                         * CAST(2 * n1 * n2 - (n1 + n2) AS DOUBLE)
                         / CAST(n1 + n2 - 1 AS DOUBLE))) AS BIGINT)
           END AS z_e6
    FROM a
    """,
)
def ts_runs_test(spark, sf_dir):
    """Wald–Wolfowitz runs test per event_type over e6-grid hourly
    means: runs / n1 / n2 exact integers against the exact
    2·median order-statistic cut, z from one shared IEEE tree (see
    analytics.runs_test)."""
    return analytics.runs_test(
        _ev(spark, sf_dir), keys=["event_type"], trunc="hour"
    )


@q(
    "ts_pacf",
    """
    WITH b AS (
      SELECT event_type AS k,
             CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS ep,
             CAST(ROUND(avg(value) * 1e3) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    lags(lag) AS (VALUES (1), (2), (3)),
    p AS (
      SELECT l.k, lags.lag, l.v AS x, r.v AS y
      FROM b l CROSS JOIN lags
      JOIN b r ON r.k = l.k AND r.ep = l.ep + lags.lag * 3600
    ),
    s AS (
      SELECT k, lag, count(*) AS n,
             sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
             sum(x * x) AS sxx, sum(y * y) AS syy
      FROM p GROUP BY 1, 2
    ),
    rr AS (
      SELECT k, lag,
             CASE WHEN n >= 2
                       AND CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
                       AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
                  THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                              * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             END AS r
      FROM s
    ),
    w AS (
      SELECT k,
             max(CASE WHEN lag = 1 THEN r END) AS r1,
             max(CASE WHEN lag = 2 THEN r END) AS r2,
             max(CASE WHEN lag = 3 THEN r END) AS r3
      FROM rr GROUP BY 1
    ),
    dl AS (
      SELECT k, r1, r2, r3,
             CASE WHEN 1.0 - r1 * r1 > 0
                  THEN (r2 - r1 * r1) / (1.0 - r1 * r1) END AS p22
      FROM w
    ),
    dl2 AS (
      SELECT k, r1, r2, r3, p22,
             r1 * (1.0 - p22) AS p21,
             (1.0 - r1 * r1) * (1.0 - p22 * p22) AS v2
      FROM dl
    )
    SELECT k AS event_type,
           CAST(ROUND(1e6 * r1) AS BIGINT) AS pacf1_e6,
           CAST(ROUND(1e6 * p22) AS BIGINT) AS pacf2_e6,
           CASE WHEN v2 > 0
                THEN CAST(ROUND(1e6 * (r3 - p21 * r2 - p22 * r1) / v2)
                          AS BIGINT)
           END AS pacf3_e6
    FROM dl2
    """,
)
def ts_pacf(spark, sf_dir):
    """Partial autocorrelation lags 1-3 per event_type: Durbin-
    Levinson unrolled over the gap-correct per-lag Pearson ACF on
    e3-grid hourly means, one shared IEEE tree (see analytics.pacf)."""
    return analytics.pacf(
        _ev(spark, sf_dir), keys=["event_type"], trunc="hour"
    )


_REVAL_QUERIES = [
    ("q1", ["fast", "merge", "query"]),
    ("q2", ["spark", "window"]),
    ("q3", ["customer", "hash", "batch"]),
    ("qz", ["zebra"]),
]
_REVAL_K = 10


def _retrieval_eval_sql() -> str:
    """DuckDB replay of textops.retrieval_eval on documents: same
    union-vocab BM25 CTE chain as doc_bm25_topk, AND-relevance, and
    the SAME pre-quantized DCG weight literals (built from one python
    list so the two engines cannot drift)."""
    import math as _m

    k = _REVAL_K
    ws = [round(1e12 / _m.log2(i + 1)) for i in range(1, k + 1)]
    cumw = [sum(ws[: i + 1]) for i in range(k)]
    wt = ", ".join(
        f"({i + 1}, {ws[i]}, {cumw[i]})" for i in range(k)
    )
    vocab = sorted({t for _, ts in _REVAL_QUERIES for t in ts})
    vterms = ", ".join(f"('{t}')" for t in vocab)
    qterms = ", ".join(
        f"('{qid}', '{t}')" for qid, ts in _REVAL_QUERIES for t in ts
    )
    qdim = ", ".join(
        f"('{qid}', {len(ts)})" for qid, ts in _REVAL_QUERIES
    )
    return f"""
    WITH base AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
               AS dl,
             text
      FROM documents
    ),
    st AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM base
    ),
    tfl AS (
      SELECT doc_id, dl, t.term,
             len(list_filter(string_split_regex(text, '\\s+'),
                             x -> x = t.term)) AS tf
      FROM base, (VALUES {vterms}) t(term)
    ),
    kept AS (SELECT * FROM tfl WHERE tf > 0),
    dfc AS (SELECT term, count(*) AS df FROM kept GROUP BY 1),
    qterms(qid, term) AS (VALUES {qterms}),
    qdim(qid, nq) AS (VALUES {qdim}),
    qd AS (
      SELECT q.qid, kept.doc_id, count(*) AS nm,
             CAST(ROUND(sum(
               ln(1.0 + (st.n_docs - dfc.df + 0.5) / (dfc.df + 0.5))
               * (kept.tf * 2.2)
                 / (kept.tf + 1.2 * (0.25 + 0.75 * kept.dl / st.avgdl))
             ) * 1e6) AS BIGINT) AS score_e6
      FROM kept JOIN dfc USING (term) CROSS JOIN st
                JOIN qterms q USING (term)
      GROUP BY 1, 2
    ),
    qr AS (
      SELECT qd.*, CASE WHEN nm = qdim.nq THEN 1 ELSE 0 END AS rel
      FROM qd JOIN qdim USING (qid)
    ),
    nrel AS (SELECT qid, sum(rel) AS n_rel FROM qr GROUP BY 1),
    topk AS (
      SELECT * FROM (
        SELECT qid, rel,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY score_e6 DESC, doc_id ASC) AS rnk
        FROM qr
      ) WHERE rnk <= {k}
    ),
    wt(rnk, w, cumw) AS (VALUES {wt}),
    kt AS (
      SELECT qid, sum(rel) AS hits,
             min(CASE WHEN rel = 1 THEN rnk END) AS fr,
             sum(CASE WHEN rel = 1 THEN wt.w ELSE 0 END) AS dcg
      FROM topk JOIN wt USING (rnk) GROUP BY 1
    )
    SELECT qdim.qid,
           CAST(COALESCE(nrel.n_rel, 0) AS BIGINT) AS n_rel,
           CAST(COALESCE(kt.hits, 0) AS BIGINT) AS hits,
           CAST(COALESCE(CAST(ROUND(1e6 / kt.fr) AS BIGINT), 0) AS BIGINT)
             AS mrr_e6,
           CAST(ROUND(1e6 * COALESCE(kt.hits, 0) / {k}) AS BIGINT)
             AS precision_e6,
           CASE WHEN COALESCE(nrel.n_rel, 0) > 0
                THEN CAST(ROUND(1e6 * COALESCE(kt.hits, 0) / nrel.n_rel)
                          AS BIGINT)
           END AS recall_e6,
           CASE WHEN COALESCE(nrel.n_rel, 0) > 0
                THEN CAST(ROUND(
                  1e6 * CAST(COALESCE(kt.dcg, 0) AS DOUBLE)
                  / CAST((SELECT cumw FROM wt
                          WHERE rnk = least(nrel.n_rel, {k})) AS DOUBLE))
                  AS BIGINT)
           END AS ndcg_e6
    FROM qdim LEFT JOIN nrel USING (qid) LEFT JOIN kt USING (qid)
    """


@q("doc_retrieval_eval", _retrieval_eval_sql())
def doc_retrieval_eval(spark, sf_dir):
    """Offline retrieval-quality eval: BM25 top-10 per fixed query vs
    AND-semantics binary relevance — MRR@10, precision/recall@10,
    nDCG@10 with pre-quantized bigint gain weights; the qz query
    matches nothing and pins the R=0 row (see
    textops.retrieval_eval)."""
    return textops.retrieval_eval(
        _docs(spark, sf_dir), _REVAL_QUERIES, k=_REVAL_K
    )


@q(
    "mm_resize",
    """
    WITH par AS (
      SELECT doc_id,
             1 + strlen(text) % 64 AS w,
             1 + doc_id % 48 AS h,
             ((3 * (1 + strlen(text) % 64) + 3) // 4) * 4 AS rb,
             least(1 + strlen(text) % 64, 16) AS ow,
             least(1 + doc_id % 48, 12) AS oh,
             ((3 * least(1 + strlen(text) % 64, 16) + 3) // 4) * 4 AS orb
      FROM documents
    ),
    px AS (
      SELECT doc_id, w, h, rb, ow, oh, orb,
             unnest(range(0, oh * orb)) AS p
      FROM par
    ),
    v AS (
      SELECT doc_id, w, h, ow, oh, orb, p,
             CASE WHEN p % orb < 3 * ow
                  THEN (doc_id
                        + ((p // orb) * h // oh) * rb
                        + (((p % orb) // 3) * w // ow) * 3
                        + (p % orb) % 3) % 256
                  ELSE 0 END AS b
      FROM px
    )
    SELECT doc_id,
           CAST(max(w) AS BIGINT) AS in_width,
           CAST(max(h) AS BIGINT) AS in_height,
           CAST(max(ow) AS BIGINT) AS out_width,
           CAST(max(oh) AS BIGINT) AS out_height,
           CAST(54 + max(oh) * max(orb) AS BIGINT) AS out_bytes,
           CAST(sum(b) AS BIGINT) AS px_sum,
           md5(string_agg(printf('%02x', b), '' ORDER BY p)) AS px_md5
    FROM v GROUP BY doc_id
    """,
)
def mm_resize(spark, sf_dir):
    """Nearest-neighbor BMP thumbnail to a 16x12 clamp: the Spark side
    genuinely parses + resamples + re-assembles the binary payload in
    an Arrow stage (and re-decodes its own output as a self-check);
    the oracle rebuilds the padded output pixel bytes from the
    fixture's closed forms and must land on the same md5-of-hex and
    byte sum (see multimodal.resize_bmp)."""
    b = multimodal.docs_as_bmp(_docs(spark, sf_dir))
    return multimodal.resize_bmp(b, max_w=16, max_h=12)


@q(
    "mm_audio_frames",
    """
    WITH par AS (
      SELECT doc_id,
             (1 + doc_id % 48)
             * (((3 * (1 + strlen(text) % 64) + 3) // 4) * 4) AS npx
      FROM documents
    ),
    fr AS (
      SELECT doc_id, npx,
             unnest(range(0, (npx + 255) // 256)) AS frame_id
      FROM par
    ),
    sm AS (
      SELECT doc_id, frame_id,
             unnest(range(frame_id * 256,
                          least(npx, (frame_id + 1) * 256))) AS idx
      FROM fr
    ),
    d AS (
      SELECT doc_id, frame_id, (doc_id + idx) % 256 - 128 AS dd
      FROM sm
    )
    SELECT doc_id, CAST(frame_id AS BIGINT) AS frame_id,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(max(abs(dd)) AS BIGINT) AS peak,
           CAST(sum(dd * dd) AS BIGINT) AS ssq,
           CAST(ROUND(1e6 * sqrt(CAST(sum(dd * dd) AS DOUBLE)
                                 / CAST(count(*) AS DOUBLE))) AS BIGINT)
             AS rms_e6
    FROM d GROUP BY 1, 2
    """,
)
def mm_audio_frames(spark, sf_dir):
    """PCM-style frame features over the payload's pixel bytes: 256-
    sample non-overlapping frames, midpoint-centered, per-frame peak /
    exact Σd² / rms — the audio-modality stand-in whose frame grid
    both engines derive from payload length alone (see
    multimodal.audio_frames)."""
    b = multimodal.docs_as_bmp(_docs(spark, sf_dir))
    return multimodal.audio_frames(b, frame=256)


def _ch_oracle_sql(dim: int = 64) -> str:
    """DuckDB mirror of simsearch.calinski_harabasz — identical
    left-to-right folds; component sums cs{j}, global sums g{j}."""
    q6 = lambda expr: f"CAST(round({expr} * 1e6) AS BIGINT)"  # noqa: E731
    s_cols = ",\n        ".join(
        f"CAST(sum({q6(f'x[{j + 1}]')}) AS BIGINT) AS cs{j}"
        for j in range(dim)
    )
    g_cols = ", ".join(f"CAST(sum(cs{j}) AS BIGINT) AS g{j}" for j in range(dim))
    cent2 = " + ".join(
        f"(CAST(cs{j} AS DOUBLE) / CAST(n AS DOUBLE))"
        f" * (CAST(cs{j} AS DOUBLE) / CAST(n AS DOUBLE))"
        for j in range(dim)
    )
    d2 = " + ".join(
        f"(CAST(s.cs{j} AS DOUBLE) / CAST(s.n AS DOUBLE)"
        f" - CAST(g.g{j} AS DOUBLE) / CAST(g.nn AS DOUBLE))"
        f" * (CAST(s.cs{j} AS DOUBLE) / CAST(s.n AS DOUBLE)"
        f" - CAST(g.g{j} AS DOUBLE) / CAST(g.nn AS DOUBLE))"
        for j in range(dim)
    )
    return f"""
    WITH e AS (
      SELECT CAST(label AS BIGINT) AS label, embedding AS x
      FROM embeddings
      WHERE embedding IS NOT NULL AND label IS NOT NULL
    ),
    sums AS (
      SELECT label, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(list_sum(list_transform(x,
          c -> {q6('c')} * {q6('c')}))) AS BIGINT) AS q,
        {s_cols}
      FROM e GROUP BY 1
    ),
    gl AS (
      SELECT CAST(sum(n) AS BIGINT) AS nn,
             CAST(count(*) AS BIGINT) AS k,
             {g_cols}
      FROM sums
    ),
    p AS (
      SELECT s.label, s.n, g.nn, g.k,
             CAST(s.q AS DOUBLE) - CAST(s.n AS DOUBLE) * ({cent2}) AS w,
             CAST(s.n AS DOUBLE) * ({d2}) AS b
      FROM sums s CROSS JOIN gl g
    ),
    tot AS (
      SELECT nn, k, sum(w) AS ww, sum(b) AS bb FROM p GROUP BY 1, 2
    )
    SELECT p.label, p.n,
           CAST(round(p.w / 1e6) AS BIGINT) AS w_e6,
           CAST(round(p.b / 1e6) AS BIGINT) AS b_e6,
           CASE WHEN t.k >= 2 AND t.nn > t.k AND t.ww > 0
                THEN CAST(round((t.bb / (CAST(t.k AS DOUBLE) - 1.0))
                     / (t.ww / (CAST(t.nn AS DOUBLE) - CAST(t.k AS DOUBLE)))
                     * 1e6) AS BIGINT)
           END AS ch_e6
    FROM p JOIN tot t ON t.nn = p.nn AND t.k = p.k
    """


@q("emb_calinski_harabasz", _ch_oracle_sql())
def emb_calinski_harabasz(spark, sf_dir):
    """Per-label Calinski-Harabasz rows: within-SSE, between-SSE
    contribution vs the global centroid, and the shared variance-ratio
    index from exact e6-grid integer sums (see
    simsearch.calinski_harabasz) — the compactness-vs-separation twin
    of emb_davies_bouldin's worst-neighbor view."""
    return simsearch.calinski_harabasz(_emb(spark, sf_dir))


@q(
    "doc_dup_span_coverage",
    r"""
    WITH d AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
      FROM documents WHERE trim(text) != ''
    ),
    base AS (
      SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words, w FROM d
    ),
    occ AS (
      SELECT doc_id,
             unnest(range(0, CAST(n_words AS INTEGER) - 4)) AS start,
             w
      FROM base WHERE n_words >= 5
    ),
    g AS (
      SELECT doc_id, start,
             array_to_string(list_slice(w, start + 1, start + 5), ' ') AS gram
      FROM occ
    ),
    cnt AS (
      SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2
    ),
    cov AS (
      SELECT DISTINCT m.doc_id, m.start + o.off AS pos
      FROM g m JOIN cnt USING (gram)
      CROSS JOIN (SELECT unnest(range(0, 5)) AS off) o
    ),
    per AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS covered
      FROM cov GROUP BY doc_id
    )
    SELECT b.doc_id, b.n_words,
           CAST(coalesce(p.covered, 0) AS BIGINT) AS covered,
           CAST(round(CAST(coalesce(p.covered, 0) AS DOUBLE)
                / CAST(b.n_words AS DOUBLE) * 1e6) AS BIGINT) AS cov_e6
    FROM base b LEFT JOIN per p USING (doc_id)
    """,
)
def doc_dup_span_coverage(spark, sf_dir):
    """Corpus-wide duplicated-span coverage per doc: fraction of word
    positions inside any word 5-gram occurring ≥2× anywhere in the
    corpus — the Lee-et-al exact-substring-dedup cut quantity (see
    dedup.dup_span_coverage)."""
    return dedup.dup_span_coverage(_docs(spark, sf_dir), k=5)


@q(
    "ts_granger",
    """
    WITH b AS (
      SELECT event_type AS sid,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ep,
             CAST(round(avg(value) * 1000.0) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    tri AS (
      SELECT x.sid AS series_x, c.sid AS series_y,
             u.v AS u, x.v AS x, c.v AS y
      FROM b c
      JOIN b u ON u.sid = c.sid AND u.ep + 3600 = c.ep
      JOIN b x ON x.ep + 3600 = c.ep AND x.sid != c.sid
    ),
    a AS (
      SELECT series_x, series_y, CAST(count(*) AS BIGINT) AS n,
             sum(u) AS su, sum(x) AS sv, sum(y) AS sy,
             sum(u*u) AS suu, sum(x*x) AS svv, sum(u*x) AS suv,
             sum(u*y) AS suy, sum(x*y) AS svy, sum(y*y) AS syy
      FROM tri GROUP BY 1, 2
    ),
    m AS (
      SELECT series_x, series_y, n,
        CAST(suu AS DOUBLE) - CAST(su AS DOUBLE) * CAST(su AS DOUBLE)
          / CAST(n AS DOUBLE) AS muu,
        CAST(svv AS DOUBLE) - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE)
          / CAST(n AS DOUBLE) AS mvv,
        CAST(suv AS DOUBLE) - CAST(su AS DOUBLE) * CAST(sv AS DOUBLE)
          / CAST(n AS DOUBLE) AS muv,
        CAST(suy AS DOUBLE) - CAST(su AS DOUBLE) * CAST(sy AS DOUBLE)
          / CAST(n AS DOUBLE) AS muy,
        CAST(svy AS DOUBLE) - CAST(sv AS DOUBLE) * CAST(sy AS DOUBLE)
          / CAST(n AS DOUBLE) AS mvy,
        CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
          / CAST(n AS DOUBLE) AS myy
      FROM a
    ),
    r AS (
      SELECT series_x, series_y, n, muu,
             muu * mvv - muv * muv AS det,
             myy - muy * muy / muu AS rss_r,
             myy - (mvv * muy * muy - 2.0 * muv * muy * mvy
                    + muu * mvy * mvy) / (muu * mvv - muv * muv) AS rss_u
      FROM m
    )
    SELECT series_x, series_y, n AS n_obs,
           CASE WHEN n >= 4 AND muu > 0 AND det > 0 AND rss_u > 0
                THEN CAST(round((rss_r - rss_u) * (CAST(n AS DOUBLE) - 3.0)
                     / rss_u * 1e6) AS BIGINT)
           END AS f_e6,
           CASE WHEN n >= 4 AND muu > 0 AND det > 0 AND rss_r > 0
                THEN CAST(round((rss_r - rss_u) / rss_r * 1e6) AS BIGINT)
           END AS gain_e6
    FROM r
    """,
)
def ts_granger(spark, sf_dir):
    """Lag-1 Granger causality F-test between every directed pair of
    event types at hourly buckets — 2-regressor OLS RSS in closed form
    from exact e3-grid integer sums (see analytics.granger). CCF's
    lead-lag says the series co-move; this says the mover carries
    predictive information beyond the target's own past."""
    return analytics.granger(
        _ev(spark, sf_dir), key_col="event_type", ts_col="ts",
        value_col="value", trunc="hour",
    )


@q(
    "ts_changepoint_mean",
    """
    WITH b AS (
      SELECT event_type AS sid,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ep,
             CAST(round(avg(value) * 1000.0) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    p AS (
      SELECT sid, ep,
             count(*) OVER (PARTITION BY sid) AS n,
             sum(v) OVER (PARTITION BY sid) AS t,
             sum(v * v) OVER (PARTITION BY sid) AS q,
             sum(v) OVER (PARTITION BY sid ORDER BY ep
                          ROWS UNBOUNDED PRECEDING) AS s,
             row_number() OVER (PARTITION BY sid ORDER BY ep) AS k
      FROM b
    ),
    cand AS (
      SELECT sid, ep, n, t, q, s, k,
             (CAST(n AS DOUBLE) * CAST(s AS DOUBLE)
              - CAST(k AS DOUBLE) * CAST(t AS DOUBLE))
             * (CAST(n AS DOUBLE) * CAST(s AS DOUBLE)
                - CAST(k AS DOUBLE) * CAST(t AS DOUBLE))
             / (CAST(k AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))
                * CAST(n AS DOUBLE)) AS gain
      FROM p WHERE k < n
    ),
    best AS (
      SELECT *, row_number() OVER (PARTITION BY sid
                  ORDER BY gain DESC, ep ASC) AS rn
      FROM cand
    )
    SELECT sid AS series_id,
           CAST(n AS BIGINT) AS n_buckets,
           ep AS cp_epoch,
           CAST(k AS BIGINT) AS k_left,
           CAST(round(gain / 1000.0 / 1000.0 * 1e6) AS BIGINT) AS gain_e6,
           CASE WHEN CAST(q AS DOUBLE) - CAST(t AS DOUBLE) * CAST(t AS DOUBLE)
                     / CAST(n AS DOUBLE) > 0
                THEN CAST(round(gain / (CAST(q AS DOUBLE)
                     - CAST(t AS DOUBLE) * CAST(t AS DOUBLE)
                     / CAST(n AS DOUBLE)) * 1e6) AS BIGINT)
           END AS strength_e6,
           CAST(round(CAST(s AS DOUBLE) / CAST(k AS DOUBLE)) AS BIGINT)
             AS mean_before_e3,
           CAST(round(CAST(t - s AS DOUBLE)
                / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))) AS BIGINT)
             AS mean_after_e3
    FROM best WHERE rn = 1
    """,
)
def ts_changepoint_mean(spark, sf_dir):
    """Best single mean-shift changepoint per event type (binary-
    segmentation step 1) over hourly e3-grid means: argmax SSE gain
    from prefix sums, with the one-break R² (strength) and the
    before/after levels (see analytics.changepoint_mean). Pettitt
    answers WHETHER robustly; this answers WHERE and BY HOW MUCH."""
    return analytics.changepoint_mean(
        _ev(spark, sf_dir), key_col="event_type", ts_col="ts",
        value_col="value", trunc="hour",
    )


_HOURLY_E3 = """
    WITH b AS (
      SELECT event_type AS sid,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ep,
             CAST(round(avg(value) * 1000.0) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    )
"""


@q(
    "ts_sampen",
    _HOURLY_E3
    + """
    , bb AS (SELECT sid, ep - ep % 86400 AS dy, ep, v FROM b),
    t AS (
      SELECT sid, dy, v,
             row_number() OVER w AS i,
             CASE WHEN lead(ep, 1) OVER w = ep + 3600
                  THEN lead(v, 1) OVER w END AS v1,
             CASE WHEN lead(ep, 1) OVER w = ep + 3600
                   AND lead(ep, 2) OVER w = ep + 7200
                  THEN lead(v, 2) OVER w END AS v2
      FROM bb WINDOW w AS (PARTITION BY sid, dy ORDER BY ep)
    ),
    st AS (
      SELECT sid, dy, CAST(count(*) AS BIGINT) AS n,
             sum(v) AS s, sum(v * v) AS q
      FROM bb GROUP BY 1, 2
    ),
    sr AS (
      SELECT sid, dy, n,
             CAST(round(0.2 * sqrt(CAST(q AS DOUBLE) / CAST(n AS DOUBLE)
               - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))))
               AS BIGINT) AS r
      FROM st
    ),
    cnt AS (
      SELECT l.sid, l.dy,
        CAST(sum(CASE WHEN l.v1 IS NOT NULL AND rr.v1 IS NOT NULL
              AND greatest(abs(l.v - rr.v), abs(l.v1 - rr.v1)) <= sr.r
              THEN 1 ELSE 0 END) AS BIGINT) AS b_cnt,
        CAST(sum(CASE WHEN l.v1 IS NOT NULL AND rr.v1 IS NOT NULL
              AND greatest(abs(l.v - rr.v), abs(l.v1 - rr.v1)) <= sr.r
              AND l.v2 IS NOT NULL AND rr.v2 IS NOT NULL
              AND abs(l.v2 - rr.v2) <= sr.r
              THEN 1 ELSE 0 END) AS BIGINT) AS a_cnt
      FROM t l
      JOIN t rr ON rr.sid = l.sid AND rr.dy = l.dy AND l.i < rr.i
      JOIN sr ON sr.sid = l.sid AND sr.dy = l.dy
      GROUP BY 1, 2
    )
    SELECT sr.sid AS series_id, sr.dy AS day_epoch,
           sr.n AS n_buckets, sr.r AS r_e3,
           CAST(coalesce(c.b_cnt, 0) AS BIGINT) AS b_cnt,
           CAST(coalesce(c.a_cnt, 0) AS BIGINT) AS a_cnt,
           CASE WHEN c.a_cnt > 0 AND c.b_cnt > 0
                THEN CAST(round(-ln(CAST(c.a_cnt AS DOUBLE)
                     / CAST(c.b_cnt AS DOUBLE)) * 1e6) AS BIGINT)
           END AS sampen_e6
    FROM sr LEFT JOIN cnt c ON c.sid = sr.sid AND c.dy = sr.dy
    """,
)
def ts_sampen(spark, sf_dir):
    """SampEn(m=2, r=0.2·σ_day) per (event type, day) on hourly
    e3-grid means — amplitude-aware template-matching complexity next
    to perm_entropy's ordinal view (see analytics.sample_entropy).
    Integer Chebyshev comparisons; A=0/B=0 days emit null honestly."""
    return analytics.sample_entropy(
        _ev(spark, sf_dir), key_col="event_type", ts_col="ts",
        value_col="value",
    )


@q(
    "ts_cointegration",
    _HOURLY_E3
    + """
    , p AS (
      SELECT l.sid AS series_a, r.sid AS series_b, l.ep,
             l.v AS x, r.v AS y
      FROM b l JOIN b r ON r.ep = l.ep AND l.sid < r.sid
    ),
    s1 AS (
      SELECT series_a, series_b, CAST(count(*) AS BIGINT) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(x * y) AS sxy
      FROM p GROUP BY 1, 2
    ),
    fit AS (
      SELECT series_a, series_b, n,
        CASE WHEN CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                  * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) > 0
             THEN (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                   * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                  / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                     * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
        END AS beta,
        CASE WHEN CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                  * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) > 0
             THEN (CAST(sy AS DOUBLE)
                   - ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                       * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                      / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                         * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
                     * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
        END AS alpha
      FROM s1
    ),
    res AS (
      SELECT p.series_a, p.series_b, p.ep,
             CAST(round(CAST(p.y AS DOUBLE) - f.alpha
                  - f.beta * CAST(p.x AS DOUBLE)) AS BIGINT) AS q
      FROM p JOIN fit f ON f.series_a = p.series_a
                       AND f.series_b = p.series_b
      WHERE f.beta IS NOT NULL
    ),
    d AS (
      SELECT series_a, series_b,
             CASE WHEN lag(ep, 1) OVER w = ep - 3600
                  THEN q - lag(q, 1) OVER w END AS dd,
             CASE WHEN lag(ep, 1) OVER w = ep - 3600
                  THEN lag(q, 1) OVER w END AS ll
      FROM res WINDOW w AS (PARTITION BY series_a, series_b ORDER BY ep)
    ),
    s2 AS (
      SELECT series_a, series_b, CAST(count(*) AS BIGINT) AS m,
             sum(ll * dd) AS sld, sum(ll * ll) AS sll,
             sum(dd * dd) AS sdd
      FROM d WHERE dd IS NOT NULL GROUP BY 1, 2
    )
    SELECT f.series_a, f.series_b, f.n AS n_obs,
           CAST(round(f.beta * 1e6) AS BIGINT) AS beta_e6,
           CAST(round(f.alpha) AS BIGINT) AS alpha_e3,
           CAST(coalesce(s2.m, 0) AS BIGINT) AS n_diffs,
           CASE WHEN s2.m >= 3 AND s2.sll > 0
                THEN CAST(round(CAST(s2.sld AS DOUBLE)
                     / CAST(s2.sll AS DOUBLE) * 1e6) AS BIGINT)
           END AS rho_e6,
           CASE WHEN s2.m >= 3 AND s2.sll > 0
                 AND (CAST(s2.sdd AS DOUBLE)
                      - 2.0 * (CAST(s2.sld AS DOUBLE) / CAST(s2.sll AS DOUBLE))
                        * CAST(s2.sld AS DOUBLE)
                      + (CAST(s2.sld AS DOUBLE) / CAST(s2.sll AS DOUBLE))
                        * (CAST(s2.sld AS DOUBLE) / CAST(s2.sll AS DOUBLE))
                        * CAST(s2.sll AS DOUBLE))
                     / (CAST(s2.m AS DOUBLE) - 1.0) > 0
                THEN CAST(round((CAST(s2.sld AS DOUBLE) / CAST(s2.sll AS DOUBLE))
                     / sqrt(((CAST(s2.sdd AS DOUBLE)
                        - 2.0 * (CAST(s2.sld AS DOUBLE) / CAST(s2.sll AS DOUBLE))
                          * CAST(s2.sld AS DOUBLE)
                        + (CAST(s2.sld AS DOUBLE) / CAST(s2.sll AS DOUBLE))
                          * (CAST(s2.sld AS DOUBLE) / CAST(s2.sll AS DOUBLE))
                          * CAST(s2.sll AS DOUBLE))
                       / (CAST(s2.m AS DOUBLE) - 1.0))
                       / CAST(s2.sll AS DOUBLE)) * 1e6) AS BIGINT)
           END AS df_t_e6
    FROM fit f LEFT JOIN s2 ON s2.series_a = f.series_a
                           AND s2.series_b = f.series_b
    """,
)
def ts_cointegration(spark, sf_dir):
    """Engle-Granger cointegration screen per ordered series pair:
    OLS spread fit, residuals quantized back to the integer grid, and
    the no-intercept Dickey-Fuller t on the spread (see
    analytics.cointegration). Correlation says levels co-move; this
    says the SPREAD mean-reverts."""
    return analytics.cointegration(
        _ev(spark, sf_dir), key_col="event_type", ts_col="ts",
        value_col="value", trunc="hour",
    )


@q(
    "ts_hjorth",
    _HOURLY_E3
    + """
    , t AS (
      SELECT sid, v,
             CASE WHEN lag(ep, 1) OVER w = ep - 3600
                  THEN v - lag(v, 1) OVER w END AS d1,
             CASE WHEN lag(ep, 1) OVER w = ep - 3600
                   AND lag(ep, 2) OVER w = ep - 7200
                  THEN v - 2 * lag(v, 1) OVER w + lag(v, 2) OVER w
             END AS d2
      FROM b WINDOW w AS (PARTITION BY sid ORDER BY ep)
    ),
    a AS (
      SELECT sid, CAST(count(*) AS BIGINT) AS n,
             sum(v) AS s0, sum(v * v) AS q0,
             CAST(count(d1) AS BIGINT) AS n1,
             sum(d1) AS s1, sum(d1 * d1) AS q1,
             CAST(count(d2) AS BIGINT) AS n2,
             sum(d2) AS s2_, sum(d2 * d2) AS q2
      FROM t GROUP BY 1
    ),
    vv AS (
      SELECT sid, n, n1, n2,
        CAST(q0 AS DOUBLE) / CAST(n AS DOUBLE)
          - (CAST(s0 AS DOUBLE) / CAST(n AS DOUBLE))
            * (CAST(s0 AS DOUBLE) / CAST(n AS DOUBLE)) AS v0,
        CAST(q1 AS DOUBLE) / CAST(n1 AS DOUBLE)
          - (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
            * (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)) AS v1,
        CAST(q2 AS DOUBLE) / CAST(n2 AS DOUBLE)
          - (CAST(s2_ AS DOUBLE) / CAST(n2 AS DOUBLE))
            * (CAST(s2_ AS DOUBLE) / CAST(n2 AS DOUBLE)) AS v2
      FROM a
    )
    SELECT sid AS series_id, n AS n_buckets, n1 AS n_d1, n2 AS n_d2,
           CASE WHEN n >= 2 THEN CAST(round(v0) AS BIGINT) END
             AS activity_e6,
           CASE WHEN n >= 2 AND n1 >= 2 AND v0 > 0
                THEN CAST(round(sqrt(v1 / v0) * 1e6) AS BIGINT)
           END AS mobility_e6,
           CASE WHEN n1 >= 2 AND n2 >= 2 AND v1 > 0 AND v0 > 0
                THEN CAST(round(sqrt(v2 / v1) / sqrt(v1 / v0) * 1e6)
                     AS BIGINT)
           END AS complexity_e6
    FROM vv
    """,
)
def ts_hjorth(spark, sf_dir):
    """Hjorth activity/mobility/complexity per event type on hourly
    e3-grid means with epoch-exact first and second differences (see
    analytics.hjorth) — the three-number signal fingerprint cheaper
    than any spectral pass."""
    return analytics.hjorth(
        _ev(spark, sf_dir), key_col="event_type", ts_col="ts",
        value_col="value", trunc="hour",
    )


@q(
    "ts_turning_points",
    _HOURLY_E3
    + """
    , t AS (
      SELECT sid,
             CASE WHEN lag(v) OVER w IS NOT NULL
                   AND lead(v) OVER w IS NOT NULL
                   AND ((lag(v) OVER w < v AND lead(v) OVER w < v)
                     OR (lag(v) OVER w > v AND lead(v) OVER w > v))
                  THEN 1 ELSE 0 END AS tp
      FROM b WINDOW w AS (PARTITION BY sid ORDER BY ep)
    ),
    a AS (
      SELECT sid, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(tp) AS BIGINT) AS t_cnt
      FROM t GROUP BY 1
    )
    SELECT sid AS series_id, n AS n_buckets, t_cnt AS n_turning,
           CASE WHEN n >= 3
                THEN CAST(round((CAST(t_cnt AS DOUBLE)
                     - 2.0 * (CAST(n AS DOUBLE) - 2.0) / 3.0)
                     / sqrt((16.0 * CAST(n AS DOUBLE) - 29.0) / 90.0)
                     * 1e6) AS BIGINT)
           END AS z_e6
    FROM a
    """,
)
def ts_turning_points(spark, sf_dir):
    """Turning-point randomness z per event type on hourly e3-grid
    means — strict local extrema counts vs the i.i.d. expectation
    2(n−2)/3 (see analytics.turning_points); the local-shape
    randomness lens next to runs_test and ljung_box."""
    return analytics.turning_points(
        _ev(spark, sf_dir), key_col="event_type", ts_col="ts",
        value_col="value", trunc="hour",
    )


_AHASH_CTE = """
    WITH par AS (
      SELECT doc_id,
             1 + strlen(text) % 64 AS w,
             1 + doc_id % 48 AS h,
             ((3 * (1 + strlen(text) % 64) + 3) // 4) * 4 AS rb
      FROM documents
    ),
    gpos AS (
      SELECT doc_id, w, h, rb, unnest(range(0, 64)) AS g FROM par
    ),
    gray AS (
      SELECT doc_id, g,
             (((doc_id + ((g // 8) * h // 8) * rb + 3 * ((g % 8) * w // 8))
               % 256)
              + ((doc_id + ((g // 8) * h // 8) * rb + 3 * ((g % 8) * w // 8)
                  + 1) % 256)
              + ((doc_id + ((g // 8) * h // 8) * rb + 3 * ((g % 8) * w // 8)
                  + 2) % 256)) // 3 AS gy
      FROM gpos
    ),
    tot AS (
      SELECT doc_id, sum(gy) AS total FROM gray GROUP BY 1
    ),
    bits AS (
      SELECT gray.doc_id, g, gy,
             CASE WHEN gy * 64 > tot.total THEN 1 ELSE 0 END AS bit
      FROM gray JOIN tot ON tot.doc_id = gray.doc_id
    ),
    nib AS (
      SELECT doc_id, g // 4 AS nb,
             sum(bit * (CASE g % 4 WHEN 0 THEN 8 WHEN 1 THEN 4
                        WHEN 2 THEN 2 ELSE 1 END)) AS val,
             sum(bit) AS bs, sum(gy) AS gs
      FROM bits GROUP BY 1, 2
    ),
    hh AS (
      SELECT doc_id,
             string_agg(printf('%x', CAST(val AS BIGINT)), '' ORDER BY nb) AS hash_hex,
             CAST(sum(bs) AS BIGINT) AS bits_set,
             CAST(sum(gs) AS BIGINT) AS gray_sum
      FROM nib GROUP BY 1
    )
"""


@q(
    "mm_ahash",
    _AHASH_CTE
    + """
    SELECT p.doc_id, CAST(p.w AS BIGINT) AS width,
           CAST(p.h AS BIGINT) AS height,
           hh.hash_hex, hh.bits_set, hh.gray_sum
    FROM par p JOIN hh ON hh.doc_id = p.doc_id
    """,
)
def mm_ahash(spark, sf_dir):
    """Perceptual average-hash per image: 8×8 integer-map grayscale
    resample, strict integer threshold bits, MSB-first hex packing —
    the Spark side genuinely parses + resamples the binary payload in
    an Arrow stage; the oracle rebuilds every sampled gray from the
    fixture closed forms and must land on the same 16-hex hash,
    popcount and gray sum (see multimodal.ahash)."""
    b = multimodal.docs_as_bmp(_docs(spark, sf_dir))
    return multimodal.ahash(b, side=8)


@q(
    "mm_ahash_dups",
    _AHASH_CTE
    + """
    SELECT hash_hex,
           CAST(count(*) AS BIGINT) AS n_dups,
           CAST(min(doc_id) AS BIGINT) AS keep_doc_id
    FROM hh GROUP BY 1 HAVING count(*) >= 2
    """,
)
def mm_ahash_dups(spark, sf_dir):
    """Perceptual-duplicate clusters: group on the exact aHash —
    catches re-encodes/brightness-shifted copies byte-md5 cannot,
    with the same one-shuffle keep-smallest-id shape as
    doc_dedup_exact (see multimodal.ahash)."""
    b = multimodal.docs_as_bmp(_docs(spark, sf_dir))
    return (
        multimodal.ahash(b, side=8)
        .groupBy("hash_hex")
        .agg(
            F.count("*").cast("bigint").alias("n_dups"),
            F.min("doc_id").cast("bigint").alias("keep_doc_id"),
        )
        .where(F.col("n_dups") >= 2)
    )


@q(
    "seq_flops_budget",
    _synth_cte()
    + """
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS sum_tok,
           CAST(sum(n_tok * n_tok) AS BIGINT) AS sum_tok_sq,
           CAST(max(n_tok) AS BIGINT) AS max_tok,
           CAST(count(*) * max(n_tok) * max(n_tok) AS BIGINT) AS pad_flops,
           CAST(round((1.0 - CAST(sum(n_tok * n_tok) AS DOUBLE)
                / CAST(count(*) * max(n_tok) * max(n_tok) AS DOUBLE)) * 1e6)
             AS BIGINT) AS attn_save_e6
    FROM seq GROUP BY source
    """,
)
def seq_flops_budget(spark, sf_dir):
    """Attention-FLOPs planning per source: Σn² (packed, block-
    diagonal attention) vs n_docs·max² (pad-to-longest) and the
    fractional saving — the cost model that justifies the packing
    pipeline (seq_packing) in compute terms, all exact integers."""
    s = _seq(spark)
    pad = (
        F.count("*") * F.max("n_tok") * F.max("n_tok")
    ).cast("bigint")
    return s.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("sum_tok"),
        F.sum(F.col("n_tok") * F.col("n_tok"))
        .cast("bigint")
        .alias("sum_tok_sq"),
        F.max("n_tok").cast("bigint").alias("max_tok"),
        pad.alias("pad_flops"),
        F.round(
            (
                F.lit(1.0)
                - F.sum(F.col("n_tok") * F.col("n_tok")).cast("double")
                / pad.cast("double")
            )
            * 1e6
        )
        .cast("bigint")
        .alias("attn_save_e6"),
    )


@q(
    "ts_hill_tail",
    """
    WITH v AS (
      SELECT event_type AS sid,
             CAST(round(value * 1000.0) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL
    ),
    r AS (
      SELECT sid, v,
             row_number() OVER (PARTITION BY sid ORDER BY v DESC) AS rn,
             CAST(count(*) OVER (PARTITION BY sid) AS BIGINT) AS n,
             CAST(floor(CAST(count(*) OVER (PARTITION BY sid) AS BIGINT)
                        * 0.05) AS BIGINT) AS k
      FROM v
    ),
    u AS (
      SELECT sid, v AS uu FROM r WHERE rn = k + 1
    ),
    top AS (
      SELECT r.sid, r.n,
             CAST(round(ln(CAST(r.v AS DOUBLE) / CAST(u.uu AS DOUBLE))
                        * 1e9) AS BIGINT) AS t9,
             u.uu
      FROM r JOIN u ON u.sid = r.sid
      WHERE r.rn <= r.k AND u.uu > 0
    ),
    a AS (
      SELECT sid, max(n) AS n, CAST(count(*) AS BIGINT) AS k,
             max(uu) AS u_grid, sum(t9) AS s9
      FROM top GROUP BY 1
    )
    SELECT sid AS series_id, n, k, u_grid AS u_e3,
           CAST(round(CAST(s9 AS DOUBLE)
                / (CAST(k AS DOUBLE) * 1e9) * 1e6) AS BIGINT) AS xi_e6,
           CASE WHEN CAST(s9 AS DOUBLE) / (CAST(k AS DOUBLE) * 1e9) > 0
                THEN CAST(round(1.0 / (CAST(s9 AS DOUBLE)
                     / (CAST(k AS DOUBLE) * 1e9)) * 1e6) AS BIGINT)
           END AS alpha_e6
    FROM a
    """,
)
def ts_hill_tail(spark, sf_dir):
    """Hill tail-index per event type over raw e3-grid values — exact
    order-statistic threshold at the top 5%, pre-quantized bigint log
    terms so the sum is order-free (see analytics.hill_tail).
    Quantiles say where the tail starts; this says how fast it keeps
    growing."""
    return analytics.hill_tail(
        _ev(spark, sf_dir), key_col="event_type", value_col="value",
    )


def _esd_oracle_sql(rounds: int = 3) -> str:
    """DuckDB mirror of analytics.esd_outliers: the remove-and-
    recompute cascade unrolled — each round re-aggregates the exact
    bigint sums over the shrunken set (identical integers to Spark's
    subtract-the-pick arithmetic) and extracts the studentized argmax
    with the earliest-epoch tie-break."""
    m = "CAST(s AS DOUBLE) / CAST(n AS DOUBLE)"
    var = (
        f"CAST(q AS DOUBLE) / CAST(n AS DOUBLE) - ({m}) * ({m})"
    )
    score = f"abs(CAST(v AS DOUBLE) - {m}) / sqrt({var})"
    parts = [
        """
    WITH b0 AS (
      SELECT event_type AS sid,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ep,
             CAST(round(avg(value) * 1000.0) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    )"""
    ]
    sel = []
    for r in range(1, rounds + 1):
        i = r - 1
        parts.append(f"""
    , st{r} AS (
      SELECT sid, CAST(count(*) AS BIGINT) AS n,
             sum(v) AS s, sum(v * v) AS q
      FROM b{i} GROUP BY 1
    ),
    sc{r} AS (
      SELECT b{i}.sid, b{i}.ep, b{i}.v, st{r}.n,
             {score} AS sc,
             row_number() OVER (PARTITION BY b{i}.sid
               ORDER BY {score} DESC, b{i}.ep ASC) AS rn
      FROM b{i} JOIN st{r} ON st{r}.sid = b{i}.sid
      WHERE st{r}.n >= 3
        AND {var} > 0
    ),
    p{r} AS (SELECT * FROM sc{r} WHERE rn = 1)""")
        if r < rounds:
            parts.append(f"""
    , b{r} AS (
      SELECT b{i}.* FROM b{i}
      LEFT JOIN p{r} ON p{r}.sid = b{i}.sid AND p{r}.ep = b{i}.ep
      WHERE p{r}.sid IS NULL
        AND b{i}.sid IN (SELECT sid FROM p{r})
    )""")
        sel.append(
            f"SELECT sid AS series_id, CAST({r} AS BIGINT) AS round, "
            f"ep AS epoch, v AS v_e3, "
            f"CAST(round(sc * 1e6) AS BIGINT) AS score_e6, "
            f"n AS n_used FROM p{r}"
        )
    return "".join(parts) + "\n" + "\nUNION ALL\n".join(sel)


@q("ts_esd3", _esd_oracle_sql())
def ts_esd3(spark, sf_dir):
    """Three ESD outlier-extraction rounds per event type on hourly
    e3-grid means — studentize, extract the extreme, REMOVE it,
    recompute (un-masking the outliers single-pass z-scores hide);
    the iteration is a fixed-depth chained plan, not a driver loop
    (see analytics.esd_outliers)."""
    return analytics.esd_outliers(
        _ev(spark, sf_dir), key_col="event_type", ts_col="ts",
        value_col="value", trunc="hour", rounds=3,
    )


def _char_entropy_oracle_sql() -> str:
    """DuckDB mirror of textops.char_entropy: per-char length-diff
    counts and the entropy fold added in the same fixed alphabet
    order."""
    alphabet = textops.CHAR_ENTROPY_ALPHABET
    cnt = lambda c: (  # noqa: E731
        f"(strlen(trim(text)) - strlen(replace(trim(text), '{c}', '')))"
    )
    cols = ",\n        ".join(
        f"CAST({cnt(c)} AS BIGINT) AS c{i}"
        for i, c in enumerate(alphabet)
    )
    total = " + ".join(f"c{i}" for i in range(len(alphabet)))
    term = lambda i: (  # noqa: E731
        f"CASE WHEN c{i} > 0 THEN (-(CAST(c{i} AS DOUBLE) / ld))"
        f" * log2(CAST(c{i} AS DOUBLE) / ld) ELSE 0.0 END"
    )
    h = " + ".join(term(i) for i in range(len(alphabet)))
    nd = " + ".join(
        f"CASE WHEN c{i} > 0 THEN 1 ELSE 0 END"
        for i in range(len(alphabet))
    )
    return f"""
    WITH c AS (
      SELECT doc_id,
        {cols}
      FROM documents
    ),
    t AS (
      SELECT doc_id, CAST({total} AS BIGINT) AS n_counted,
             CAST({nd} AS BIGINT) AS n_distinct_chars,
             CAST({total} AS DOUBLE) AS ld,
             * FROM c
    )
    SELECT doc_id, n_counted, n_distinct_chars,
           CASE WHEN n_counted > 0
                THEN CAST(round(({h}) * 1e6) AS BIGINT)
           END AS entropy_e6
    FROM t
    """


@q("doc_char_entropy", _char_entropy_oracle_sql())
def doc_char_entropy(spark, sf_dir):
    """Character-distribution Shannon entropy per doc over a fixed
    37-char alphabet — zero-shuffle row-local length-difference
    counts, identical left-to-right entropy fold both engines (see
    textops.char_entropy); the cheap binary-junk / degenerate-
    repetition filter next to doc_quality and doc_repetition."""
    return textops.char_entropy(_docs(spark, sf_dir))


@q(
    "mm_hamming_pairs",
    _AHASH_CTE
    + """
    , bd AS (
      SELECT doc_id, g // 16 AS band,
             CAST(sum(bit * (1 << (15 - g % 16))) AS BIGINT) AS bits
      FROM bits GROUP BY 1, 2
    ),
    h4 AS (
      SELECT doc_id,
             max(CASE WHEN band = 0 THEN bits END) AS b0,
             max(CASE WHEN band = 1 THEN bits END) AS b1,
             max(CASE WHEN band = 2 THEN bits END) AS b2,
             max(CASE WHEN band = 3 THEN bits END) AS b3
      FROM bd GROUP BY 1
    ),
    sized AS (
      SELECT band, bits, doc_id FROM bd
      QUALIFY count(*) OVER (PARTITION BY band, bits) BETWEEN 2 AND 1000
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sized a JOIN sized b
        ON b.band = a.band AND b.bits = a.bits AND a.doc_id < b.doc_id
    )
    SELECT c.id_a, c.id_b,
           CAST(bit_count(xor(ha.b0, hb.b0)) + bit_count(xor(ha.b1, hb.b1))
              + bit_count(xor(ha.b2, hb.b2)) + bit_count(xor(ha.b3, hb.b3))
             AS BIGINT) AS hamming
    FROM cand c
    JOIN h4 ha ON ha.doc_id = c.id_a
    JOIN h4 hb ON hb.doc_id = c.id_b
    WHERE bit_count(xor(ha.b0, hb.b0)) + bit_count(xor(ha.b1, hb.b1))
        + bit_count(xor(ha.b2, hb.b2)) + bit_count(xor(ha.b3, hb.b3)) <= 3
    """,
)
def mm_hamming_pairs(spark, sf_dir):
    """Near-duplicate image pairs within Hamming distance 3 of their
    aHash via the banded-pigeonhole equi-join (exhaustive for d<4 —
    two hashes that close MUST share a full 16-bit band), exact
    4-term popcount verify, hot buckets capped (see
    multimodal.hamming_pairs) — doc_simhash_pairs re-expressed for
    the image modality, composing on the stored hash without
    re-decoding a payload byte."""
    b = multimodal.docs_as_bmp(_docs(spark, sf_dir))
    return multimodal.hamming_pairs(multimodal.ahash(b, side=8))


def _erank_oracle_sql(dims: int = 16) -> str:
    """DuckDB mirror of simsearch.effective_rank: identical cov trees
    and fixed-order trace/Frobenius folds. The 136-term Frobenius
    chain is split across CTE layers at left-associative prefix
    points (x+y+z ≡ (x+y)+z, so naming a prefix and continuing from
    the name is the SAME IEEE tree) — DuckDB's binder caps expression
    depth at 128."""
    q6 = lambda expr: f"CAST(round({expr} * 1e6) AS BIGINT)"  # noqa: E731
    s_cols = ",\n        ".join(
        f"CAST(sum({q6(f'CAST(embedding[{d + 1}] AS DOUBLE)')}) AS BIGINT)"
        f" AS s{d}"
        for d in range(dims)
    )
    p_cols = ",\n        ".join(
        f"CAST(sum({q6(f'CAST(embedding[{d + 1}] AS DOUBLE)')}"
        f" * {q6(f'CAST(embedding[{d2 + 1}] AS DOUBLE)')}) AS BIGINT)"
        f" AS p{d}_{d2}"
        for d in range(dims)
        for d2 in range(d, dims)
    )

    def cov(d, d2):
        return (
            f"(CAST(p{d}_{d2} AS DOUBLE) / CAST(n AS DOUBLE)"
            f" - (CAST(s{d} AS DOUBLE) / CAST(n AS DOUBLE))"
            f" * (CAST(s{d2} AS DOUBLE) / CAST(n AS DOUBLE)))"
        )

    c_cols = ",\n        ".join(
        f"{cov(d, d2)} AS c{d}_{d2}"
        for d in range(dims)
        for d2 in range(d, dims)
    )
    tr = " + ".join(f"c{d}_{d}" for d in range(dims))
    fro_terms = []
    for d in range(dims):
        for d2 in range(d, dims):
            t = f"(c{d}_{d2} * c{d}_{d2})"
            if d2 > d:
                t = f"({t} * 2.0)"
            fro_terms.append(t)
    fa = " + ".join(fro_terms[:60])
    fb = " + ".join(fro_terms[60:120])
    fc = " + ".join(fro_terms[120:])
    return f"""
    WITH e AS (
      SELECT embedding FROM embeddings WHERE embedding IS NOT NULL
    ),
    a AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
        {s_cols},
        {p_cols}
      FROM e
    ),
    cv AS (
      SELECT n,
        {c_cols}
      FROM a
    ),
    l1 AS (
      SELECT n, {tr} AS tr, {fa} AS f1, * FROM cv
    ),
    l2 AS (
      SELECT n, tr, f1 + {fb} AS f2, * FROM l1
    ),
    l3 AS (
      SELECT n, tr, f2 + {fc} AS fro FROM l2
    )
    SELECT n, CAST({dims} AS BIGINT) AS dims,
           CAST(round(tr / 1e6) AS BIGINT) AS trace_e6,
           CASE WHEN fro > 0
                THEN CAST(round(tr * tr / fro * 1e6) AS BIGINT)
           END AS erank_e6
    FROM l3
    """


@q("emb_effective_rank", _erank_oracle_sql())
def emb_effective_rank(spark, sf_dir):
    """Participation-ratio effective rank (Σλ)²/Σλ² of the embedding
    covariance over the first 16 dims — the representation-collapse
    dial, computed WITHOUT eigendecomposition from exact e6-grid
    sums (see simsearch.effective_rank)."""
    return simsearch.effective_rank(_emb(spark, sf_dir), dims=16)


@q(
    "ts_burstiness",
    """
    WITH g AS (
      SELECT event_type AS sid,
             CAST(floor(CAST(epoch_us(ts)
               - lag(epoch_us(ts))
                 OVER (PARTITION BY event_type ORDER BY ts)
               AS DOUBLE) / 1000.0) AS BIGINT) AS gp
      FROM events
    ),
    a AS (
      SELECT sid, CAST(count(*) AS BIGINT) AS n_gaps,
             sum(gp) AS s, sum(gp * gp) AS q
      FROM g WHERE gp IS NOT NULL GROUP BY 1
    )
    SELECT sid AS series_id, n_gaps,
           CAST(round(CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE))
             AS BIGINT) AS mean_gap_ms,
           CASE WHEN sqrt(CAST(q AS DOUBLE) / CAST(n_gaps AS DOUBLE)
                  - (CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE))
                    * (CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE)))
                  + CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE) > 0
                THEN CAST(round((sqrt(CAST(q AS DOUBLE) / CAST(n_gaps AS DOUBLE)
                       - (CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE))
                         * (CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE)))
                     - CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE))
                     / (sqrt(CAST(q AS DOUBLE) / CAST(n_gaps AS DOUBLE)
                       - (CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE))
                         * (CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE)))
                     + CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE)) * 1e6)
                     AS BIGINT)
           END AS b_e6
    FROM a
    """,
)
def ts_burstiness(spark, sf_dir):
    """Goh-Barabási burstiness B = (σ−μ)/(σ+μ) of raw interarrival
    gaps per event type — the single bounded periodic-vs-Poisson-vs-
    bursty number next to interarrival_stats' quantiles (see
    analytics.burstiness). Exact integer gap sums."""
    return analytics.burstiness(
        _ev(spark, sf_dir), key_col="event_type", ts_col="ts",
    )


@q(
    "ts_apdex",
    """
    WITH a AS (
      SELECT event_type AS sid,
             CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS bucket_epoch,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN value <= 100.0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_sat,
             CAST(sum(CASE WHEN value > 100.0 AND value <= 400.0
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_tol
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    )
    SELECT sid AS series_id, bucket_epoch, n, n_sat, n_tol,
           CAST(round((CAST(n_sat AS DOUBLE)
                + CAST(n_tol AS DOUBLE) / 2.0)
                / CAST(n AS DOUBLE) * 1e6) AS BIGINT) AS apdex_e6
    FROM a
    """,
)
def ts_apdex(spark, sf_dir):
    """Apdex per (event type, day) at T=100: satisfied / tolerating /
    frustrated exact counts and the standard SLO scalar (see
    analytics.apdex)."""
    return analytics.apdex(
        _ev(spark, sf_dir), key_col="event_type", ts_col="ts",
        value_col="value", threshold=100.0, trunc="day",
    )


@q(
    "ts_mann_kendall",
    _HOURLY_E3
    + """
    , p AS (
      SELECT l.sid,
             CASE WHEN r.v > l.v THEN 1
                  WHEN r.v < l.v THEN -1 ELSE 0 END AS sg
      FROM b l JOIN b r ON l.sid = r.sid AND l.ep < r.ep
    ),
    s AS (SELECT sid, CAST(sum(sg) AS BIGINT) AS s_stat FROM p GROUP BY 1),
    tc AS (SELECT sid, v, CAST(count(*) AS BIGINT) AS t FROM b GROUP BY 1, 2),
    ties AS (
      SELECT sid, CAST(count(*) AS BIGINT) AS n_values,
             CAST(sum(t) AS BIGINT) AS n_buckets,
             CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
      FROM tc GROUP BY 1
    )
    SELECT ties.sid AS series_id, n_buckets, n_values,
           COALESCE(s_stat, 0) AS s_stat,
           CASE WHEN n_buckets >= 2
                 AND (CAST(n_buckets AS DOUBLE)
                      * (CAST(n_buckets AS DOUBLE) - 1.0)
                      * (2.0 * CAST(n_buckets AS DOUBLE) + 5.0)
                      - CAST(tie_term AS DOUBLE)) / 18.0 > 0
                THEN CAST(round(CASE
                  WHEN s_stat > 0 THEN (CAST(s_stat AS DOUBLE) - 1.0)
                    / sqrt((CAST(n_buckets AS DOUBLE)
                            * (CAST(n_buckets AS DOUBLE) - 1.0)
                            * (2.0 * CAST(n_buckets AS DOUBLE) + 5.0)
                            - CAST(tie_term AS DOUBLE)) / 18.0)
                  WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE) + 1.0)
                    / sqrt((CAST(n_buckets AS DOUBLE)
                            * (CAST(n_buckets AS DOUBLE) - 1.0)
                            * (2.0 * CAST(n_buckets AS DOUBLE) + 5.0)
                            - CAST(tie_term AS DOUBLE)) / 18.0)
                  ELSE 0.0 END * 1e6) AS BIGINT)
           END AS z_e6
    FROM ties LEFT JOIN s USING (sid)
    """,
)
def ts_mann_kendall(spark, sf_dir):
    """Mann-Kendall monotone-trend test per event type over hourly
    e3-grid means: exact-integer S = Σ sign(v_j − v_i), tie-corrected
    variance, ±1 continuity correction (see analytics.mann_kendall).
    theil_sen reports the robust SLOPE; this reports whether a
    monotone trend EXISTS, with no linearity assumption."""
    return analytics.mann_kendall(
        _ev(spark, sf_dir), key_col="event_type", ts_col="ts",
        value_col="value", trunc="hour",
    )


@q(
    "ts_partial_corr",
    _HOURLY_E3
    + """
    , tri AS (
      SELECT x.sid AS series_x, y.sid AS series_y, z.sid AS series_z,
             x.v AS xv, y.v AS yv, z.v AS zv
      FROM b x
      JOIN b y ON x.ep = y.ep AND x.sid < y.sid
      JOIN b z ON z.ep = x.ep AND z.sid != x.sid AND z.sid != y.sid
    ),
    a AS (
      SELECT series_x, series_y, series_z, CAST(count(*) AS BIGINT) AS n,
             sum(xv) AS sx, sum(yv) AS sy, sum(zv) AS sz,
             sum(xv * yv) AS sxy, sum(xv * zv) AS sxz, sum(yv * zv) AS syz,
             sum(xv * xv) AS sxx, sum(yv * yv) AS syy, sum(zv * zv) AS szz
      FROM tri GROUP BY 1, 2, 3
    ),
    m AS (
      SELECT series_x, series_y, series_z, n,
        CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
        CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy,
        CAST(n AS DOUBLE) * CAST(szz AS DOUBLE)
          - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE) AS vz,
        CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS mxy,
        CAST(n AS DOUBLE) * CAST(sxz AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE) AS mxz,
        CAST(n AS DOUBLE) * CAST(syz AS DOUBLE)
          - CAST(sy AS DOUBLE) * CAST(sz AS DOUBLE) AS myz
      FROM a
    ),
    r AS (
      SELECT series_x, series_y, series_z, n, vx, vy, vz,
             mxy / sqrt(vx * vy) AS rxy,
             mxz / sqrt(vx * vz) AS rxz,
             myz / sqrt(vy * vz) AS ryz
      FROM m
    )
    SELECT series_x, series_y, series_z, n AS n_obs,
           CASE WHEN n >= 3 AND vx > 0 AND vy > 0 AND vz > 0
                THEN CAST(round(rxy * 1e6) AS BIGINT)
           END AS rxy_e6,
           CASE WHEN n >= 3 AND vx > 0 AND vy > 0 AND vz > 0
                 AND (1.0 - rxz * rxz) * (1.0 - ryz * ryz) > 0
                THEN CAST(round((rxy - rxz * ryz)
                     / sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz))
                     * 1e6) AS BIGINT)
           END AS pcorr_e6
    FROM r
    """,
)
def ts_partial_corr(spark, sf_dir):
    """First-order partial correlation (x, y | z) for every series
    triple on TRIPLE-complete hourly bucket epochs — the confounder
    audit over corr_matrix's raw r: does x-y co-movement survive
    conditioning on z (see analytics.partial_corr)? All ten sums are
    exact e3-grid bigints over the same epoch sample."""
    return analytics.partial_corr(
        _ev(spark, sf_dir), key_col="event_type", ts_col="ts",
        value_col="value", trunc="hour",
    )


@q(
    "ts_adf",
    _HOURLY_E3
    + """
    , pr AS (
      SELECT sid, ep, v,
             lag(ep) OVER (PARTITION BY sid ORDER BY ep) AS pep,
             lag(v) OVER (PARTITION BY sid ORDER BY ep) AS pv
      FROM b
    ),
    pairs AS (
      SELECT sid, pv AS x, v - pv AS y
      FROM pr WHERE pep = ep - 3600
    ),
    a AS (
      SELECT sid, CAST(count(*) AS BIGINT) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
      FROM pairs GROUP BY 1
    ),
    m AS (
      SELECT sid, n,
        CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS mxx,
        CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS mxy,
        CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS myy
      FROM a
    )
    SELECT sid AS series_id, n AS n_obs,
           CASE WHEN n >= 3 AND mxx > 0
                THEN CAST(round(mxy / mxx * 1e9) AS BIGINT)
           END AS rho_e9,
           CASE WHEN n >= 3 AND mxx > 0
                 AND myy - mxy * mxy / mxx > 0
                THEN CAST(round(mxy / mxx
                     / sqrt((myy - mxy * mxy / mxx)
                            / ((CAST(n AS DOUBLE) - 2.0) * mxx))
                     * 1e6) AS BIGINT)
           END AS adf_t_e6
    FROM m
    """,
)
def ts_adf(spark, sf_dir):
    """Dickey-Fuller unit-root t per event type over consecutive
    hourly e3-grid buckets — strongly negative = mean-reverting,
    ~0 = random walk (see analytics.adf_test). cointegration runs
    this regression on pair SPREADS; this tests each series alone."""
    return analytics.adf_test(
        _ev(spark, sf_dir), key_col="event_type", ts_col="ts",
        value_col="value", trunc="hour",
    )


@q(
    "ts_seasonal_mk",
    _HOURLY_E3
    + """
    , bb AS (SELECT sid, ep, CAST(ep / 3600 % 24 AS INT) AS hod, v FROM b),
    p AS (
      SELECT l.sid,
             CASE WHEN r.v > l.v THEN 1
                  WHEN r.v < l.v THEN -1 ELSE 0 END AS sg
      FROM bb l JOIN bb r
        ON l.sid = r.sid AND l.hod = r.hod AND l.ep < r.ep
    ),
    s AS (SELECT sid, CAST(sum(sg) AS BIGINT) AS s_stat FROM p GROUP BY 1),
    tc AS (
      SELECT sid, hod, v, CAST(count(*) AS BIGINT) AS t
      FROM bb GROUP BY 1, 2, 3
    ),
    gv AS (
      SELECT sid, hod, CAST(sum(t) AS BIGINT) AS ng,
             CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_g
      FROM tc GROUP BY 1, 2
    ),
    ties AS (
      SELECT sid, CAST(sum(ng) AS BIGINT) AS n_buckets,
             CAST(count(*) AS BIGINT) AS n_seasons,
             CAST(sum(ng * (ng - 1) * (2 * ng + 5) - tie_g) AS BIGINT)
               AS var18
      FROM gv GROUP BY 1
    )
    SELECT ties.sid AS series_id, n_buckets, n_seasons,
           COALESCE(s_stat, 0) AS s_stat,
           CASE WHEN CAST(var18 AS DOUBLE) / 18.0 > 0
                THEN CAST(round(CASE
                  WHEN s_stat > 0 THEN (CAST(s_stat AS DOUBLE) - 1.0)
                    / sqrt(CAST(var18 AS DOUBLE) / 18.0)
                  WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE) + 1.0)
                    / sqrt(CAST(var18 AS DOUBLE) / 18.0)
                  ELSE 0.0 END * 1e6) AS BIGINT)
           END AS z_e6
    FROM ties LEFT JOIN s USING (sid)
    """,
)
def ts_seasonal_mk(spark, sf_dir):
    """Seasonal Mann-Kendall per event type with hour-of-day seasons
    — sign pairs only within the same hour across days, so a diurnal
    profile cannot dilute or fake the trend plain mann_kendall sees
    (see analytics.seasonal_mann_kendall). The hydrology standard."""
    return analytics.seasonal_mann_kendall(
        _ev(spark, sf_dir), key_col="event_type", ts_col="ts",
        value_col="value",
    )


@q(
    "ts_distinct_cascade",
    """
    SELECT event_type AS series_id,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
           TRUE AS direct_ok, TRUE AS merged_ok
    FROM events GROUP BY 1
    """,
)
def ts_distinct_cascade(spark, sf_dir, lg_k: int = 12):
    """Tier-cascadable distinct counts: a datasketches HLL sketch per
    (series, hour) — the form a 1h continuous-aggregate tier would
    STORE — unioned up to the series level, vs the direct one-shot
    sketch over raw, both bound-checked against the exact count at
    5σ·rsd(lgK=12 ≈ 1.625%) + 1. Merged and direct estimates differ
    (the union target re-codes registers) but BOTH must sit inside
    the bound — the mergeability contract that lets a 1d tier answer
    distinct-user queries without rescanning raw. approx_distinct's
    HLL++ twin is one-shot; this is the cascade form."""
    ev = _ev(spark, sf_dir)
    k = F.lit(lg_k)
    direct = ev.groupBy(F.col("event_type").alias("series_id")).agg(
        F.count_distinct("user_id").alias("exact_distinct"),
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", k)).alias("d_est"),
    )
    merged = (
        ev.groupBy(
            F.col("event_type").alias("series_id"),
            F.date_trunc("hour", "ts").alias("_h"),
        )
        .agg(F.hll_sketch_agg("user_id", k).alias("sk"))
        .groupBy("series_id")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("m_est"))
    )
    rsd = 1.04 / (2 ** (lg_k / 2.0))
    bound = 5.0 * rsd * F.col("exact_distinct") + F.lit(1.0)
    return (
        direct.join(merged, "series_id")
        .select(
            "series_id",
            "exact_distinct",
            (F.abs(F.col("d_est") - F.col("exact_distinct")) <= bound)
            .alias("direct_ok"),
            (F.abs(F.col("m_est") - F.col("exact_distinct")) <= bound)
            .alias("merged_ok"),
        )
    )


@q(
    "doc_gopher_rules",
    """
    WITH w AS (
      SELECT doc_id,
             string_split_regex(trim(text), '\\s+') AS ws,
             string_split_regex(text, '\\n') AS ls,
             text
      FROM documents
    ),
    c AS (
      SELECT doc_id,
             CAST(len(ws) AS BIGINT) AS n,
             CAST(list_sum(list_transform(ws, x -> length(x)))
               AS BIGINT) AS sl,
             CAST(len(list_filter(ws, x -> contains(x, '#')
                  OR contains(x, '...') OR contains(x, '…')))
               AS BIGINT) AS nsym,
             CAST(len(ls) AS BIGINT) AS nl,
             CAST(len(list_filter(ls, x -> starts_with(trim(x), '•')
                  OR starts_with(trim(x), '-')
                  OR starts_with(trim(x), '*'))) AS BIGINT) AS nb,
             CAST(len(list_filter(ls, x -> ends_with(x, '...')
                  OR ends_with(x, '…'))) AS BIGINT) AS ne,
             CAST(len(list_filter(ws,
                  x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS na,
             CAST(len(list_distinct(list_filter(ws,
                  x -> x IN ('the','be','to','of','and','that',
                             'have','with')))) AS BIGINT) AS nst
      FROM w
    )
    SELECT doc_id,
           n AS n_words, sl AS sum_word_len, nsym AS n_symbol_words,
           nl AS n_lines, nb AS n_bullet_lines, ne AS n_ellipsis_lines,
           na AS n_alpha_words, nst AS n_stopwords,
           (n >= 50 AND n <= 100000) AS ok_word_count,
           (3 * n <= sl AND sl <= 10 * n) AS ok_word_len,
           (10 * nsym <= n) AS ok_symbol_ratio,
           (10 * nb <= 9 * nl) AS ok_bullets,
           (10 * ne <= 3 * nl) AS ok_ellipsis,
           (5 * na >= 4 * n) AS ok_alpha,
           (nst >= 2) AS ok_stopwords,
           ((n >= 50 AND n <= 100000) AND (3 * n <= sl AND sl <= 10 * n)
            AND (10 * nsym <= n) AND (10 * nb <= 9 * nl)
            AND (10 * ne <= 3 * nl) AND (5 * na >= 4 * n)
            AND (nst >= 2)) AS gopher_pass
    FROM c
    """,
)
def doc_gopher_rules(spark, sf_dir):
    """The published Gopher quality thresholds as a per-doc pass/fail
    vector — every comparison integer cross-multiplication, zero
    float, one codegen projection (see textops.gopher_rules)."""
    return textops.gopher_rules(_docs(spark, sf_dir))


@q(
    "doc_c4_filters",
    """
    WITH w AS (
      SELECT doc_id, text,
             string_split_regex(text, '\\n') AS ls
      FROM documents
    ),
    c AS (
      SELECT doc_id, text,
             CAST(len(ls) AS BIGINT) AS nl,
             CAST(len(list_filter(ls,
                  x -> (ends_with(trim(x), '.') OR ends_with(trim(x), '!')
                        OR ends_with(trim(x), '?')
                        OR ends_with(trim(x), '"'))
                   AND len(string_split_regex(trim(x), '\\s+')) >= 5))
               AS BIGINT) AS nk,
             CAST(len(string_split_regex(text, '[.!?]')) - 1
               AS BIGINT) AS ns,
             contains(lower(text), 'lorem ipsum') AS lorem,
             contains(text, '{') AS brace
      FROM w
    )
    SELECT doc_id, nl AS n_lines, nk AS n_kept_lines, ns AS n_sentences,
           lorem AS has_lorem, brace AS has_brace,
           CAST(round(CAST(nk AS DOUBLE) / CAST(nl AS DOUBLE) * 1e6)
             AS BIGINT) AS kept_frac_e6,
           (nk >= 1 AND ns >= 3 AND NOT lorem AND NOT brace) AS c4_pass
    FROM c
    """,
)
def doc_c4_filters(spark, sf_dir):
    """The published C4 cleaning heuristics as a per-doc audit:
    terminal-punctuation ≥5-word line keeps, ≥3-sentence page rule,
    lorem-ipsum / curly-brace discards (see textops.c4_filters)."""
    return textops.c4_filters(_docs(spark, sf_dir))


@q(
    "ts_matrix_profile",
    _HOURLY_E3
    + """
    , bb AS (SELECT sid, ep - ep % 86400 AS dy, ep, v FROM b),
    t AS (
      SELECT sid, dy, ep, v AS v0,
             CASE WHEN lead(ep, 1) OVER w = ep + 3600
                  THEN lead(v, 1) OVER w END AS v1,
             CASE WHEN lead(ep, 2) OVER w = ep + 7200
                  THEN lead(v, 2) OVER w END AS v2,
             CASE WHEN lead(ep, 3) OVER w = ep + 10800
                  THEN lead(v, 3) OVER w END AS v3,
             lead(ep, 1) OVER w AS e1, lead(ep, 2) OVER w AS e2,
             lead(ep, 3) OVER w AS e3
      FROM bb WINDOW w AS (PARTITION BY sid, dy ORDER BY ep)
    ),
    wins AS (
      SELECT sid, dy, ep, v0, v1, v2, v3 FROM t
      WHERE e1 = ep + 3600 AND e2 = ep + 7200 AND e3 = ep + 10800
    ),
    nw AS (
      SELECT sid, dy, CAST(count(*) AS BIGINT) AS n_windows
      FROM wins GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.sid, a.dy, a.ep AS ea, c.ep AS eb,
             (a.v0 - c.v0) * (a.v0 - c.v0)
           + (a.v1 - c.v1) * (a.v1 - c.v1)
           + (a.v2 - c.v2) * (a.v2 - c.v2)
           + (a.v3 - c.v3) * (a.v3 - c.v3) AS d
      FROM wins a JOIN wins c
        ON a.sid = c.sid AND a.dy = c.dy
       AND abs(c.ep - a.ep) >= 14400
    ),
    prof AS (
      SELECT sid, dy, ea, min(d) AS p FROM pairs GROUP BY 1, 2, 3
    ),
    disc AS (
      SELECT sid, dy, ea, p,
             row_number() OVER (PARTITION BY sid, dy
                                ORDER BY p DESC, ea ASC) AS rn
      FROM prof
    ),
    mot AS (
      SELECT sid, dy, ea, eb, d,
             row_number() OVER (PARTITION BY sid, dy
                                ORDER BY d ASC, ea ASC, eb ASC) AS rn
      FROM pairs WHERE ea < eb
    )
    SELECT nw.sid AS series_id, nw.dy AS day_epoch, nw.n_windows,
           disc.ea AS discord_epoch, CAST(disc.p AS BIGINT) AS discord_dist,
           CAST(mot.d AS BIGINT) AS motif_dist,
           mot.ea AS motif_epoch_a, mot.eb AS motif_epoch_b
    FROM nw
    LEFT JOIN disc ON disc.sid = nw.sid AND disc.dy = nw.dy AND disc.rn = 1
    LEFT JOIN mot ON mot.sid = nw.sid AND mot.dy = nw.dy AND mot.rn = 1
    """,
)
def ts_matrix_profile(spark, sf_dir):
    """Matrix-profile discord + motif per (event type, day): each
    complete 4-hour window's min distance to a non-overlapping
    window, all integer-exact (see analytics.matrix_profile_daily).
    The shape-anomaly lens point-wise z-scores cannot see."""
    return analytics.matrix_profile_daily(
        _ev(spark, sf_dir), key_col="event_type", ts_col="ts",
        value_col="value",
    )


@q(
    "ts_sen_ci",
    _HOURLY_E3
    + """
    , nb AS (SELECT sid, CAST(count(*) AS BIGINT) AS n_buckets
             FROM b GROUP BY 1),
    sl AS (
      SELECT l.sid,
             CAST(round(CAST(r.v - l.v AS DOUBLE) * 3.6
                  / CAST(r.ep - l.ep AS DOUBLE) * 1e6) AS BIGINT) AS s
      FROM b l JOIN b r ON l.sid = r.sid AND l.ep < r.ep
    ),
    rk AS (
      SELECT sid, s,
             row_number() OVER (PARTITION BY sid ORDER BY s) AS rn
      FROM sl
    ),
    tc AS (SELECT sid, v, CAST(count(*) AS BIGINT) AS t
           FROM b GROUP BY 1, 2),
    ties AS (
      SELECT sid, CAST(sum(t) AS BIGINT) AS nb2,
             CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
      FROM tc GROUP BY 1
    ),
    st AS (
      SELECT rk.sid, CAST(count(*) AS BIGINT) AS n_pairs,
             (CAST(nb2 AS DOUBLE) * (CAST(nb2 AS DOUBLE) - 1.0)
              * (2.0 * CAST(nb2 AS DOUBLE) + 5.0)
              - CAST(tie_term AS DOUBLE)) / 18.0 AS var
      FROM rk JOIN ties ON ties.sid = rk.sid
      GROUP BY 1, nb2, tie_term
    ),
    rr AS (
      SELECT sid, n_pairs,
             greatest(CAST(1 AS BIGINT),
               CAST(floor((CAST(n_pairs AS DOUBLE)
                    - 1.96 * sqrt(var)) / 2.0) AS BIGINT)) AS rlo,
             least(n_pairs,
               CAST(floor((CAST(n_pairs AS DOUBLE)
                    + 1.96 * sqrt(var)) / 2.0) AS BIGINT) + 1) AS rhi
      FROM st
    ),
    ag AS (
      SELECT rk.sid, rr.n_pairs,
             CAST(sum(CASE WHEN rk.rn = CAST(floor(
                      (CAST(rr.n_pairs AS DOUBLE) + 1.0) / 2.0) AS BIGINT)
                        OR rk.rn = CAST(ceil(
                      (CAST(rr.n_pairs AS DOUBLE) + 1.0) / 2.0) AS BIGINT)
                      THEN rk.s * (CASE WHEN rr.n_pairs % 2 = 1
                                        THEN 2 ELSE 1 END)
                      ELSE NULL END) AS BIGINT) AS sen2_e6,
             CAST(min(CASE WHEN rk.rn = rr.rlo THEN rk.s END)
               AS BIGINT) AS ci_lo_e6,
             CAST(min(CASE WHEN rk.rn = rr.rhi THEN rk.s END)
               AS BIGINT) AS ci_hi_e6
      FROM rk JOIN rr ON rr.sid = rk.sid
      GROUP BY 1, 2
    )
    SELECT nb.sid AS series_id, nb.n_buckets,
           COALESCE(ag.n_pairs, 0) AS n_pairs,
           ag.sen2_e6, ag.ci_lo_e6, ag.ci_hi_e6
    FROM nb LEFT JOIN ag ON ag.sid = nb.sid
    """,
)
def ts_sen_ci(spark, sf_dir):
    """Sen's slope with the Gilbert rank-based confidence interval
    per event type — the estimator half of the Mann-Kendall trend
    package, order statistics over e6-quantized exact pairwise
    slopes (see analytics.sen_slope_ci)."""
    return analytics.sen_slope_ci(
        _ev(spark, sf_dir), key_col="event_type", ts_col="ts",
        value_col="value", trunc="hour",
    )


@q(
    "emb_semdedup",
    """
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    cents AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
    csim AS (
      SELECT e.vec_id AS nid, c.cid,
             CAST(ROUND(
               list_sum(list_transform(range(1, 65), i -> e.v[i] * c.cv[i]))
               / (sqrt(list_sum(list_transform(e.v, x -> x * x)))
                * sqrt(list_sum(list_transform(c.cv, x -> x * x))))
               * 1e6) AS BIGINT) AS s
      FROM e CROSS JOIN cents c
    ),
    assign AS (
      SELECT nid, cid, s AS c2c FROM (
        SELECT nid, cid, s,
               row_number() OVER (PARTITION BY nid ORDER BY s DESC, cid) AS r
        FROM csim
      ) WHERE r = 1
    ),
    pairs AS (
      SELECT a.cid, a.nid AS na, b.nid AS nb, a.c2c AS ca, b.c2c AS cb,
             CAST(ROUND(
               list_sum(list_transform(range(1, 65), i -> ea.v[i] * eb.v[i]))
               / (sqrt(list_sum(list_transform(ea.v, x -> x * x)))
                * sqrt(list_sum(list_transform(eb.v, x -> x * x))))
               * 1e6) AS BIGINT) AS sim
      FROM assign a
      JOIN assign b ON a.cid = b.cid AND a.nid < b.nid
      JOIN e ea ON ea.vec_id = a.nid
      JOIN e eb ON eb.vec_id = b.nid
    ),
    hits AS (SELECT * FROM pairs WHERE sim >= 400000),
    condemned AS (
      SELECT CASE WHEN ca > cb OR (ca = cb AND na > nb)
                  THEN na ELSE nb END AS nid
      FROM hits
    ),
    partners AS (
      SELECT nid, CAST(count(*) AS BIGINT) AS n_partners FROM (
        SELECT na AS nid FROM hits UNION ALL SELECT nb AS nid FROM hits
      ) GROUP BY 1
    ),
    rem AS (SELECT nid, count(*) AS nc FROM condemned GROUP BY 1)
    SELECT a.nid AS vec_id, a.cid, a.c2c AS c2c_e6,
           COALESCE(p.n_partners, 0) AS n_partners,
           (COALESCE(rem.nc, 0) > 0) AS removed
    FROM assign a
    LEFT JOIN partners p ON p.nid = a.nid
    LEFT JOIN rem ON rem.nid = a.nid
    """,
)
def emb_semdedup(spark, sf_dir):
    """SemDeDup per-vector keep/remove verdict: IVF-cluster-scoped
    cosine pairs ≥ τ condemn the member closer to the centroid —
    survivors are the diverse extremes (see simsearch.semdedup)."""
    return simsearch.semdedup(_emb(spark, sf_dir))


@q(
    "ts_stream_gapfill",
    """
    WITH e AS (
      SELECT event_type AS sid,
             CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS slot,
             CAST(round(value * 1000.0) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL
    ),
    wm AS (
      SELECT ((epoch_us(max(ts)) // 1000) - 7200000) // 1000 AS wm_s
      FROM events WHERE value IS NOT NULL
    ),
    slots AS (
      SELECT sid, slot, CAST(sum(v) AS BIGINT) AS sum_e3,
             CAST(count(*) AS BIGINT) AS cnt
      FROM e GROUP BY 1, 2
    ),
    bounds AS (
      SELECT s.sid, min(s.slot) AS lo,
             max(CASE WHEN s.slot + 60 <= wm.wm_s THEN s.slot END) AS hi
      FROM slots s, wm GROUP BY 1, wm.wm_s
    ),
    grid AS (
      SELECT sid, unnest(generate_series(lo, hi, 60)) AS g
      FROM bounds WHERE hi IS NOT NULL
    ),
    joined AS (
      SELECT g.sid, g.g, s.slot AS src, s.sum_e3, s.cnt
      FROM grid g LEFT JOIN slots s
        ON s.sid = g.sid AND s.slot = g.g
    )
    SELECT sid AS series_id, g AS slot_epoch,
           last_value(src IGNORE NULLS) OVER w AS src_slot_epoch,
           last_value(sum_e3 IGNORE NULLS) OVER w AS sum_e3,
           last_value(cnt IGNORE NULLS) OVER w AS cnt,
           (src IS NULL) AS filled
    FROM joined
    WINDOW w AS (PARTITION BY sid ORDER BY g
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def ts_stream_gapfill(spark, sf_dir):
    """streaming.stream_gapfill run to completion (availableNow) over
    the events table written as a fixed file set: the final
    append-mode output must equal the batch minute-grid forward fill
    restricted to watermark-sealed slots — grid bounds, fill sources,
    exact (sum_e3, cnt) slot aggregates, and the seal rule
    slot+60 ≤ max(ts)−2h all derived independently by DuckDB."""
    import tempfile
    import uuid

    from tokens_ts import streaming

    ev = _ev(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="stream_gapfill_")
    ev.write.mode("overwrite").parquet(d + "/in")
    schema = spark.read.parquet(d + "/in").schema
    src = spark.readStream.schema(schema).parquet(d + "/in")
    out = streaming.stream_gapfill(src, watermark="2 hours")
    name = "stream_gapfill_" + uuid.uuid4().hex[:8]
    sq = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", d + "/ck")
        .start()
    )
    sq.awaitTermination(600)
    return spark.table(name)


# ---------------------------------------------------------------------------
# Bloom filter: mergeable membership pre-filter + measured FPR
# ---------------------------------------------------------------------------
#
# The membership twin of seq_countmin_est. doc_bloom_words value-checks
# the filter CONTENTS (every word of every per-source filter);
# doc_bloom_fpr value-checks the PROBE path end-to-end — members must
# all hit (a Bloom filter has no false negatives, and the pair would
# hash-mismatch if even one bit went missing), aliens hit only by
# collision, and both engines must agree on exactly which aliens
# collide (the verdicts feed the counts, so a single flipped verdict
# breaks the value hash).

_BLOOM_M, _BLOOM_K = 1920, 4


def _bloom_words_cte() -> str:
    """DuckDB mirror of sketch.bloom_build over documents/text."""
    return f"""
    WITH pos AS (
      SELECT d.source,
             CAST(concat('0x', substr(md5(j.j || '#' || d.text), 1, 15)) AS BIGINT)
               % {_BLOOM_M} AS p
      FROM documents d
      CROSS JOIN (VALUES ('0'), ('1'), ('2'), ('3')) j(j)
    )
    """


@q(
    "doc_bloom_words",
    _bloom_words_cte()
    + """
    SELECT source, CAST(p // 60 AS INT) AS widx,
           bit_or(1::BIGINT << CAST(p % 60 AS INT)) AS word
    FROM pos GROUP BY source, widx
    ORDER BY source, widx
    """,
)
def doc_bloom_words(spark, sf_dir):
    """Per-source Bloom filter words (m=1920 bits, k=4, 60-bit words —
    the sign bit is unusable cross-engine: DuckDB raises on 1<<63).
    ≤32 rows per source regardless of corpus size; ONE map-side-
    combined bit_or agg (see sketch.bloom_build). Mergeability
    (word-wise OR of per-batch filters == full rebuild) is pinned in
    pytest."""
    from tokens_ts import sketch

    return sketch.bloom_build(
        _docs(spark, sf_dir), "text", ["source"], m_bits=_BLOOM_M, k=_BLOOM_K
    ).orderBy("source", "widx")


def _bloom_fpr_sql() -> str:
    """DuckDB mirror of the probe path: rebuild the filter, probe 40
    alien strings + the doc_id%5==0 member texts per source, aggregate
    verdicts. Alien verdicts are pure hash collisions — both engines
    must flag the same aliens."""
    return f"""
    WITH pos AS (
      SELECT d.source,
             CAST(concat('0x', substr(md5(j.j || '#' || d.text), 1, 15)) AS BIGINT)
               % {_BLOOM_M} AS p
      FROM documents d
      CROSS JOIN (VALUES ('0'), ('1'), ('2'), ('3')) j(j)
    ),
    words AS (
      SELECT source, CAST(p // 60 AS INT) AS widx,
             bit_or(1::BIGINT << CAST(p % 60 AS INT)) AS word
      FROM pos GROUP BY source, widx
    ),
    probes AS (
      SELECT source, concat(source, '#probe#', CAST(i AS VARCHAR)) AS item,
             0 AS is_member
      FROM (SELECT DISTINCT source FROM documents)
      CROSS JOIN (SELECT unnest(range(40)) AS i)
      UNION ALL
      SELECT source, text AS item, 1 AS is_member
      FROM documents WHERE doc_id % 5 = 0
    ),
    ppos AS (
      SELECT p.source, p.item, p.is_member,
             CAST((CAST(concat('0x', substr(md5(j.j || '#' || p.item), 1, 15)) AS BIGINT)
               % {_BLOOM_M}) // 60 AS INT) AS widx,
             1::BIGINT << CAST((CAST(concat('0x', substr(md5(j.j || '#' || p.item), 1, 15)) AS BIGINT)
               % {_BLOOM_M}) % 60 AS INT) AS bit
      FROM probes p
      CROSS JOIN (VALUES ('0'), ('1'), ('2'), ('3')) j(j)
    ),
    verdicts AS (
      SELECT pp.source, pp.item, pp.is_member,
             min(CASE WHEN COALESCE(w.word, 0) & pp.bit = pp.bit
                      THEN 1 ELSE 0 END) AS hit
      FROM ppos pp
      LEFT JOIN words w ON w.source = pp.source AND w.widx = pp.widx
      GROUP BY pp.source, pp.item, pp.is_member
    )
    SELECT source,
           sum(is_member) AS n_member,
           sum(CASE WHEN is_member = 1 THEN hit ELSE 0 END) AS n_member_hit,
           sum(1 - is_member) AS n_alien,
           sum(CASE WHEN is_member = 0 THEN hit ELSE 0 END) AS n_alien_hit,
           CAST(round(sum(CASE WHEN is_member = 0 THEN hit ELSE 0 END)
             * 1000000.0 / sum(1 - is_member)) AS BIGINT) AS fpr_e6
    FROM verdicts GROUP BY source ORDER BY source
    """


@q("doc_bloom_fpr", _bloom_fpr_sql())
def doc_bloom_fpr(spark, sf_dir):
    """Probe the per-source filters with 40 alien strings + every
    doc_id%5==0 member text: members must ALL hit (no false
    negatives), aliens hit only by md5 collision — the measured FPR
    the pre-filter design is sized by. Filter side broadcast
    (words-bounded), probe side one map-side join + regroup."""
    from tokens_ts import sketch

    docs = _docs(spark, sf_dir)
    bloom = sketch.bloom_build(
        docs, "text", ["source"], m_bits=_BLOOM_M, k=_BLOOM_K
    )
    aliens = (
        docs.select("source")
        .distinct()
        .select(
            "source",
            F.explode(F.sequence(F.lit(0), F.lit(39))).alias("_i"),
        )
        .select(
            "source",
            F.concat(
                F.col("source"), F.lit("#probe#"), F.col("_i").cast("string")
            ).alias("item"),
            F.lit(0).alias("is_member"),
        )
    )
    members = docs.filter(F.col("doc_id") % 5 == 0).select(
        "source", F.col("text").alias("item"), F.lit(1).alias("is_member")
    )
    probes = aliens.unionByName(members)
    verdicts = sketch.bloom_probe(
        bloom, probes, "item", ["source"], m_bits=_BLOOM_M, k=_BLOOM_K
    ).join(probes, ["source", "item"])
    hit = F.col("maybe_member").cast("int")
    mem = F.col("is_member")
    return (
        verdicts.groupBy("source")
        .agg(
            F.sum(mem).alias("n_member"),
            F.sum(F.when(mem == 1, hit).otherwise(0)).alias("n_member_hit"),
            F.sum(1 - mem).alias("n_alien"),
            F.sum(F.when(mem == 0, hit).otherwise(0)).alias("n_alien_hit"),
            F.round(
                F.sum(F.when(mem == 0, hit).otherwise(0))
                * F.lit(1000000.0)
                / F.sum(1 - mem)
            )
            .cast("bigint")
            .alias("fpr_e6"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Pareto frontier (skyline): efficient hours per (event_type, day)
# ---------------------------------------------------------------------------
#
# The oracle is the textbook NOT EXISTS dominance predicate — a
# genuinely independent algorithm from the engine's reduce-then-
# running-max plan (analytics.pareto_front), so agreement checks the
# frontier SEMANTICS, not a shared implementation.


@q(
    "ts_pareto_hours",
    """
    WITH h AS (
      SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             CAST(EXTRACT(hour FROM ts) AS INT) AS hour,
             CAST(count(*) AS BIGINT) AS n_events,
             sum(CAST(ROUND(value * 1000) AS BIGINT)) AS sum_e3
      FROM events GROUP BY 1, 2, 3
    )
    SELECT a.event_type, a.day, a.hour, a.n_events, a.sum_e3
    FROM h a
    WHERE NOT EXISTS (
      SELECT 1 FROM h b
      WHERE b.event_type = a.event_type AND b.day = a.day
        AND b.n_events >= a.n_events AND b.sum_e3 >= a.sum_e3
        AND (b.n_events > a.n_events OR b.sum_e3 > a.sum_e3)
    )
    ORDER BY event_type, day, hour
    """,
)
def ts_pareto_hours(spark, sf_dir):
    """Per (event_type, day): the Pareto-efficient hours trading off
    volume (event count) against total e3-grid value — no other hour
    of that day beats them on both axes. Integer metrics end to end;
    the frontier membership set is therefore drift-free by
    construction."""
    ev = _ev(spark, sf_dir)
    h = ev.groupBy(
        "event_type",
        F.to_date("ts").cast("string").alias("day"),
        F.hour("ts").alias("hour"),
    ).agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum(_e("value", 3)).alias("sum_e3"),
    )
    from tokens_ts import analytics

    return analytics.pareto_front(
        h, ["event_type", "day"], "n_events", "sum_e3"
    ).orderBy("event_type", "day", "hour")


# ---------------------------------------------------------------------------
# JSONL source with dead-letter routing (S2: second real format)
# ---------------------------------------------------------------------------
#
# The pair materializes a REAL line-delimited JSON file from events —
# every 7th record truncated mid-line (unparseable), every 11th≡3
# serialized without its event_type (valid JSON, invalid record) —
# then ingests it through io.jsonl.jsonl_scan and aggregates the good
# rows per type plus one quarantine row. The oracle never sees the
# file: it re-derives who must survive from the corruption rules
# alone, so any parse, routing, or JSON round-trip defect (doubles and
# epoch-micros ride through text!) diverges the counts/sums.


@q(
    "ts_jsonl_source",
    """
    WITH g AS (
      SELECT * FROM events
      WHERE event_id % 7 <> 0 AND event_id % 11 <> 3
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           sum(CAST(ROUND(value * 1000) AS BIGINT)) AS sum_e3,
           sum(epoch_us(ts) % 1000000000000) AS ts_us_sum
    FROM g GROUP BY event_type
    UNION ALL
    SELECT '__dead_letter__' AS event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(0 AS BIGINT) AS sum_e3,
           CAST(0 AS BIGINT) AS ts_us_sum
    FROM events WHERE event_id % 7 = 0 OR event_id % 11 = 3
    ORDER BY event_type
    """,
)
def ts_jsonl_source(spark, sf_dir):
    """events → JSONL with two planted corruption classes → one-scan
    schema-enforced ingest (io.jsonl.jsonl_scan) → per-type aggregate
    + quarantine count. Doubles and epoch-micros must round-trip
    text exactly (to_json shortest-repr ↔ from_json); the micros
    checksum sums ts_us mod 1e12 — low bits carry the full round-trip
    signal and the sum stays in bigint at any SF."""
    import tempfile

    from tokens_ts.io.jsonl import jsonl_scan

    ev = _ev(spark, sf_dir)
    full = F.to_json(
        F.struct(
            F.col("event_id"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            F.col("user_id"),
            F.col("event_type"),
            F.col("value"),
        )
    )
    nofield = F.to_json(
        F.struct(
            F.col("event_id"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            F.col("user_id"),
            F.col("value"),
        )
    )
    line = (
        F.when(F.col("event_id") % 7 == 0, F.substring(full, 1, 12))
        .when(F.col("event_id") % 11 == 3, nofield)
        .otherwise(full)
    )
    d = tempfile.mkdtemp(prefix="jsonl_src_") + "/events.jsonl"
    ev.select(line.alias("value")).write.mode("overwrite").text(d)
    good, dead = jsonl_scan(
        spark,
        d,
        "event_id bigint, ts_us bigint, user_id bigint, "
        "event_type string, value double",
        required=["event_id", "event_type"],
    )
    agg = good.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum(_e("value", 3)).alias("sum_e3"),
        F.sum(F.col("ts_us") % F.lit(1_000_000_000_000)).alias(
            "ts_us_sum"
        ),
    )
    quarantine = dead.agg(
        F.lit("__dead_letter__").alias("event_type"),
        F.count("*").cast("bigint").alias("n_events"),
        F.lit(0).cast("bigint").alias("sum_e3"),
        F.lit(0).cast("bigint").alias("ts_us_sum"),
    )
    return agg.unionByName(quarantine).orderBy("event_type")


# ---------------------------------------------------------------------------
# Fixed-point PageRank over the session transition graph
# ---------------------------------------------------------------------------


def _pagerank_sql() -> str:
    """DuckDB mirror: same session-bounded edges as ts_markov_
    transitions, then three unrolled integer fixed-point iterations —
    every rank an exact bigint, so the chain cannot drift."""
    e12 = 10**12
    iters = []
    prev = "r0"
    for k in (1, 2, 3):
        iters.append(f"""
    i{k} AS (
      SELECT e.dst AS node, sum((r.rank * e.n) // r.out_n) AS inflow
      FROM e JOIN {prev} r ON r.node = e.src GROUP BY e.dst
    ),
    d{k} AS (
      SELECT COALESCE(sum(rank), 0)::BIGINT AS dang
      FROM {prev} WHERE out_n = 0
    ),
    r{k} AS (
      SELECT b.node, b.n_nodes, b.out_n,
             (3 * {e12}::BIGINT) // (20 * b.n_nodes)
             + (17 * (COALESCE(i.inflow, 0) + (d.dang // b.n_nodes))) // 20
               AS rank
      FROM base b LEFT JOIN i{k} i ON i.node = b.node CROSS JOIN d{k} d
    )""")
        prev = f"r{k}"
    return f"""
    WITH o AS (
      SELECT user_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS ep,
             lag(event_type) OVER w AS from_type,
             lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w AS pep
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    e AS (
      SELECT from_type AS src, event_type AS dst,
             CAST(count(*) AS BIGINT) AS n
      FROM o WHERE from_type IS NOT NULL AND ep - pep <= 1800
      GROUP BY 1, 2
    ),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM nodes),
    base AS (
      SELECT nd.node, nn.n_nodes,
             COALESCE(o2.out_n, 0)::BIGINT AS out_n
      FROM nodes nd CROSS JOIN nn
      LEFT JOIN (SELECT src, sum(n) AS out_n FROM e GROUP BY src) o2
        ON o2.src = nd.node
    ),
    r0 AS (
      SELECT node, n_nodes, out_n, {e12}::BIGINT // n_nodes AS rank
      FROM base
    ),{','.join(iters)}
    SELECT node, out_n, rank AS rank_e12 FROM r3 ORDER BY node
    """


@q("ts_pagerank_types", _pagerank_sql())
def ts_pagerank_types(spark, sf_dir):
    """PageRank centrality of event types over the session-bounded
    transition graph (the markov_transitions edges), 3 fixed-point
    e12 iterations — structural importance where the transition
    matrix gives only one-step probabilities. All frames after the
    edge count are type-vocabulary-bounded."""
    from tokens_ts import analytics

    edges = analytics.markov_transitions(_ev(spark, sf_dir)).select(
        F.col("from_type").alias("src"),
        F.col("to_type").alias("dst"),
        F.col("n"),
    )
    return analytics.pagerank_fixed(edges, iters=3).orderBy("node")


# ---------------------------------------------------------------------------
# Snapshot (manifest-committed) read of the token tier
# ---------------------------------------------------------------------------


@q(
    "seq_token_tier_asof",
    _synth_cte()
    + """
    , ex AS (
      SELECT source, epoch_s - epoch_s % 3600 AS ep, unnest(tokens) AS t
      FROM seq WHERE k % 3 IN (0, 1)
    )
    SELECT source, CAST(ep AS BIGINT) AS ep, CAST(t AS BIGINT) AS t,
           CAST(count(*) AS BIGINT) AS c
    FROM ex WHERE t <> 0 GROUP BY 1, 2, 3
    ORDER BY source, ep, t
    """,
)
def seq_token_tier_asof(spark, sf_dir):
    """Three synth batches (k mod 3): batches 0 and 1 folded through
    run_token_tier_increment (partition write + manifest marker),
    batch 2 written as an ORPHAN — partitions on disk, NO marker, the
    exact state a crash between write and commit leaves. The snapshot
    read must serve batches 0+1 and keep the orphan invisible; the
    oracle re-derives that histogram from the generation rules alone
    (k % 3 IN (0,1)), so a leak of even one orphan row diverges the
    counts."""
    import tempfile

    from tokens_ts import pipeline

    s = _seq(spark)
    root = tempfile.mkdtemp(prefix="tok_asof_")
    for b in (0, 1):
        pipeline.run_token_tier_increment(
            spark,
            s.where(F.col("k") % 3 == b),
            root,
            batch_id=f"b{b}",
        )
    # orphan: the crash-shaped state — data, no manifest marker
    from tokens_ts.io.catalog import Catalog

    orphan = (
        textops.token_histogram(
            s.where(F.col("k") % 3 == 2), by="source", trunc="hour"
        )
        .withColumn("day", F.to_date(F.timestamp_seconds(F.col("ep"))))
        .withColumn("batch_id", F.lit("b2"))
    )
    Catalog(root).overwrite_partitions(
        orphan, "tok_hist", ["source", "day", "batch_id"]
    )
    return (
        pipeline.read_token_tier_asof(spark, root)
        .select(
            "source",
            F.col("ep").cast("bigint").alias("ep"),
            F.col("t").cast("bigint").alias("t"),
            F.col("c").cast("bigint").alias("c"),
        )
        .orderBy("source", "ep", "t")
    )


# ---------------------------------------------------------------------------
# DSIR importance weights: hashed-bigram importance resampling scores
# (Xie et al. 2023) — target distribution = the lang='en' slice,
# raw = the whole corpus. Both engines hash grams with md5_60 into the
# same 4096 buckets and share one IEEE expression tree per bucket, so
# per-doc scores agree to well under the e6 rounding grain.
# ---------------------------------------------------------------------------


@q(
    "doc_dsir_weights",
    """
    WITH w AS (
      SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS ws
      FROM documents
    ),
    g AS (
      SELECT doc_id, lang,
             CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) % 4096 AS b
      FROM (
        SELECT doc_id, lang,
               unnest(list_transform(range(1, greatest(len(ws) - 1, 1) + 1),
                 i -> array_to_string(ws[i:i+1], ' '))) AS s
        FROM w
      )
    ),
    bc AS (
      SELECT b, count(*) AS cr,
             sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct
      FROM g GROUP BY 1
    ),
    tot AS (SELECT sum(cr) AS nr, sum(ct) AS nt FROM bc),
    lr AS (
      SELECT b,
             ln((CAST(ct AS DOUBLE) + 1.0) / (CAST(nt AS DOUBLE) + 4096.0))
             - ln((CAST(cr AS DOUBLE) + 1.0) / (CAST(nr AS DOUBLE) + 4096.0))
               AS lr
      FROM bc, tot
    ),
    d AS (SELECT doc_id, b, count(*) AS c FROM g GROUP BY 1, 2)
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_bigrams,
           CAST(ROUND(sum(CAST(c AS DOUBLE) * lr) * 1e6) AS BIGINT) AS dsir_e6
    FROM d JOIN lr USING (b)
    GROUP BY 1
    """,
)
def doc_dsir_weights(spark, sf_dir):
    """Per-doc DSIR importance weight: log-likelihood ratio of the doc
    under the target (en) vs raw hashed-bigram unigram models — the
    published data-selection score for importance-resampling a corpus
    toward a target domain. One corpus explode; bucket dims are
    broadcast; no corpus self-join (plan mirrors textops.dsir_weights
    docstring)."""
    docs = _docs(spark, sf_dir)
    d = textops.dsir_weights(docs, F.col("lang") == "en")
    return d.select("doc_id", "n_bigrams", _e("dsir", 6).alias("dsir_e6"))


# ---------------------------------------------------------------------------
# CSV source with dead-letter routing (S2: third real format)
# ---------------------------------------------------------------------------
#
# Mirrors ts_jsonl_source for the delimiter-separated world, with the
# CSV-specific hazard exercised: a truncated CSV line can still PARSE
# (cutting `123,1671234567890123,...` at 6 chars leaves a valid
# event_id and ts_us=16), so io.csvsrc adds a delimiter-arity guard
# JSONL never needed. Two planted corruption classes — every 7th line
# truncated to 12 chars (arity break; prefix fields still parse),
# every 11th≡3 with type garbage in the double column (parses as a
# row, nulls the required field) — and the oracle re-derives the
# survivor set from the rules alone, never reading the file.


@q(
    "ts_csv_source",
    """
    WITH g AS (
      SELECT * FROM events
      WHERE event_id % 7 <> 0 AND event_id % 11 <> 3
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           sum(CAST(ROUND(value * 1000) AS BIGINT)) AS sum_e3,
           sum(epoch_us(ts) % 1000000000000) AS ts_us_sum
    FROM g GROUP BY event_type
    UNION ALL
    SELECT '__dead_letter__' AS event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(0 AS BIGINT) AS sum_e3,
           CAST(0 AS BIGINT) AS ts_us_sum
    FROM events WHERE event_id % 7 = 0 OR event_id % 11 = 3
    ORDER BY event_type
    """,
)
def ts_csv_source(spark, sf_dir):
    """events → CSV with two planted corruption classes → one-scan
    schema-enforced ingest (io.csvsrc.csv_scan: arity guard +
    required-field routing) → per-type aggregate + quarantine count.
    Doubles round-trip text via Spark's shortest-repr double cast;
    the micros checksum sums ts_us mod 1e12 (bigint-safe at any SF)."""
    import tempfile

    from tokens_ts.io.csvsrc import csv_scan

    ev = _ev(spark, sf_dir)
    full = F.concat_ws(
        ",",
        F.col("event_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.col("user_id"),
        F.col("event_type"),
        F.col("value").cast("string"),
    )
    garbage = F.concat_ws(
        ",",
        F.col("event_id"),
        F.unix_micros(F.col("ts").cast("timestamp")),
        F.col("user_id"),
        F.col("event_type"),
        F.lit("oops"),
    )
    line = (
        F.when(F.col("event_id") % 7 == 0, F.substring(full, 1, 12))
        .when(F.col("event_id") % 11 == 3, garbage)
        .otherwise(full)
    )
    d = tempfile.mkdtemp(prefix="csv_src_") + "/events.csv"
    ev.select(line.alias("value")).write.mode("overwrite").text(d)
    good, dead = csv_scan(
        spark,
        d,
        "event_id bigint, ts_us bigint, user_id bigint, "
        "event_type string, value double",
        required=["event_id", "event_type", "value"],
    )
    agg = good.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum(_e("value", 3)).alias("sum_e3"),
        F.sum(F.col("ts_us") % F.lit(1_000_000_000_000)).alias(
            "ts_us_sum"
        ),
    )
    quarantine = dead.agg(
        F.lit("__dead_letter__").alias("event_type"),
        F.count("*").cast("bigint").alias("n_events"),
        F.lit(0).cast("bigint").alias("sum_e3"),
        F.lit(0).cast("bigint").alias("ts_us_sum"),
    )
    return agg.unionByName(quarantine).orderBy("event_type")


# ---------------------------------------------------------------------------
# Schema-evolution read (S2: mixed-generation table scan)
# ---------------------------------------------------------------------------
#
# A long-lived incremental table WILL change shape mid-life — a new
# quality flag added, a legacy debug column retired — and the files
# written before the change never get rewritten at 10^12-sequence
# scale. The Spark side materializes that history as REAL parquet in
# one table directory: generation 1 (event_id % 3 = 0) written before
# `quality` existed and before `event_type` was captured; generation 2
# with both, plus the legacy `user_id` column the current contract has
# since dropped. Catalog.read_evolved then serves the table under the
# evolved target schema (old rows get declared defaults, the dropped
# column is pruned, column order is the contract's). The oracle never
# sees the files: it re-derives every row's post-evolution shape from
# the generation rule alone, so a scan that crashes on mixed footers,
# serves one generation's footer for both, misses a default, or drops
# old rows diverges the per-type counts/sums.


@q(
    "ts_schema_evolution",
    """
    WITH g AS (
      SELECT CASE WHEN event_id % 3 = 0 THEN 'unknown'
                  ELSE event_type END AS event_type,
             value,
             CASE WHEN event_id % 3 = 0 THEN 0
                  ELSE CAST(event_id % 5 AS INTEGER) END AS quality
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           sum(CAST(ROUND(value * 1000) AS BIGINT)) AS sum_e3,
           CAST(sum(quality) AS BIGINT) AS sum_quality
    FROM g GROUP BY event_type ORDER BY event_type
    """,
)
def ts_schema_evolution(spark, sf_dir):
    """events → two REAL parquet schema generations in one directory →
    Catalog.read_evolved under the evolved contract (event_type
    defaulted to 'unknown' on pre-capture rows, quality defaulted to
    0, legacy user_id pruned) → per-type aggregate. Exercises
    mergeSchema across footers + target projection + value defaults in
    one scan."""
    import tempfile

    from tokens_ts.io.catalog import Catalog

    ev = _ev(spark, sf_dir)
    cat = Catalog(tempfile.mkdtemp(prefix="evo_"))
    tbl = cat.path("events_evo")
    gen1 = ev.where(F.col("event_id") % 3 == 0).select(
        "event_id", "user_id", "value"
    )
    gen2 = ev.where(F.col("event_id") % 3 != 0).select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        (F.col("event_id") % 5).cast("int").alias("quality"),
    )
    gen1.write.mode("overwrite").parquet(tbl)
    gen2.write.mode("append").parquet(tbl)
    df = cat.read_evolved(
        spark,
        "events_evo",
        "event_id bigint, event_type string, value double, quality int",
        defaults={"event_type": "unknown", "quality": 0},
    )
    return (
        df.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(_e("value", 3)).alias("sum_e3"),
            F.sum("quality").alias("sum_quality"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# §2.9 streaming: stream-stream interval join (the second
# streaming-EXECUTED pair). Click→purchase attribution run as a real
# Structured Streaming two-stream join: both sides watermarked, the
# range condition bounding buffered state. Single availableNow batch →
# no row is past the watermark, so the completed output must equal the
# batch interval join exactly — which DuckDB computes independently.
# The late-drop semantics across checkpointed restarts are pinned in
# tests/test_streaming.py (they are watermark-progress-dependent and
# belong in a controlled multi-batch harness, not a cross-engine pair).
# ---------------------------------------------------------------------------


@q(
    "ts_stream_interval_join",
    """
    WITH c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
         p AS (SELECT user_id, ts, value FROM events
               WHERE event_type = 'purchase')
    SELECT c.user_id,
           CAST(count(*) AS BIGINT) AS n_pairs,
           sum(CAST(ROUND(p.value * 1000) AS BIGINT)) AS sum_e3,
           CAST(sum(epoch_us(p.ts) - epoch_us(c.ts)) AS BIGINT)
             AS lag_us_sum
    FROM c JOIN p
      ON p.user_id = c.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 6 HOUR
    GROUP BY c.user_id ORDER BY c.user_id
    """,
)
def ts_stream_interval_join(spark, sf_dir):
    """clicks and purchases written as two fixed file sets → two
    readStreams → streaming.stream_interval_join (watermarked, 6-hour
    range bound) → memory sink; per-user pair counts, purchase value,
    and exact microsecond lag mass aggregated from the completed
    output. The lag checksum pins the PAIRING itself — any duplicate,
    dropped, or mis-windowed match shifts it."""
    import tempfile
    import uuid

    from tokens_ts import streaming

    # stream-stream joins require TIMESTAMP (LTZ) event time — NTZ is
    # rejected with EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE. The session TZ
    # is pinned UTC, so the cast is a stable relabeling.
    ev = _ev(spark, sf_dir).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    d = tempfile.mkdtemp(prefix="stream_ij_")
    ev.where(F.col("event_type") == "click").select(
        "user_id", "ts"
    ).coalesce(1).write.mode("overwrite").parquet(d + "/clicks")
    ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    ).coalesce(1).write.mode("overwrite").parquet(d + "/purchases")
    cs = spark.readStream.schema(
        spark.read.parquet(d + "/clicks").schema
    ).parquet(d + "/clicks")
    ps = spark.readStream.schema(
        spark.read.parquet(d + "/purchases").schema
    ).parquet(d + "/purchases")
    out = streaming.stream_interval_join(
        cs, ps, key="user_id", within="6 hours", watermark="1 hour"
    )
    name = "stream_ij_" + uuid.uuid4().hex[:8]
    sq = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", d + "/ck")
        .start()
    )
    sq.awaitTermination(600)
    t = spark.table(name)
    return (
        t.groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.sum(_e("r_value", 3)).alias("sum_e3"),
            F.sum(
                F.unix_micros(F.col("r_ts").cast("timestamp"))
                - F.unix_micros(F.col("l_ts").cast("timestamp"))
            ).alias("lag_us_sum"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Data-quality expectations audit (tokens_ts/dq.py): the ingest
# acceptance gate. Four row-local rules fused into ONE scan plus two
# uniqueness rules (one passing, one with natural duplicates so the
# keyed path produces a real count). The oracle recomputes every rule
# independently in SQL.
# ---------------------------------------------------------------------------


@q(
    "ts_dq_audit",
    r"""
    WITH e AS (SELECT *, CAST(CAST(ts AS DATE) AS VARCHAR) AS day
               FROM events)
    SELECT 'not_null(value)' AS rule,
           CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violations,
           CAST(count(*) AS BIGINT) AS n_checked FROM e
    UNION ALL
    SELECT 'in_set(event_type)',
           CAST(sum(CASE WHEN event_type IS NOT NULL AND event_type
                NOT IN ('view','click','purchase','signup')
                THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(*) AS BIGINT) FROM e
    UNION ALL
    SELECT 'in_range(value,0.0,50.0)',
           CAST(sum(CASE WHEN value IS NOT NULL
                AND (value < 0.0 OR value > 50.0)
                THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(*) AS BIGINT) FROM e
    UNION ALL
    SELECT 'matches(props)',
           CAST(sum(CASE WHEN props IS NOT NULL
                AND NOT regexp_matches(props, '^\{')
                THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(*) AS BIGINT) FROM e
    UNION ALL
    SELECT 'unique(event_id)',
           CAST(count(*) - count(DISTINCT event_id) AS BIGINT),
           CAST(count(*) AS BIGINT) FROM e
    UNION ALL
    SELECT 'unique(user_day_type)',
           CAST(count(*) - count(DISTINCT (user_id, day, event_type))
                AS BIGINT),
           CAST(count(*) AS BIGINT) FROM e
    ORDER BY rule
    """,
)
def ts_dq_audit(spark, sf_dir):
    """dq.audit over events: not-null, set-membership, range, and
    regex rules in one fused scan; event_id uniqueness (passes) and
    (user_id, day, event_type) uniqueness (natural duplicates) through
    the keyed path."""
    from tokens_ts import dq

    ev = _ev(spark, sf_dir).withColumn(
        "day", F.to_date("ts").cast("string")
    )
    return dq.audit(
        ev,
        [
            dq.not_null("value"),
            dq.in_set(
                "event_type", ["view", "click", "purchase", "signup"]
            ),
            dq.in_range("value", 0.0, 50.0),
            dq.matches("props", "^\\{"),
        ],
        {
            "event_id": ["event_id"],
            "user_day_type": ["user_id", "day", "event_type"],
        },
    ).orderBy("rule")


# ---------------------------------------------------------------------------
# Incremental scan between manifest states of the token tier
# ---------------------------------------------------------------------------


@q(
    "seq_token_tier_changes",
    _synth_cte()
    + """
    , ex AS (
      SELECT source, epoch_s - epoch_s % 3600 AS ep, unnest(tokens) AS t
      FROM seq WHERE k % 3 = 1
    )
    SELECT source, CAST(ep AS BIGINT) AS ep, CAST(t AS BIGINT) AS t,
           CAST(count(*) AS BIGINT) AS c
    FROM ex WHERE t <> 0 GROUP BY 1, 2, 3
    ORDER BY source, ep, t
    """,
)
def seq_token_tier_changes(spark, sf_dir):
    """Batches 0 and 1 folded through run_token_tier_increment, batch
    2 planted as a crash-shaped orphan (data, no marker). The
    incremental scan since batch 0's commit timestamp must serve
    EXACTLY batch 1 — batch 0 excluded by the snapshot boundary, the
    orphan by manifest invisibility. The oracle re-derives batch 1's
    histogram from the generation rule alone (k % 3 = 1)."""
    import tempfile

    from tokens_ts import checkpoint, pipeline
    from tokens_ts.io.catalog import Catalog

    s = _seq(spark)
    root = tempfile.mkdtemp(prefix="tok_chg_")
    for b in (0, 1):
        pipeline.run_token_tier_increment(
            spark,
            s.where(F.col("k") % 3 == b),
            root,
            batch_id=f"b{b}",
        )
    orphan = (
        textops.token_histogram(
            s.where(F.col("k") % 3 == 2), by="source", trunc="hour"
        )
        .withColumn("day", F.to_date(F.timestamp_seconds(F.col("ep"))))
        .withColumn("batch_id", F.lit("b2"))
    )
    Catalog(root).overwrite_partitions(
        orphan, "tok_hist", ["source", "day", "batch_id"]
    )
    since = (
        checkpoint.read_manifest(spark, Catalog(root))
        .where(F.col("partition_id") == "tok:b0")
        .agg(F.max("ts").alias("m"))
        .collect()[0]["m"]
    )
    return (
        pipeline.read_token_tier_changes(spark, root, since_ts=since)
        .select(
            "source",
            F.col("ep").cast("bigint").alias("ep"),
            F.col("t").cast("bigint").alias("t"),
            F.col("c").cast("bigint").alias("c"),
        )
        .orderBy("source", "ep", "t")
    )


# ---------------------------------------------------------------------------
# Row-level DELETE (right-to-be-forgotten) via copy-on-write rewrite
# ---------------------------------------------------------------------------


@q(
    "ts_delete_where",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           sum(CAST(ROUND(value * 1000) AS BIGINT)) AS sum_e3
    FROM events
    WHERE NOT (event_type = 'error'
               OR (event_type = 'click' AND value > 50.0))
    GROUP BY event_type ORDER BY event_type
    """,
)
def ts_delete_where(spark, sf_dir):
    """events materialized as a type-partitioned table, then ONE
    delete_where hitting all three rewrite paths at once: the 'error'
    partition is deleted entirely (dir removal), 'click' is rewritten
    copy-on-write around its surviving rows, and the other partitions
    are never opened. The post-delete aggregate must equal DuckDB's
    NOT-predicate filter over the original events."""
    import tempfile

    from tokens_ts.io.catalog import Catalog

    cat = Catalog(tempfile.mkdtemp(prefix="delw_"))
    _ev(spark, sf_dir).write.mode("overwrite").partitionBy(
        "event_type"
    ).parquet(cat.path("events_cow"))
    cat.delete_where(
        spark,
        "events_cow",
        "event_type = 'error' OR (event_type = 'click' AND value > 50.0)",
        partition_cols=["event_type"],
    )
    return (
        cat.read(spark, "events_cow")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(_e("value", 3)).alias("sum_e3"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Store-wide forget (right-to-be-forgotten across raw + tiers)
# ---------------------------------------------------------------------------


@q(
    "ts_forget_series",
    """
    SELECT event_type AS series_id,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
             AS window_start,
           count(value) AS cnt,
           CAST(ROUND(sum(value) * 1e4) AS BIGINT) AS sum_e4
    FROM events
    WHERE event_type NOT IN ('click', 'error')
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def ts_forget_series(spark, sf_dir):
    """A full store (raw + t1m/t1h/t1d, (source, day)-partitioned) is
    built from events, then pipeline.forget_series erases two series
    everywhere through copy-on-write deletes. The served 1h tier after
    the forget must equal DuckDB's rollup of the events that were
    never about those series — i.e. the delete at tier level is
    indistinguishable from never having ingested the series."""
    import tempfile

    from tokens_ts import pipeline, tiers
    from tokens_ts.io.catalog import Catalog
    from tokens_ts.queries_driver import _events_raw, _fmt

    cat = Catalog(tempfile.mkdtemp(prefix="forget_"))
    raw = _events_raw(spark, sf_dir).withColumn(
        "day", F.to_date("event_ts")
    )
    cat.overwrite_partitions(raw, "raw", ["source", "day"])
    frames = tiers.build_all_tiers(raw.drop("day"))
    for t, name in pipeline.TIER_NAMES.items():
        cat.overwrite_partitions(
            frames[t].withColumn("day", F.to_date("window_start")),
            name,
            ["source", "day"],
        )
    rep = pipeline.forget_series(
        spark, cat.root, ["click", "error"], source="events"
    )
    assert rep["rows_deleted"] > 0
    return (
        cat.read(spark, "t1h")
        .select(
            "series_id",
            _fmt("window_start").alias("window_start"),
            "cnt",
            _e("sum", 4).alias("sum_e4"),
        )
        .orderBy("series_id", "window_start")
    )


# ---------------------------------------------------------------------------
# File-skipping (min/max pruning) audit on a day-partitioned layout
# ---------------------------------------------------------------------------


@q(
    "ts_file_skipping",
    """
    WITH m AS (SELECT (4 * max(event_id)) // 10 AS lo,
                      (5 * max(event_id)) // 10 AS hi FROM events),
    f AS (
      SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             CAST(count(*) AS BIGINT) AS n,
             CAST(min(event_id) AS BIGINT) AS vmin,
             CAST(max(event_id) AS BIGINT) AS vmax
      FROM events GROUP BY 1
    )
    SELECT day, n, vmin, vmax,
           CAST(CASE WHEN vmax < lo OR vmin > hi THEN 1 ELSE 0 END
                AS BIGINT) AS skippable
    FROM f, m ORDER BY day
    """,
)
def ts_file_skipping(spark, sf_dir):
    """events written as a day-partitioned layout with ONE file per
    day (repartition by the partition key), then skipping_audit for an
    event_id range predicate. event_id is time-ordered, so whole days
    ARE skippable — the audit must find exactly the days whose
    [min, max] misses the range, which the oracle re-derives from the
    day grouping alone (file ≡ day by construction)."""
    import tempfile

    from tokens_ts.io import layout

    ev = _ev(spark, sf_dir)
    mx = ev.agg(F.max("event_id").alias("m")).collect()[0]["m"]
    lo, hi = (4 * mx) // 10, (5 * mx) // 10
    d = tempfile.mkdtemp(prefix="skip_") + "/t"
    (
        ev.withColumn("day", F.to_date("ts").cast("string"))
        .repartition(F.col("day"))
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(d)
    )
    audit = layout.skipping_audit(spark, d, "event_id", float(lo), float(hi))
    return audit.select(
        F.regexp_extract("file", "day=([^/]+)", 1).alias("day"),
        "n",
        F.col("vmin").cast("bigint").alias("vmin"),
        F.col("vmax").cast("bigint").alias("vmax"),
        F.col("skippable").cast("bigint").alias("skippable"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# KMV audience overlap: distinct-set intersection estimates next to
# their exact answers
# ---------------------------------------------------------------------------


@q(
    "ts_audience_overlap",
    """
    WITH h AS (
      SELECT DISTINCT event_type AS g,
             CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS hv
      FROM events
    ),
    n AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM h GROUP BY g),
    t AS (
      SELECT g, n,
             LEAST(CAST(1152921504606846976 AS BIGINT),
                   (CAST(1152921504606846976 AS BIGINT)
                    // GREATEST(n, 512)) * 512) AS thr
      FROM n
    ),
    s AS (
      SELECT h.g, t.n, list_sort(list(hv))[1:64] AS hs
      FROM h JOIN t ON h.g = t.g AND h.hv < t.thr
      GROUP BY h.g, t.n
    ),
    p AS (
      SELECT a.g AS ga, b.g AS gb, a.n AS na, b.n AS nb,
             list_sort(list_distinct(list_concat(a.hs, b.hs)))[1:64] AS uk,
             list_filter(a.hs, x -> list_contains(b.hs, x)) AS il
      FROM s a JOIN s b ON a.g < b.g
    ),
    r AS (
      SELECT ga, gb, na, nb,
             CAST(len(uk) AS BIGINT) AS m,
             CAST(len(list_filter(uk, x -> list_contains(il, x)))
                  AS BIGINT) AS matched,
             uk
      FROM p
    ),
    e AS (
      SELECT ga, gb, na, nb, m, matched,
             CASE WHEN m < 64 THEN CAST(m AS DOUBLE)
                  ELSE CAST(63 AS DOUBLE)
                       * CAST(1152921504606846976 AS DOUBLE)
                       / CAST(uk[64] AS DOUBLE) END AS u,
             CAST(matched AS DOUBLE) / CAST(m AS DOUBLE) AS j
      FROM r
    ),
    x AS (
      SELECT a.event_type AS ga, b.event_type AS gb,
             CAST(count(*) AS BIGINT) AS exact_inter
      FROM (SELECT DISTINCT event_type, user_id FROM events) a
      JOIN (SELECT DISTINCT event_type, user_id FROM events) b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT e.ga, e.gb, na, nb, m, matched,
           CAST(ROUND(u * 1e6) AS BIGINT) AS union_e6,
           CAST(ROUND(j * 1e6) AS BIGINT) AS jaccard_e6,
           CAST(ROUND(j * u * 1e6) AS BIGINT) AS inter_e6,
           COALESCE(exact_inter, 0) AS exact_inter
    FROM e LEFT JOIN x ON e.ga = x.ga AND e.gb = x.gb
    ORDER BY e.ga, e.gb
    """,
)
def ts_audience_overlap(spark, sf_dir):
    """Which event types share users: KMV sketches per type (k=64,
    threshold-prefiltered min-k — the 10^12-distinct shape), all-pairs
    union/Jaccard/intersection estimates, and the EXACT pairwise
    intersection in the same row so the estimator's error is visible.
    The sketch is deterministic md5_60, so DuckDB rebuilds it value
    for value — estimates included."""
    from tokens_ts import sketch

    ev = _ev(spark, sf_dir)
    sk = sketch.kmv_sketch(ev, "user_id", ["event_type"], k=64)
    ov = sketch.kmv_overlap(sk, "event_type", k=64)
    d = ev.select("event_type", "user_id").distinct()
    ex = (
        d.alias("x")
        .join(
            d.alias("y"),
            (F.col("x.user_id") == F.col("y.user_id"))
            & (F.col("x.event_type") < F.col("y.event_type")),
        )
        .groupBy(
            F.col("x.event_type").alias("ga"),
            F.col("y.event_type").alias("gb"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_inter"))
    )
    return (
        ov.join(ex, ["ga", "gb"], "left")
        .select(
            "ga",
            "gb",
            "na",
            "nb",
            "m",
            "matched",
            _e("union_est", 6).alias("union_e6"),
            _e("jaccard", 6).alias("jaccard_e6"),
            _e("inter_est", 6).alias("inter_e6"),
            F.coalesce("exact_inter", F.lit(0).cast("bigint")).alias(
                "exact_inter"
            ),
        )
        .orderBy("ga", "gb")
    )


# ---------------------------------------------------------------------------
# Sequential Poisson weighted sampling (integer-exact, hashable sample)
# ---------------------------------------------------------------------------


@q(
    "doc_weighted_sample",
    """
    WITH p AS (
      SELECT source, doc_id, n_chars,
             CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) // n_chars AS pri
      FROM documents WHERE n_chars > 0
    ),
    r AS (
      SELECT source, doc_id, n_chars, pri,
             row_number() OVER (PARTITION BY source
                                ORDER BY pri, doc_id) AS rank
      FROM p
    )
    SELECT source, CAST(rank AS INTEGER) AS rank, doc_id,
           CAST(n_chars AS BIGINT) AS n_chars, pri
    FROM r WHERE rank <= 20
    ORDER BY source, rank
    """,
)
def doc_weighted_sample(spark, sf_dir):
    """Per-source sequential Poisson sample of documents with weight =
    n_chars: priority = md5_60(doc_id) DIV n_chars, keep the 20
    smallest. Pure integer arithmetic, so BOTH engines must select the
    identical documents in the identical order — the sample is
    hash-checked, not just its size."""
    from tokens_ts import textops

    return (
        textops.weighted_sample(
            _docs(spark, sf_dir), "n_chars", ["source"], k=20
        )
        .select(
            "source",
            "rank",
            "doc_id",
            F.col("n_chars").cast("bigint").alias("n_chars"),
            "pri",
        )
        .orderBy("source", "rank")
    )


# ---------------------------------------------------------------------------
# k-anonymity release audit
# ---------------------------------------------------------------------------


@q(
    "ts_k_anonymity",
    """
    WITH g AS (
      SELECT event_type, week(ts) AS wk, hour(ts) AS hr,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2, 3
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(sum(CASE WHEN n < 10 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_below_k,
           CAST(sum(CASE WHEN n < 10 THEN n ELSE 0 END) AS BIGINT)
             AS rows_at_risk,
           min(n) AS min_class, max(n) AS max_class
    FROM g GROUP BY event_type ORDER BY event_type
    """,
)
def ts_k_anonymity(spark, sf_dir):
    """Release gate for a quasi-identifier combination (week,
    hour-of-day) sliced per event type: class counts, below-k classes,
    and the re-identifiable row mass. All integer; at sf0.01 the gate
    FAILS (sparse hours), at sf0.1 it passes — the audit sees both
    regimes."""
    from tokens_ts import dq

    ev = (
        _ev(spark, sf_dir)
        .withColumn("wk", F.weekofyear("ts"))
        .withColumn("hr", F.hour("ts"))
    )
    return dq.k_anonymity_summary(
        ev, ["wk", "hr"], k=10, by=["event_type"]
    ).orderBy("event_type")


@q(
    "ts_l_diversity",
    """
    WITH g AS (
      SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             hour(ts) AS hr,
             CAST(count(DISTINCT user_id % 10) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2, 3
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(sum(CASE WHEN d < 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_below_l,
           CAST(sum(CASE WHEN d < 3 THEN n ELSE 0 END) AS BIGINT)
             AS rows_at_risk,
           min(d) AS min_diversity
    FROM g GROUP BY event_type ORDER BY event_type
    """,
)
def ts_l_diversity(spark, sf_dir):
    """ℓ-diversity gate over (day, hour) classes per event type with
    sensitive attribute user_id%10 — the homogeneity-attack check
    k-anonymity misses. Fails broadly at sf0.01 (sparse hours hold 1-2
    distinct sensitive values), mostly passes at sf0.1."""
    from tokens_ts import dq

    ev = (
        _ev(spark, sf_dir)
        .withColumn("day", F.to_date("ts").cast("string"))
        .withColumn("hr", F.hour("ts"))
        .withColumn("sens", F.col("user_id") % 10)
    )
    return dq.l_diversity_summary(
        ev, ["day", "hr"], "sens", l=3, by=["event_type"]
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Video frame-sampling plan (multimodal: decide before decoding)
# ---------------------------------------------------------------------------


@q(
    "mm_frame_plan",
    """
    WITH v AS (
      SELECT doc_id,
             1000 + (n_chars % 300) * 100 AS duration_ms,
             12 + doc_id % 19 AS fps
      FROM documents
    ),
    f AS (
      SELECT doc_id, fps, duration_ms * fps // 1000 AS n_frames,
             fps * 2 AS stride
      FROM v
    ),
    e AS (
      SELECT doc_id, n_frames, fps, stride,
             unnest(generate_series(0, n_frames - 1, stride)) AS frame_idx
      FROM f
    )
    SELECT doc_id, CAST(n_frames AS BIGINT) AS n_frames,
           CAST(frame_idx // stride AS INTEGER) AS k,
           CAST(frame_idx AS BIGINT) AS frame_idx,
           CAST(frame_idx * 1000 // fps AS BIGINT) AS ts_ms
    FROM e WHERE frame_idx <= 7 * stride
    ORDER BY doc_id, k
    """,
)
def mm_frame_plan(spark, sf_dir):
    """Synthetic video metadata from closed forms (duration_ms =
    1000 + (n_chars%300)·100, fps = 12 + doc_id%19, both
    oracle-mirrorable), then the frame-sampling plan: one frame every
    2 s, capped at 8 — every planned index and its integer timestamp
    hash-checked. The plan is pure sequence/slice/explode expressions;
    payload bytes are never touched."""
    from tokens_ts import multimodal

    v = _docs(spark, sf_dir).select(
        "doc_id",
        (1000 + (F.col("n_chars") % 300) * 100).alias("duration_ms"),
        (12 + F.col("doc_id") % 19).alias("fps"),
    )
    return multimodal.frame_plan(
        v, every_s=2, max_frames=8
    ).orderBy("doc_id", "k")


@q(
    "emb_matryoshka",
    """
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    p AS (
      SELECT a.vec_id AS aid, a.v AS va, b.v AS vb
      FROM e a JOIN e b ON b.vec_id = a.vec_id + 7
    ),
    d AS (SELECT aid, va, vb, unnest([8, 16, 32, 64]) AS dim FROM p),
    c AS (
      SELECT aid, dim,
        CAST(ROUND(list_sum(list_transform(range(1, dim + 1),
          i -> va[i] * vb[i])) * 1e6) AS BIGINT) AS dt,
        CAST(ROUND(list_sum(list_transform(range(1, dim + 1),
          i -> va[i] * va[i])) * 1e6) AS BIGINT) AS na,
        CAST(ROUND(list_sum(list_transform(range(1, dim + 1),
          i -> vb[i] * vb[i])) * 1e6) AS BIGINT) AS nb,
        CAST(ROUND(list_sum(list_transform(range(1, 65),
          i -> va[i] * vb[i])) * 1e6) AS BIGINT) AS fdt,
        CAST(ROUND(list_sum(list_transform(range(1, 65),
          i -> va[i] * va[i])) * 1e6) AS BIGINT) AS fna,
        CAST(ROUND(list_sum(list_transform(range(1, 65),
          i -> vb[i] * vb[i])) * 1e6) AS BIGINT) AS fnb
      FROM d
    ),
    s AS (
      SELECT dim,
        CASE WHEN na > 0 AND nb > 0 THEN
          CAST(ROUND(1e6 * dt
            / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))) AS BIGINT)
        END AS cos_d,
        CASE WHEN fna > 0 AND fnb > 0 THEN
          CAST(ROUND(1e6 * fdt
            / sqrt(CAST(fna AS DOUBLE) * CAST(fnb AS DOUBLE))) AS BIGINT)
        END AS cos_full
      FROM c
    )
    SELECT CAST(dim AS BIGINT) AS dim,
           count(CASE WHEN cos_d IS NOT NULL AND cos_full IS NOT NULL
                 THEN 1 END) AS n_pairs,
           CAST(sum(CASE WHEN cos_d IS NOT NULL AND cos_full IS NOT NULL
                 THEN abs(cos_d - cos_full) END) AS BIGINT)
             AS sum_abs_err_e6,
           CAST(max(CASE WHEN cos_d IS NOT NULL AND cos_full IS NOT NULL
                 THEN abs(cos_d - cos_full) END) AS BIGINT)
             AS max_abs_err_e6,
           count(CASE WHEN cos_d IS NOT NULL AND cos_full IS NOT NULL
                 AND ((cos_d >= 0) = (cos_full >= 0)) THEN 1 END)
             AS n_sign_agree
    FROM s GROUP BY 1
    """,
)
def emb_matryoshka(spark, sf_dir):
    """Matryoshka truncation-fidelity sweep over prefix dims
    8/16/32/64 on the deterministic (id, id+7) pair sample: per dim,
    pair count, summed + max absolute e6-cosine error vs the full
    64-dim cosine, and sign-agreement count. dim=64 pins err = 0 by
    construction (the slice IS the full vector — a free self-check the
    driver hash enforces). See simsearch.matryoshka_fidelity."""
    return simsearch.matryoshka_fidelity(_emb(spark, sf_dir))


@q(
    "ts_kruskal_dow",
    """
    WITH b AS (
      SELECT event_type AS series_id,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ep,
             CAST(ROUND(avg(value) * 1e6) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    r AS (
      SELECT series_id, v, (ep // 86400 + 3) % 7 AS dow,
             2 * rank() OVER (PARTITION BY series_id ORDER BY v)
               + count(*) OVER (PARTITION BY series_id, v) - 1 AS m2
      FROM b
    ),
    g AS (
      SELECT series_id, dow, count(*) AS ng, sum(m2) AS r2g
      FROM r GROUP BY 1, 2
    ),
    s AS (
      SELECT series_id, count(*) AS n_groups,
             sum(CAST(r2g AS DOUBLE) * CAST(r2g AS DOUBLE)
                 / CAST(ng AS DOUBLE)) AS s4,
             sum(ng) AS n
      FROM g GROUP BY 1
    ),
    t AS (
      SELECT series_id, sum(t * t * t - t) AS ties
      FROM (SELECT series_id, v, count(*) AS t FROM b GROUP BY 1, 2)
      GROUP BY 1
    )
    SELECT s.series_id,
           CAST(n AS BIGINT) AS n_buckets,
           CAST(n_groups AS BIGINT) AS n_groups,
           CAST(ROUND((3.0 * s4 / CAST(n * (n + 1) AS DOUBLE)
                       - 3.0 * CAST(n + 1 AS DOUBLE)) * 1e6) AS BIGINT)
             AS h_e6,
           CASE WHEN 1.0 - CAST(ties AS DOUBLE)
                          / CAST(n * n * n - n AS DOUBLE) > 0
                THEN CAST(ROUND((3.0 * s4 / CAST(n * (n + 1) AS DOUBLE)
                                 - 3.0 * CAST(n + 1 AS DOUBLE))
                     / (1.0 - CAST(ties AS DOUBLE)
                              / CAST(n * n * n - n AS DOUBLE))
                     * 1e6) AS BIGINT)
           END AS h_corr_e6
    FROM s JOIN t ON s.series_id = t.series_id
    WHERE n >= 2
    """,
)
def ts_kruskal_dow(spark, sf_dir):
    """Kruskal-Wallis H across the seven weekday groups of hourly
    bucket means, per event_type series — tie-corrected, with the
    integer midrank + calendar-arithmetic pins (see
    analytics.kruskal_dow)."""
    from tokens_ts import analytics

    ev = _ev(spark, sf_dir).select(
        F.col("event_type").alias("series_id"), "ts", "value"
    )
    return analytics.kruskal_dow(
        ev, keys=["series_id"], ts_col="ts", value_col="value", trunc="hour",
    ).select("series_id", "n_buckets", "n_groups", "h_e6", "h_corr_e6")


@q(
    "ts_friedman_dayparts",
    """
    WITH b AS (
      SELECT event_type AS series_id,
             epoch_us(ts) // 86400000000 AS blk,
             (epoch_us(ts) % 86400000000) // 21600000000 AS seg,
             CAST(ROUND(avg(value) * 1e6) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2, 3
    ),
    kk AS (SELECT series_id, count(DISTINCT seg) AS k FROM b GROUP BY 1),
    c AS (
      SELECT b.*, kk.k FROM b JOIN kk USING (series_id)
      QUALIFY count(*) OVER (PARTITION BY series_id, blk) = k
    ),
    r AS (
      SELECT series_id, k, seg,
             2 * rank() OVER (PARTITION BY series_id, blk ORDER BY v)
               + count(*) OVER (PARTITION BY series_id, blk, v) - 1 AS m2
      FROM c
    ),
    pt AS (
      SELECT series_id, k, seg, sum(m2) AS r2, sum(m2 * m2) AS a2,
             count(*) AS n
      FROM r GROUP BY 1, 2, 3
    ),
    s AS (
      SELECT series_id, k, max(n) AS n_blocks,
             sum((r2 - n * (k + 1)) * (r2 - n * (k + 1))) AS n2,
             sum(a2) AS a2s
      FROM pt GROUP BY 1, 2
    )
    SELECT series_id,
           CAST(k AS BIGINT) AS k_treatments,
           CAST(n_blocks AS BIGINT) AS n_blocks,
           CASE WHEN a2s - n_blocks * k * (k + 1) * (k + 1) > 0 THEN
             CAST(ROUND(CAST(k - 1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                  / CAST(a2s - n_blocks * k * (k + 1) * (k + 1) AS DOUBLE)
                  * 1e6) AS BIGINT) END AS q_e6,
           CASE WHEN a2s - n_blocks * k * (k + 1) * (k + 1) > 0 THEN
             CAST(ROUND(CAST(k - 1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                  / CAST(a2s - n_blocks * k * (k + 1) * (k + 1) AS DOUBLE)
                  / CAST(n_blocks * (k - 1) AS DOUBLE)
                  * 1e6) AS BIGINT) END AS w_e6
    FROM s WHERE k >= 2 AND n_blocks >= 1
    """,
)
def ts_friedman_dayparts(spark, sf_dir):
    """Friedman blocked rank test per event_type series: blocks are
    calendar days, treatments the four 6-hour dayparts — within-day
    rank concordance with Kendall's W effect size, tie-corrected via
    the exact-bigint Q = (k-1)*N2/D2 collapse (see
    analytics.friedman_dayparts)."""
    from tokens_ts import analytics

    ev = _ev(spark, sf_dir).select(
        F.col("event_type").alias("series_id"), "ts", "value"
    )
    return analytics.friedman_dayparts(
        ev, keys=["series_id"], ts_col="ts", value_col="value"
    ).select("series_id", "k_treatments", "n_blocks", "q_e6", "w_e6")


@q(
    "ts_levene_dow",
    """
    WITH b AS (
      SELECT event_type AS series_id,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ep,
             CAST(ROUND(avg(value) * 1e3) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    o AS (
      SELECT series_id, (ep // 86400 + 3) % 7 AS g, ep, v,
             row_number() OVER (
               PARTITION BY series_id, (ep // 86400 + 3) % 7
               ORDER BY v, ep) AS rn,
             count(*) OVER (
               PARTITION BY series_id, (ep // 86400 + 3) % 7) AS ng
      FROM b
    ),
    m AS (
      SELECT series_id, g,
             sum(CASE WHEN rn = (ng + 1) // 2 THEN v ELSE 0 END)
               + sum(CASE WHEN rn = ng // 2 + 1 THEN v ELSE 0 END) AS med2
      FROM o GROUP BY 1, 2
    ),
    z AS (
      SELECT o.series_id, o.g, abs(2 * v - med2) AS z2
      FROM o JOIN m ON o.series_id = m.series_id AND o.g = m.g
    ),
    gr AS (
      SELECT series_id, g, count(*) AS n, sum(z2) AS zg,
             sum(z2 * z2) AS qg
      FROM z GROUP BY 1, 2
    ),
    t AS (
      SELECT *,
             CAST(ROUND(CAST(zg AS DOUBLE) * CAST(zg AS DOUBLE)
                        / CAST(n AS DOUBLE) * 1000.0) AS BIGINT) AS t1g
      FROM gr
    ),
    s AS (
      SELECT series_id, sum(n) AS nb, count(*) AS k, sum(zg) AS sz,
             sum(qg) AS sq, sum(t1g) AS t1
      FROM t GROUP BY 1
    )
    SELECT series_id,
           CAST(nb AS BIGINT) AS n_buckets,
           CAST(k AS BIGINT) AS k_groups,
           CAST(1000 * sq - t1 AS BIGINT) AS ssw_m,
           CAST(t1 - CAST(ROUND(CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)
                / CAST(nb AS DOUBLE) * 1000.0) AS BIGINT) AS BIGINT)
             AS ssb_m,
           CASE WHEN 1000 * sq - t1 > 0 THEN
             CAST(ROUND(
               CAST(nb - k AS DOUBLE)
               * CAST(t1 - CAST(ROUND(CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)
                     / CAST(nb AS DOUBLE) * 1000.0) AS BIGINT) AS DOUBLE)
               / (CAST(k - 1 AS DOUBLE) * CAST(1000 * sq - t1 AS DOUBLE))
               * 1e6) AS BIGINT) END AS w_e6
    FROM s WHERE k >= 2 AND nb > k
    """,
)
def ts_levene_dow(spark, sf_dir):
    """Brown–Forsythe (median-centered Levene) variance-homogeneity W
    across the seven weekday groups of hourly bucket means, per
    event_type series — exact med2 centers, pre-quantized per-group
    quadratic terms (see analytics.brown_forsythe_dow)."""
    from tokens_ts import analytics

    ev = _ev(spark, sf_dir).select(
        F.col("event_type").alias("series_id"), "ts", "value"
    )
    return analytics.brown_forsythe_dow(
        ev, keys=["series_id"], ts_col="ts", value_col="value"
    ).select("series_id", "n_buckets", "k_groups", "ssw_m", "ssb_m", "w_e6")


@q(
    "ts_gini_hours",
    """
    WITH h AS (
      SELECT event_type AS series_id,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ep,
             count(*) AS c
      FROM events GROUP BY 1, 2
    ),
    r AS (
      SELECT series_id, c,
             row_number() OVER (PARTITION BY series_id ORDER BY c, ep)
               AS rn,
             count(*) OVER (PARTITION BY series_id) AS m,
             (max(ep) OVER (PARTITION BY series_id)
              - min(ep) OVER (PARTITION BY series_id)) // 3600 + 1 AS n
      FROM h
    ),
    a AS (
      SELECT series_id, max(n) AS n, max(m) AS m, sum(c) AS s,
             sum(rn * c) AS tr,
             sum(CASE WHEN rn > m - (n + 9) // 10 THEN c ELSE 0 END)
               AS topc
      FROM r GROUP BY 1
    )
    SELECT series_id,
           CAST(n AS BIGINT) AS n_hours,
           CAST(m AS BIGINT) AS n_active,
           CASE WHEN n > 1 THEN
             CAST(ROUND(CAST(2 * ((n - m) * s + tr) - (n + 1) * s AS DOUBLE)
                  / CAST(n * s AS DOUBLE) * 1e6) AS BIGINT)
           ELSE 0 END AS gini_e6,
           CAST(ROUND(CAST(topc AS DOUBLE) / CAST(s AS DOUBLE) * 1e6)
                AS BIGINT) AS top_decile_share_e6
    FROM a
    """,
)
def ts_gini_hours(spark, sf_dir):
    """Gini coefficient of hourly event counts over each series' full
    hourly grid (silent hours as zeros) plus the top-decile volume
    share — the volume-concentration lens (see analytics.gini_hours)."""
    from tokens_ts import analytics

    ev = _ev(spark, sf_dir).select(
        F.col("event_type").alias("series_id"), "ts"
    )
    return analytics.gini_hours(ev, keys=["series_id"], ts_col="ts").select(
        "series_id", "n_hours", "n_active", "gini_e6", "top_decile_share_e6"
    )


@q(
    "ts_welch_drift",
    """
    WITH b AS (
      SELECT event_type AS series_id,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ep,
             CAST(ROUND(avg(value) * 1e3) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    r AS (
      SELECT series_id, v,
             row_number() OVER (PARTITION BY series_id ORDER BY ep) AS i,
             count(*) OVER (PARTITION BY series_id) AS n
      FROM b
    ),
    g AS (
      SELECT series_id,
             sum(CASE WHEN i <= n // 2 THEN 1 ELSE 0 END) AS na,
             sum(CASE WHEN i > n // 2 THEN 1 ELSE 0 END) AS nb,
             sum(CASE WHEN i <= n // 2 THEN v ELSE 0 END) AS sa,
             sum(CASE WHEN i > n // 2 THEN v ELSE 0 END) AS sb,
             sum(CASE WHEN i <= n // 2 THEN v * v ELSE 0 END) AS qa,
             sum(CASE WHEN i > n // 2 THEN v * v ELSE 0 END) AS qb
      FROM r GROUP BY 1
    ),
    d AS (
      SELECT series_id, na, nb,
             CAST(na AS DOUBLE) AS nad, CAST(nb AS DOUBLE) AS nbd,
             CAST(sa AS DOUBLE) AS sad, CAST(sb AS DOUBLE) AS sbd,
             CAST(na * qa - sa * sa AS DOUBLE) AS da2,
             CAST(nb * qb - sb * sb AS DOUBLE) AS db2
      FROM g WHERE na >= 2 AND nb >= 2
    ),
    e AS (
      SELECT series_id, na, nb,
             da2 / (nad * (nad - 1)) / nad
               + db2 / (nbd * (nbd - 1)) / nbd AS se2,
             sad / nad - sbd / nbd AS diff,
             da2 / (nad * (nad - 1)) / nad AS vna,
             db2 / (nbd * (nbd - 1)) / nbd AS vnb,
             nad, nbd,
             (da2 / nad + db2 / nbd) / (nad + nbd - 2) AS sp2
      FROM d
    )
    SELECT series_id,
           CAST(na AS BIGINT) AS n_a,
           CAST(nb AS BIGINT) AS n_b,
           CASE WHEN se2 > 0 THEN
             CAST(ROUND(diff / sqrt(se2) * 1e6) AS BIGINT) END AS t_e6,
           CASE WHEN se2 > 0 THEN
             CAST(ROUND(se2 * se2
                  / (vna * vna / (nad - 1) + vnb * vnb / (nbd - 1))
                  * 1e6) AS BIGINT) END AS df_e6,
           CASE WHEN sp2 > 0 THEN
             CAST(ROUND(diff / sqrt(sp2) * 1e6) AS BIGINT) END AS cohen_d_e6
    FROM e
    """,
)
def ts_welch_drift(spark, sf_dir):
    """Welch's t between the first and second half of each event_type
    series' hourly bucket history, with Welch–Satterthwaite df and
    Cohen's d — the parametric drift twin of ts_mannwhitney (see
    analytics.welch_drift)."""
    from tokens_ts import analytics

    ev = _ev(spark, sf_dir).select(
        F.col("event_type").alias("series_id"), "ts", "value"
    )
    return analytics.welch_drift(
        ev, keys=["series_id"], ts_col="ts", value_col="value"
    ).select("series_id", "n_a", "n_b", "t_e6", "df_e6", "cohen_d_e6")


@q(
    "ts_chi2_dow_type",
    """
    WITH cells AS (
      SELECT (epoch_us(ts) // 86400000000 + 3) % 7 AS dow,
             event_type, count(*) AS o
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT o,
             sum(o) OVER (PARTITION BY dow) AS r,
             sum(o) OVER (PARTITION BY event_type) AS c,
             sum(o) OVER () AS n,
             count(DISTINCT dow) OVER () AS nr,
             count(DISTINCT event_type) OVER () AS nc
      FROM cells
    ),
    t AS (
      SELECT n, nr, nc,
             CAST(ROUND(
               CAST(o AS DOUBLE) * CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
               / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE))
               * 1e6) AS BIGINT) AS t6
      FROM m
    ),
    s AS (
      SELECT n, nr, nc, sum(t6) - n * 1000000 AS chi2_e6
      FROM t GROUP BY 1, 2, 3
    )
    SELECT CAST(n AS BIGINT) AS n_obs,
           CAST(nr AS BIGINT) AS n_rows,
           CAST(nc AS BIGINT) AS n_cols,
           CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof,
           CAST(chi2_e6 AS BIGINT) AS chi2_e6,
           CASE WHEN least(nr - 1, nc - 1) > 0 THEN
             CAST(ROUND(sqrt(CAST(chi2_e6 AS DOUBLE) / 1e6
                  / CAST(n * least(nr - 1, nc - 1) AS DOUBLE)) * 1e6)
                  AS BIGINT) END AS cramers_v_e6
    FROM s
    """,
)
def ts_chi2_dow_type(spark, sf_dir):
    """Chi-square independence of weekday x event_type with Cramér's V
    — is the event mix calendar-structured at all? Per-cell e6
    pre-quantized contributions (see analytics.chi2_independence)."""
    from tokens_ts import analytics

    ev = _ev(spark, sf_dir).select(
        F.pmod(
            (F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(86400_000_000))
            .cast("bigint") + 3,
            F.lit(7),
        ).alias("dow"),
        "event_type",
    )
    return analytics.chi2_independence(ev, "dow", "event_type").select(
        "n_obs", "n_rows", "n_cols", "dof", "chi2_e6", "cramers_v_e6"
    )


def _isotropy_sql(dim: int = 64) -> str:
    nchain = " + ".join(f"x[{j}] * x[{j}]" for j in range(1, dim + 1))
    qchain = " + ".join(f"q[{j}] * q[{j}]" for j in range(1, dim + 1))
    ssums = ", ".join(f"sum(q[{j}]) AS s{j}" for j in range(1, dim + 1))
    schain = " + ".join(f"s{j} * s{j}" for j in range(1, dim + 1))
    return f"""
    WITH e AS (
      SELECT label, CAST(embedding AS DOUBLE[]) AS x FROM embeddings
      WHERE embedding IS NOT NULL AND label IS NOT NULL
    ),
    nr AS (
      SELECT label, x, sqrt(0.0 + {nchain}) AS nm FROM e
    ),
    qv AS (
      SELECT label,
             list_transform(x, v -> CAST(ROUND(v / nm * 1000) AS BIGINT))
               AS q
      FROM nr WHERE nm > 0
    ),
    g AS (
      SELECT label, count(*) AS n, sum({qchain}) AS qs, {ssums}
      FROM qv GROUP BY 1
    )
    SELECT CAST(label AS BIGINT) AS label,
           CAST(n AS BIGINT) AS n,
           CASE WHEN n >= 2 THEN
             CAST(ROUND(CAST(({schain}) - qs AS DOUBLE)
                  / CAST(n * (n - 1) AS DOUBLE)) AS BIGINT)
           END AS avg_pair_cos_e6,
           CAST(ROUND(sqrt(CAST({schain} AS DOUBLE)) / CAST(n AS DOUBLE)
                * 1000.0) AS BIGINT) AS mean_resultant_e6
    FROM g
    """


@q("emb_isotropy", _isotropy_sql())
def emb_isotropy(spark, sf_dir):
    """Per-label average pairwise cosine (closed form — no pair join)
    and mean resultant length: the representation-collapse dial that
    measures member-to-member agreement (see simsearch.isotropy)."""
    return simsearch.isotropy(_emb(spark, sf_dir)).select(
        F.col("label").cast("bigint").alias("label"),
        "n",
        "avg_pair_cos_e6",
        "mean_resultant_e6",
    )


@q(
    "doc_minhash_accuracy",
    "WITH "
    + _MD5_LSH_CTES
    + """
    ,
    cand AS (
      SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      FROM sized x JOIN sized y ON x.band = y.band AND x.bucket = y.bucket
      WHERE x.doc_id < y.doc_id
    ),
    sides AS (
      SELECT sig.doc_id, sig.mh, sh.sh3 FROM sig JOIN sh USING (doc_id)
    ),
    j AS (
      SELECT cand.a, cand.b,
             CAST(list_sum(list_transform(range(1, 33),
               i -> CASE WHEN sa.mh[i] = sb.mh[i] THEN 1 ELSE 0 END))
               AS BIGINT) AS est_matches,
             CAST(len(list_intersect(sa.sh3, sb.sh3)) AS BIGINT) AS n_inter,
             CAST(len(list_distinct(list_concat(sa.sh3, sb.sh3))) AS BIGINT)
               AS n_union
      FROM cand
      JOIN sides sa ON sa.doc_id = cand.a
      JOIN sides sb ON sb.doc_id = cand.b
    )
    SELECT a, b, est_matches, n_inter, n_union,
           CAST(ROUND(abs(CAST(est_matches AS DOUBLE) / 32.0
                - CAST(n_inter AS DOUBLE) / CAST(n_union AS DOUBLE))
                * 1e6) AS BIGINT) AS abs_err_e6
    FROM j
    """,
)
def doc_minhash_accuracy(spark, sf_dir):
    """Sketch-error audit: for every md5-LSH candidate pair, the
    signature Jaccard estimate vs the exact shingle Jaccard and the
    absolute e6 error — the n_perm/banding tuning table, measured on
    the pairs the index really emits (see dedup.minhash_accuracy)."""
    return dedup.minhash_accuracy(_docs(spark, sf_dir), hash_mode="md5")


@q(
    "emb_hubness",
    """
    WITH q AS (
      SELECT vec_id AS qid, embedding AS qe FROM embeddings
      WHERE vec_id % 37 = 0
    ),
    c AS (
      SELECT q.qid, e.vec_id AS nid,
             list_sum(list_transform(range(1, 65),
               i -> CAST(q.qe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
               AS dot,
             sqrt(list_sum(list_transform(q.qe,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS na,
             sqrt(list_sum(list_transform(e.embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nb
      FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid
    ),
    top AS (
      SELECT qid, nid FROM (
        SELECT qid, nid,
               row_number() OVER (
                 PARTITION BY qid
                 ORDER BY CAST(ROUND(dot / (na * nb) * 1e6) AS BIGINT) DESC,
                          nid
               ) AS rank
        FROM c
      ) WHERE rank <= 5
    ),
    deg AS (SELECT nid, count(*) AS in_deg FROM top GROUP BY 1),
    hist AS (
      SELECT CAST(in_deg AS BIGINT) AS in_deg,
             CAST(count(*) AS BIGINT) AS n_vectors
      FROM deg GROUP BY 1
    ),
    zero AS (
      SELECT CAST(0 AS BIGINT) AS in_deg,
             CAST((SELECT count(*) FROM embeddings)
                  - (SELECT count(*) FROM deg) AS BIGINT) AS n_vectors
    )
    SELECT * FROM hist
    UNION ALL
    SELECT * FROM zero WHERE n_vectors > 0
    """,
)
def emb_hubness(spark, sf_dir):
    """k-NN in-degree histogram over the deterministic mod-37 query
    sample — the hubness pathology dial, including the never-retrieved
    in_deg = 0 mass (see simsearch.hubness)."""
    return simsearch.hubness(_emb(spark, sf_dir)).select(
        "in_deg", "n_vectors"
    )


@q(
    "ts_longest_run",
    """
    WITH b AS (
      SELECT event_type AS series_id,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ep,
             CAST(ROUND(avg(value) * 1e6) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    o AS (
      SELECT series_id, ep, v,
             row_number() OVER (PARTITION BY series_id ORDER BY v, ep)
               AS rn,
             count(*) OVER (PARTITION BY series_id) AS nb
      FROM b
    ),
    m AS (
      SELECT series_id,
             sum(CASE WHEN rn = (nb + 1) // 2 THEN v ELSE 0 END)
               + sum(CASE WHEN rn = nb // 2 + 1 THEN v ELSE 0 END) AS med2
      FROM o GROUP BY 1
    ),
    s AS (
      SELECT o.series_id, ep, 2 * v - med2 AS d
      FROM o JOIN m ON o.series_id = m.series_id
      WHERE 2 * v - med2 <> 0
    ),
    mk AS (
      SELECT series_id, ep, d > 0 AS up,
             CASE WHEN lag(d) OVER w IS NULL
                    OR (d > 0) <> (lag(d) OVER w > 0)
                  THEN 1 ELSE 0 END AS st
      FROM s WINDOW w AS (PARTITION BY series_id ORDER BY ep)
    ),
    rid AS (
      SELECT series_id, up,
             sum(st) OVER (PARTITION BY series_id ORDER BY ep) AS rid
      FROM mk
    ),
    runs AS (
      SELECT series_id, rid, up, count(*) AS len
      FROM rid GROUP BY 1, 2, 3
    )
    SELECT series_id,
           CAST(sum(len) AS BIGINT) AS n_kept,
           CAST(count(*) AS BIGINT) AS n_runs,
           CAST(coalesce(max(CASE WHEN up THEN len END), 0) AS BIGINT)
             AS longest_up,
           CAST(coalesce(max(CASE WHEN NOT up THEN len END), 0) AS BIGINT)
             AS longest_down
    FROM runs GROUP BY 1
    """,
)
def ts_longest_run(spark, sf_dir):
    """Longest above/below-median streaks per event_type series —
    the regime-persistence lengths behind ts_runs_test's z, same
    median cut and tie rules (see analytics.longest_run)."""
    from tokens_ts import analytics

    ev = _ev(spark, sf_dir).select(
        F.col("event_type").alias("series_id"), "ts", "value"
    )
    return analytics.longest_run(
        ev, keys=["series_id"], ts_col="ts", value_col="value"
    ).select("series_id", "n_kept", "n_runs", "longest_up", "longest_down")


@q(
    "ts_extremal_index",
    """
    WITH b AS (
      SELECT event_type AS series_id,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ep,
             CAST(ROUND(avg(value) * 1e6) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    o AS (
      SELECT series_id, ep, v,
             row_number() OVER (PARTITION BY series_id ORDER BY v, ep)
               AS rn,
             count(*) OVER (PARTITION BY series_id) AS n
      FROM b
    ),
    t AS (
      SELECT series_id,
             sum(CASE WHEN rn = n - n // 10 THEN v ELSE 0 END) AS u
      FROM o GROUP BY 1
    ),
    exc AS (
      SELECT o.series_id, ep, n FROM o JOIN t ON o.series_id = t.series_id
      WHERE v > u
    ),
    mk AS (
      SELECT series_id, ep, n,
             CASE WHEN lag(ep) OVER w IS NULL OR ep - lag(ep) OVER w > 3600
                  THEN 1 ELSE 0 END AS st
      FROM exc WINDOW w AS (PARTITION BY series_id ORDER BY ep)
    ),
    cl AS (
      SELECT series_id, n,
             sum(st) OVER (PARTITION BY series_id ORDER BY ep) AS cid
      FROM mk
    ),
    cs AS (
      SELECT series_id, max(n) AS n, cid, count(*) AS sz
      FROM cl GROUP BY 1, 3
    )
    SELECT series_id,
           CAST(max(n) AS BIGINT) AS n_buckets,
           CAST(sum(sz) AS BIGINT) AS n_exceed,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(max(sz) AS BIGINT) AS max_cluster,
           CAST(ROUND(CAST(count(*) AS DOUBLE) / CAST(sum(sz) AS DOUBLE)
                * 1e6) AS BIGINT) AS theta_e6
    FROM cs GROUP BY 1
    """,
)
def ts_extremal_index(spark, sf_dir):
    """Runs-declustering extremal index of the strict top decile of
    hourly means per event_type series, with the worst storm length
    (see analytics.extremal_index)."""
    from tokens_ts import analytics

    ev = _ev(spark, sf_dir).select(
        F.col("event_type").alias("series_id"), "ts", "value"
    )
    return analytics.extremal_index(
        ev, keys=["series_id"], ts_col="ts", value_col="value"
    ).select(
        "series_id", "n_buckets", "n_exceed", "n_clusters", "max_cluster",
        "theta_e6",
    )


@q(
    "ts_records",
    """
    WITH b AS (
      SELECT event_type AS series_id,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ep,
             CAST(ROUND(avg(value) * 1e6) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    r AS (
      SELECT series_id, v,
             row_number() OVER w AS k,
             max(v) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS pmax,
             min(v) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS pmin
      FROM b WINDOW w AS (PARTITION BY series_id ORDER BY ep)
    )
    SELECT series_id,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(sum(CASE WHEN pmax IS NULL OR v > pmax THEN 1 ELSE 0 END)
                AS BIGINT) AS n_records_up,
           CAST(sum(CASE WHEN pmin IS NULL OR v < pmin THEN 1 ELSE 0 END)
                AS BIGINT) AS n_records_down,
           CAST(sum(CAST(ROUND(1e9 / CAST(k AS DOUBLE)) AS BIGINT))
                AS BIGINT) AS expected_e9,
           CAST(ROUND(
             CAST(sum(CASE WHEN pmax IS NULL OR v > pmax THEN 1 ELSE 0 END)
                  AS DOUBLE)
             / (CAST(sum(CAST(ROUND(1e9 / CAST(k AS DOUBLE)) AS BIGINT))
                     AS DOUBLE) / 1e9)
             * 1e6) AS BIGINT) AS up_ratio_e6
    FROM r GROUP BY 1
    """,
)
def ts_records(spark, sf_dir):
    """Record-breaking high/low counts per event_type series vs the
    exact exchangeability expectation H_n — the distribution-free
    drift alarm (see analytics.record_counts)."""
    from tokens_ts import analytics

    ev = _ev(spark, sf_dir).select(
        F.col("event_type").alias("series_id"), "ts", "value"
    )
    return analytics.record_counts(
        ev, keys=["series_id"], ts_col="ts", value_col="value"
    ).select(
        "series_id", "n_buckets", "n_records_up", "n_records_down",
        "expected_e9", "up_ratio_e6",
    )


@q(
    "emb_knn_purity",
    """
    WITH q AS (
      SELECT vec_id AS qid, label AS qlabel, embedding AS qe
      FROM embeddings WHERE vec_id % 37 = 0
    ),
    c AS (
      SELECT q.qid, q.qlabel, e.label AS nlabel, e.vec_id AS nid,
             list_sum(list_transform(range(1, 65),
               i -> CAST(q.qe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
               AS dot,
             sqrt(list_sum(list_transform(q.qe,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS na,
             sqrt(list_sum(list_transform(e.embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nb
      FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid
    ),
    top AS (
      SELECT qid, qlabel, nlabel, rank FROM (
        SELECT qid, qlabel, nlabel,
               row_number() OVER (
                 PARTITION BY qid
                 ORDER BY CAST(ROUND(dot / (na * nb) * 1e6) AS BIGINT) DESC,
                          nid
               ) AS rank
        FROM c
      ) WHERE rank <= 5
    ),
    pq AS (
      SELECT qid, qlabel,
             sum(CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END) AS m,
             sum(CASE WHEN rank = 1 AND nlabel = qlabel THEN 1 ELSE 0 END)
               AS nn1
      FROM top GROUP BY 1, 2
    )
    SELECT CAST(qlabel AS BIGINT) AS label,
           CAST(count(*) AS BIGINT) AS n_queries,
           CAST(sum(m) AS BIGINT) AS n_matches,
           CAST(sum(nn1) AS BIGINT) AS n_nn1_correct,
           CAST(ROUND(CAST(sum(m) AS DOUBLE)
                / CAST(count(*) * 5 AS DOUBLE) * 1e6) AS BIGINT)
             AS purity_e6
    FROM pq GROUP BY 1
    """,
)
def emb_knn_purity(spark, sf_dir):
    """Leave-one-out kNN label purity + 1-NN accuracy per label over
    the mod-37 query sample — retrieval-behavior label quality (see
    simsearch.knn_purity)."""
    return simsearch.knn_purity(_emb(spark, sf_dir)).select(
        F.col("label").cast("bigint").alias("label"),
        "n_queries", "n_matches", "n_nn1_correct", "purity_e6",
    )


@q(
    "doc_minhash_pr_curve",
    "WITH "
    + _MD5_LSH_CTES
    + """
    ,
    cand AS (
      SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      FROM sized x JOIN sized y ON x.band = y.band AND x.bucket = y.bucket
      WHERE x.doc_id < y.doc_id
    ),
    sides AS (
      SELECT sig.doc_id, sig.mh, sh.sh3 FROM sig JOIN sh USING (doc_id)
    ),
    j AS (
      SELECT CAST(list_sum(list_transform(range(1, 33),
               i -> CASE WHEN sa.mh[i] = sb.mh[i] THEN 1 ELSE 0 END))
               AS BIGINT) AS est,
             CAST(len(list_intersect(sa.sh3, sb.sh3)) AS BIGINT) AS ni,
             CAST(len(list_distinct(list_concat(sa.sh3, sb.sh3))) AS BIGINT)
               AS nu
      FROM cand
      JOIN sides sa ON sa.doc_id = cand.a
      JOIN sides sb ON sb.doc_id = cand.b
    ),
    x AS (
      SELECT j.*, t.tau FROM j,
        (SELECT unnest([400000, 500000, 600000, 700000, 800000, 900000])
           AS tau) t
    ),
    g AS (
      SELECT CAST(tau AS BIGINT) AS tau_e6,
             count(*) AS n_pairs,
             sum(CASE WHEN est * 1000000 >= 32 * tau THEN 1 ELSE 0 END)
               AS n_est_pos,
             sum(CASE WHEN ni * 1000000 >= tau * nu THEN 1 ELSE 0 END)
               AS n_exact_pos,
             sum(CASE WHEN est * 1000000 >= 32 * tau
                       AND ni * 1000000 >= tau * nu THEN 1 ELSE 0 END)
               AS n_true_pos
      FROM x GROUP BY 1
    )
    SELECT tau_e6,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(n_est_pos AS BIGINT) AS n_est_pos,
           CAST(n_exact_pos AS BIGINT) AS n_exact_pos,
           CAST(n_true_pos AS BIGINT) AS n_true_pos,
           CASE WHEN n_est_pos > 0 THEN
             CAST(ROUND(CAST(n_true_pos AS DOUBLE)
                  / CAST(n_est_pos AS DOUBLE) * 1e6) AS BIGINT)
           END AS precision_e6,
           CASE WHEN n_exact_pos > 0 THEN
             CAST(ROUND(CAST(n_true_pos AS DOUBLE)
                  / CAST(n_exact_pos AS DOUBLE) * 1e6) AS BIGINT)
           END AS sensitivity_e6
    FROM g
    """,
)
def doc_minhash_pr_curve(spark, sf_dir):
    """Precision/sensitivity of the md5-LSH signature decision at six
    near-dup thresholds — the curve a pipeline threshold is chosen
    from; integer cross-multiply comparisons, no rounding in any cell
    (see dedup.minhash_pr_curve)."""
    return dedup.minhash_pr_curve(_docs(spark, sf_dir), hash_mode="md5")


@q(
    "seq_bigram_pred_acc",
    _synth_cte()
    + """
    , bg AS (
      SELECT source, tokens[i] AS a, tokens[i + 1] AS b
      FROM seq, unnest(range(1, len(tokens))) AS u(i)
      WHERE tokens[i] <> 0 AND tokens[i + 1] <> 0
    ),
    bgc AS (SELECT a, b, count(*) AS cab FROM bg GROUP BY 1, 2),
    pred AS (
      SELECT a, b AS b_hat FROM (
        SELECT a, b,
               row_number() OVER (PARTITION BY a ORDER BY cab DESC, b)
                 AS rk
        FROM bgc
      ) WHERE rk = 1
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(CASE WHEN b = b_hat THEN 1 ELSE 0 END) AS BIGINT)
             AS n_correct,
           CAST(ROUND(CAST(sum(CASE WHEN b = b_hat THEN 1 ELSE 0 END)
                           AS DOUBLE)
                / CAST(count(*) AS DOUBLE) * 1e6) AS BIGINT) AS acc_e6
    FROM bg JOIN pred USING (a)
    GROUP BY 1
    """,
)
def seq_bigram_pred_acc(spark, sf_dir):
    """Top-1 bigram self-prediction accuracy per synthetic source —
    the speculative-decoding predictability number, argmax ties to the
    smallest token id (see textops.bigram_pred_acc)."""
    return textops.bigram_pred_acc(_seq(spark), pad_id=C.PAD_ID).select(
        "source", "n_bigrams", "n_correct", "acc_e6"
    )


@q(
    "ts_qq_drift",
    """
    WITH b AS (
      SELECT event_type AS series_id,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ep,
             CAST(ROUND(avg(value) * 1e6) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    r AS (
      SELECT series_id, v, ep,
             CASE WHEN row_number() OVER (PARTITION BY series_id
                                          ORDER BY ep)
                    <= count(*) OVER (PARTITION BY series_id) // 2
                  THEN 1 ELSE 2 END AS h
      FROM b
    ),
    rr AS (
      SELECT series_id, h, v,
             row_number() OVER (PARTITION BY series_id, h
                                ORDER BY v, ep) AS rv,
             count(*) OVER (PARTITION BY series_id, h) AS m
      FROM r
    ),
    d AS (
      SELECT series_id, h, v, dec FROM rr,
        (SELECT unnest(range(1, 10)) AS dec) x
      WHERE rv * 10 >= dec * m AND (rv - 1) * 10 < dec * m
    )
    SELECT series_id,
           CAST(dec AS BIGINT) AS decile,
           CAST(sum(CASE WHEN h = 1 THEN v END) AS BIGINT) AS q_first_e6,
           CAST(sum(CASE WHEN h = 2 THEN v END) AS BIGINT) AS q_second_e6,
           CAST(sum(CASE WHEN h = 2 THEN v END)
                - sum(CASE WHEN h = 1 THEN v END) AS BIGINT) AS shift_e6
    FROM d GROUP BY 1, 2
    HAVING sum(CASE WHEN h = 1 THEN v END) IS NOT NULL
       AND sum(CASE WHEN h = 2 THEN v END) IS NOT NULL
    """,
)
def ts_qq_drift(spark, sf_dir):
    """Decile-by-decile exact quantile shift between the two halves of
    each event_type series — the WHERE of a distribution drift, with
    no floating point anywhere (see analytics.qq_drift)."""
    from tokens_ts import analytics

    ev = _ev(spark, sf_dir).select(
        F.col("event_type").alias("series_id"), "ts", "value"
    )
    return analytics.qq_drift(
        ev, keys=["series_id"], ts_col="ts", value_col="value"
    ).select("series_id", "decile", "q_first_e6", "q_second_e6", "shift_e6")


@q(
    "ts_vol_clustering",
    """
    WITH b AS (
      SELECT event_type AS series_id,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ep,
             CAST(ROUND(avg(value) * 1e3) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    d AS (
      SELECT series_id, ep,
             CASE WHEN ep - lag(ep) OVER w = 3600
                  THEN abs(v - lag(v) OVER w) END AS r
      FROM b WINDOW w AS (PARTITION BY series_id ORDER BY ep)
    ),
    dd AS (SELECT * FROM d WHERE r IS NOT NULL),
    p AS (
      SELECT series_id, r AS y,
             CASE WHEN ep - lag(ep) OVER w = 3600
                  THEN lag(r) OVER w END AS x
      FROM dd WINDOW w AS (PARTITION BY series_id ORDER BY ep)
    ),
    a AS (
      SELECT series_id, count(*) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
      FROM p WHERE x IS NOT NULL GROUP BY 1
    )
    SELECT series_id,
           CAST(n AS BIGINT) AS n_pairs,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
             CAST(ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                  / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                         * CAST(n * syy - sy * sy AS DOUBLE))
                  * 1e6) AS BIGINT) END AS arch_r_e6
    FROM a WHERE n >= 2
    """,
)
def ts_vol_clustering(spark, sf_dir):
    """Lag-1 autocorrelation of absolute hourly changes per event_type
    series — the ARCH volatility-clustering dial, gap-correct and
    overflow-safe via the |delta| form (see analytics.vol_clustering)."""
    from tokens_ts import analytics

    ev = _ev(spark, sf_dir).select(
        F.col("event_type").alias("series_id"), "ts", "value"
    )
    return analytics.vol_clustering(
        ev, keys=["series_id"], ts_col="ts", value_col="value"
    ).select("series_id", "n_pairs", "arch_r_e6")


@q(
    "doc_cross_source_dups",
    "WITH "
    + _MD5_LSH_CTES
    + """
    ,
    cand AS (
      SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      FROM sized x JOIN sized y ON x.band = y.band AND x.bucket = y.bucket
      WHERE x.doc_id < y.doc_id
    ),
    j AS (
      SELECT least(da.source, db.source) AS source_a,
             greatest(da.source, db.source) AS source_b
      FROM cand
      JOIN documents da ON da.doc_id = cand.a
      JOIN documents db ON db.doc_id = cand.b
    )
    SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_pairs
    FROM j GROUP BY 1, 2
    """,
)
def doc_cross_source_dups(spark, sf_dir):
    """Near-duplicate flow matrix between sources over the md5-LSH
    candidate pairs — internal boilerplate (diagonal) vs feed
    republication (off-diagonal) (see dedup.cross_source_dups)."""
    return dedup.cross_source_dups(_docs(spark, sf_dir), hash_mode="md5")


@q(
    "ts_ess",
    """
    WITH b AS (
      SELECT event_type AS series_id,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ep,
             avg(value) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    nb AS (SELECT series_id, count(*) AS n FROM b GROUP BY 1),
    pairs AS (
      SELECT l.series_id, lg.lag, l.v AS x, r.v AS y
      FROM b l
      JOIN (SELECT unnest(range(1, 7)) AS lag) lg ON TRUE
      JOIN b r ON r.series_id = l.series_id
             AND r.ep = l.ep + lg.lag * 3600
    ),
    ac AS (
      SELECT series_id, lag, count(*) AS n,
             sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
             sum(x * x) AS sxx, sum(y * y) AS syy
      FROM pairs GROUP BY 1, 2
    ),
    rho AS (
      SELECT series_id, lag,
             CASE WHEN n >= 2
                   AND CAST(n AS DOUBLE) * sxx - sx * sx > 0
                   AND CAST(n AS DOUBLE) * syy - sy * sy > 0 THEN
               CAST(ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
                    / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                           * (CAST(n AS DOUBLE) * syy - sy * sy))
                    * 1e6) AS BIGINT)
             ELSE 0 END AS r6
      FROM ac
    ),
    s AS (
      SELECT series_id, sum(r6) AS rho_sum, count(*) AS n_lags
      FROM rho GROUP BY 1
    )
    SELECT nb.series_id,
           CAST(nb.n AS BIGINT) AS n_buckets,
           CAST(s.n_lags AS BIGINT) AS n_lags,
           CAST(s.rho_sum AS BIGINT) AS rho_sum_e6,
           CASE WHEN 1000000 + 2 * s.rho_sum > 0 THEN
             CAST(ROUND(CAST(nb.n AS DOUBLE) * 1e6
                  / CAST(1000000 + 2 * s.rho_sum AS DOUBLE) * 1e3)
                  AS BIGINT) END AS ess_e3,
           CASE WHEN 1000000 + 2 * s.rho_sum > 0 THEN
             CAST(ROUND(1e12 / CAST(1000000 + 2 * s.rho_sum AS DOUBLE))
                  AS BIGINT) END AS ess_ratio_e6
    FROM nb JOIN s ON nb.series_id = s.series_id
    """,
)
def ts_ess(spark, sf_dir):
    """Autocorrelation-adjusted effective sample size per event_type
    series: n / (1 + 2*sum rho_k), k <= 6, rhos pre-quantized at e6 —
    the CI correction factor (see analytics.effective_sample_size)."""
    from tokens_ts import analytics

    ev = _ev(spark, sf_dir).select(
        F.col("event_type").alias("series_id"), "ts", "value"
    )
    return analytics.effective_sample_size(
        ev, keys=["series_id"], ts_col="ts", value_col="value"
    ).select(
        "series_id", "n_buckets", "n_lags", "rho_sum_e6", "ess_e3",
        "ess_ratio_e6",
    )


@q(
    "doc_dup_family_sizes",
    "WITH RECURSIVE "
    + _MD5_LSH_CTES
    + """
    ,
    cand AS (
      SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      FROM sized x JOIN sized y ON x.band = y.band AND x.bucket = y.bucket
      WHERE x.doc_id < y.doc_id
    ),
    edges AS (
      SELECT a AS u, b AS v FROM cand UNION SELECT b AS u, a AS v FROM cand
    ),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    comp AS (
      SELECT u AS doc_id, least(u, min(v)) AS component
      FROM reach GROUP BY u
    ),
    fam AS (SELECT component, count(*) AS sz FROM comp GROUP BY 1)
    SELECT CAST(sz AS BIGINT) AS family_size,
           CAST(count(*) AS BIGINT) AS n_families,
           CAST(sum(sz) AS BIGINT) AS n_docs,
           CAST(sum(sz) - count(*) AS BIGINT) AS n_removable
    FROM fam GROUP BY 1
    """,
)
def doc_dup_family_sizes(spark, sf_dir):
    """Duplicate-family size census over the md5-LSH component graph:
    per family size, how many families, how many docs they hold, and
    how many rows a keep-one policy deletes — the census that says
    whether duplication is pairwise noise (mass at size 2) or
    boilerplate black holes (a fat tail), and the exact row count a
    dedup pass will remove. Derived from the SAME label-propagation
    components the dedup chain uses, so the census and the deletion
    agree by construction; sizes/counts exact integers."""
    pairs = dedup.lsh_candidates(
        _docs(spark, sf_dir), n_perm=32, bands=8, hash_mode="md5"
    )
    comp = dedup.connected_components(pairs)
    fam = comp.groupBy("component").agg(F.count("*").alias("sz"))
    return (
        fam.groupBy(F.col("sz").cast("bigint").alias("family_size"))
        .agg(
            F.count("*").cast("bigint").alias("n_families"),
            F.sum("sz").cast("bigint").alias("n_docs"),
            (F.sum("sz") - F.count("*")).cast("bigint").alias("n_removable"),
        )
    )


@q(
    "seq_pack_xattn",
    _synth_cte()
    + _PACK_CTES
    + """
    , a AS (
      SELECT chunk_id, count(*) AS n_spans, sum(span_len) AS lf,
             sum(span_len * span_len) AS sq
      FROM spans GROUP BY 1
    )
    SELECT chunk_id,
           CAST(n_spans AS BIGINT) AS n_spans,
           CAST(lf AS BIGINT) AS n_filled,
           CAST((lf * lf - sq) / 2 AS BIGINT) AS n_cross_pairs,
           CAST(lf * (lf - 1) / 2 AS BIGINT) AS n_causal_pairs,
           CASE WHEN lf > 1 THEN
             CAST(ROUND(CAST((lf * lf - sq) / 2 AS DOUBLE)
                  / CAST(lf * (lf - 1) / 2 AS DOUBLE) * 1e6) AS BIGINT)
           END AS cross_frac_e6
    FROM a
    """,
)
def seq_pack_xattn(spark, sf_dir):
    """Cross-document causal-attention pair count per packed chunk —
    the contamination a block-diagonal mask removes, closed-form from
    the span lengths (see packing.pack_xattn)."""
    return packing.pack_xattn(_seq(spark), chunk_len=_PACK_L).select(
        "chunk_id", "n_spans", "n_filled", "n_cross_pairs",
        "n_causal_pairs", "cross_frac_e6",
    )


@q(
    "ts_conformal",
    """
    WITH b AS (
      SELECT event_type AS series_id,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ep,
             CAST(ROUND(avg(value) * 1e6) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    r AS (
      SELECT series_id, ep,
             CASE WHEN ep - lag(ep) OVER w = 3600
                  THEN abs(v - lag(v) OVER w) END AS res
      FROM b WINDOW w AS (PARTITION BY series_id ORDER BY ep)
    ),
    rr AS (SELECT * FROM r WHERE res IS NOT NULL),
    s AS (
      SELECT series_id, ep, res,
             row_number() OVER (PARTITION BY series_id ORDER BY ep)
               <= count(*) OVER (PARTITION BY series_id) // 2 AS cal
      FROM rr
    ),
    ranked AS (
      SELECT series_id, cal, res, ep,
             row_number() OVER (PARTITION BY series_id, cal
                                ORDER BY res, ep) AS rv,
             count(*) OVER (PARTITION BY series_id, cal) AS m
      FROM s
    ),
    qh AS (
      SELECT series_id, res AS qhat, m AS n_cal
      FROM ranked
      WHERE cal AND rv = least(((m + 1) * 90 + 99) // 100, m)
    )
    SELECT t.series_id,
           CAST(qh.n_cal AS BIGINT) AS n_cal,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(qh.qhat AS BIGINT) AS qhat_e6,
           CAST(sum(CASE WHEN t.res <= qh.qhat THEN 1 ELSE 0 END)
                AS BIGINT) AS n_covered,
           CAST(ROUND(CAST(sum(CASE WHEN t.res <= qh.qhat THEN 1 ELSE 0 END)
                           AS DOUBLE)
                / CAST(count(*) AS DOUBLE) * 1e6) AS BIGINT) AS coverage_e6
    FROM (SELECT series_id, res FROM ranked WHERE NOT cal) t
    JOIN qh ON t.series_id = qh.series_id
    GROUP BY 1, 2, 4
    """,
)
def ts_conformal(spark, sf_dir):
    """Split-conformal 90% interval for the persistence forecast per
    event_type series, with measured holdout coverage — distribution-
    free, integer-exact (see analytics.conformal_interval)."""
    from tokens_ts import analytics

    ev = _ev(spark, sf_dir).select(
        F.col("event_type").alias("series_id"), "ts", "value"
    )
    return analytics.conformal_interval(
        ev, keys=["series_id"], ts_col="ts", value_col="value"
    ).select(
        "series_id", "n_cal", "n_test", "qhat_e6", "n_covered",
        "coverage_e6",
    )


@q(
    "ts_page_trend",
    """
    WITH b AS (
      SELECT event_type AS series_id,
             epoch_us(ts) // 86400000000 AS blk,
             (epoch_us(ts) % 86400000000) // 21600000000 AS seg,
             CAST(ROUND(avg(value) * 1e6) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2, 3
    ),
    kk AS (SELECT series_id, count(DISTINCT seg) AS k FROM b GROUP BY 1),
    c AS (
      SELECT b.*, kk.k FROM b JOIN kk USING (series_id)
      QUALIFY count(*) OVER (PARTITION BY series_id, blk) = k
    ),
    r AS (
      SELECT series_id, k,
             2 * rank() OVER (PARTITION BY series_id, blk ORDER BY v)
               + count(*) OVER (PARTITION BY series_id, blk, v) - 1 AS m2,
             dense_rank() OVER (PARTITION BY series_id ORDER BY seg) AS j
      FROM c
    ),
    pt AS (
      SELECT series_id, k, j, sum(m2) AS r2, count(*) AS n
      FROM r GROUP BY 1, 2, 3
    ),
    s AS (
      SELECT series_id, k, max(n) AS nb, sum(j * r2) AS l2
      FROM pt GROUP BY 1, 2
    )
    SELECT series_id,
           CAST(k AS BIGINT) AS k_treatments,
           CAST(nb AS BIGINT) AS n_blocks,
           CAST(l2 AS BIGINT) AS l2,
           CAST(ROUND(
             (CAST(l2 AS DOUBLE)
              - CAST(nb * k * (k + 1) * (k + 1) / 2 AS DOUBLE))
             / (2.0 * sqrt(CAST(nb * k * k * (k + 1) * (k * k - 1)
                                AS DOUBLE) / 144.0))
             * 1e6) AS BIGINT) AS z_e6
    FROM s WHERE k >= 2
    """,
)
def ts_page_trend(spark, sf_dir):
    """Page's L ordered-alternative trend across the four dayparts per
    event_type series — the monotone-ordering test Friedman cannot
    see, same complete-block construction (see analytics.page_trend)."""
    from tokens_ts import analytics

    ev = _ev(spark, sf_dir).select(
        F.col("event_type").alias("series_id"), "ts", "value"
    )
    return analytics.page_trend(
        ev, keys=["series_id"], ts_col="ts", value_col="value"
    ).select("series_id", "k_treatments", "n_blocks", "l2", "z_e6")


@q(
    "ts_yule_walker",
    """
    WITH b AS (
      SELECT event_type AS series_id,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ep,
             avg(value) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    l AS (
      SELECT series_id, ep, v AS x, lg.lag
      FROM b CROSS JOIN (SELECT unnest(range(1, 3)) AS lag) lg
    ),
    p AS (
      SELECT l.series_id, l.lag, l.x, r.v AS y
      FROM l JOIN b r ON r.series_id = l.series_id
                     AND r.ep = l.ep + l.lag * 3600
    ),
    a AS (
      SELECT series_id, lag, CAST(count(*) AS DOUBLE) AS n,
             sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy,
             sum(x*x) AS sxx, sum(y*y) AS syy
      FROM p GROUP BY 1, 2
    ),
    rho AS (
      SELECT series_id, lag, CAST(n AS BIGINT) AS n_pairs,
             CASE WHEN n >= 2 AND n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
                  THEN CAST(ROUND((n*sxy - sx*sy)
                       / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy)) * 1e6)
                       AS BIGINT)
             END AS r
      FROM a
    ),
    pv AS (
      SELECT series_id,
             max(CASE WHEN lag = 1 THEN r END) AS r1,
             max(CASE WHEN lag = 2 THEN r END) AS r2,
             max(CASE WHEN lag = 1 THEN n_pairs END) AS np1
      FROM rho GROUP BY 1
    ),
    t AS (
      SELECT series_id, np1, r1, r2,
             1000000000000 - r1 * r1 AS d,
             r1 * (1000000 - r2) AS aa,
             r2 * 1000000 - r1 * r1 AS bb
      FROM pv
    ),
    v AS (
      SELECT *,
             (r1 IS NOT NULL AND r2 IS NOT NULL AND d > 0) AS ok,
             CAST(aa AS HUGEINT) * aa + 4 * CAST(bb AS HUGEINT) * d AS disc
      FROM t
    )
    SELECT series_id,
           CAST(np1 AS BIGINT) AS n_pairs1,
           r1 AS r1_e6, r2 AS r2_e6,
           CASE WHEN ok THEN CAST(ROUND(
             CAST(aa AS DOUBLE) / CAST(d AS DOUBLE) * 1e6) AS BIGINT)
           END AS phi1_e6,
           CASE WHEN ok THEN CAST(ROUND(
             CAST(bb AS DOUBLE) / CAST(d AS DOUBLE) * 1e6) AS BIGINT)
           END AS phi2_e6,
           CASE WHEN ok THEN
             CAST(bb + d > 0 AND aa + bb < d AND bb - aa < d AS BIGINT)
           END AS stationary,
           CASE WHEN ok THEN CAST(disc < 0 AS BIGINT) END AS oscillatory,
           CASE WHEN ok AND disc < 0 THEN CAST(ROUND(
             (CAST(aa AS DOUBLE) / CAST(d AS DOUBLE))
             / (2.0 * sqrt(-(CAST(bb AS DOUBLE) / CAST(d AS DOUBLE))))
             * 1e6) AS BIGINT)
           END AS cos_theta_e6
    FROM v
    """,
)
def ts_yule_walker(spark, sf_dir):
    """Yule-Walker AR(2) fit per series at hourly buckets: φ₁/φ₂ as
    exact integer rationals over the e6-prequantized ACF ρ₁, ρ₂,
    exact-integer oscillation (complex characteristic roots) and
    stationarity-triangle verdicts, and the ringing angle's cosine as
    a fixed IEEE tree — the overshoot detector AR(1) cannot express
    (see analytics.yule_walker_ar2)."""
    from tokens_ts import analytics

    out = analytics.yule_walker_ar2(
        _ev(spark, sf_dir), keys=["event_type"], ts_col="ts",
        value_col="value", trunc="hour",
    )
    return out.select(
        F.col("event_type").alias("series_id"),
        "n_pairs1", "r1_e6", "r2_e6", "phi1_e6", "phi2_e6",
        "stationary", "oscillatory", "cos_theta_e6",
    )


@q(
    "seq_mlm_plan",
    _synth_cte()
    + f"""
    , am AS (
      SELECT doc_id, len(tokens) AS n, tokens,
             list_transform(range(1, len(tokens) + 1),
               i -> CASE
                 WHEN tokens[i] <> {C.PAD_ID}
                      AND (tokens[i] * 31 + i) % 20 < 3 THEN
                   CASE WHEN (tokens[i] * 17 + i) % 10 < 8 THEN 0
                        WHEN (tokens[i] * 17 + i) % 10 = 8 THEN 1
                        ELSE 2 END
                 ELSE -1 END) AS a
      FROM seq WHERE len(tokens) > 0
    ),
    cr AS (
      SELECT doc_id, n, a,
             len(list_filter(tokens, x -> x <> {C.PAD_ID})) AS n_nonpad,
             list_transform(range(1, n + 1),
               i -> CASE WHEN a[i] = 0 THEN {C.V}
                         WHEN a[i] = 1
                           THEN 1 + (tokens[i] * 13 + i * 7) % {C.V - 1}
                         ELSE tokens[i] END) AS c
      FROM am
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_tok,
           CAST(n_nonpad AS BIGINT) AS n_nonpad,
           CAST(len(list_filter(a, x -> x >= 0)) AS BIGINT) AS n_sel,
           CAST(len(list_filter(a, x -> x = 0)) AS BIGINT) AS n_mask,
           CAST(len(list_filter(a, x -> x = 1)) AS BIGINT) AS n_random,
           CAST(len(list_filter(a, x -> x = 2)) AS BIGINT) AS n_keep,
           CASE WHEN n_nonpad > 0 THEN
             CAST(ROUND(CAST(len(list_filter(a, x -> x >= 0)) AS DOUBLE)
                        / n_nonpad * 1e6) AS BIGINT)
           END AS sel_rate_e6,
           -- array_to_string([]) is NULL in DuckDB but concat_ws('')
           -- is '' in Spark: coalesce pins the empty-plan md5
           md5(coalesce(array_to_string(
             list_filter(list_transform(range(1, n + 1),
               i -> CASE WHEN a[i] >= 0
                         THEN CAST(i AS VARCHAR) || ':'
                              || CAST(a[i] AS VARCHAR) END),
               s -> s IS NOT NULL), ','), '')) AS plan_md5,
           md5(array_to_string(
             list_transform(c, x -> CAST(x AS VARCHAR)), ',')) AS corrupted_md5
    FROM cr
    """,
)
def seq_mlm_plan(spark, sf_dir):
    """BERT-style MLM corruption plan per sequence: content-addressed
    15% selection with 80/10/10 mask/random/keep actions, the plan
    AND the corrupted token stream md5-pinned cross-engine (see
    textops.mlm_plan) — the fourth objective next to CLM packing, FIM,
    and span corruption."""
    return textops.mlm_plan(_seq(spark), pad_id=C.PAD_ID, vocab=C.V)


@q(
    "ts_markov_entropy",
    """
    WITH o AS (
      SELECT user_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS ep,
             lag(event_type) OVER w AS from_type,
             lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w AS pep
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    c AS (
      SELECT from_type, event_type AS to_type, count(*) AS n
      FROM o WHERE from_type IS NOT NULL AND ep - pep <= 1800
      GROUP BY 1, 2
    ),
    cells AS (
      SELECT from_type,
             sum(n) OVER (PARTITION BY from_type) AS nf,
             CAST(ROUND(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type)
                  * ln(CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE)
                       / CAST(n AS DOUBLE))
                  * 1e6) AS BIGINT) AS t
      FROM c
    ),
    g AS (
      SELECT from_type, max(nf) AS n_from, count(*) AS k_next,
             sum(t) AS h_e6
      FROM cells GROUP BY 1
    )
    SELECT from_type,
           CAST(n_from AS BIGINT) AS n_from,
           CAST(k_next AS BIGINT) AS k_next,
           CAST(h_e6 AS BIGINT) AS h_e6,
           CASE WHEN k_next > 1 THEN
             CAST(ROUND(CAST(h_e6 AS DOUBLE)
                        / ln(CAST(k_next AS DOUBLE))) AS BIGINT)
           END AS norm_h_e6
    FROM g
    """,
)
def ts_markov_entropy(spark, sf_dir):
    """Conditional next-event entropy (nats, e6) per from-state of the
    session-bounded event-type chain, with the uniform-normalized
    ratio — the decision-point-vs-mechanical-flow dial the transition
    matrix only implies (see analytics.markov_entropy)."""
    return analytics.markov_entropy(_ev(spark, sf_dir))


@q(
    "doc_ccnet_buckets",
    """
    WITH words AS (
      SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS w
      FROM documents
    ),
    w2 AS (SELECT doc_id, w FROM words WHERE w != ''),
    counts AS (SELECT w, count(*) AS wc FROM w2 GROUP BY 1),
    tot AS (SELECT CAST(sum(wc) AS DOUBLE) AS t FROM counts),
    lp AS (
      SELECT doc_id, count(*) AS n_words,
             CAST(ROUND(avg(ln(wc / t)) * 1e4) AS BIGINT) AS lp_e4
      FROM w2 JOIN counts USING (w) CROSS JOIN tot
      GROUP BY 1
    ),
    scored AS (
      SELECT d.source, lp.n_words, lp.lp_e4,
             row_number() OVER (PARTITION BY d.source
                                ORDER BY lp.lp_e4 DESC, lp.doc_id ASC) AS rn,
             count(*) OVER (PARTITION BY d.source) AS n
      FROM lp JOIN documents d USING (doc_id)
    ),
    b AS (
      SELECT source, n_words, lp_e4,
             CASE WHEN rn * 3 <= n THEN 'head'
                  WHEN rn * 3 <= 2 * n THEN 'middle'
                  ELSE 'tail' END AS bucket
      FROM scored
    )
    SELECT source, bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS n_words,
           CAST(max(lp_e4) AS BIGINT) AS lp_max_e4,
           CAST(min(lp_e4) AS BIGINT) AS lp_min_e4
    FROM b GROUP BY 1, 2
    """,
)
def doc_ccnet_buckets(spark, sf_dir):
    """CCNet-style head/middle/tail perplexity buckets per source over
    the corpus-unigram LM score: per-bucket doc and word mass plus the
    e4 score range — the keep-head+middle filter's decision table,
    with integer-exact bucket edges (see textops.ccnet_buckets)."""
    return textops.ccnet_buckets(_docs(spark, sf_dir))


@q(
    "ts_kaplan_meier",
    """
    WITH e AS (
      SELECT event_type, user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS ep,
             lead(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
               PARTITION BY event_type, user_id
               ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    obs AS (SELECT max(CAST(floor(epoch(ts)) AS BIGINT)) AS oend FROM events),
    g AS (
      SELECT event_type,
             CAST(floor((coalesce(nxt, oend) - ep) / 60.0) AS BIGINT) AS t,
             CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END AS death
      FROM e CROSS JOIN obs
    ),
    per_t AS (
      SELECT event_type, t, sum(death) AS d, count(*) AS m
      FROM g GROUP BY 1, 2
    ),
    risk AS (
      SELECT event_type, t, d,
             sum(m) OVER (PARTITION BY event_type ORDER BY t DESC
                          ROWS UNBOUNDED PRECEDING) AS n_risk
      FROM per_t
    ),
    deaths AS (SELECT * FROM risk WHERE d > 0),
    sc AS (
      SELECT event_type, t, d, n_risk,
             sum(CASE WHEN n_risk > d THEN
                   CAST(ROUND(ln(CAST(n_risk - d AS DOUBLE)
                                 / CAST(n_risk AS DOUBLE)) * 1e6) AS BIGINT)
                 END) OVER (PARTITION BY event_type ORDER BY t ASC
                            ROWS UNBOUNDED PRECEDING) AS logs,
             max(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
               OVER (PARTITION BY event_type ORDER BY t ASC
                     ROWS UNBOUNDED PRECEDING) AS dead_all
      FROM deaths
    )
    SELECT event_type, t, CAST(d AS BIGINT) AS d,
           CAST(n_risk AS BIGINT) AS n_risk,
           CASE WHEN dead_all = 0 THEN CAST(logs AS BIGINT) END AS logs_e6,
           CASE WHEN dead_all = 1 THEN 0
                ELSE CAST(ROUND(exp(CAST(logs AS DOUBLE) / 1e6) * 1e6)
                          AS BIGINT) END AS s_e6
    FROM sc
    """,
)
def ts_kaplan_meier(spark, sf_dir):
    """Right-censored Kaplan-Meier survival of per-user inter-event
    waits per event type at minute buckets: exact d/n_at_risk counts,
    log-survival as an order-free sum of e6-prequantized factors, the
    everyone-dies row pinned to S = 0 (see analytics.kaplan_meier)."""
    return analytics.kaplan_meier(_ev(spark, sf_dir))


@q(
    "ts_kpss",
    _HOURLY_E3
    + """
    , r AS (
      SELECT sid, v,
             row_number() OVER w AS i,
             sum(v) OVER (PARTITION BY sid ORDER BY ep
                          ROWS UNBOUNDED PRECEDING) AS c,
             sum(v) OVER (PARTITION BY sid) AS t,
             count(*) OVER (PARTITION BY sid) AS n
      FROM b WINDOW w AS (PARTITION BY sid ORDER BY ep)
    ),
    dd AS (
      SELECT sid, n,
             CAST(n * v - t AS DOUBLE) / CAST(n AS DOUBLE) AS e_t,
             CAST(n * c - i * t AS DOUBLE) / CAST(n AS DOUBLE) AS s_t
      FROM r
    ),
    terms AS (
      SELECT sid, n,
        CAST(round(e_t * e_t) AS BIGINT) AS dq,
        CAST(round(s_t * s_t / CAST(n AS DOUBLE)) AS BIGINT) AS nq
      FROM dd
    ),
    a AS (
      SELECT sid, CAST(count(*) AS BIGINT) AS n_obs,
             sum(dq) AS den, sum(nq) AS num
      FROM terms GROUP BY 1
    )
    SELECT sid AS series_id, n_obs,
           CASE WHEN n_obs >= 2 AND den > 0
                THEN CAST(round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
                                * 1e6) AS BIGINT)
           END AS kpss_e6
    FROM a
    """,
)
def ts_kpss(spark, sf_dir):
    """KPSS level-stationarity eta per event type over the hourly
    e3-grid bucket sequence — the complementary null to ts_adf (large
    eta REJECTS stationarity where ADF's null is the unit root), so
    the pair four-quadrant-classifies every series. Partial sums and
    residuals exact bigints, quadratics pre-quantized per term (see
    analytics.kpss_test)."""
    return analytics.kpss_test(
        _ev(spark, sf_dir), key_col="event_type", ts_col="ts",
        value_col="value", trunc="hour",
    )


@q(
    "ts_anova_dow",
    """
    WITH b AS (
      SELECT event_type AS series_id,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ep,
             CAST(ROUND(avg(value) * 1e3) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    gr AS (
      SELECT series_id, (ep // 86400 + 3) % 7 AS g, count(*) AS n,
             sum(v) AS zg, sum(v * v) AS qg
      FROM b GROUP BY 1, 2
    ),
    t AS (
      SELECT *,
             CAST(ROUND(CAST(zg AS DOUBLE) * CAST(zg AS DOUBLE)
                        / CAST(n AS DOUBLE) * 1000.0) AS BIGINT) AS t1g
      FROM gr
    ),
    s AS (
      SELECT series_id, sum(n) AS nb, count(*) AS k, sum(zg) AS sz,
             sum(qg) AS sq, sum(t1g) AS t1
      FROM t GROUP BY 1
    ),
    fin AS (
      SELECT series_id, nb, k,
             CAST(1000 * sq - t1 AS BIGINT) AS ssw_m,
             CAST(t1 - CAST(ROUND(CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)
                  / CAST(nb AS DOUBLE) * 1000.0) AS BIGINT) AS BIGINT)
               AS ssb_m
      FROM s WHERE k >= 2 AND nb > k
    )
    SELECT series_id,
           CAST(nb AS BIGINT) AS n_buckets,
           CAST(k AS BIGINT) AS k_groups,
           ssw_m, ssb_m,
           CASE WHEN ssw_m > 0 THEN
             CAST(ROUND(CAST(nb - k AS DOUBLE) * CAST(ssb_m AS DOUBLE)
                  / (CAST(k - 1 AS DOUBLE) * CAST(ssw_m AS DOUBLE))
                  * 1e6) AS BIGINT) END AS f_e6,
           CASE WHEN ssb_m + ssw_m > 0 THEN
             CAST(ROUND(CAST(ssb_m AS DOUBLE)
                  / CAST(ssb_m + ssw_m AS DOUBLE) * 1e6) AS BIGINT)
           END AS eta2_e6
    FROM fin
    """,
)
def ts_anova_dow(spark, sf_dir):
    """One-way ANOVA F + eta² effect size across the seven weekday
    groups of hourly e3 bucket means per event_type — the parametric
    mean test completing the weekday triptych with ts_kruskal_dow
    (ranks) and ts_levene_dow (scale); pre-quantized per-group
    quadratics per the brown_forsythe rule (see analytics.anova_dow)."""
    from tokens_ts import analytics

    ev = _ev(spark, sf_dir).select(
        F.col("event_type").alias("series_id"), "ts", "value"
    )
    return analytics.anova_dow(
        ev, keys=["series_id"], ts_col="ts", value_col="value"
    )


@q(
    "doc_dup_triangles",
    "WITH "
    + _MD5_LSH_CTES
    + """
    ,
    cand AS (
      SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      FROM sized x JOIN sized y ON x.band = y.band AND x.bucket = y.bucket
      WHERE x.doc_id < y.doc_id
    ),
    deg AS (
      SELECT v, count(*) AS d FROM (
        SELECT a AS v FROM cand UNION ALL SELECT b AS v FROM cand
      ) GROUP BY 1
    ),
    ne AS (
      SELECT CAST(count(*) AS BIGINT) AS n_nodes,
             CAST(sum(d) / 2 AS BIGINT) AS n_edges,
             CAST(sum(d * (d - 1) / 2) AS BIGINT) AS n_wedges
      FROM deg
    ),
    tri AS (
      SELECT CAST(count(*) AS BIGINT) AS n_triangles
      FROM cand e1
      JOIN cand e2 ON e1.b = e2.a
      WHERE EXISTS (SELECT 1 FROM cand c
                    WHERE c.a = e1.a AND c.b = e2.b)
    )
    SELECT n_nodes, n_edges, n_wedges, n_triangles,
           CASE WHEN n_wedges > 0 THEN
             CAST(ROUND(3.0 * CAST(n_triangles AS DOUBLE)
                  / CAST(n_wedges AS DOUBLE) * 1e6) AS BIGINT)
           END AS transitivity_e6
    FROM ne CROSS JOIN tri
    """,
)
def doc_dup_triangles(spark, sf_dir):
    """Triangle/wedge census + global transitivity of the md5-seeded
    LSH candidate-pair graph — clique (template boilerplate) vs chain
    (gradual drift) structure of the near-dup families, node-iterator
    triangle counting as two capped relational joins (see
    dedup.dup_graph_census)."""
    return dedup.dup_graph_triangles(_docs(spark, sf_dir))


@q(
    "ts_attribution",
    """
    WITH t AS (
      SELECT user_id AS u, CAST(floor(epoch(ts)) AS BIGINT) AS tc,
             event_id AS tid
      FROM events WHERE event_type = 'click'
    ),
    c AS (
      SELECT user_id AS u, CAST(floor(epoch(ts)) AS BIGINT) AS tp,
             event_id AS cid
      FROM events WHERE event_type = 'purchase'
    ),
    m AS (
      SELECT t.tc, t.tid, c.cid
      FROM t JOIN c ON t.u = c.u
      WHERE t.tc > c.tp - 3600 AND t.tc <= c.tp
    ),
    scored AS (
      SELECT tc,
             CAST(ROUND(1e6 / count(*) OVER (PARTITION BY cid)) AS BIGINT)
               AS credit,
             CASE WHEN row_number() OVER (PARTITION BY cid
                    ORDER BY tc ASC, tid ASC) = 1 THEN 1 ELSE 0 END
               AS is_first,
             CASE WHEN row_number() OVER (PARTITION BY cid
                    ORDER BY tc DESC, tid DESC) = 1 THEN 1 ELSE 0 END
               AS is_last
      FROM m
    )
    SELECT tc - tc % 3600 AS touch_hour_ep,
           CAST(count(*) AS BIGINT) AS n_touch,
           CAST(sum(credit) AS BIGINT) AS credit_e6,
           CAST(sum(is_first) AS BIGINT) AS n_first,
           CAST(sum(is_last) AS BIGINT) AS n_last
    FROM scored GROUP BY 1
    """,
)
def ts_attribution(spark, sf_dir):
    """Linear multi-touch attribution of purchases to the user's
    clicks in the trailing hour, per touch hour, next to first- and
    last-touch counts — exact pre-quantized per-conversion credit,
    pinned window boundaries, bucket-exploded equi-join shape (see
    analytics.attribution_linear)."""
    return analytics.attribution_linear(_ev(spark, sf_dir))


@q(
    "doc_bleu_pairs",
    "WITH "
    + _MD5_LSH_CTES
    + """
    ,
    cand AS (
      SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      FROM sized x JOIN sized y ON x.band = y.band AND x.bucket = y.bucket
      WHERE x.doc_id < y.doc_id
    ),
    side AS (
      SELECT doc_id, ws,
             CASE WHEN len(ws) >= 2 THEN
               list_transform(range(1, len(ws)),
                              i -> ws[i] || ' ' || ws[i + 1])
             ELSE [] END AS gs
      FROM w
    ),
    j AS (
      SELECT cand.a, cand.b,
             CAST(len(ra.ws) AS BIGINT) AS len_r,
             CAST(len(rb.ws) AS BIGINT) AS len_c,
             CAST(list_sum(list_transform(list_distinct(rb.ws),
               t -> least(len(list_filter(rb.ws, x -> x = t)),
                          len(list_filter(ra.ws, x -> x = t)))))
               AS BIGINT) AS clip1,
             CAST(coalesce(list_sum(list_transform(list_distinct(rb.gs),
               t -> least(len(list_filter(rb.gs, x -> x = t)),
                          len(list_filter(ra.gs, x -> x = t))))), 0)
               AS BIGINT) AS clip2
      FROM cand
      JOIN side ra ON ra.doc_id = cand.a
      JOIN side rb ON rb.doc_id = cand.b
    )
    SELECT a, b, len_r, len_c, clip1, clip2,
           CASE WHEN len_c >= 2 THEN
             CAST(ROUND(
               exp(least(0.0, 1.0 - CAST(len_r AS DOUBLE)
                                    / CAST(len_c AS DOUBLE)))
               * sqrt((CAST(clip1 AS DOUBLE) / CAST(len_c AS DOUBLE))
                      * (CAST(clip2 AS DOUBLE)
                         / (CAST(len_c AS DOUBLE) - 1.0)))
               * 1e6) AS BIGINT)
           END AS bleu2_e6
    FROM j
    """,
)
def doc_bleu_pairs(spark, sf_dir):
    """BLEU-2 with brevity penalty per LSH candidate pair, reference =
    lower doc_id — the order-aware similarity next to the chain's set
    metrics: clipped unigram/bigram precision as exact row-local
    counts, one fixed IEEE finishing tree (see dedup.bleu_pairs)."""
    return dedup.bleu_pairs(_docs(spark, sf_dir))


@q(
    "ts_t_closeness",
    """
    WITH cv AS (
      SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             hour(ts) AS hr, user_id % 10 AS sens,
             CAST(count(*) AS BIGINT) AS cvn
      FROM events GROUP BY 1, 2, 3, 4
    ),
    gv AS (
      SELECT event_type, sens, sum(cvn) AS gvn FROM cv GROUP BY 1, 2
    ),
    tot AS (SELECT event_type, sum(gvn) AS n FROM gv GROUP BY 1),
    j AS (
      SELECT cv.event_type, cv.day, cv.hr, cv.cvn, gv.gvn, tot.n,
             sum(cv.cvn) OVER (PARTITION BY cv.event_type, cv.day, cv.hr)
               AS nc
      FROM cv
      JOIN gv ON cv.event_type = gv.event_type AND cv.sens = gv.sens
      JOIN tot ON cv.event_type = tot.event_type
    ),
    pc AS (
      SELECT event_type, day, hr,
             CAST(min(nc) AS BIGINT) AS nc, CAST(min(n) AS BIGINT) AS nn,
             CAST(sum(abs(cvn * n - gvn * nc)) AS BIGINT) AS obs,
             CAST(sum(gvn) AS BIGINT) AS seen
      FROM j GROUP BY 1, 2, 3
    ),
    sc AS (
      SELECT event_type, nc,
             obs + (nn - seen) * nc AS num,
             5 * (obs + (nn - seen) * nc) > 2 * 1 * nc * nn AS viol,
             CAST(ROUND(CAST(obs + (nn - seen) * nc AS DOUBLE)
                  / (2.0 * CAST(nc AS DOUBLE) * CAST(nn AS DOUBLE))
                  * 1e6) AS BIGINT) AS t_e6
      FROM pc
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(sum(CASE WHEN viol THEN 1 ELSE 0 END) AS BIGINT)
             AS n_above_t,
           CAST(sum(CASE WHEN viol THEN nc ELSE 0 END) AS BIGINT)
             AS rows_at_risk,
           max(t_e6) AS max_t_e6
    FROM sc GROUP BY 1
    """,
)
def ts_t_closeness(spark, sf_dir):
    """t-closeness (t = 1/5) over (day, hour) classes per event type
    with sensitive attribute user_id%10 — the skew-disclosure gate
    k-anonymity and ℓ-diversity both miss; violation membership is an
    exact integer cross-multiplication (see dq.t_closeness_summary)."""
    from tokens_ts import dq

    ev = (
        _ev(spark, sf_dir)
        .withColumn("day", F.to_date("ts").cast("string"))
        .withColumn("hr", F.hour("ts"))
        .withColumn("sens", F.col("user_id") % 10)
    )
    return dq.t_closeness_summary(
        ev, ["day", "hr"], "sens", t_num=1, t_den=5, by=["event_type"]
    )


@q(
    "ts_autoperiod",
    """
    WITH b AS (
      SELECT event_type AS series_id,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ep,
             avg(value) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    pairs AS (
      SELECT l.series_id, lg.lag, l.v AS x, r.v AS y
      FROM b l
      JOIN (SELECT unnest(range(1, 31)) AS lag) lg ON TRUE
      JOIN b r ON r.series_id = l.series_id
             AND r.ep = l.ep + lg.lag * 3600
    ),
    ac AS (
      SELECT series_id, lag, count(*) AS n,
             sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
             sum(x * x) AS sxx, sum(y * y) AS syy
      FROM pairs GROUP BY 1, 2
    ),
    rho AS (
      SELECT series_id, lag,
             CASE WHEN n >= 2
                   AND CAST(n AS DOUBLE) * sxx - sx * sx > 0
                   AND CAST(n AS DOUBLE) * syy - sy * sy > 0 THEN
               CAST(ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
                    / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                           * (CAST(n AS DOUBLE) * syy - sy * sy))
                    * 1e6) AS BIGINT)
             END AS r6
      FROM ac
    ),
    nb AS (
      SELECT series_id, lag, r6,
             lag(r6) OVER w AS pr, lead(r6) OVER w AS nr,
             lag(lag) OVER w AS pl, lead(lag) OVER w AS nl
      FROM rho WINDOW w AS (PARTITION BY series_id ORDER BY lag)
    ),
    pk AS (
      SELECT series_id, lag, r6,
             (lag >= 2 AND lag <= 29 AND r6 IS NOT NULL
              AND pl = lag - 1 AND nl = lag + 1
              AND r6 > pr AND r6 > nr) AS is_peak
      FROM nb
    ),
    best AS (
      SELECT series_id, lag, r6,
             row_number() OVER (PARTITION BY series_id
                                ORDER BY r6 DESC, lag ASC) AS rn
      FROM pk WHERE is_peak
    )
    SELECT p.series_id,
           CAST(count(*) FILTER (WHERE p.r6 IS NOT NULL) AS BIGINT)
             AS n_lags,
           CAST(count(*) FILTER (WHERE p.is_peak) AS BIGINT) AS n_peaks,
           CAST(min(CASE WHEN b.rn = 1 THEN b.lag END) AS BIGINT)
             AS period_lag,
           CAST(min(CASE WHEN b.rn = 1 THEN b.r6 END) AS BIGINT)
             AS period_rho_e6
    FROM pk p
    LEFT JOIN best b ON b.series_id = p.series_id AND b.lag = p.lag
    GROUP BY 1
    """,
)
def ts_autoperiod(spark, sf_dir):
    """Dominant period per event type: smallest strict local ACF peak
    with the highest e6-quantized rho over hourly lags 1..30 —
    integer-exact peak certification and struct-max tie rule (see
    analytics.autoperiod)."""
    return analytics.autoperiod(
        _ev(spark, sf_dir), keys=["event_type"], ts_col="ts",
        value_col="value", trunc="hour", max_lag=30,
    ).select(
        F.col("event_type").alias("series_id"),
        "n_lags", "n_peaks", "period_lag", "period_rho_e6",
    )


@q(
    "ts_did",
    _HOURLY_E3
    + """
    , mm AS (
      SELECT sid, min(ep) AS lo, max(ep) AS hi FROM b GROUP BY 1
    ),
    p AS (
      SELECT a.sid AS sa, bb.sid AS sb,
             (least(a.lo, bb.lo) + greatest(a.hi, bb.hi)) // 2 AS mid
      FROM mm a JOIN mm bb ON a.sid < bb.sid
    ),
    u AS (
      SELECT p.sa, p.sb, p.mid, 'a' AS side, b.ep, b.v
      FROM p JOIN b ON b.sid = p.sa
      UNION ALL
      SELECT p.sa, p.sb, p.mid, 'b' AS side, b.ep, b.v
      FROM p JOIN b ON b.sid = p.sb
    ),
    g AS (
      SELECT sa, sb, mid,
        sum(CASE WHEN side='a' AND ep <  mid THEN 1 ELSE 0 END) AS n_a0,
        sum(CASE WHEN side='a' AND ep <  mid THEN v ELSE 0 END) AS s_a0,
        sum(CASE WHEN side='a' AND ep <  mid THEN v*v ELSE 0 END) AS q_a0,
        sum(CASE WHEN side='a' AND ep >= mid THEN 1 ELSE 0 END) AS n_a1,
        sum(CASE WHEN side='a' AND ep >= mid THEN v ELSE 0 END) AS s_a1,
        sum(CASE WHEN side='a' AND ep >= mid THEN v*v ELSE 0 END) AS q_a1,
        sum(CASE WHEN side='b' AND ep <  mid THEN 1 ELSE 0 END) AS n_b0,
        sum(CASE WHEN side='b' AND ep <  mid THEN v ELSE 0 END) AS s_b0,
        sum(CASE WHEN side='b' AND ep <  mid THEN v*v ELSE 0 END) AS q_b0,
        sum(CASE WHEN side='b' AND ep >= mid THEN 1 ELSE 0 END) AS n_b1,
        sum(CASE WHEN side='b' AND ep >= mid THEN v ELSE 0 END) AS s_b1,
        sum(CASE WHEN side='b' AND ep >= mid THEN v*v ELSE 0 END) AS q_b1
      FROM u GROUP BY 1, 2, 3
    ),
    f AS (
      SELECT *,
        CAST(s_a1 AS DOUBLE) / CAST(n_a1 AS DOUBLE)
          - CAST(s_a0 AS DOUBLE) / CAST(n_a0 AS DOUBLE)
          - (CAST(s_b1 AS DOUBLE) / CAST(n_b1 AS DOUBLE)
             - CAST(s_b0 AS DOUBLE) / CAST(n_b0 AS DOUBLE)) AS eff,
        (CAST(n_a0 AS DOUBLE) * CAST(q_a0 AS DOUBLE)
           - CAST(s_a0 AS DOUBLE) * CAST(s_a0 AS DOUBLE))
          / (CAST(n_a0 AS DOUBLE) * CAST(n_a0 AS DOUBLE)
             * (CAST(n_a0 AS DOUBLE) - 1.0))
        + (CAST(n_a1 AS DOUBLE) * CAST(q_a1 AS DOUBLE)
           - CAST(s_a1 AS DOUBLE) * CAST(s_a1 AS DOUBLE))
          / (CAST(n_a1 AS DOUBLE) * CAST(n_a1 AS DOUBLE)
             * (CAST(n_a1 AS DOUBLE) - 1.0))
        + (CAST(n_b0 AS DOUBLE) * CAST(q_b0 AS DOUBLE)
           - CAST(s_b0 AS DOUBLE) * CAST(s_b0 AS DOUBLE))
          / (CAST(n_b0 AS DOUBLE) * CAST(n_b0 AS DOUBLE)
             * (CAST(n_b0 AS DOUBLE) - 1.0))
        + (CAST(n_b1 AS DOUBLE) * CAST(q_b1 AS DOUBLE)
           - CAST(s_b1 AS DOUBLE) * CAST(s_b1 AS DOUBLE))
          / (CAST(n_b1 AS DOUBLE) * CAST(n_b1 AS DOUBLE)
             * (CAST(n_b1 AS DOUBLE) - 1.0)) AS sesq
      FROM g
      WHERE n_a0 >= 1 AND n_a1 >= 1 AND n_b0 >= 1 AND n_b1 >= 1
    )
    SELECT sa AS series_a, sb AS series_b,
           CAST(mid AS BIGINT) AS boundary_ep,
           CAST(n_a0 AS BIGINT) AS n_a0, CAST(n_a1 AS BIGINT) AS n_a1,
           CAST(n_b0 AS BIGINT) AS n_b0, CAST(n_b1 AS BIGINT) AS n_b1,
           CAST(ROUND(eff * 1e3) AS BIGINT) AS effect_e6,
           CASE WHEN n_a0 >= 2 AND n_a1 >= 2 AND n_b0 >= 2 AND n_b1 >= 2
                 AND sesq > 0
                THEN CAST(ROUND(eff / sqrt(sesq) * 1e6) AS BIGINT)
           END AS t_e6
    FROM f
    """,
)
def ts_did(spark, sf_dir):
    """Difference-in-differences per unordered event-type pair at the
    shared union-span midpoint: treated delta minus control delta with
    Welch-style SE over the four (side, phase) cells — the
    common-shock-netting drift primitive (see analytics.did_pairs)."""
    return analytics.did_pairs(
        _ev(spark, sf_dir), key_col="event_type", ts_col="ts",
        value_col="value", trunc="hour",
    )


@q(
    "doc_heldout_nll",
    """
    WITH d AS (
      SELECT source, doc_id, text,
             CASE WHEN CAST('0x' || substring(md5(text), 1, 8) AS BIGINT)
                       % 100 < 96
                  THEN 'train' ELSE 'held' END AS split
      FROM documents
    ),
    words AS (
      SELECT source, doc_id, split, unnest(
               string_split_regex(text, '\\s+')) AS w
      FROM d
    ),
    wnz AS (SELECT * FROM words WHERE w <> ''),
    tc AS (
      SELECT w, CAST(count(*) AS BIGINT) AS wc
      FROM wnz WHERE split = 'train' GROUP BY 1
    ),
    tv AS (
      SELECT CAST(sum(wc) AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS v
      FROM tc
    ),
    ev AS (
      SELECT wnz.source, wnz.doc_id, tc.wc, tv.t, tv.v,
             CAST(ROUND(ln(CAST(coalesce(tc.wc, 0) + 1 AS DOUBLE)
                           / CAST(tv.t + tv.v + 1 AS DOUBLE)) * 1e6)
                  AS BIGINT) AS lp
      FROM wnz LEFT JOIN tc ON wnz.w = tc.w CROSS JOIN tv
      WHERE wnz.split = 'held'
    )
    SELECT source,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN wc IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           CAST(sum(lp) AS BIGINT) AS lp_sum_e6,
           CAST(ROUND(-CAST(sum(lp) AS DOUBLE) / CAST(count(*) AS DOUBLE))
                AS BIGINT) AS mean_nll_e6
    FROM ev GROUP BY 1
    """,
)
def doc_heldout_nll(spark, sf_dir):
    """Held-out (val+test) NLL per source under the train split's
    add-1 unigram LM with a single OOV class — the generalization
    twin of doc_unigram_logprob, with leakage-proof content-hash
    splits; per-token logprobs pre-quantized at e6 so the sums are
    exact (see textops.heldout_nll)."""
    return textops.heldout_nll(_docs(spark, sf_dir))


@q(
    "emb_mutual_knn",
    """
    WITH q AS (
      SELECT vec_id AS qid, embedding AS qe FROM embeddings
      WHERE vec_id % 37 = 0
    ),
    c AS (
      SELECT q.qid, e.vec_id AS nid,
             list_sum(list_transform(range(1, 65),
               i -> CAST(q.qe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
               AS dot,
             sqrt(list_sum(list_transform(q.qe,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS na,
             sqrt(list_sum(list_transform(e.embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nb
      FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid
    ),
    top AS (
      SELECT qid, nid FROM (
        SELECT qid, nid,
               row_number() OVER (
                 PARTITION BY qid
                 ORDER BY CAST(ROUND(dot / (na * nb) * 1e6) AS BIGINT) DESC,
                          nid
               ) AS rank
        FROM c
      ) WHERE rank <= 5
    ),
    arcs AS (SELECT qid, nid FROM top WHERE nid % 37 = 0),
    mut AS (
      SELECT x.qid AS a, x.nid AS b
      FROM arcs x
      WHERE x.qid < x.nid
        AND EXISTS (SELECT 1 FROM arcs y
                    WHERE y.qid = x.nid AND y.nid = x.qid)
    ),
    deg AS (
      SELECT v, count(*) AS d FROM (
        SELECT a AS v FROM mut UNION ALL SELECT b AS v FROM mut
      ) GROUP BY 1
    ),
    ne AS (
      SELECT CAST(count(*) AS BIGINT) AS n_mutual_nodes,
             CAST(coalesce(sum(d * (d - 1) / 2), 0) AS BIGINT) AS n_wedges
      FROM deg
    ),
    tri AS (
      SELECT CAST(count(*) AS BIGINT) AS n_triangles
      FROM mut e1 JOIN mut e2 ON e1.b = e2.a
      WHERE EXISTS (SELECT 1 FROM mut c2
                    WHERE c2.a = e1.a AND c2.b = e2.b)
    ),
    cnts AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM q) AS n_queries,
             (SELECT CAST(count(*) AS BIGINT) FROM arcs) AS n_directed,
             (SELECT CAST(count(*) AS BIGINT) FROM mut) AS n_mutual
    )
    SELECT n_queries, n_directed, n_mutual,
           CASE WHEN n_directed > 0 THEN
             CAST(ROUND(2.0 * CAST(n_mutual AS DOUBLE)
                  / CAST(n_directed AS DOUBLE) * 1e6) AS BIGINT)
           END AS reciprocity_e6,
           n_mutual_nodes, n_wedges, n_triangles,
           CASE WHEN n_wedges > 0 THEN
             CAST(ROUND(3.0 * CAST(n_triangles AS DOUBLE)
                  / CAST(n_wedges AS DOUBLE) * 1e6) AS BIGINT)
           END AS transitivity_e6
    FROM cnts CROSS JOIN ne CROSS JOIN tri
    """,
)
def emb_mutual_knn(spark, sf_dir):
    """Reciprocity + mutual-graph census of exact top-5 retrieval over
    the mod-37 sample — the symmetry dial next to hubness and purity,
    the mutual edges fed through the same dup_graph_census as the LSH
    near-dup graph (see simsearch.mutual_knn)."""
    return simsearch.mutual_knn(_emb(spark, sf_dir))


@q(
    "ts_orc_source",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           sum(CAST(ROUND(value * 1000) AS BIGINT)) AS sum_e3,
           sum(epoch_us(ts) % 1000000000000) AS ts_us_sum,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
    GROUP BY event_type
    """,
)
def ts_orc_source(spark, sf_dir):
    """events → ORC partitioned by event_type → selective read-back:
    the second Spark-native columnar format next to parquet, proving
    the full write/read round trip preserves doubles, NTZ timestamps
    (micros checksum mod 1e12 — bigint-safe at any SF), and ids, and
    that the partition layout prunes: the reader lists only the two
    requested partition directories (PartitionFilters — plan-asserted
    in tests/test_plans.py), so at 10^12 rows the query touches 2/5
    of the data before a single row is read. The oracle never sees
    the ORC file — it derives the aggregate from the parquet view, so
    any round-trip corruption (timestamp shift, double mangling,
    partition misrouting) diverges the checksums."""
    import tempfile

    ev = _ev(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="orc_src_") + "/events_orc"
    ev.write.mode("overwrite").partitionBy("event_type").orc(d)
    back = (
        spark.read.orc(d)
        .where(
            F.col("event_type").isin("click", "purchase")
            & F.col("value").isNotNull()
        )
    )
    return back.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum(F.round(F.col("value") * 1000).cast("bigint")).alias("sum_e3"),
        F.sum(
            F.pmod(
                F.unix_micros(F.col("ts").cast("timestamp")),
                F.lit(1000000000000),
            )
        ).alias("ts_us_sum"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


@q(
    "ts_binseg2",
    _HOURLY_E3
    + """
    , p AS (
      SELECT sid, ep, v,
             count(*) OVER (PARTITION BY sid) AS n,
             sum(v) OVER (PARTITION BY sid) AS t,
             sum(v * v) OVER (PARTITION BY sid) AS q,
             sum(v) OVER (PARTITION BY sid ORDER BY ep
                          ROWS UNBOUNDED PRECEDING) AS s,
             row_number() OVER (PARTITION BY sid ORDER BY ep) AS k
      FROM b
    ),
    c1 AS (
      SELECT sid, ep, k, s,
             (CAST(n AS DOUBLE) * CAST(s AS DOUBLE)
              - CAST(k AS DOUBLE) * CAST(t AS DOUBLE))
             * (CAST(n AS DOUBLE) * CAST(s AS DOUBLE)
                - CAST(k AS DOUBLE) * CAST(t AS DOUBLE))
             / (CAST(k AS DOUBLE) * CAST(n - k AS DOUBLE)
                * CAST(n AS DOUBLE)) AS g,
             row_number() OVER (PARTITION BY sid
                                ORDER BY (CAST(n AS DOUBLE) * CAST(s AS DOUBLE)
                                          - CAST(k AS DOUBLE) * CAST(t AS DOUBLE))
                                         * (CAST(n AS DOUBLE) * CAST(s AS DOUBLE)
                                            - CAST(k AS DOUBLE) * CAST(t AS DOUBLE))
                                         / (CAST(k AS DOUBLE) * CAST(n - k AS DOUBLE)
                                            * CAST(n AS DOUBLE)) DESC,
                                         ep ASC) AS rn
      FROM p WHERE k < n AND n >= 3
    ),
    b1 AS (
      SELECT sid, ep AS ep1, k AS k1, s AS s1, g AS g1
      FROM c1 WHERE rn = 1
    ),
    c2 AS (
      SELECT p.sid, p.n, p.t, p.q, p.ep, p.k, p.s,
             b1.ep1, b1.k1, b1.s1, b1.g1,
             CASE WHEN p.k < b1.k1 THEN 0 ELSE b1.k1 END AS a_,
             CASE WHEN p.k < b1.k1 THEN b1.k1 ELSE p.n END AS b_,
             CASE WHEN p.k < b1.k1 THEN 0 ELSE b1.s1 END AS sa,
             CASE WHEN p.k < b1.k1 THEN b1.s1 ELSE p.t END AS sb
      FROM p JOIN b1 ON p.sid = b1.sid
      WHERE p.k <> b1.k1
    ),
    g2c AS (
      SELECT *,
             (CAST(b_ - a_ AS DOUBLE) * CAST(s - sa AS DOUBLE)
              - CAST(k - a_ AS DOUBLE) * CAST(sb - sa AS DOUBLE))
             * (CAST(b_ - a_ AS DOUBLE) * CAST(s - sa AS DOUBLE)
                - CAST(k - a_ AS DOUBLE) * CAST(sb - sa AS DOUBLE))
             / (CAST(k - a_ AS DOUBLE) * CAST(b_ - k AS DOUBLE)
                * CAST(b_ - a_ AS DOUBLE)) AS g2
      FROM c2 WHERE k - a_ >= 1 AND b_ - k >= 1
    ),
    b2 AS (
      SELECT *, row_number() OVER (PARTITION BY sid
                                   ORDER BY g2 DESC, ep ASC) AS rn2
      FROM g2c
    ),
    fin AS (SELECT * FROM b2 WHERE rn2 = 1)
    SELECT sid AS series_id,
           CAST(n AS BIGINT) AS n_buckets,
           CAST(ep1 AS BIGINT) AS cp1_epoch,
           CAST(ep AS BIGINT) AS cp2_epoch,
           CAST(k1 AS BIGINT) AS k1,
           CAST(k AS BIGINT) AS k2,
           CAST(ROUND(g1 / 1e6 * 1e6) AS BIGINT) AS gain1_e6,
           CAST(ROUND(g2 / 1e6 * 1e6) AS BIGINT) AS gain2_e6,
           CASE WHEN CAST(q AS DOUBLE)
                     - CAST(t AS DOUBLE) * CAST(t AS DOUBLE)
                       / CAST(n AS DOUBLE) > 0 THEN
             CAST(ROUND((g1 + g2)
                  / (CAST(q AS DOUBLE)
                     - CAST(t AS DOUBLE) * CAST(t AS DOUBLE)
                       / CAST(n AS DOUBLE)) * 1e6) AS BIGINT)
           END AS strength2_e6,
           CAST(ROUND(CAST(CASE WHEN k1 < k THEN s1 ELSE s END AS DOUBLE)
                / CAST(least(k1, k) AS DOUBLE)) AS BIGINT) AS mean_seg1_e3,
           CAST(ROUND(CAST((CASE WHEN k1 < k THEN s ELSE s1 END)
                           - (CASE WHEN k1 < k THEN s1 ELSE s END) AS DOUBLE)
                / CAST(greatest(k1, k) - least(k1, k) AS DOUBLE)) AS BIGINT)
             AS mean_seg2_e3,
           CAST(ROUND(CAST(t - (CASE WHEN k1 < k THEN s ELSE s1 END) AS DOUBLE)
                / CAST(n - greatest(k1, k) AS DOUBLE)) AS BIGINT)
             AS mean_seg3_e3
    FROM fin
    """,
)
def ts_binseg2(spark, sf_dir):
    """Two-changepoint binary segmentation per event type over hourly
    e3 buckets: the strongest mean shift, then the strongest sub-split
    within either segment, with the three shelf means and the
    two-break R² — exact prefix-sum algebra at both levels, ties to
    the earliest epoch (see analytics.binseg2)."""
    return analytics.binseg2(
        _ev(spark, sf_dir), key_col="event_type", ts_col="ts",
        value_col="value", trunc="hour",
    )


@q(
    "ts_interarrival_memory",
    """
    WITH g0 AS (
      SELECT event_type, user_id, ts, event_id,
             CAST(floor(epoch(ts)) AS BIGINT)
               - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w AS gp
      FROM events
      WINDOW w AS (PARTITION BY event_type, user_id
                   ORDER BY ts, event_id)
    ),
    g AS (
      SELECT event_type, gp,
             lag(gp) OVER (PARTITION BY event_type, user_id
                           ORDER BY ts, event_id) AS pp
      FROM g0
    ),
    p AS (SELECT * FROM g WHERE gp IS NOT NULL AND pp IS NOT NULL),
    a AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
             sum(pp) AS sx, sum(gp) AS sy, sum(pp * gp) AS sxy,
             sum(pp * pp) AS sxx, sum(gp * gp) AS syy
      FROM p GROUP BY 1
    )
    SELECT event_type, n_pairs,
           CASE WHEN n_pairs >= 2
                 AND CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
                 AND CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0 THEN
             CAST(ROUND((CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / sqrt((CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                         * (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
                            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                  * 1e6) AS BIGINT)
           END AS memory_e6
    FROM a
    """,
)
def ts_interarrival_memory(spark, sf_dir):
    """Goh–Barabási memory coefficient per event type: Pearson r of
    consecutive per-user inter-arrival gaps — the ordering axis of
    the (B, M) phase diagram that burstiness alone cannot see (see
    analytics.memory_coefficient)."""
    return analytics.memory_coefficient(
        _ev(spark, sf_dir), keys=["event_type"], user_col="user_id",
        ts_col="ts", order_cols=["event_id"],
    )


@q(
    "ts_jarque_bera",
    """
    WITH b AS (
      SELECT event_type AS series_id,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ep,
             CAST(ROUND(avg(value)) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    a AS (
      SELECT series_id, CAST(count(*) AS BIGINT) AS n,
             sum(v) AS s1, sum(v*v) AS s2, sum(v*v*v) AS s3,
             sum(v*v*v*v) AS s4
      FROM b GROUP BY 1
    ),
    f AS (
      SELECT series_id, n,
             CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m,
             CAST(s2 AS DOUBLE) AS s2d, CAST(s3 AS DOUBLE) AS s3d,
             CAST(s4 AS DOUBLE) AS s4d, CAST(n AS DOUBLE) AS nd
      FROM a WHERE n >= 2
    ),
    c AS (
      SELECT series_id, n, nd,
             s2d / nd - m * m AS m2,
             (s3d - 3.0 * m * s2d + 2.0 * nd * m * m * m) / nd AS m3,
             (s4d - 4.0 * m * s3d + 6.0 * m * m * s2d
              - 3.0 * nd * m * m * m * m) / nd AS m4
      FROM f
    )
    SELECT series_id, n AS n_buckets,
           CASE WHEN m2 > 0 THEN
             CAST(ROUND(m3 / sqrt(m2 * m2 * m2) * 1e6) AS BIGINT)
           END AS skew_e6,
           CASE WHEN m2 > 0 THEN
             CAST(ROUND((m4 / (m2 * m2) - 3.0) * 1e6) AS BIGINT)
           END AS exkurt_e6,
           CASE WHEN m2 > 0 THEN
             CAST(ROUND(nd * ((m3 / sqrt(m2 * m2 * m2))
                              * (m3 / sqrt(m2 * m2 * m2)) / 6.0
                              + (m4 / (m2 * m2) - 3.0)
                                * (m4 / (m2 * m2) - 3.0) / 24.0)
                  * 1e6) AS BIGINT)
           END AS jb_e6
    FROM c
    """,
)
def ts_jarque_bera(spark, sf_dir):
    """Jarque–Bera omnibus normality per event type over integer
    hourly bucket means (e0 grid — the fourth-power sum is the
    binding overflow constraint), with skew and excess kurtosis as
    the directional diagnosis (see analytics.jarque_bera)."""
    return analytics.jarque_bera(
        _ev(spark, sf_dir), key_col="event_type", ts_col="ts",
        value_col="value", trunc="hour",
    )


@q(
    "seq_window_dups",
    _synth_cte()
    + """
    , w AS (
      SELECT doc_id, source,
             unnest(list_transform(range(1, n_tok - 8 + 2),
               i -> array_to_string(tokens[i:i+7], ','))) AS wk
      FROM seq
    ),
    keys AS (
      SELECT wk, CAST(count(DISTINCT doc_id) AS BIGINT) AS nd
      FROM w GROUP BY 1
    )
    SELECT w.source,
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(sum(CASE WHEN keys.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_windows,
           CAST(ROUND(CAST(sum(CASE WHEN keys.nd >= 2 THEN 1 ELSE 0 END)
                           AS DOUBLE)
                / CAST(count(*) AS DOUBLE) * 1e6) AS BIGINT) AS dup_frac_e6
    FROM w JOIN keys ON w.wk = keys.wk
    GROUP BY 1
    """,
)
def seq_window_dups(spark, sf_dir):
    """Cross-sequence duplicate 8-token-window mass per source — the
    token-level ExactSubstr axis next to within-seq repetition
    (seq_dup_ngram) and whole-doc LSH: verbatim spans shared across
    documents, exact window-key counts (see dedup.token_window_dups).
    Both engines GENERATE the sequences table from the same integer
    recurrences — no shared input file."""
    return dedup.token_window_dups(_seq(spark), k=8)


@q(
    "ts_logrank",
    """
    WITH e AS (
      SELECT event_type AS ty, user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS ep,
             lead(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
               PARTITION BY event_type, user_id
               ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    obs AS (SELECT max(CAST(floor(epoch(ts)) AS BIGINT)) AS oend FROM events),
    g AS (
      SELECT ty,
             CAST(floor((coalesce(nxt, oend) - ep) / 60.0) AS BIGINT) AS t,
             CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END AS death
      FROM e CROSS JOIN obs
    ),
    hist AS (
      SELECT ty, t, CAST(sum(death) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS m
      FROM g GROUP BY 1, 2
    ),
    tys AS (SELECT DISTINCT ty FROM hist),
    p AS (
      SELECT a.ty AS ta, b.ty AS tb FROM tys a JOIN tys b ON a.ty < b.ty
    ),
    u AS (
      SELECT ta, tb, t, sum(da) AS da, sum(ma) AS ma,
             sum(db) AS db, sum(mb) AS mb
      FROM (
        SELECT p.ta, p.tb, h.t, h.d AS da, h.m AS ma,
               CAST(0 AS BIGINT) AS db, CAST(0 AS BIGINT) AS mb
        FROM p JOIN hist h ON h.ty = p.ta
        UNION ALL
        SELECT p.ta, p.tb, h.t, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
               h.d, h.m
        FROM p JOIN hist h ON h.ty = p.tb
      ) GROUP BY 1, 2, 3
    ),
    r AS (
      SELECT ta, tb, t, da, db,
             sum(ma) OVER (PARTITION BY ta, tb ORDER BY t DESC
                           ROWS UNBOUNDED PRECEDING) AS na,
             sum(mb) OVER (PARTITION BY ta, tb ORDER BY t DESC
                           ROWS UNBOUNDED PRECEDING) AS nb
      FROM u
    ),
    dth AS (SELECT * FROM r WHERE da + db > 0),
    terms AS (
      SELECT ta, tb, da,
        CAST(ROUND(CAST(da + db AS DOUBLE) * CAST(na AS DOUBLE)
             / CAST(na + nb AS DOUBLE) * 1e6) AS BIGINT) AS et,
        CASE WHEN na + nb >= 2 THEN
          CAST(ROUND(CAST(da + db AS DOUBLE)
               * (CAST(na AS DOUBLE) / CAST(na + nb AS DOUBLE))
               * (CAST(nb AS DOUBLE) / CAST(na + nb AS DOUBLE))
               * (CAST(na + nb AS DOUBLE) - CAST(da + db AS DOUBLE))
               / (CAST(na + nb AS DOUBLE) - 1.0) * 1e6) AS BIGINT)
        ELSE CAST(0 AS BIGINT) END AS vt
      FROM dth
    ),
    a AS (
      SELECT ta, tb, CAST(count(*) AS BIGINT) AS n_death_times,
             CAST(sum(da) AS BIGINT) AS o_a,
             CAST(sum(et) AS BIGINT) AS e_a_e6,
             CAST(sum(vt) AS BIGINT) AS v_e6
      FROM terms GROUP BY 1, 2
    )
    SELECT ta AS type_a, tb AS type_b, n_death_times, o_a, e_a_e6, v_e6,
           CASE WHEN v_e6 > 0 THEN
             CAST(ROUND(CAST(o_a * 1000000 - e_a_e6 AS DOUBLE)
                  / (sqrt(CAST(v_e6 AS DOUBLE)) * 1e3) * 1e6) AS BIGINT)
           END AS z_e6
    FROM a
    """,
)
def ts_logrank(spark, sf_dir):
    """Two-sample log-rank z for every unordered event-type pair over
    the kaplan_meier wait construction: Mantel-Haenszel O−E at pooled
    death times with hypergeometric variance, censored waits held in
    the risk sets, E/V terms pre-quantized at e6 (see
    analytics.logrank_pairs)."""
    return analytics.logrank_pairs(_ev(spark, sf_dir))


@q(
    "emb_pq_recall",
    """
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    cb AS (
      SELECT s, vec_id AS cid, v[8 * s + 1 : 8 * s + 8] AS cw
      FROM e CROSS JOIN range(0, 8) t(s) WHERE vec_id < 16
    ),
    d AS (
      SELECT e.vec_id AS nid, c.s, c.cid, c.cw,
             CAST(ROUND(list_sum(list_transform(range(1, 9),
                    i -> (e.v[8 * c.s + i] - c.cw[i])
                       * (e.v[8 * c.s + i] - c.cw[i]))) * 1e9)
               AS BIGINT) AS d9
      FROM e CROSS JOIN cb c
    ),
    b AS (
      SELECT nid, s, cw FROM (
        SELECT *, row_number() OVER (PARTITION BY nid, s
                                     ORDER BY d9, cid) AS r
        FROM d
      ) WHERE r = 1
    ),
    rec AS (
      SELECT nid, flatten(list(cw ORDER BY s)) AS r FROM b GROUP BY nid
    ),
    q AS (
      SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id % 37 = 0
    ),
    sj AS (
      SELECT q.qid, e.vec_id AS nid,
             CAST(ROUND(list_sum(list_transform(range(1, 65),
                    i -> q.qv[i] * e.v[i]))
                  / (sqrt(list_sum(list_transform(q.qv, x -> x * x)))
                     * sqrt(list_sum(list_transform(e.v, x -> x * x))))
                  * 1e6) AS BIGINT) AS se,
             CASE WHEN sqrt(list_sum(list_transform(rec.r, x -> x * x))) > 0
                  THEN CAST(ROUND(list_sum(list_transform(range(1, 65),
                         i -> q.qv[i] * rec.r[i]))
                       / (sqrt(list_sum(list_transform(q.qv, x -> x * x)))
                          * sqrt(list_sum(list_transform(rec.r, x -> x * x))))
                       * 1e6) AS BIGINT)
                  ELSE -2000000 END AS sp
      FROM q CROSS JOIN e JOIN rec ON rec.nid = e.vec_id
      WHERE e.vec_id <> q.qid
    ),
    rk AS (
      SELECT qid,
             CASE WHEN row_number() OVER (PARTITION BY qid
                    ORDER BY se DESC, nid ASC) <= 5 THEN 1 ELSE 0 END AS ex,
             CASE WHEN row_number() OVER (PARTITION BY qid
                    ORDER BY sp DESC, nid ASC) <= 5 THEN 1 ELSE 0 END AS pq
      FROM sj
    ),
    pg AS (
      SELECT qid, CAST(sum(ex * pq) AS BIGINT) AS hit FROM rk GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_queries,
           CAST(5 AS BIGINT) AS k,
           CAST(sum(hit) AS BIGINT) AS n_hits,
           CAST(ROUND(CAST(sum(hit) AS DOUBLE)
                / (CAST(count(*) AS DOUBLE) * 5.0) * 1e6) AS BIGINT)
             AS recall_e6
    FROM pg
    """,
)
def emb_pq_recall(spark, sf_dir):
    """Measured recall@5 under product quantization: exact full-vector
    top-k vs asymmetric-distance top-k against the PQ reconstruction,
    codebook and tie rules pinned identical to emb_pq_error — the
    serving number the reconstruction error only bounds (see
    simsearch.pq_recall)."""
    return simsearch.pq_recall(_emb(spark, sf_dir))


@q(
    "ts_leadlag",
    """
    WITH b AS (
      SELECT event_type AS sid,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ep,
             avg(value) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    l AS (
      SELECT b.sid AS series_a, b.ep, b.v AS x, lg.lag
      FROM b CROSS JOIN (SELECT unnest(range(-12, 13)) AS lag) lg
    ),
    p AS (
      SELECT l.series_a, r.sid AS series_b, l.lag, l.x, r.v AS y
      FROM l JOIN b r ON r.ep = l.ep + l.lag * 3600
      WHERE l.series_a < r.sid
    ),
    a AS (
      SELECT series_a, series_b, lag, CAST(count(*) AS DOUBLE) AS n,
             sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy,
             sum(x*x) AS sxx, sum(y*y) AS syy
      FROM p GROUP BY 1, 2, 3
    ),
    rho AS (
      SELECT series_a, series_b, lag,
             CASE WHEN n >= 2 AND n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
                  THEN CAST(ROUND((n*sxy - sx*sy)
                       / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy)) * 1e6)
                       AS BIGINT)
             END AS r6
      FROM a
    ),
    rk AS (
      SELECT series_a, series_b, lag, r6,
             row_number() OVER (PARTITION BY series_a, series_b
                                ORDER BY abs(r6) DESC, abs(lag) ASC,
                                         lag DESC) AS rn
      FROM rho WHERE r6 IS NOT NULL
    )
    SELECT g.series_a, g.series_b,
           CAST(count(*) FILTER (WHERE g.r6 IS NOT NULL) AS BIGINT)
             AS n_lags,
           CAST(min(CASE WHEN rk.rn = 1 THEN rk.lag END) AS BIGINT)
             AS best_lag,
           CAST(min(CASE WHEN rk.rn = 1 THEN rk.r6 END) AS BIGINT)
             AS best_ccf_e6
    FROM rho g
    LEFT JOIN rk ON rk.series_a = g.series_a AND rk.series_b = g.series_b
                AND rk.lag = g.lag
    GROUP BY 1, 2
    """,
)
def ts_leadlag(spark, sf_dir):
    """Lead-lag verdict per event-type pair: the hourly lag in
    −12..+12 with the strongest |cross-correlation| on e6-prequantized
    rho — strongest coupling, then closest-to-zero lag, then the
    positive lag on exact ties; signed rho rides along (see
    analytics.leadlag)."""
    return analytics.leadlag(
        _ev(spark, sf_dir), key_col="event_type", ts_col="ts",
        value_col="value", trunc="hour", max_lag=12,
    )


@q(
    "ts_neyman_alloc",
    """
    WITH b AS (
      SELECT event_type AS series_id,
             CAST(ROUND(value * 1000) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL
    ),
    st AS (
      SELECT series_id, CAST(count(*) AS BIGINT) AS n_rows,
             sum(v) AS s, sum(v * v) AS q
      FROM b GROUP BY 1
    ),
    w AS (
      SELECT series_id, n_rows,
             CAST(n_rows AS DOUBLE)
               * sqrt(greatest(CAST(q AS DOUBLE) / CAST(n_rows AS DOUBLE)
                       - (CAST(s AS DOUBLE) / CAST(n_rows AS DOUBLE))
                         * (CAST(s AS DOUBLE) / CAST(n_rows AS DOUBLE)),
                       0.0)) AS wd
      FROM st
    ),
    tw AS (SELECT sum(wd) AS twd FROM w),
    qd AS (
      SELECT series_id, n_rows, wd, twd,
             CASE WHEN twd > 0 THEN 1000.0 * wd / twd ELSE 0.0 END AS quota
      FROM w CROSS JOIN tw
    ),
    qq AS (
      SELECT *, CAST(floor(quota) AS BIGINT) AS base,
             quota - floor(quota) AS rem
      FROM qd
    ),
    lf AS (SELECT 1000 - sum(base) AS lft FROM qq),
    rk AS (
      SELECT *, row_number() OVER (ORDER BY rem DESC, series_id ASC) AS rnk
      FROM qq
    )
    SELECT rk.series_id, rk.n_rows,
           CASE WHEN rk.twd > 0 THEN
             CAST(ROUND(rk.wd / rk.twd * 1e6) AS BIGINT)
           END AS share_e6,
           CAST(rk.base + CASE WHEN rk.twd > 0 AND rk.rnk <= lf.lft
                               THEN 1 ELSE 0 END AS BIGINT) AS alloc
    FROM rk CROSS JOIN lf
    """,
)
def ts_neyman_alloc(spark, sf_dir):
    """Neyman variance-optimal allocation of a 1000-row inspection
    budget across event types, integerized by Hamilton's
    largest-remainder method so allocations sum to exactly the budget
    (see dq.neyman_allocation)."""
    from tokens_ts import dq

    return dq.neyman_allocation(
        _ev(spark, sf_dir), key_col="event_type", value_col="value",
        budget=1000,
    )


@q(
    "ts_user_gini",
    """
    WITH h AS (
      SELECT event_type AS series_id, user_id AS u,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    r AS (
      SELECT series_id, c,
             row_number() OVER (PARTITION BY series_id ORDER BY c, u) AS rn,
             count(*) OVER (PARTITION BY series_id) AS m
      FROM h
    ),
    a AS (
      SELECT series_id,
             CAST(max(m) AS BIGINT) AS n_users,
             CAST(sum(c) AS BIGINT) AS n_events,
             CAST(sum(rn * c) AS BIGINT) AS tr,
             CAST(sum(CASE WHEN rn > m - floor((m + 9) / 10)
                           THEN c ELSE 0 END) AS BIGINT) AS topc
      FROM r GROUP BY 1
    )
    SELECT series_id, n_users, n_events,
           CASE WHEN n_users > 1 AND n_events > 0 THEN
             CAST(ROUND(CAST(2 * tr - (n_users + 1) * n_events AS DOUBLE)
                  / CAST(n_users * n_events AS DOUBLE) * 1e6) AS BIGINT)
           WHEN n_events > 0 THEN 0 END AS gini_e6,
           CAST(ROUND(CAST(topc AS DOUBLE) / CAST(n_events AS DOUBLE) * 1e6)
                AS BIGINT) AS top_decile_share_e6
    FROM a
    """,
)
def ts_user_gini(spark, sf_dir):
    """Gini concentration of event volume across active users per
    event type, with the busiest-decile user share — the bot/whale
    dial next to gini_hours' temporal concentration (see
    analytics.user_gini)."""
    return analytics.user_gini(
        _ev(spark, sf_dir), keys=["event_type"], user_col="user_id",
    ).select(
        F.col("event_type").alias("series_id"),
        "n_users", "n_events", "gini_e6", "top_decile_share_e6",
    )


@q(
    "ts_stickiness",
    """
    WITH ud AS (
      SELECT DISTINCT user_id AS u,
             CAST(floor(epoch(date_trunc('day', ts)) / 86400) AS BIGINT) AS d
      FROM events
    ),
    dau AS (SELECT d, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY 1),
    sup AS (
      SELECT DISTINCT u, d + s AS td
      FROM ud CROSS JOIN (SELECT unnest(range(0, 7)) AS s)
    ),
    wau AS (SELECT td, CAST(count(*) AS BIGINT) AS wau FROM sup GROUP BY 1)
    SELECT CAST(dau.d * 86400 AS BIGINT) AS day_ep, dau.dau, wau.wau,
           CAST(ROUND(CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE)
                * 1e6) AS BIGINT) AS stickiness_e6
    FROM dau JOIN wau ON wau.td = dau.d
    """,
)
def ts_stickiness(spark, sf_dir):
    """DAU/WAU stickiness per observed day — exact trailing-7-day
    distinct users via support explosion (never a sliding distinct,
    never a sketch), output only for days with events (see
    analytics.stickiness)."""
    return analytics.stickiness(_ev(spark, sf_dir))
