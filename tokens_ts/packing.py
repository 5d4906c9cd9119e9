"""Sequence packing: concat-and-chunk for training-batch assembly.

The packing step every LLM training pipeline runs between curation and
the data loader: concatenate all documents' tokens in a deterministic
global order and cut the stream into fixed-length chunks (GPT-style
concat-and-chunk — zero padding waste; document boundaries travel as
spans so the loader can mask attention across them). The north-rule
token-array-equality invariant holds THROUGH this rewrite: flattening
each chunk's ordered spans reproduces the input token stream exactly
(pinned by tests and a cross-engine md5 over the packed arrays).

Scale design: the global token offset is computed WITHOUT a global
window. A single `Window.orderBy(...)` over 10^12 docs would funnel the
whole corpus through ONE task (Exchange SinglePartition); instead:

  1. per-source token totals        — one map-side-combined agg
     (#sources rows: control-plane size),
  2. driver-side prefix sum         — O(#sources), broadcast back,
  3. per-source cumulative window   — partitioned by source, parallel.

Chunk assembly is then an explode of each doc onto the O(n_tok/L)
chunks its span crosses plus one hash aggregation — all shuffles are
on (chunk_id), never a global sort.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def source_bases(seq: DataFrame) -> DataFrame:
    """Per-source global base offsets in source order — the driver-side
    prefix sum over per-source token totals. Control-plane sized (one
    row per source, the same bound as the checkpoint manifest); compute
    ONCE and pass to pack_offsets when deriving both pack_summary and
    pack_tokens from the same input, so the totals job runs once.

    Uniqueness of doc_id per source is enforced by pack_offsets'
    zero-cost window guard, not here — this aggregation stays ONE
    map-side-combined shuffle of (source) partials."""
    totals = (
        seq.groupBy("source")
        .agg(F.sum("n_tok").alias("tot"))
        .orderBy("source")
        .collect()
    )
    base_rows, acc = [], 0
    for r in totals:
        base_rows.append((r["source"], acc))
        acc += int(r["tot"])
    return seq.sparkSession.createDataFrame(
        base_rows, "source string, base long"
    )


def pack_offsets(seq: DataFrame, bases: DataFrame | None = None) -> DataFrame:
    """Attach the global token offset of every doc in the deterministic
    (source, doc_id) concatenation order. `bases` = a precomputed
    source_bases(seq) to share across pack_summary + pack_tokens.

    Duplicate doc_ids within a source would make the concatenation
    order — and hence every packed chunk — silently nondeterministic,
    so the cumulative window doubles as a ZERO-COST guard: a lag() over
    the SAME (source, doc_id) sort flags adjacent equal ids and
    raise_error()s mid-scan (no extra shuffle, no distinct count —
    measured at +0 s vs +50% for an exact count_distinct pre-check).
    The failure surfaces as a SparkRuntimeException('duplicate doc_id
    …') when the plan executes.

    r6 note (measured, REJECTED — guide §1.1 empirical loop): a
    guide-§8 rewrite that ran the cumulative window on a slim
    (source, doc_id, n_tok) projection and re-attached offsets to
    the heavy rows via a broadcast doc_id join — so token payloads
    never ride the window shuffle — benchmarked ~2x SLOWER at sandbox
    volume (interleaved A/B: 1.5-1.7 s window path vs 2.7-3.7 s
    broadcast path; the broadcast build barrier + per-row hash probe
    cost more than sorting this corpus's arrays 8 ways). Kept the
    window form; the slim-plus-broadcast shape is the documented
    fallback if per-source window state ever dominates at real
    payload sizes."""
    base = bases if bases is not None else source_bases(seq)
    w_sort = Window.partitionBy("source").orderBy("doc_id")
    w = w_sort.rowsBetween(Window.unboundedPreceding, -1)
    dup_guard = F.when(
        F.lag("doc_id").over(w_sort) == F.col("doc_id"),
        F.raise_error(
            F.concat(
                F.lit("pack_offsets: duplicate doc_id "),
                F.col("doc_id").cast("string"),
                F.lit(" within source "),
                F.col("source"),
                F.lit(" — packing order would be nondeterministic; "
                      "dedupe the batch first"),
            )
        ).cast("long"),
    ).otherwise(F.lit(0))
    return (
        seq.join(F.broadcast(base), "source")
        .withColumn(
            "offset",
            F.col("base")
            + F.coalesce(F.sum("n_tok").over(w), F.lit(0)).cast("long")
            + dup_guard,
        )
        .drop("base")
    )


def _spans(
    seq: DataFrame, chunk_len: int, bases: DataFrame | None = None
) -> DataFrame:
    """One row per (doc, chunk) span the doc's tokens cover."""
    off = pack_offsets(seq, bases=bases).where(F.col("n_tok") > 0)
    first = F.floor(F.col("offset") / chunk_len).cast("long")
    last = F.floor((F.col("offset") + F.col("n_tok") - 1) / chunk_len).cast("long")
    sp = off.select(
        "doc_id",
        "source",
        "offset",
        "n_tok",
        "tokens",
        F.explode(F.sequence(first, last)).alias("chunk_id"),
    )
    span_start = F.greatest(F.col("offset"), F.col("chunk_id") * chunk_len)
    span_end = F.least(
        F.col("offset") + F.col("n_tok"), (F.col("chunk_id") + 1) * chunk_len
    )
    return sp.select(
        "doc_id",
        "source",
        "chunk_id",
        "offset",
        (span_start - F.col("offset")).cast("int").alias("start_in_doc"),
        (span_end - span_start).cast("int").alias("span_len"),
        "tokens",
    )


def pack_summary(
    seq: DataFrame, chunk_len: int = 2048, bases: DataFrame | None = None
) -> DataFrame:
    """Per-chunk packing report: how many docs contribute, how many
    tokens land, and the covering doc range — the bookkeeping view a
    data-loader manifest needs (no token materialization)."""
    spans = _spans(seq, chunk_len, bases=bases).drop("tokens")
    return spans.groupBy("chunk_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("span_len").cast("long").alias("n_filled"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


def pack_tokens(
    seq: DataFrame, chunk_len: int = 2048, bases: DataFrame | None = None
) -> DataFrame:
    """Materialize the packed chunks: (chunk_id, tokens array<int> of
    length chunk_len except the tail). Spans are cut with F.slice and
    reassembled in offset order via array_sort over (offset, piece)
    structs — offsets are globally unique, so the sort is total and
    collect_list's arrival nondeterminism cannot leak through."""
    spans = _spans(seq, chunk_len, bases=bases)
    piece = F.slice("tokens", F.col("start_in_doc") + 1, F.col("span_len"))
    return (
        spans.select("chunk_id", "offset", piece.alias("piece"))
        .groupBy("chunk_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col("offset").alias("o"), F.col("piece").alias("p"))
                        )
                    ),
                    lambda s: s["p"],
                )
            ).alias("tokens"),
            F.count("*").alias("n_spans"),
        )
        .withColumn("n_filled", F.size("tokens").cast("long"))
    )


def length_buckets(
    seq,
    ladder: tuple = (16, 32, 64, 128, 256, 512, 1024, 2048),
    tokens_col: str = "n_tok",
):
    """Padding-waste audit for length-bucketed batching: assign every
    sequence to the smallest power-of-two bucket that holds it and
    report, per bucket, how many tokens a pad-to-bucket batcher would
    compute vs how many are real — THE number that decides between
    bucketed padding and sequence packing (pack_tokens' waste is its
    fill column; this is the baseline it beats).

    Bucket rule (pinned): smallest ladder rung ≥ n_tok; sequences
    longer than the top rung land in the top rung (flagged by
    overflow — a real batcher would truncate or reject, and the audit
    must show the mass that hits that policy). waste_rate =
    (padded − real) / padded from exact bigint sums.

    Scale shape: the bucket is a row-local CASE ladder; the audit is
    one map-side-combined groupBy on a |ladder|-bounded frame."""
    import pyspark.sql.functions as F

    n = F.col(tokens_col).cast("bigint")
    b = F.lit(int(ladder[-1])).cast("bigint")
    for rung in reversed(ladder[:-1]):
        b = F.when(n <= rung, F.lit(int(rung)).cast("bigint")).otherwise(b)
    out = (
        seq.where(n > 0)
        .select(
            b.alias("bucket"),
            n.alias("_n"),
            (n > int(ladder[-1])).cast("int").alias("_ovf"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_seqs"),
            F.sum("_n").cast("bigint").alias("real_tokens"),
            F.sum("_ovf").cast("bigint").alias("n_overflow"),
        )
    )
    padded = F.col("bucket") * F.col("n_seqs")
    return out.select(
        "bucket",
        "n_seqs",
        "real_tokens",
        padded.alias("padded_tokens"),
        F.round(
            (padded - F.col("real_tokens")).cast("double") / padded * 1e6
        )
        .cast("bigint")
        .alias("waste_rate_e6"),
        "n_overflow",
    )


def packing_sweep(
    seq,
    chunk_lens: tuple = (512, 1024, 2048, 4096),
    tokens_col: str = "n_tok",
):
    """Chunk-length sweep for the concat-and-pack path: for each
    candidate length, how many chunks the corpus packs into and the
    fill it achieves — closed-form from ONE total-token aggregate
    (pack_tokens concatenates globally, so n_chunks = ceil(total/len)
    exactly: the sweep needs no packing run, just the arithmetic).
    Read next to seq_length_buckets: the same corpus under pad-to-
    bucket batching wastes what this table shows packing saves, and
    together they price the two batching strategies per length.

    fill = total/(n_chunks·len) from exact bigints; waste is the tail
    chunk's padding. Scale shape: one map-side-combined scalar agg +
    |chunk_lens| literal rows."""
    import pyspark.sql.functions as F

    tot = seq.agg(
        F.sum(F.col(tokens_col).cast("bigint")).alias("_t"),
        F.count("*").cast("bigint").alias("_n"),
    )
    rows = None
    for cl in chunk_lens:
        n_chunks = F.ceil(F.col("_t") / F.lit(int(cl))).cast("bigint")
        r = tot.select(
            F.lit(int(cl)).cast("bigint").alias("chunk_len"),
            F.col("_n").alias("n_seqs"),
            F.col("_t").alias("total_tokens"),
            n_chunks.alias("n_chunks"),
            (n_chunks * cl - F.col("_t")).cast("bigint").alias(
                "waste_tokens"
            ),
            F.round(
                F.col("_t").cast("double") / (n_chunks * cl) * 1e6
            ).cast("bigint").alias("fill_e6"),
        )
        rows = r if rows is None else rows.unionByName(r)
    return rows


def curriculum(
    seq: DataFrame,
    rung_width: int = 32,
    id_col: str = "doc_id",
) -> DataFrame:
    """Length-curriculum training schedule: assign every sequence a
    GLOBAL step number such that shorter sequences train first (the
    classic warmup curriculum — short sequences are cheaper and
    gradient-stabler early), with deterministic shuffling inside each
    difficulty rung so the model never sees a systematic within-rung
    order.

    Order pinned as the lexicographic sort
        (rung asc, source asc, md5(doc_id) asc, doc_id asc)
    where rung = n_tok div rung_width: rung-major (the curriculum),
    source as ordered blocks within a rung, md5 as the content-
    addressed shuffle key within a block (both engines rebuild it
    from the id alone; doc_id breaks md5 ties exactly).

    Computed WITHOUT a global sort (the pack_offsets pattern): a
    row_number inside each (rung, source) window plus driver-side
    prefix-summed block offsets over the (rung, source) group counts
    — control-plane sized (rungs × sources rows) — broadcast back.
    One key shuffle on (rung, source); no SinglePartition anywhere,
    and the window partitioning carries the rung AND source so no
    rung-sized skew partition exists at corpus scale."""
    rung = (F.col("n_tok") / rung_width).cast("bigint")
    d = seq.select(
        id_col, "source", F.col("n_tok").cast("bigint").alias("n_tok")
    ).withColumn("rung", rung)
    sizes = (
        d.groupBy("rung", "source")
        .agg(F.count("*").alias("n"))
        .orderBy("rung", "source")
        .collect()
    )
    rows, acc = [], 0
    for r in sizes:
        rows.append((int(r["rung"]), r["source"], acc))
        acc += int(r["n"])
    offsets = seq.sparkSession.createDataFrame(
        rows, "rung bigint, source string, base long"
    )
    w = Window.partitionBy("rung", "source").orderBy(
        F.md5(F.col(id_col)), F.col(id_col)
    )
    return (
        d.withColumn("_r", F.row_number().over(w))
        .join(F.broadcast(offsets), ["rung", "source"])
        .select(
            id_col,
            "source",
            "n_tok",
            "rung",
            (F.col("base") + F.col("_r")).cast("bigint").alias("step"),
        )
    )


def nextfit_bins(
    seq: DataFrame,
    cap: int = 2048,
    id_col: str = "doc_id",
) -> DataFrame:
    """No-split sequence packing: assign each document WHOLE to a
    training bin of capacity `cap` tokens by next-fit-decreasing —
    the packer you use when cross-document attention contamination is
    forbidden (pack_tokens concatenates and SPLITS; length_buckets
    pads; this one never cuts a document and never mixes bins once
    closed, so masks stay per-doc).

    Per source, docs walk in (n_tok desc, doc_id asc) order with the
    classic next-fit recurrence from (bin 1, fill 0):
        close iff fill > 0 and fill + n > cap  →  bin += 1, fill = n
        else fill += n
    Pins: an oversized doc (n > cap) lands ALONE in its own bin (the
    recurrence closes before and after it naturally); ties in n_tok
    walk in doc_id order; bins are per-source (bin ids restart at 1
    per source — sources are independent packing domains, matching
    pack_tokens' concatenation domains).

    The open-bin fill is genuinely sequential state (a cumsum with
    data-dependent resets — no window frame expresses it), so it
    takes the sanctioned Arrow path: ONE source-key shuffle into
    applyInPandas with an int64 loop; parallelism = |sources|, the
    same domain decomposition every packing op here uses. The oracle
    replays the identical recurrence as a recursive CTE. fill_after
    makes the hash pin the entire state walk, not just assignments."""
    d = seq.select(
        id_col, "source", F.col("n_tok").cast("long").alias("n_tok")
    )
    schema = (
        "source string, doc_id string, n_tok bigint, "
        "bin_idx bigint, fill_after bigint"
    )

    def _pack(pdf):
        pdf = pdf.sort_values(
            ["n_tok", id_col], ascending=[False, True]
        ).reset_index(drop=True)
        n = pdf["n_tok"].to_numpy(dtype="int64")
        bins = [0] * len(n)
        fills = [0] * len(n)
        b, fill = 1, 0
        for i, ni in enumerate(n):
            if fill > 0 and fill + ni > cap:
                b += 1
                fill = int(ni)
            else:
                fill += int(ni)
            bins[i] = b
            fills[i] = fill
        res = pdf[["source", id_col, "n_tok"]].copy()
        res["bin_idx"] = bins
        res["fill_after"] = fills
        return res

    return d.groupBy("source").applyInPandas(_pack, schema=schema)


def pack_xattn(
    seq: DataFrame, chunk_len: int = 2048, bases: DataFrame | None = None
) -> DataFrame:
    """Cross-document attention contamination per packed chunk: of the
    L'(L'−1)/2 causal token pairs a full-attention model forms over a
    packed chunk of L' filled tokens, how many CROSS a document
    boundary — the quantity a block-diagonal attention mask exists to
    remove, and the number that decides whether plain concat-packing
    is acceptable for a given model or the loader must emit mask/
    position-id resets. pack_summary says how full the chunks are;
    this says what the fullness costs.

    Closed form from the span lengths alone (no token
    materialization): cross = (L'² − Σ s_i²)/2 with L' = Σ s_i — both
    terms exact bigints off the same spans frame the manifest uses,
    so the report and the actual packing agree by construction.
    frac = cross/total causal pairs; single-token chunks (total = 0)
    emit an honest null frac.

    Scale shape: the spans frame's chunk_id partial agg — identical
    lineage to pack_summary, one chunk_id shuffle, no global sort."""
    spans = _spans(seq, chunk_len, bases=bases).drop("tokens")
    a = spans.groupBy("chunk_id").agg(
        F.count("*").cast("bigint").alias("n_spans"),
        F.sum("span_len").cast("bigint").alias("n_filled"),
        F.sum(
            F.col("span_len").cast("bigint") * F.col("span_len").cast("bigint")
        ).alias("_sq"),
    )
    lf = F.col("n_filled")
    cross = (lf * lf - F.col("_sq")) / 2
    total = (lf * (lf - 1)) / 2
    return a.select(
        "chunk_id",
        "n_spans",
        "n_filled",
        cross.cast("bigint").alias("n_cross_pairs"),
        total.cast("bigint").alias("n_causal_pairs"),
        F.when(
            total > 0,
            F.round(
                cross.cast("double") / total.cast("double") * 1e6
            ).cast("bigint"),
        ).alias("cross_frac_e6"),
    )
