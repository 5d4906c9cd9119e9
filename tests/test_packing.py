"""Sequence packing (concat-and-chunk): invariants + oracle + plan."""

import pyspark.sql.functions as F
import pytest

from tokens_ts import packing

L = 256


def test_packing_token_conservation_and_fill(spark, seq_tiny):
    total = seq_tiny.agg(F.sum("n_tok")).collect()[0][0]
    summary = packing.pack_summary(seq_tiny, chunk_len=L).collect()
    by_id = {r["chunk_id"]: r for r in summary}
    n_chunks = len(by_id)
    # contiguous ids from 0
    assert sorted(by_id) == list(range(n_chunks))
    # token conservation: every input token lands in exactly one chunk
    assert sum(r["n_filled"] for r in summary) == total
    # every chunk full except the tail
    for cid, r in by_id.items():
        if cid < n_chunks - 1:
            assert r["n_filled"] == L, cid
    assert 0 < by_id[n_chunks - 1]["n_filled"] <= L


def test_packed_stream_equals_pandas_concatenation(spark, seq_tiny, seq_tiny_pd):
    """Flattening the packed chunks in chunk order must reproduce the
    single-node concatenation of all docs' tokens in (source, doc_id)
    order, element for element — the token-array-equality invariant
    through the packing rewrite."""
    pdf = seq_tiny_pd.sort_values(["source", "doc_id"])
    expected = [int(t) for toks in pdf["tokens"] for t in toks]

    chunks = packing.pack_tokens(seq_tiny, chunk_len=L).orderBy("chunk_id").collect()
    got = [t for r in chunks for t in r["tokens"]]
    assert got == expected


def test_packing_offsets_match_pandas_cumsum(spark, seq_tiny, seq_tiny_pd):
    pdf = seq_tiny_pd.sort_values(["source", "doc_id"])
    exp = dict(
        zip(pdf["doc_id"], pdf["n_tok"].cumsum().shift(fill_value=0).astype(int))
    )
    got = {
        r["doc_id"]: r["offset"]
        for r in packing.pack_offsets(seq_tiny).collect()
    }
    assert got == exp


def test_packing_plan_has_no_global_sort(seq_tiny):
    """The scale contract: offsets come from per-source windows + a
    broadcast prefix, never a corpus-wide window — a SinglePartition
    exchange in this plan would funnel 10^12 docs through one task."""
    plan = (
        packing.pack_summary(seq_tiny, chunk_len=L)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan, plan


def test_packing_skips_empty_docs(spark):
    df = spark.createDataFrame(
        [
            ("a-0", [1, 2, 3], 3, "a"),
            ("a-1", [], 0, "a"),
            ("a-2", [4, 5], 2, "a"),
        ],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    chunks = packing.pack_tokens(df, chunk_len=4).orderBy("chunk_id").collect()
    flat = [t for r in chunks for t in r["tokens"]]
    assert flat == [1, 2, 3, 4, 5]
    assert [r["n_filled"] for r in chunks] == [4, 1]


def test_packing_duplicate_doc_id_rejected(spark):
    """Duplicate doc_ids within a source would make the concat order —
    and every packed chunk — nondeterministic; the zero-cost window
    guard must abort the job (raise_error inside the offset scan; no
    extra shuffle, pinned by the plan test below)."""
    df = spark.createDataFrame(
        [
            ("a-0", [1, 2], 2, "a"),
            ("a-0", [3, 4], 2, "a"),
            ("b-0", [5], 1, "b"),
        ],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    with pytest.raises(Exception, match="duplicate doc_id"):
        packing.pack_tokens(df, chunk_len=4).collect()


def test_packing_dup_guard_adds_no_shuffle(seq_tiny):
    """The dup guard rides the existing per-source window sort: the
    offsets plan must contain exactly ONE exchange (the hash
    repartition by source) — a count_distinct pre-check would add a
    second."""
    plan = (
        packing.pack_offsets(seq_tiny)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan


def test_packing_shared_bases_single_totals_job(spark, seq_tiny):
    """source_bases computed once feeds both summary and tokens with
    identical results to the per-call path (the caching contract)."""
    bases = packing.source_bases(seq_tiny)
    s1 = packing.pack_summary(seq_tiny, chunk_len=L, bases=bases).collect()
    s2 = packing.pack_summary(seq_tiny, chunk_len=L).collect()
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))
    t1 = (
        packing.pack_tokens(seq_tiny, chunk_len=L, bases=bases)
        .orderBy("chunk_id")
        .collect()
    )
    t2 = packing.pack_tokens(seq_tiny, chunk_len=L).orderBy("chunk_id").collect()
    assert [r["tokens"] for r in t1] == [r["tokens"] for r in t2]


def test_length_buckets_ladder_waste_and_overflow(spark):
    """Bucket rule pinned at the rung boundaries (16 stays in 16, 17
    spills to 32), waste accounting exact, and an over-top-rung
    sequence lands in the top rung with the overflow flag set (its
    negative waste is the truncation mass the audit must surface)."""
    seq = spark.createDataFrame(
        [(1, 16), (2, 17), (3, 32), (4, 250), (5, 3000), (6, 0)],
        "doc_id long, n_tok int",
    )
    from tokens_ts import packing

    out = {r["bucket"]: r for r in packing.length_buckets(seq).collect()}
    assert set(out) == {16, 32, 256, 2048}  # n_tok=0 dropped
    assert out[16]["n_seqs"] == 1 and out[16]["waste_rate_e6"] == 0
    assert out[32]["n_seqs"] == 2 and out[32]["real_tokens"] == 49
    assert out[32]["padded_tokens"] == 64
    assert out[32]["waste_rate_e6"] == round((64 - 49) / 64 * 1e6)
    assert out[2048]["n_overflow"] == 1
    assert out[2048]["waste_rate_e6"] < 0


def test_packing_sweep_closed_form_matches_real_pack(spark):
    """The sweep's closed form must agree with an ACTUAL pack run:
    n_chunks at chunk_len 2048 equals pack_tokens' chunk count on the
    same corpus; fill/waste arithmetic hand-checked on a tiny total."""
    from tokens_ts import packing, synth

    seq = synth.sequences(spark, 200, 4)
    sweep = {
        r["chunk_len"]: r for r in packing.packing_sweep(seq).collect()
    }
    real = packing.pack_tokens(seq, chunk_len=2048).count()
    assert sweep[2048]["n_chunks"] == real
    tiny = spark.createDataFrame(
        [(1, 700), (2, 500)], "doc_id long, n_tok int"
    )
    row = {
        r["chunk_len"]: r
        for r in packing.packing_sweep(tiny, chunk_lens=(512,)).collect()
    }[512]
    assert row["n_chunks"] == 3  # ceil(1200/512)
    assert row["waste_tokens"] == 3 * 512 - 1200
    assert row["fill_e6"] == round(1200 / 1536 * 1e6)


def test_curriculum_matches_global_sort_and_is_a_permutation(spark):
    """The blocked (rung, source)-window + prefix-sum construction
    reproduces the global (rung, source, md5(id), id) sort exactly,
    and steps are a 1..N permutation with rungs in nondecreasing
    step order."""
    import hashlib

    rows = []
    for s in range(3):
        for k in range(40):
            rows.append((f"s{s}-{k:03d}", f"src{s}", 16 + (k * 37) % 200))
    df = spark.createDataFrame(rows, "doc_id string, source string, n_tok int")
    out = sorted(packing.curriculum(df).collect(), key=lambda r: r["step"])
    assert [r["step"] for r in out] == list(range(1, len(rows) + 1))
    expect = sorted(
        rows,
        key=lambda t: (t[2] // 32, t[1],
                       hashlib.md5(t[0].encode()).hexdigest(), t[0]),
    )
    assert [r["doc_id"] for r in out] == [t[0] for t in expect]
    rungs = [r["rung"] for r in out]
    assert rungs == sorted(rungs)


def test_curriculum_within_block_is_md5_shuffled_not_id_ordered(spark):
    """Inside one (rung, source) block the schedule follows md5(id),
    which differs from plain id order — the shuffle is real."""
    rows = [(f"d{k:03d}", "s", 16) for k in range(30)]
    df = spark.createDataFrame(rows, "doc_id string, source string, n_tok int")
    out = sorted(packing.curriculum(df).collect(), key=lambda r: r["step"])
    ids = [r["doc_id"] for r in out]
    assert sorted(ids) == [t[0] for t in rows]
    assert ids != sorted(ids)


def test_nextfit_hand_walk_oversized_alone_and_tie_order(spark):
    """cap=100: docs (n desc, id asc) = d-big(150), a(60), b(60),
    c(40), d(40) → big alone in bin 1 (oversized pin); a opens bin 2;
    b doesn't fit (60+60>100) → bin 3 with c (60+40=100 exactly fits);
    d opens bin 4. Equal-length ties walk in id order."""
    rows = [("a", "s", 60), ("b", "s", 60), ("c", "s", 40),
            ("dbig", "s", 150), ("d", "s", 40)]
    df = spark.createDataFrame(rows, "doc_id string, source string, n_tok int")
    out = {r["doc_id"]: r for r in
           packing.nextfit_bins(df, cap=100).collect()}
    assert (out["dbig"]["bin_idx"], out["dbig"]["fill_after"]) == (1, 150)
    assert (out["a"]["bin_idx"], out["a"]["fill_after"]) == (2, 60)
    assert (out["b"]["bin_idx"], out["b"]["fill_after"]) == (3, 60)
    assert (out["c"]["bin_idx"], out["c"]["fill_after"]) == (3, 100)
    assert (out["d"]["bin_idx"], out["d"]["fill_after"]) == (4, 40)


def test_nextfit_bins_never_split_and_respect_cap(spark):
    """Property over 200 docs: every doc appears exactly once, every
    bin's total ≤ cap unless it holds a single oversized doc, and
    bins restart per source."""
    import random

    rng = random.Random(3)
    rows = [(f"d{i:03d}", f"src{i % 2}", rng.randrange(10, 300))
            for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id string, source string, n_tok int")
    out = packing.nextfit_bins(df, cap=512).collect()
    assert len(out) == 200 and len({r["doc_id"] for r in out}) == 200
    from collections import defaultdict

    fills = defaultdict(int)
    members = defaultdict(list)
    for r in out:
        fills[(r["source"], r["bin_idx"])] += r["n_tok"]
        members[(r["source"], r["bin_idx"])].append(r["n_tok"])
    for k, tot in fills.items():
        assert tot <= 512 or len(members[k]) == 1
    assert min(b for s, b in fills if s == "src0") == 1
    assert min(b for s, b in fills if s == "src1") == 1


def test_pack_xattn_closed_form_matches_direct_count(spark, seq_tiny):
    out = {r["chunk_id"]: r for r in
           packing.pack_xattn(seq_tiny, chunk_len=L).collect()}
    spans = packing._spans(seq_tiny, L).drop("tokens").collect()
    by_chunk = {}
    for s in spans:
        by_chunk.setdefault(s["chunk_id"], []).append(s["span_len"])
    assert set(out) == set(by_chunk)
    for cid, lens in by_chunk.items():
        lf = sum(lens)
        # direct O(m^2) count of cross-doc causal pairs
        direct = sum(
            a * b for i, a in enumerate(lens) for b in lens[i + 1:]
        )
        r = out[cid]
        assert r["n_filled"] == lf
        assert r["n_cross_pairs"] == direct
        assert r["n_causal_pairs"] == lf * (lf - 1) // 2
        if lf > 1:
            # HALF-UP like both engines (python round() is half-even
            # and this fixture lands exactly on a .5 boundary)
            import math

            assert r["cross_frac_e6"] == math.floor(
                direct / (lf * (lf - 1) // 2) * 1e6 + 0.5
            )
    # a single-doc chunk has zero contamination by construction
    singles = [cid for cid, lens in by_chunk.items() if len(lens) == 1]
    for cid in singles:
        assert out[cid]["n_cross_pairs"] == 0
