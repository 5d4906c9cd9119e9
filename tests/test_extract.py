"""Extraction operators (point/box/mask/full stats) vs the numpy oracle."""

import math

import numpy as np
import pytest

from tests import oracle
from tokens_ts import extract

REL = 1e-12
# std: numpy uses pairwise summation; Spark's F.aggregate is sequential —
# identical math, last-ulp summation-order differences only.
REL_STD = 1e-9


def _close(a, b, rel=REL):
    if a is None or (isinstance(a, float) and math.isnan(a)):
        return b is None or (isinstance(b, float) and math.isnan(b))
    if b is None or (isinstance(b, float) and math.isnan(b)):
        return False
    return math.isclose(float(a), float(b), rel_tol=rel, abs_tol=1e-9)


STATS = ["mean", "min", "max", "sum", "std", "median", "cnt", "25%", "95%"]


def test_point(seq_tiny, seq_tiny_pd):
    for p in (0, 7, 200):
        got = {r["doc_id"]: r["value"] for r in extract.point(seq_tiny, p).collect()}
        for _, row in seq_tiny_pd.iterrows():
            exp = oracle.sel_point(oracle.masked(row["tokens"]), p)
            assert _close(got[row["doc_id"]], exp), (p, row["doc_id"], got[row["doc_id"]], exp)


def test_box_stats(seq_tiny, seq_tiny_pd):
    lo, hi = 8, 32
    df = extract.box_stats(seq_tiny, lo, hi, stats=STATS)
    got = {r["doc_id"]: r.asDict() for r in df.collect()}
    for _, row in seq_tiny_pd.iterrows():
        v = oracle.sel_box(oracle.masked(row["tokens"]), lo, hi)
        g = got[row["doc_id"]]
        for st in STATS:
            exp = oracle.stat(v, st)
            rel = REL_STD if st == "std" else REL
            assert _close(g[f"box_{lo}_{hi}_{st}"], exp, rel), (st, row["doc_id"], g, exp)


def test_mask_stats(seq_tiny, seq_tiny_pd):
    positions = [0, 3, 6, 9, 12, 15, 40, 80, 250]
    df = extract.mask_stats(seq_tiny, positions, stats=["mean", "cnt", "std"])
    got = {r["doc_id"]: r.asDict() for r in df.collect()}
    for _, row in seq_tiny_pd.iterrows():
        v = oracle.sel_mask(oracle.masked(row["tokens"]), positions)
        g = got[row["doc_id"]]
        for st in ("mean", "cnt", "std"):
            rel = REL_STD if st == "std" else REL
            assert _close(g[f"mask_{st}"], oracle.stat(v, st), rel), (st, row["doc_id"])


def test_full_stats(seq_tiny, seq_tiny_pd):
    df = extract.full_stats(seq_tiny, stats=STATS)
    got = {r["doc_id"]: r.asDict() for r in df.collect()}
    for _, row in seq_tiny_pd.iterrows():
        v = oracle.masked(row["tokens"])
        g = got[row["doc_id"]]
        for st in STATS:
            rel = REL_STD if st == "std" else REL
            assert _close(g[f"full_{st}"], oracle.stat(v, st), rel), (st, row["doc_id"])


def test_to_raw_melt(seq_tiny):
    wide = extract.full_stats(seq_tiny, stats=["mean", "max"])
    raw = extract.to_raw(wide)
    assert raw.columns == ["source", "series_id", "event_ts", "value"]
    n_docs = seq_tiny.count()
    assert raw.count() == 2 * n_docs
    sids = {r["series_id"] for r in raw.select("series_id").distinct().collect()}
    assert sids == {"full_mean", "full_max"}


def test_token_array_equality_invariant(seq_tiny, seq_tiny_pd):
    """BASELINE.json:15 — tokens pass through extraction untouched."""
    from tokens_ts import grid
    import pyspark.sql.functions as F

    out = grid.with_event_time(seq_tiny)  # a rewrite that carries tokens
    got = {r["doc_id"]: r["tokens"] for r in out.select("doc_id", "tokens").collect()}
    for _, row in seq_tiny_pd.iterrows():
        assert np.array_equal(np.array(got[row["doc_id"]], dtype=np.int32), row["tokens"])
    # checksum carrier used at scale (SURVEY.md §4.4): xor-fold of
    # xxhash64(doc_id, tokens) — order-independent, overflow-free
    cs = out.select(F.bit_xor(F.xxhash64("doc_id", "tokens")).alias("c")).collect()[0]["c"]
    cs2 = seq_tiny.select(F.bit_xor(F.xxhash64("doc_id", "tokens")).alias("c")).collect()[0]["c"]
    assert cs == cs2


def test_points_multi_matches_single_and_oob(spark, seq_tiny):
    """Multi-point extraction equals per-point extraction column-wise;
    out-of-range positions are null (reference: NaN for p >= n_tok)."""
    from tokens_ts import extract
    import pyspark.sql.functions as F

    multi = {r["doc_id"]: r for r in extract.points(seq_tiny, [3, 500]).collect()}
    single = {r["doc_id"]: r["value"] for r in extract.point(seq_tiny, 3).collect()}
    assert multi and single
    for doc_id, r in multi.items():
        assert r["point_p3"] == single[doc_id], doc_id
        assert r["point_p500"] is None  # n_tok <= 256 in the fixture
