"""Source registry: custom (non-srcNN) sources end-to-end + the
compiled-default ≡ dim-join parity pin."""

import pyspark.sql.functions as F

from tokens_ts import extract, grid, synth, tiers
from tokens_ts.registry import SourceSpec, default_specs, registry_dim

SPECS = [
    SourceSpec("webcrawl", 1_700_000_000, 45, 50),
    SourceSpec("forum-archive", 1_700_003_600, 90, 30),
]


def test_custom_registry_end_to_end(spark):
    """Arbitrary source names flow synth → with_event_time → extraction
    → rollup with the registry dim supplying (t0, step, budget) — no
    name parsing anywhere on this path."""
    seq = synth.sequences(spark, 0, specs=SPECS)
    per_src = {
        r["source"]: r["n"]
        for r in seq.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # budgets minus the deterministic ~15% gaps
    assert set(per_src) == {"webcrawl", "forum-archive"}
    assert 0 < per_src["webcrawl"] <= 50
    assert 0 < per_src["forum-archive"] <= 30

    timed = grid.with_event_time(seq, specs=SPECS)
    rows = timed.select("source", "k", "event_ts").collect()
    spec_by_name = {s.source: s for s in SPECS}
    import datetime

    for r in rows:
        sp = spec_by_name[r["source"]]
        expect = sp.t0 + r["k"] * sp.step
        got = r["event_ts"].replace(tzinfo=datetime.timezone.utc).timestamp()
        assert got == expect, (r, expect)

    raw = extract.to_raw(extract.full_stats(timed, stats=["mean", "max"]))
    t1m = tiers.rollup(raw, "1m")
    assert t1m.where(F.col("source") == "webcrawl").count() > 0
    assert t1m.where(F.col("source") == "forum-archive").count() > 0


def test_custom_registry_full_grid(spark):
    g = grid.full_grid(spark, 0, specs=SPECS).collect()
    per = {}
    for r in g:
        per.setdefault(r["source"], []).append(r)
    assert {s: len(v) for s, v in per.items()} == {
        "webcrawl": 50,
        "forum-archive": 30,
    }
    import datetime

    for sp in SPECS:
        ks = sorted(r["k"] for r in per[sp.source])
        assert ks == list(range(sp.budget))  # gapless grid
        first = min(per[sp.source], key=lambda r: r["k"])["event_ts"]
        assert (
            first.replace(tzinfo=datetime.timezone.utc).timestamp() == sp.t0
        )


def test_default_registry_dim_matches_compiled_expressions(spark, seq_tiny):
    """ONE rule, two forms: the srcNN expression fast path and the
    broadcast-dim join must produce identical (k, event_ts) on the
    fixture — the pin that lets the hot path stay join-free without a
    second copy of the rule drifting."""
    expr_rows = {
        r["doc_id"]: (r["k"], r["event_ts"])
        for r in grid.with_event_time(seq_tiny).collect()
    }
    dim_rows = {
        r["doc_id"]: (r["k"], r["event_ts"])
        for r in grid.with_event_time(
            seq_tiny, specs=default_specs(0, 8)
        ).collect()
    }
    assert expr_rows == dim_rows


def test_registry_dim_rejects_duplicates(spark):
    import pytest

    with pytest.raises(ValueError, match="duplicate source names"):
        registry_dim(
            spark,
            [SourceSpec("a", 0, 60, 1), SourceSpec("a", 0, 30, 2)],
        )


def test_full_grid_default_unchanged(spark):
    """The default path (no specs) still honors k_total/n_sources —
    every existing pair's grid is untouched by the registry refactor."""
    g = grid.full_grid(spark, 12, 3)
    per = {
        r["source"]: r["n"]
        for r in g.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert per == {"src00": 12, "src01": 6, "src02": 4}
