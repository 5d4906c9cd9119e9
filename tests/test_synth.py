"""Fixture parity: Spark synthesizer ≡ numpy oracle, bit for bit."""

import numpy as np

from tests import oracle


def test_synth_matches_oracle(seq_tiny, seq_tiny_pd):
    got = {r["doc_id"]: r for r in seq_tiny.collect()}
    exp = seq_tiny_pd
    assert len(got) == len(exp)
    for _, row in exp.iterrows():
        g = got[row["doc_id"]]
        assert g["source"] == row["source"]
        assert g["n_tok"] == row["n_tok"]
        assert np.array_equal(np.array(g["tokens"], dtype=np.int32), row["tokens"]), row["doc_id"]


def test_gap_and_skew_shape(seq_tiny_pd):
    sizes = seq_tiny_pd.groupby("source").size()
    # Zipf-ish: src00 strictly heaviest, ~2x src01
    assert sizes["src00"] > sizes["src01"] > sizes["src03"]
    # ~15% gaps
    assert 0.10 < 1 - sizes["src00"] / 400 < 0.20


def test_event_time_derivation(spark, seq_tiny, seq_tiny_pd):
    from tokens_ts import grid

    got = grid.with_event_time(seq_tiny).select("doc_id", "event_ts").collect()
    exp = dict(zip(seq_tiny_pd["doc_id"], seq_tiny_pd["event_ts"]))
    for r in got:
        assert r["event_ts"] == exp[r["doc_id"]].to_pydatetime().replace(tzinfo=None)
