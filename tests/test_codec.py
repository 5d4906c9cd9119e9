"""Codec round-trip + cross-implementation parity + Spark integration.

Two independent implementations exist on purpose: tokens_ts/codec.py
(vectorized, production) and tests/oracle.py (per-bit BitWriter,
normative spec). They must produce identical bytes for every input.
"""

import math

import numpy as np
import pytest

from tests import oracle
from tokens_ts import codec

# adversarial arrays (FIXTURES.md §3)
TS_CASES = {
    "regular": np.arange(0, 3600, 60, dtype=np.int64) + 1767225600,
    "single": np.array([1767225600], dtype=np.int64),
    "two": np.array([1767225600, 1767225660], dtype=np.int64),
    "irregular": 1767225600 + np.cumsum(np.array([0, 1, 63, 64, 65, 255, 256, 257, 2047, 2048, 2049, 100000, 1 << 30], dtype=np.int64)),
    "negative_dod": 1767225600 + np.cumsum(np.array([0, 1000, 1, 1000, 1, 937, 64, 2111], dtype=np.int64)),
    "epoch_zero": np.array([0, 60, 120, 7200], dtype=np.int64),
    "pre_epoch": np.array([-86400, -86340, -86280], dtype=np.int64),
}

rng_vals = (np.arange(500, dtype=np.float64) * 40503.0) % 131072.0
VAL_CASES = {
    "constant": np.full(100, 3.14159),
    "single": np.array([42.0]),
    "monotone": np.arange(256, dtype=np.float64),
    "walk": np.cumsum(((np.arange(300) * 104729) % 7 - 3).astype(np.float64)),
    "recurrence": rng_vals,
    "with_nan": np.where((np.arange(64) % 7) == 0, np.nan, np.arange(64, dtype=np.float64)),
    "tiny_and_huge": np.array([1e-308, 1e308, -1e-308, -1e308, 0.0, -0.0, 1.0]),
    "zeros": np.zeros(10),
}


@pytest.mark.parametrize("name", list(TS_CASES))
def test_ts_roundtrip_and_parity(name):
    t = TS_CASES[name]
    enc = codec.encode_ts_dod(t)
    assert enc == oracle.encode_ts_dod(t), name  # byte parity w/ normative spec
    dec = codec.decode_ts_dod(enc, t.size)
    assert np.array_equal(dec, t), name
    dec2 = oracle.decode_ts_dod(enc, t.size)
    assert np.array_equal(dec2, t), name


@pytest.mark.parametrize("name", list(VAL_CASES))
def test_val_roundtrip_and_parity(name):
    v = VAL_CASES[name]
    enc = codec.encode_val_xor(v)
    assert enc == oracle.encode_val_xor(v), name
    dec = codec.decode_val_xor(enc, v.size)
    assert np.array_equal(
        dec.view(np.uint64), np.ascontiguousarray(v).view(np.uint64)
    ), name  # bit-exact incl. nan patterns and -0.0
    dec2 = oracle.decode_val_xor(enc, v.size)
    assert np.array_equal(dec2.view(np.uint64), np.ascontiguousarray(v).view(np.uint64)), name


def test_compression_ratio_regular_series():
    """Regular grid + smooth values must compress hard (the point of DoD)."""
    t = np.arange(0, 86400, 60, dtype=np.int64) + 1767225600
    enc = codec.encode_ts_dod(t)
    assert len(enc) < t.size  # ≪ 8 bytes/point: ~1 bit/point after warmup
    v = np.full(t.size, 123.5)
    assert len(codec.encode_val_xor(v)) < t.size / 4 + 16


def test_spark_segment_roundtrip(spark, seq_tiny):
    """Full Spark path: raw → hourly blob segments → decode → identical."""
    from tokens_ts import extract

    raw = extract.to_raw(extract.point(seq_tiny, 7)).where("value is not null")
    segs = codec.encode_segments(raw, "1h")
    back = codec.decode_segments(segs)
    a = {(r["source"], r["series_id"], r["event_ts"]): r["value"] for r in raw.collect()}
    b = {(r["source"], r["series_id"], r["event_ts"]): r["value"] for r in back.collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == b[k] or (math.isnan(a[k]) and math.isnan(b[k]))
    # framing: one row per (source, series, hour)
    import pyspark.sql.functions as F

    dup = segs.groupBy("source", "series_id", "seg_start").count().where("count > 1").count()
    assert dup == 0
    ratio = segs.agg((F.sum("enc_bytes") / F.sum("raw_bytes")).alias("r")).collect()[0]["r"]
    assert ratio < 1.0
