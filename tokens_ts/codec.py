"""Time-series compression codecs (SURVEY.md §2.4 C1-C4).

Delta-of-delta timestamp encoding and Gorilla XOR value compression
(Pelkonen et al., "Gorilla: A Fast, Scalable, In-Memory Time Series
Database", VLDB 2015 — public paper; absent from the reference, which
mandates them via BASELINE.json:6). Exposed as *vectorized Arrow UDFs*:
segment framing via ``groupBy(...).applyInPandas`` (one blob row per
(source, series_id, segment)), decode via ``mapInPandas`` — the only
Python-execution stages in the engine, and they move data as Arrow
batches, never per-Spark-row Python (BASELINE.json:15).

Bit layout (normative; independently re-implemented by tests/oracle.py
as a cross-check — the two implementations must produce identical
bytes):

  DoD ts:  8b width marker (64) | 64b t0 | 64b zigzag(first delta)
           | per further point: '0' dod=0; '10'+7b  dod∈[-63,64];
             '110'+9b [-255,256]; '1110'+12b [-2047,2048];
             '1111'+64b zigzag(dod)   (payloads offset-coded from lo;
             64-bit first-delta/escape so microsecond grids fit)
  XOR val: 64b v0 raw IEEE bits | per point: '0' identical bits;
           '10' + meaningful bits (reuse previous leading/length
           window); '11' + 5b leading + 6b (meaningful−1) + bits.
           NaN round-trips via its bit pattern.

Encoding hot path is numpy-vectorized: per-element variable-width
fields are scattered into a bit buffer with a repeat/cumsum index
trick (no per-bit Python), then np.packbits. The only sequential part
is the Gorilla window-reuse decision (inherently stateful); it runs
once per *changed* value per segment, on numpy scalars.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
    DoubleType,
)

from tokens_ts import config as C

# ---------------------------------------------------------------------------
# bit packing primitives (vectorized)
# ---------------------------------------------------------------------------


def _pack_fields(vals: np.ndarray, widths: np.ndarray) -> bytes:
    """Pack per-element (value, bit-width) fields MSB-first into bytes.

    Fully vectorized: output bit j belongs to element repeat(arange)[j]
    at intra-field position j - offset[elem]; one shift+mask per bit
    lane, then np.packbits.
    """
    vals = vals.astype(np.uint64)
    widths = widths.astype(np.int64)
    total = int(widths.sum())
    if total == 0:
        return b""
    elem = np.repeat(np.arange(vals.size, dtype=np.int64), widths)
    starts = np.concatenate(([0], np.cumsum(widths)[:-1]))
    pos_in_field = np.arange(total, dtype=np.int64) - starts[elem]
    shift = (widths[elem] - 1 - pos_in_field).astype(np.uint64)
    bits = ((vals[elem] >> shift) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits).tobytes()


def _zigzag64(d: np.ndarray) -> np.ndarray:
    d = d.astype(np.int64)
    return ((d << 1) ^ (d >> 63)).astype(np.uint64)


# ---------------------------------------------------------------------------
# C1: delta-of-delta timestamp encode (vectorized)
# ---------------------------------------------------------------------------

_DOD_LO = np.array([-63, -255, -2047], dtype=np.int64)
_DOD_HI = np.array([64, 256, 2048], dtype=np.int64)
_DOD_CTRL = np.array([0b10, 0b110, 0b1110], dtype=np.uint64)
_DOD_CBITS = np.array([2, 3, 4], dtype=np.int64)
_DOD_PBITS = np.array([7, 9, 12], dtype=np.int64)


def encode_ts_dod(ts_units: np.ndarray) -> bytes:
    """Timestamps in any integer unit (seconds or microseconds)."""
    t = np.asarray(ts_units, dtype=np.int64)
    head_vals = [np.uint64(64), np.uint64(int(t[0]) & ((1 << 64) - 1))]
    head_widths = [8, 64]
    if t.size >= 2:
        d0 = t[1] - t[0]
        head_vals.append(_zigzag64(np.array([d0]))[0])
        head_widths.append(64)
    vals = np.array(head_vals, dtype=np.uint64)
    widths = np.array(head_widths, dtype=np.int64)
    if t.size > 2:
        dod = np.diff(np.diff(t))
        n = dod.size
        # per point: header field + optional payload field (the 4+64-bit
        # escape exceeds one uint64, so fields are split like the XOR
        # encoder; zero-width payloads vanish in _pack_fields)
        hdr_v = np.zeros(n, dtype=np.uint64)
        hdr_w = np.ones(n, dtype=np.int64)  # default: '0' (dod == 0)
        pay_v = np.zeros(n, dtype=np.uint64)
        pay_w = np.zeros(n, dtype=np.int64)
        nz = dod != 0
        # bucket index: 0..2 for the bounded buckets, 3 = escape
        b = np.full(n, 3, dtype=np.int64)
        for bi in range(2, -1, -1):
            inb = (dod >= _DOD_LO[bi]) & (dod <= _DOD_HI[bi]) & nz
            b[inb] = bi
        for bi in range(3):
            m = (b == bi) & nz
            if m.any():
                hdr_v[m] = _DOD_CTRL[bi]
                hdr_w[m] = _DOD_CBITS[bi]
                pay_v[m] = (dod[m] - _DOD_LO[bi]).astype(np.uint64)
                pay_w[m] = _DOD_PBITS[bi]
        m = (b == 3) & nz
        if m.any():
            hdr_v[m], hdr_w[m] = 0b1111, 4
            pay_v[m] = _zigzag64(dod[m])
            pay_w[m] = 64
        fv = np.empty(2 * n, dtype=np.uint64)
        fw = np.empty(2 * n, dtype=np.int64)
        fv[0::2], fw[0::2] = hdr_v, hdr_w
        fv[1::2], fw[1::2] = pay_v, pay_w
        vals = np.concatenate([vals, fv])
        widths = np.concatenate([widths, fw])
    return _pack_fields(vals, widths)


def decode_ts_dod(data: bytes, n: int) -> np.ndarray:
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8)).astype(np.int64)
    pos = 8  # skip width marker

    def rd(nb: int) -> int:
        nonlocal pos
        v = 0
        for i in range(nb):
            v = (v << 1) | int(bits[pos + i])
        pos += nb
        return v

    t0 = rd(64)
    if t0 >= 1 << 63:
        t0 -= 1 << 64
    out = np.empty(n, dtype=np.int64)
    out[0] = t0
    if n == 1:
        return out
    zz = rd(64)
    d = (zz >> 1) ^ -(zz & 1)
    out[1] = t0 + d
    for i in range(2, n):
        if rd(1) == 0:
            dod = 0
        elif rd(1) == 0:
            dod = rd(7) - 63
        elif rd(1) == 0:
            dod = rd(9) - 255
        elif rd(1) == 0:
            dod = rd(12) - 2047
        else:
            zz = rd(64)
            dod = (zz >> 1) ^ -(zz & 1)
        d += dod
        out[i] = out[i - 1] + d
    return out


# ---------------------------------------------------------------------------
# C2: Gorilla XOR value encode
# ---------------------------------------------------------------------------


def encode_val_xor(values: np.ndarray) -> bytes:
    """Each point emits a header field (≤13 bits) plus an optional
    payload field (≤64 bits) — split because '11'+5+6+64-bit payloads
    exceed one uint64. Zero-width payload slots vanish in _pack_fields
    (np.repeat drops them), so the arrays stay fixed-size/vectorized."""
    v = np.ascontiguousarray(np.asarray(values, dtype=np.float64))
    bits = v.view(np.uint64)
    n = v.size
    xors = np.concatenate(([np.uint64(0)], bits[1:] ^ bits[:-1]))
    # field layout: [v0 | hdr_1, pay_1 | hdr_2, pay_2 | ...]
    hdr_v = np.zeros(n, dtype=np.uint64)   # index 0 unused (v0 slot below)
    hdr_w = np.ones(n, dtype=np.int64)     # default '0' (identical bits)
    pay_v = np.zeros(n, dtype=np.uint64)
    pay_w = np.zeros(n, dtype=np.int64)
    nz_idx = np.nonzero(xors[1:])[0] + 1
    lead, meaning = -1, -1
    for i in nz_idx:
        x = int(xors[i])
        lz = min(64 - x.bit_length(), 31)
        tz = (x & -x).bit_length() - 1
        ml = 64 - lz - tz
        if lead >= 0 and lz >= lead and (64 - tz) <= (lead + meaning):
            hdr_v[i], hdr_w[i] = 0b10, 2
            pay_v[i] = (x >> (64 - lead - meaning)) & ((1 << meaning) - 1)
            pay_w[i] = meaning
        else:
            lead, meaning = lz, ml
            hdr_v[i] = (0b11 << 11) | (lead << 6) | (meaning - 1)
            hdr_w[i] = 13
            pay_v[i] = x >> tz
            pay_w[i] = meaning
    vals = np.empty(1 + 2 * n, dtype=np.uint64)
    widths = np.empty(1 + 2 * n, dtype=np.int64)
    vals[0], widths[0] = bits[0] if n else np.uint64(0), 64 if n else 0
    vals[1::2], widths[1::2] = hdr_v, hdr_w
    vals[2::2], widths[2::2] = pay_v, pay_w
    # point 0 has no per-point fields
    if n:
        widths[1] = widths[2] = 0
    return _pack_fields(vals, widths)


def decode_val_xor(data: bytes, n: int) -> np.ndarray:
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8)).astype(np.int64)
    pos = 0

    def rd(nb: int) -> int:
        nonlocal pos
        v = 0
        for i in range(nb):
            v = (v << 1) | int(bits[pos + i])
        pos += nb
        return v

    cur = rd(64)
    out = np.empty(n, dtype=np.uint64)
    out[0] = cur
    lead = meaning = -1
    for i in range(1, n):
        if rd(1) == 0:
            out[i] = cur
            continue
        if rd(1) == 0:  # reuse window
            m = rd(meaning)
        else:
            lead = rd(5)
            meaning = rd(6) + 1
            m = rd(meaning)
        cur ^= m << (64 - lead - meaning)
        cur &= (1 << 64) - 1
        out[i] = cur
    return out.view(np.float64)


# ---------------------------------------------------------------------------
# C4: Spark segment framing
# ---------------------------------------------------------------------------

SEGMENT_SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("series_id", StringType()),
        StructField("seg_start", TimestampType()),
        StructField("n", IntegerType()),
        StructField("ts_blob", BinaryType()),
        StructField("val_blob", BinaryType()),
        StructField("raw_bytes", LongType()),
        StructField("enc_bytes", LongType()),
    ]
)

RAW_SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("series_id", StringType()),
        StructField("event_ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)


from pyspark.sql.functions import pandas_udf


@pandas_udf(BinaryType())
def _enc_ts_udf(ts_lists: pd.Series) -> pd.Series:
    return ts_lists.map(
        lambda a: encode_ts_dod(np.asarray(a, dtype=np.int64))
    )


@pandas_udf(BinaryType())
def _enc_val_udf(val_lists: pd.Series) -> pd.Series:
    return val_lists.map(
        lambda a: encode_val_xor(np.asarray(a, dtype=np.float64))
    )


def encode_segments(raw: DataFrame, segment: str = "1h") -> DataFrame:
    """raw (source, series_id, event_ts, value) → one blob row per
    (source, series_id, segment window).

    Shape: the grouping + time-sort happens JVM-side
    (collect_list → sort_array inside a hash aggregate, one shuffle on
    the segment key), and the Python stage is a *scalar* Arrow
    pandas_udf over whole batches of segments — thousands of segments
    per Arrow round-trip. The earlier applyInPandas formulation paid
    ~3 ms of per-group overhead, 10× the actual encoding cost on small
    segments. Segment length bounds both the aggregation buffer and
    the UDF row size."""
    from pyspark.sql.types import TimestampNTZType

    is_ntz = isinstance(raw.schema["event_ts"].dataType, TimestampNTZType)
    if is_ntz:
        # wall-clock micros, session-timezone-independent
        ts_us = F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', event_ts)"
        )
    else:
        ts_us = F.unix_micros("event_ts")
    seg = F.date_trunc(C.TIER_TRUNC[segment], F.col("event_ts")).alias("seg_start")
    framed = raw.select(
        "source", "series_id", seg, ts_us.alias("_ts_us"), "value",
    )
    agg = framed.groupBy("source", "series_id", "seg_start").agg(
        F.sort_array(F.collect_list(F.struct("_ts_us", "value"))).alias("_pts")
    )
    ts_arr = F.transform("_pts", lambda s: s["_ts_us"])
    val_arr = F.transform("_pts", lambda s: s["value"])
    n = F.size("_pts")
    return agg.select(
        "source",
        "series_id",
        "seg_start",
        n.alias("n"),
        _enc_ts_udf(ts_arr).alias("ts_blob"),
        _enc_val_udf(val_arr).alias("val_blob"),
        (n * 16).cast("long").alias("raw_bytes"),
    ).withColumn(
        "enc_bytes",
        (F.octet_length("ts_blob") + F.octet_length("val_blob")).cast("long"),
    )


def _decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        outs = []
        for r in pdf.itertuples(index=False):
            ts = decode_ts_dod(bytes(r.ts_blob), r.n)
            vals = decode_val_xor(bytes(r.val_blob), r.n)
            outs.append(
                pd.DataFrame(
                    {
                        "source": r.source,
                        "series_id": r.series_id,
                        "event_ts": pd.to_datetime(ts, unit="us"),
                        "value": vals,
                    }
                )
            )
        if outs:
            yield pd.concat(outs, ignore_index=True)


def decode_segments(blobs: DataFrame) -> DataFrame:
    """Inverse of encode_segments — blob rows back to raw points.

    Output event_ts type mirrors the input (seg_start carries it):
    NTZ in → NTZ out, so the round trip is wall-clock-exact regardless
    of session timezone."""
    from pyspark.sql.types import TimestampNTZType

    schema = RAW_SCHEMA
    if isinstance(blobs.schema["seg_start"].dataType, TimestampNTZType):
        schema = StructType(
            [
                StructField("source", StringType()),
                StructField("series_id", StringType()),
                StructField("event_ts", TimestampNTZType()),
                StructField("value", DoubleType()),
            ]
        )
    return blobs.mapInPandas(_decode_batches, schema=schema)
