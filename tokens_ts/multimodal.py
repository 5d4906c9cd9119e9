"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as `binary` columns with a mime
string; decode / feature-extraction runs as Arrow-batched mapInPandas.
The heavyweight decoders (PIL/libav) are not in this container, so the
demonstration container format is BMP — a real, fully-specified binary
format parsed here with struct.unpack, no library needed: the decode
step is a genuine byte-level parse with validation (magic, header
size, bpp, declared-vs-actual length), not a stub. A production
deployment swaps `decode_bmp_header` for a PIL/libav call inside the
same `_feature_batches` Arrow stage without touching the Spark plan.

Fixture synthesis (`docs_as_bmp`) derives each document's image
dimensions from closed forms the DuckDB oracle can mirror:
    width  = 1 + octet_length(text) % 64
    height = 1 + doc_id % 48
    row bytes = ceil(3·width / 4)·4      (24-bit rows, 4-byte aligned)
    n_bytes = 54 + height·row_bytes      (14 file + 40 info header)
so the driver pair value-checks REAL decoded dimensions end-to-end.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

BMP_HEADER_BYTES = 54  # 14-byte file header + 40-byte BITMAPINFOHEADER

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("bpp", LongType()),
    ]
)


def _row_bytes(width: int) -> int:
    """24-bit BMP rows are padded to 4-byte boundaries."""
    return ((3 * width + 3) // 4) * 4


def make_bmp(width: int, height: int, seed: int = 0) -> bytes:
    """A valid, decodable 24-bit BMP with deterministic pixel content."""
    if width < 1 or height < 1:
        raise ValueError(f"BMP dimensions must be positive, got {width}x{height}")
    rb = _row_bytes(width)
    n_px = rb * height
    size = BMP_HEADER_BYTES + n_px
    file_hdr = struct.pack("<2sIHHI", b"BM", size, 0, 0, BMP_HEADER_BYTES)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, n_px, 2835, 2835, 0, 0
    )
    pixels = ((seed + np.arange(n_px, dtype=np.int64)) % 256).astype(np.uint8)
    return file_hdr + info_hdr + pixels.tobytes()


def decode_bmp_header(payload: bytes) -> tuple[int, int, int]:
    """Parse + validate a BMP payload → (width, height, bpp).

    Real byte-level decode: magic, header size, plane count, and the
    declared file size are all checked against the actual buffer, so a
    truncated or mislabeled payload raises a contextual ValueError
    instead of yielding silently-wrong metadata downstream.
    """
    if len(payload) < BMP_HEADER_BYTES:
        raise ValueError(
            f"BMP payload truncated: header needs {BMP_HEADER_BYTES} bytes, "
            f"got {len(payload)}"
        )
    magic, declared_size, _, _, data_off = struct.unpack("<2sIHHI", payload[:14])
    if magic != b"BM":
        raise ValueError(f"not a BMP payload (magic {magic!r})")
    hdr_size, width, height, planes, bpp = struct.unpack(
        "<IiiHH", payload[14:30]
    )
    if hdr_size != 40 or planes != 1:
        raise ValueError(
            f"unsupported BMP variant: info header {hdr_size}, planes {planes}"
        )
    if width <= 0 or height == 0:
        # height < 0 is legal (top-down rows); width never is, and
        # either zero dimension would silently poison downstream
        # metadata instead of raising here
        raise ValueError(f"corrupt BMP: non-positive dimensions {width}x{height}")
    if bpp != 24:
        raise ValueError(f"unsupported BMP depth: {bpp} bpp (only 24 supported)")
    if declared_size != len(payload):
        raise ValueError(
            f"corrupt BMP: declares {declared_size} bytes, buffer has {len(payload)}"
        )
    return width, abs(height), bpp


def _feature_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        payloads = pdf["payload"]
        dims = payloads.map(decode_bmp_header)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "mime": pdf["mime"],
                "n_bytes": payloads.map(len).astype(np.int64),
                "width": dims.map(lambda d: d[0]).astype(np.int64),
                "height": dims.map(lambda d: d[1]).astype(np.int64),
                "bpp": dims.map(lambda d: d[2]).astype(np.int64),
            }
        )


def extract_features(binary_df: DataFrame) -> DataFrame:
    """(doc_id, payload binary, mime) → typed feature rows.

    mapInPandas: Arrow batches in/out; the per-payload decode inside
    the batch is the irreducible Python of any image decode (PIL would
    sit in the same spot). At 100 TB the payload column dominates I/O,
    so callers must select only (doc_id, payload, mime) before this —
    column pruning keeps the scan narrow."""
    return binary_df.select("doc_id", "payload", "mime").mapInPandas(
        _feature_batches, schema=FEATURE_SCHEMA
    )


def _bmp_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        widths = pdf["text"].map(lambda t: 1 + len(t.encode("utf-8")) % 64)
        heights = 1 + pdf["doc_id"] % 48
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "payload": [
                    make_bmp(int(w), int(h), seed=int(d))
                    for w, h, d in zip(widths, heights, pdf["doc_id"])
                ],
                "mime": "image/bmp",
            }
        )


def docs_as_bmp(docs: DataFrame) -> DataFrame:
    """Adapter: synthesize a real BMP payload per document (dims from
    the closed forms in the module docstring) — the multimodal fixture
    the sandbox lacks, in a format the decode path genuinely parses."""
    return docs.select("doc_id", "text").mapInPandas(
        _bmp_batches,
        schema="doc_id long, payload binary, mime string",
    )


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("in_width", LongType()),
        StructField("in_height", LongType()),
        StructField("out_width", LongType()),
        StructField("out_height", LongType()),
        StructField("out_bytes", LongType()),
        StructField("px_sum", LongType()),
        StructField("px_md5", StringType()),
    ]
)


def _resize_one(payload: bytes, max_w: int, max_h: int):
    import hashlib

    w, h, _bpp = decode_bmp_header(payload)
    rb = _row_bytes(w)
    arr = np.frombuffer(payload, np.uint8)[BMP_HEADER_BYTES:].reshape(h, rb)
    ow, oh = min(w, max_w), min(h, max_h)
    orb = _row_bytes(ow)
    sy = (np.arange(oh, dtype=np.int64) * h) // oh
    k = np.arange(3 * ow, dtype=np.int64)
    sx = ((k // 3) * w) // ow
    src_cols = sx * 3 + (k % 3)
    out = np.zeros((oh, orb), dtype=np.uint8)
    out[:, : 3 * ow] = arr[sy][:, src_cols]
    pix = out.tobytes()
    n_px = orb * oh
    size = BMP_HEADER_BYTES + n_px
    file_hdr = struct.pack("<2sIHHI", b"BM", size, 0, 0, BMP_HEADER_BYTES)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, ow, oh, 1, 24, 0, n_px, 2835, 2835, 0, 0
    )
    resized = file_hdr + info_hdr + pix
    got = decode_bmp_header(resized)  # self-check: output is a real BMP
    if got != (ow, oh, 24):
        raise ValueError(f"resize produced an invalid BMP: {got}")
    return (
        w,
        h,
        ow,
        oh,
        len(resized),
        int(out.sum(dtype=np.int64)),
        hashlib.md5(pix.hex().encode()).hexdigest(),
    )


def resize_bmp(
    binary_df: DataFrame, max_w: int = 16, max_h: int = 12
) -> DataFrame:
    """Nearest-neighbor BMP thumbnail: clamp each image to
    (max_w × max_h) with the integer index map sx = ⌊x·w/ow⌋,
    sy = ⌊y·h/oh⌋ applied in STORAGE row order (BMP rows are
    bottom-up; sampling in storage order preserves that orientation),
    output rows re-padded to the 4-byte BMP boundary with zeros, and
    the result re-assembled into a VALID 24-bit BMP (header rewritten,
    then re-decoded as a self-check — the resize emits nothing it
    could not itself parse back). Never upscales: ow = min(w, max_w).

    Emits per image: in/out dims, out_bytes (54 + oh·orb exactly),
    px_sum (exact bigint over the padded output pixel array) and
    px_md5 = md5 of the LOWERCASE-HEX of the output pixel bytes — the
    cross-engine artifact a byte-free SQL oracle can rebuild from the
    fixture's closed-form pixel values.

    Same Arrow stage discipline as extract_features: one mapInPandas,
    the per-payload numpy resample is the irreducible Python of any
    image op (PIL.thumbnail would sit in the same spot), and callers
    must project (doc_id, payload) only — at 100 TB the payload column
    dominates I/O."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            res = pdf["payload"].map(lambda p: _resize_one(p, max_w, max_h))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "in_width": res.map(lambda r: r[0]).astype(np.int64),
                    "in_height": res.map(lambda r: r[1]).astype(np.int64),
                    "out_width": res.map(lambda r: r[2]).astype(np.int64),
                    "out_height": res.map(lambda r: r[3]).astype(np.int64),
                    "out_bytes": res.map(lambda r: r[4]).astype(np.int64),
                    "px_sum": res.map(lambda r: r[5]).astype(np.int64),
                    "px_md5": res.map(lambda r: r[6]),
                }
            )

    return binary_df.select("doc_id", "payload").mapInPandas(
        _batches, schema=RESIZE_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("peak", LongType()),
        StructField("ssq", LongType()),
        StructField("rms_e6", LongType()),
    ]
)


def audio_frames(binary_df: DataFrame, frame: int = 256) -> DataFrame:
    """Audio-style frame features over an opaque payload: interpret
    the BMP pixel array as unsigned 8-bit PCM (the stand-in for a real
    audio decode — libav would sit in the same Arrow stage), center at
    the 128 midpoint, cut NON-OVERLAPPING frames of `frame` samples
    (the last partial frame is kept with its true n_samples), and emit
    per frame: peak = max |d|, ssq = Σd² (exact bigint), and
    rms_e6 = round(1e6·√(ssq/n)) — one IEEE tree from exact integers.

    One mapInPandas over (doc_id, payload); output is
    frames-per-payload bounded (n_bytes/frame rows per doc). The
    frame grid is sample-index based, so both engines agree on frame
    boundaries from the payload length alone."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, fids, ns, pk, ss, rm = [], [], [], [], [], []
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                decode_bmp_header(payload)  # validate before use
                arr = np.frombuffer(payload, np.uint8)[
                    BMP_HEADER_BYTES:
                ].astype(np.int64) - 128
                for f in range(0, (arr.size + frame - 1) // frame):
                    seg = arr[f * frame : (f + 1) * frame]
                    ssq = int((seg * seg).sum())
                    ids.append(int(d))
                    fids.append(f)
                    ns.append(seg.size)
                    pk.append(int(np.abs(seg).max()))
                    ss.append(ssq)
                    rm.append(round(1e6 * float(np.sqrt(ssq / seg.size))))
            yield pd.DataFrame(
                {
                    "doc_id": np.array(ids, np.int64),
                    "frame_id": np.array(fids, np.int64),
                    "n_samples": np.array(ns, np.int64),
                    "peak": np.array(pk, np.int64),
                    "ssq": np.array(ss, np.int64),
                    "rms_e6": np.array(rm, np.int64),
                }
            )

    return binary_df.select("doc_id", "payload").mapInPandas(
        _batches, schema=FRAME_SCHEMA
    )


AHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("hash_hex", StringType()),
        StructField("bits_set", LongType()),
        StructField("gray_sum", LongType()),
    ]
)


def _ahash_one(doc_id: int, payload: bytes, side: int):
    w, h, _bpp = decode_bmp_header(payload)
    rb = _row_bytes(w)
    arr = np.frombuffer(payload, np.uint8)[BMP_HEADER_BYTES:].reshape(h, rb)
    sy = (np.arange(side, dtype=np.int64) * h) // side
    sx = (np.arange(side, dtype=np.int64) * w) // side
    px = arr[sy][:, :]  # sampled rows
    base = sx * 3
    gray = (
        px[:, base].astype(np.int64)
        + px[:, base + 1].astype(np.int64)
        + px[:, base + 2].astype(np.int64)
    ) // 3
    flat = gray.reshape(-1)
    total = int(flat.sum())
    bits = (flat * (side * side) > total).astype(np.int64)
    nib = bits.reshape(-1, 4)
    vals = nib[:, 0] * 8 + nib[:, 1] * 4 + nib[:, 2] * 2 + nib[:, 3]
    return (
        w,
        h,
        "".join("%x" % int(x) for x in vals),
        int(bits.sum()),
        total,
    )


def ahash(binary_df: DataFrame, side: int = 8) -> DataFrame:
    """Perceptual average-hash per image: resample to a side×side
    grayscale grid with the SAME integer index maps as resize_bmp
    (upscaling allowed here — a 3-pixel-wide image still yields a
    full grid by column duplication, the standard aHash behavior),
    gray = (b+g+r)//3 integer floor, and bit_i = 1 iff
    gray_i·side² > Σgray (STRICT — the multiply keeps the threshold
    comparison pure integer, no mean division, no float). Bits in
    storage row-major order, packed MSB-first into side²/4 hex chars.

    A shifted/re-encoded copy of an image keeps its relative
    brightness pattern, so exact-equal aHashes catch re-encodes that
    byte-level md5 misses — group on hash_hex for the candidate
    clusters (mm_ahash_dups), exactly like doc_dedup_exact groups on
    content md5. Emits bits_set + the exact gray_sum as independent
    cross-checkable integers.

    Same Arrow-stage discipline as the other multimodal verbs: one
    mapInPandas over (doc_id, payload) only; the per-payload numpy
    resample is the irreducible Python (PIL's Image.resize sits in
    the same spot)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            res = [
                _ahash_one(int(d), p, side)
                for d, p in zip(pdf["doc_id"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype(np.int64),
                    "width": np.array([r[0] for r in res], np.int64),
                    "height": np.array([r[1] for r in res], np.int64),
                    "hash_hex": [r[2] for r in res],
                    "bits_set": np.array([r[3] for r in res], np.int64),
                    "gray_sum": np.array([r[4] for r in res], np.int64),
                }
            )

    return binary_df.select("doc_id", "payload").mapInPandas(
        _batches, schema=AHASH_SCHEMA
    )


def hamming_pairs(
    ahash_df: DataFrame,
    max_hamming: int = 3,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-duplicate image PAIRS within Hamming distance
    `max_hamming` of their 64-bit aHash, via the banded-pigeonhole
    join (the doc_simhash_pairs shape applied to the image modality):
    4 bands of 16 bits — two hashes closer than 4 bits MUST agree on
    a full band, so with the default max_hamming=3 the candidate
    equi-join is EXHAUSTIVE for the emitted set, never probabilistic;
    each candidate is verified with the exact 4-term popcount. Hot
    buckets (flat images hashing alike) are capped to [2, max_bucket]
    exactly like skewed agg keys.

    Bands parse straight out of the hex string (4 hex chars = 16
    bits, MSB-first — the same packing ahash() wrote), so this
    COMPOSES with any stored aHash column without re-decoding a
    single payload byte."""
    bands = [
        F.conv(F.substring("hash_hex", 1 + 4 * b, 4), 16, 10)
        .cast("int")
        .alias(f"b{b}")
        for b in range(4)
    ]
    h = ahash_df.select("doc_id", "hash_hex", *bands)
    rows = h.select(
        "doc_id",
        "b0",
        "b1",
        "b2",
        "b3",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.col(f"b{b}").alias("bits"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "b0", "b1", "b2", "b3", "bb.band", "bb.bits")
    from pyspark.sql import Window

    w = Window.partitionBy("band", "bits")
    sized = rows.withColumn("bsz", F.count("*").over(w)).where(
        (F.col("bsz") >= 2) & (F.col("bsz") <= max_bucket)
    )
    a = sized.select(
        "band", "bits", F.col("doc_id").alias("id_a"),
        *[F.col(f"b{b}").alias(f"a{b}") for b in range(4)],
    )
    b_ = sized.select(
        "band", "bits", F.col("doc_id").alias("id_b"),
        *[F.col(f"b{b}").alias(f"c{b}") for b in range(4)],
    )
    ham = sum(
        F.bit_count(F.col(f"a{b}").bitwiseXOR(F.col(f"c{b}")))
        for b in range(4)
    )
    return (
        a.join(b_, ["band", "bits"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.cast("bigint").alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def frame_plan(
    df: DataFrame,
    duration_col: str = "duration_ms",
    fps_col: str = "fps",
    every_s: int = 2,
    max_frames: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Frame-sampling PLAN for video-as-binary columns: which frame
    indices to decode, decided from metadata BEFORE the expensive
    decode stage ever touches payload bytes — the row-local planning
    half of a video pipeline (the decode half is the same Arrow
    mapInPandas slot extract_features uses; a production deployment
    feeds these indices to libav inside it).

    Per row: total frame count n_frames = duration_ms·fps div 1000,
    one planned frame every `every_s` seconds (stride = fps·every_s),
    capped at max_frames; each planned frame carries its integer
    timestamp ts_ms = idx·1000 div fps. All integer arithmetic —
    exactly mirrorable — and pure expressions: sequence() + slice() +
    explode, no UDF, no shuffle."""
    n_frames = F.expr(
        f"CAST({duration_col} AS BIGINT) * {fps_col} DIV 1000"
    )
    stride = F.col(fps_col).cast("long") * every_s
    planned = F.slice(
        F.sequence(F.lit(0).cast("long"), n_frames - 1, stride),
        1,
        max_frames,
    )
    # fps ≤ 0 has no frame grid and n_frames ≤ 0 has nothing to plan;
    # sequence(0, -1, step) would raise, so such rows are excluded
    # rather than crashing the batch
    df = df.where((F.col(fps_col) > 0) & (n_frames > 0))
    out = df.select(
        id_col,
        F.col(fps_col),
        n_frames.alias("n_frames"),
        F.posexplode(planned).alias("k", "frame_idx"),
    )
    return out.select(
        id_col,
        "n_frames",
        F.col("k").cast("int").alias("k"),
        "frame_idx",
        F.expr(f"frame_idx * 1000 DIV {fps_col}").alias("ts_ms"),
    )
