"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as `binary` columns with a mime
string; decode / feature-extraction runs as Arrow-batched mapInPandas.
The real decoders (PIL/libav/...) are NOT in this container, so the
decode step is a clearly-marked deterministic fake — the Spark-side
plumbing (schema, batch shape, partitioning, UDF signature) is real
and tested, and a production deployment swaps `_fake_decode` for a
library call without touching anything else.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("first_byte", LongType()),
        StructField("fake_width", LongType()),
        StructField("fake_height", LongType()),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """STUB: deterministic stand-in for an image decode.

    Production: `PIL.Image.open(io.BytesIO(payload)).size`. Raising
    NotImplementedError here would fail the plumbing test, so we return
    a deterministic fake derived from the bytes instead.
    """
    n = len(payload)
    first = payload[0] if n else 0
    return n % 640, (first * 7) % 480


def _feature_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        payloads = pdf["payload"]
        n_bytes = payloads.map(len).astype(np.int64)
        first = payloads.map(lambda b: b[0] if len(b) else 0).astype(np.int64)
        dims = payloads.map(_fake_decode)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "mime": pdf["mime"],
                "n_bytes": n_bytes,
                "first_byte": first,
                "fake_width": dims.map(lambda d: d[0]).astype(np.int64),
                "fake_height": dims.map(lambda d: d[1]).astype(np.int64),
            }
        )


def extract_features(binary_df: DataFrame) -> DataFrame:
    """(doc_id, payload binary, mime) → typed feature rows.

    mapInPandas: Arrow batches, no per-row Python at the Spark layer;
    at 100 TB the payload column dominates I/O, so callers must select
    only (doc_id, payload, mime) before this — column pruning keeps
    the scan narrow."""
    return binary_df.select("doc_id", "payload", "mime").mapInPandas(
        _feature_batches, schema=FEATURE_SCHEMA
    )


def docs_as_binary(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as an opaque payload column."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.lit("application/fake-image").alias("mime"),
    )
