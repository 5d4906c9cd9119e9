"""CSV source with schema enforcement and dead-letter routing — the
third real on-disk format next to parquet and JSONL (S2), shaped for
the spreadsheet-export / legacy-feed ingest that still dominates
enterprise data exchange.

CSV has a hazard JSONL does not: a TRUNCATED line can still parse.
Cutting `123,1671234567890123,...` after 6 chars leaves `123,16` —
`from_csv` happily yields event_id=123, ts_us=16, and a silently
corrupted timestamp enters the pipeline. JSONL's brace structure makes
truncation self-evident; CSV's does not. The quarantine contract here
therefore adds a STRUCTURAL guard the JSONL source never needed: a
line whose delimiter-arity disagrees with the schema routes to the
dead letter even when every surviving prefix field parses cleanly.

Like io.jsonl, the file is read ONCE as text and parsed with
`from_csv` — a JVM whole-stage-codegen expression — so the good/bad
split is two filters over one map-only scan (no cache, no second
read) and the dead-letter branch keeps the raw line replayable.

Limitation, stated rather than hidden: the arity guard counts raw
delimiters, so fields containing QUOTED separators would be
mis-counted. This engine's writers never quote (source names, ISO
dates, numerics); a quoted-CSV feed should route through
`arity_check=False` and rely on the required-field contract alone.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def csv_scan(
    spark: SparkSession,
    path: str,
    schema: str,
    required: list[str] | None = None,
    sep: str = ",",
    arity_check: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Read delimiter-separated text at `path` against `schema` (DDL
    string). Returns (good, dead_letter):

    - a line whose delimiter count disagrees with the schema's field
      count → dead letter (structural: catches truncation that would
      otherwise PARSE, the CSV-specific silent-corruption mode);
    - a line that parses but nulls any `required` field (type garbage
      in a numeric column, or a missing trailing field) → dead letter;
    - everything else → good, projected to the schema's columns.

    Both frames derive from ONE text scan; the raw line rides along in
    the dead-letter frame so the quarantine table is replayable."""
    import re

    n_fields = len(spark.createDataFrame([], schema).columns)
    parsed = spark.read.text(path).select(
        F.col("value").alias("_line"),
        F.from_csv(F.col("value"), schema, {"sep": sep}).alias("_r"),
    )
    ok = F.col("_r").isNotNull()
    if arity_check:
        # split() takes a regex while from_csv's sep is literal —
        # escape so "|" or "." separators count correctly.
        ok = ok & (
            F.size(F.split(F.col("_line"), re.escape(sep), -1))
            == F.lit(n_fields)
        )
    for c in required or []:
        ok = ok & F.col(f"_r.{c}").isNotNull()
    good = parsed.where(ok).select("_r.*")
    dead = parsed.where(~ok).select(F.col("_line").alias("line"))
    return good, dead
