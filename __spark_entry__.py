"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship query — the full north-rule pipeline slice on
sf0.001 events mapped to the raw tier: 1m rollup cascaded to 1h with
finishers.

queries()/oracle_sql(): one pair per implemented operator from
SURVEY.md §2 plus the training-data ops (tokens_ts/queries_driver.py,
queries_data.py). All but two pairs carry a full ANSI-SQL oracle
(GATES_r5.json
= the committed full-registry run at both SFs); exactly two are
rows-only by design — doc_minhash_lsh and doc_simhash use
xxhash64, which DuckDB lacks. Each has a fully-oracled md5-hashed
twin (doc_minhash_md5, doc_simhash_pairs) checking the identical
algorithm shape value-for-value, AND pytest pins their equivalence
executably (tests/test_dataops.py: xxhash/md5 twin pair-set equality;
independent numpy re-fold of the simhash signatures).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import DataFrame, SparkSession


def _pin_utc(spark: SparkSession) -> None:
    """Window truncation and cross-engine timestamp canonicalization
    assume UTC; the external driver's session timezone is unknown, so
    every entry point pins it (a +05:30 session would shift date_trunc
    hour/day windows and break value hashes)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: events → raw tier → 1m rollup → 1h cascade → finish."""
    from tokens_ts import tiers
    from tokens_ts.queries_driver import _events_raw

    _pin_utc(spark)
    raw = _events_raw(spark, "/root/testdata/sf0.001")
    t1h = tiers.finish(tiers.cascade(tiers.rollup(raw, "1m"), "1h"))
    return t1h


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    import tokens_ts.queries_data  # noqa: F401  (registers into QUERIES)
    from tokens_ts.queries_driver import QUERIES

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _pin_utc(spark)
            return fn(spark, sf_dir)

        run.__name__ = fn.__name__
        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    import tokens_ts.queries_data  # noqa: F401
    from tokens_ts.queries_driver import ORACLES

    return dict(ORACLES)
