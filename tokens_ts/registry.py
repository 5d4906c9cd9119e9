"""Source registry: the ONE site defining per-source grid parameters.

Every operator that needs a source's event-time grid — with_event_time,
full_grid, the synthesizer — resolves (t0, step, budget) HERE, either:

- from an explicit ``list[SourceSpec]`` (production shape: the registry
  is a small config table — hundreds of sources, control-plane sized —
  broadcast as a dim and equi-joined; source names are then arbitrary),
- or from the DEFAULT registry: the fixture's ``srcNN`` convention
  (t0 = T0_EPOCH, step = 60·(1 + N % 3), budget = ceil(k_total/(N+1))).

The default registry also has a COMPILED expression form
(default_step_col / default_event_ts): for srcNN names the step rule is
a pure column expression, so the hot extraction path needs no join at
all and Catalyst constant-folds/pushes filters through it. A pytest
pins that the compiled form and the dim-join form agree row-for-row —
the rule itself still lives only in this module.
"""

from __future__ import annotations

from typing import NamedTuple

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from tokens_ts import config as C


class SourceSpec(NamedTuple):
    """One registry row: a source's grid geometry."""

    source: str
    t0: int      # grid origin, unix seconds (UTC)
    step: int    # grid spacing, seconds
    budget: int  # number of grid slots (synth / full_grid fan-out)


def default_specs(k_total: int = 0, n_sources: int = C.DEFAULT_SOURCES) -> list[SourceSpec]:
    """The srcNN default registry (FIXTURES.md §1), budgets scaled to
    k_total (0 → budget-free uses like with_event_time)."""
    return [
        SourceSpec(
            f"src{s:02d}",
            C.T0_EPOCH,
            C.step_seconds(s),
            C.source_budget(k_total, s) if k_total else 0,
        )
        for s in range(n_sources)
    ]


def registry_dim(spark: SparkSession, specs: list[SourceSpec]) -> DataFrame:
    """Registry as a broadcast-sized dim (source, t0, step, budget).

    Control-plane scale: one row per source. Every join against it in
    this package is F.broadcast(...) — a registry of even 10^5 sources
    is a few MB, never a shuffle."""
    if not specs:
        raise ValueError("registry_dim: empty spec list")
    names = [s.source for s in specs]
    if len(set(names)) != len(names):
        raise ValueError(f"registry_dim: duplicate source names in {names}")
    return spark.createDataFrame(
        list(specs), "source string, t0 long, step long, budget long"
    )


# ---- compiled default-registry expressions (srcNN fast path) ---------------


def default_ordinal(source: Column = None) -> Column:
    """Source ordinal N from the default 'srcNN' name."""
    source = F.col("source") if source is None else source
    return F.regexp_extract(source, r"(\d+)$", 1).cast("int")


def default_step_col(source: Column = None) -> Column:
    """Compiled form of SourceSpec.step for the default registry."""
    s = default_ordinal(source)
    return F.lit(60) * (F.lit(1) + s % 3)


def default_event_ts(k: Column, source: Column = None) -> Column:
    """event_ts = t0 + k·step under the default registry."""
    return F.timestamp_seconds(
        F.lit(C.T0_EPOCH) + k * default_step_col(source)
    )
