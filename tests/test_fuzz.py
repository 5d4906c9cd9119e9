"""Property-based cross-checks: randomized inputs vs pandas semantics.

The fixed fixtures pin known answers; these pin the SEMANTICS over
adversarial shapes hypothesis invents (duplicate timestamps, empty
sides, all-null stretches, single-point series). Example counts are
small because every example runs Spark jobs — the value is in the
shrunken counterexamples, not volume.
"""

import datetime as dt
import math

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tokens_ts import gapfill

T0 = dt.datetime(2026, 1, 1)


def _nan_eq(a, b):
    if a is None or (isinstance(a, float) and math.isnan(a)):
        return b is None or (isinstance(b, float) and math.isnan(b))
    return b is not None and math.isclose(float(a), float(b), rel_tol=1e-12, abs_tol=1e-12)


@settings(max_examples=10, deadline=None)
@given(
    left=st.lists(st.integers(0, 500), min_size=1, max_size=25),
    right=st.lists(st.integers(0, 500), min_size=0, max_size=25),
)
def test_asof_join_fuzz_vs_merge_asof(spark, left, right):
    """asof_join == pd.merge_asof(direction='backward') including
    duplicate probe timestamps, empty build side, and exact-match ties."""
    lrows = [("k", T0 + dt.timedelta(seconds=s), i) for i, s in enumerate(sorted(left))]
    rrows = [("k", T0 + dt.timedelta(seconds=s), float(s)) for s in sorted(set(right))]
    ldf = spark.createDataFrame(lrows, "key string, ts timestamp, lid long")
    rdf = spark.createDataFrame(
        rrows, "key string, ts timestamp, value double"
    ) if rrows else spark.createDataFrame([], "key string, ts timestamp, value double")
    out = gapfill.asof_join(
        ldf, rdf, keys=["key"], left_ts="ts", right_ts="ts", value_cols=["value"]
    )
    got = {r["lid"]: r["asof_value"] for r in out.collect()}

    lpd = pd.DataFrame({"ts": [r[1] for r in lrows], "lid": [r[2] for r in lrows]})
    rpd = pd.DataFrame({"ts": [r[1] for r in rrows], "value": [r[2] for r in rrows]})
    if len(rpd):
        exp_df = pd.merge_asof(
            lpd.sort_values("ts"), rpd.sort_values("ts"), on="ts", direction="backward"
        )
        exp = dict(zip(exp_df["lid"], exp_df["value"]))
    else:
        exp = {lid: None for lid in lpd["lid"]}
    assert got.keys() == set(exp)
    for k in got:
        assert _nan_eq(got[k], exp[k]), (k, got[k], exp[k])


@settings(max_examples=10, deadline=None)
@given(
    n_slots=st.integers(2, 30),
    observed=st.sets(st.integers(0, 29), max_size=30),
    bucket_minutes=st.sampled_from([60, 1440]),
)
def test_gapfill_fuzz_vs_pandas(spark, n_slots, observed, bucket_minutes):
    """ffill/interp (single-window AND bucketed) == pandas on random
    observation patterns: leading/trailing gaps, isolated points,
    fully-null series."""
    obs = {o for o in observed if o < n_slots}
    step = dt.timedelta(minutes=47)  # deliberately unaligned to buckets
    slots = [T0 + i * step for i in range(n_slots)]
    grid_rows = [("src00", t) for t in slots]
    raw_rows = [("src00", "s", slots[i], float(i * i)) for i in sorted(obs)]
    g = spark.createDataFrame(grid_rows, "source string, event_ts timestamp")
    raw = spark.createDataFrame(
        raw_rows, "source string, series_id string, event_ts timestamp, value double"
    ) if raw_rows else spark.createDataFrame(
        [], "source string, series_id string, event_ts timestamp, value double"
    )
    if not raw_rows:
        return  # align yields no series → nothing to compare

    s = pd.Series(
        [float(i * i) if i in obs else np.nan for i in range(n_slots)],
        index=pd.DatetimeIndex(slots),
    )
    exp_ffill = s.ffill()
    exp_interp = s.interpolate(method="time", limit_area="inside")

    for impl in ("single", "bucketed"):
        if impl == "single":
            out = gapfill.gapfill(g, raw)
        else:
            bucket = "1h" if bucket_minutes == 60 else "1d"
            out = gapfill.gapfill_bucketed(g, raw, bucket=bucket)
        got = {r["event_ts"]: (r["ffill"], r["interp"]) for r in out.collect()}
        assert set(got) == set(slots), impl
        for i, t in enumerate(slots):
            assert _nan_eq(got[t][0], exp_ffill.iloc[i]), (impl, "ffill", i)
            assert _nan_eq(got[t][1], exp_interp.iloc[i]), (impl, "interp", i)
