"""dq.audit: planted-violation counts, null semantics, plan shape."""

import pyspark.sql.functions as F

from tokens_ts import dq


def _rows(df):
    return {r["rule"]: (r["n_violations"], r["n_checked"]) for r in df.collect()}


def test_audit_counts_planted_violations(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 5.0, "{x}"),
            (2, "a", None, "{y}"),     # null value
            (3, "zz", 5.0, "nope"),    # bad set member, bad regex
            (4, "b", 99.0, None),      # out of range; null props passes regex rule
            (1, "a", 5.0, "{x}"),      # duplicate id
        ],
        "id bigint, cat string, v double, props string",
    )
    out = _rows(
        dq.audit(
            df,
            [
                dq.not_null("v"),
                dq.in_set("cat", ["a", "b"]),
                dq.in_range("v", 0.0, 50.0),
                dq.matches("props", "^\\{"),
            ],
            {"id": ["id"]},
        )
    )
    assert out["not_null(v)"] == (1, 5)
    assert out["in_set(cat)"] == (1, 5)
    # null v is NOT an in_range violation (not_null owns missingness)
    assert out["in_range(v,0.0,50.0)"] == (1, 5)
    # null props passes the regex rule for the same reason
    assert out["matches(props)"] == (1, 5)
    assert out["unique(id)"] == (1, 5)


def test_audit_null_keys_form_a_group(spark):
    """countDistinct would DROP null keys and undercount survivors;
    the two-level groupBy must treat null as one key group."""
    df = spark.createDataFrame(
        [(None,), (None,), (1,), (1,), (2,)], "k bigint"
    )
    out = _rows(dq.audit(df, [dq.not_null("k")], {"k": ["k"]}))
    # groups: {null: 2, 1: 2, 2: 1} → violations = 5 − 3 = 2
    assert out["unique(k)"] == (2, 5)


def test_audit_row_rules_fuse_into_one_aggregate(spark):
    """N row rules must cost one scan: a single partial/final aggregate
    pair with exactly one Exchange (the global-agg SinglePartition),
    never one pass per rule."""
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).cast("double").alias("v")
    )
    out = dq.audit(
        df,
        [
            dq.not_null("v"),
            dq.in_range("v", 0.0, 3.0),
            dq.in_range("id", 0.0, 500.0),
        ],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_k_anonymity_summary_counts_exact(spark):
    """Hand-staged classes: sizes {a:(3,12), b:(1,)} with k=5 →
    a: 1 below-k class carrying 3 rows; b: its only class below."""
    rows = (
        [("a", "q1")] * 3 + [("a", "q2")] * 12 + [("b", "q1")]
    )
    df = spark.createDataFrame(rows, "s string, qi string")
    from tokens_ts import dq

    out = {
        r["s"]: (
            r["n_classes"], r["n_below_k"], r["rows_at_risk"],
            r["min_class"], r["max_class"],
        )
        for r in dq.k_anonymity_summary(df, ["qi"], k=5, by=["s"]).collect()
    }
    assert out == {"a": (2, 1, 3, 3, 12), "b": (1, 1, 1, 1, 1)}
    # global form: one row, classes keyed by (s absent) → qi only
    g = dq.k_anonymity_summary(df, ["s", "qi"], k=5).collect()[0]
    assert (g["n_classes"], g["n_below_k"], g["rows_at_risk"]) == (3, 2, 4)


def test_l_diversity_summary_catches_homogeneous_class(spark):
    """A large-but-homogeneous class is k-anonymous yet fails ℓ: class
    q1 has 10 rows but ONE sensitive value (below ℓ=2, 10 rows at
    risk); q2 has 3 rows and 3 distinct values (passes)."""
    rows = [("q1", "s0")] * 10 + [("q2", "s0"), ("q2", "s1"), ("q2", "s2")]
    df = spark.createDataFrame(rows, "qi string, sens string")
    from tokens_ts import dq

    g = dq.l_diversity_summary(df, ["qi"], "sens", l=2).collect()[0]
    assert (g["n_classes"], g["n_below_l"], g["rows_at_risk"],
            g["min_diversity"]) == (2, 1, 10, 1)
    # the SAME data passes k-anonymity at k=3 — the attack k can't see
    ka = dq.k_anonymity_summary(df, ["qi"], k=3).collect()[0]
    assert ka["n_below_k"] == 0


def test_audit_unique_only_and_empty_rules(spark):
    import pytest as _pytest

    from tokens_ts import dq

    df = spark.createDataFrame([(1,), (1,), (2,)], "k bigint")
    out = {
        r["rule"]: (r["n_violations"], r["n_checked"])
        for r in dq.audit(df, [], {"k": ["k"]}).collect()
    }
    assert out == {"unique(k)": (1, 3)}
    with _pytest.raises(ValueError, match="no rules"):
        dq.audit(df, [], {})


def test_t_closeness_hand_tvd_and_absent_mass(spark):
    """Global sensitive counts a:6 b:2 over two classes. Class c1 =
    4×a (value b ABSENT — its global mass still owes, the chi²
    missing-cell rule): TVD = 0.25 exactly. Class c2 = 2a+2b: TVD =
    0.25 exactly too. At t = 1/5 both violate (0.25 > 0.2) via the
    integer cross-multiplication — no rounding in the membership."""
    from tokens_ts import dq

    rows = [("c1", "a")] * 4 + [("c2", "a")] * 2 + [("c2", "b")] * 2
    df = spark.createDataFrame(rows, "cls string, sens string")
    r = dq.t_closeness_summary(df, ["cls"], "sens", t_num=1, t_den=5)
    out = r.collect()[0]
    assert out["n_classes"] == 2
    assert out["n_above_t"] == 2 and out["rows_at_risk"] == 8
    assert out["max_t_e6"] == 250_000

    # threshold exactness: at t = 1/4 the 0.25 classes do NOT violate
    # (strict >), at t = 6/25 = 0.24 they do
    r4 = dq.t_closeness_summary(
        df, ["cls"], "sens", t_num=1, t_den=4).collect()[0]
    assert r4["n_above_t"] == 0 and r4["rows_at_risk"] == 0
    r24 = dq.t_closeness_summary(
        df, ["cls"], "sens", t_num=6, t_den=25).collect()[0]
    assert r24["n_above_t"] == 2

    # a class matching the global distribution exactly reads t = 0
    rows2 = [("u1", "a")] * 3 + [("u1", "b")] + [("u2", "a")] * 3 + [("u2", "b")]
    df2 = spark.createDataFrame(rows2, "cls string, sens string")
    o2 = dq.t_closeness_summary(df2, ["cls"], "sens").collect()[0]
    assert o2["max_t_e6"] == 0 and o2["n_above_t"] == 0


def test_t_closeness_by_slice_isolation(spark):
    """`by` slices get independent global distributions: a slice
    whose classes all mirror its own global reads 0 even when the
    OTHER slice is maximally skewed."""
    from tokens_ts import dq

    rows = [("s1", "c1", "a")] * 2 + [("s1", "c2", "a")] * 2
    rows += [("s2", "c1", "a")] * 2 + [("s2", "c2", "b")] * 2
    df = spark.createDataFrame(rows, "sl string, cls string, sens string")
    out = {r["sl"]: r for r in dq.t_closeness_summary(
        df, ["cls"], "sens", by=["sl"]).collect()}
    assert out["s1"]["max_t_e6"] == 0
    # s2: each class is all-one-value vs a 50/50 slice global -> 0.5
    assert out["s2"]["max_t_e6"] == 500_000
    assert out["s2"]["n_above_t"] == 2


def test_neyman_allocation_hamilton_exact_sum(spark):
    """Three equal-weight strata, budget 10: quotas 3.333… each →
    bases 3,3,3, one leftover seat → the remainder tie breaks to the
    ascending key: allocs (4,3,3) summing to EXACTLY the budget (the
    apportionment invariant). A zero-dispersion stratum reads weight
    0 and competes only from the back of the remainder queue; an
    all-constant input reads all-zero allocations (no variance to
    optimize — the honest no-op)."""
    from tokens_ts import dq

    rows = []
    for k in ("a", "b", "c"):
        rows += [(k, 1.0), (k, 3.0)]       # identical multisets: equal w
    rows += [("z", 5.0), ("z", 5.0)]        # constant stratum: sigma = 0
    df = spark.createDataFrame(rows, "key string, value double")
    out = {r["series_id"]: r for r in dq.neyman_allocation(
        df, key_col="key", budget=10).collect()}
    assert (out["a"]["alloc"], out["b"]["alloc"], out["c"]["alloc"]) == (
        4, 3, 3)
    assert out["z"]["alloc"] == 0 and out["z"]["share_e6"] == 0
    assert sum(r["alloc"] for r in out.values()) == 10

    dfc = spark.createDataFrame([("a", 2.0), ("b", 2.0)],
                                "key string, value double")
    outc = dq.neyman_allocation(dfc, key_col="key", budget=10).collect()
    assert all(r["alloc"] == 0 for r in outc)
    assert all(r["share_e6"] is None for r in outc)
