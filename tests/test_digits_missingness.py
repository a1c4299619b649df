"""Benford first-digit conformance (operators/digits.py) and
co-missingness profiling (operators/missingness.py)."""

import math
import random

import pytest
from pyspark.sql import functions as F

from mdvalidate_spark.errors import SchemaError
from mdvalidate_spark.operators import digits as D
from mdvalidate_spark.operators import missingness as M


# ------------------------------------------------------------- benford


def _benford_sample(n, seed=7):
    # log-uniform magnitudes over ~6 orders: Benford-conformant by
    # construction (scale invariance), deterministic
    rng = random.Random(seed)
    return [10 ** rng.uniform(0, 6) for _ in range(n)]


def test_benford_expected_shares_are_log10_table():
    for d, v in D.BENFORD_EXPECTED.items():
        assert abs(v - math.log10(1 + 1 / d)) < 5e-7
    assert abs(sum(D.BENFORD_EXPECTED.values()) - 1.0) < 1e-5


def test_benford_conformant_sample_passes(spark):
    df = spark.createDataFrame([(x,) for x in _benford_sample(5000)], "v double")
    rep = {r["digit"]: r for r in D.benford_report(df, "v").collect()}
    assert set(rep) == set(range(1, 10))
    assert all(rep[d]["within_tol"] for d in rep)
    mad = D.benford_mad(df, "v").collect()[0]
    assert mad["conforms"] and mad["n_scoped"] == 5000


def test_benford_constant_fill_fails_loudly(spark):
    # a constant-fill bug: every value leads with 5 — maximal skew
    df = spark.createDataFrame(
        [(5000.0 + i * 0.1,) for i in range(2000)], "v double"
    )
    rep = {r["digit"]: r for r in D.benford_report(df, "v").collect()}
    assert not rep[5]["within_tol"] and rep[5]["observed_share"] == 1.0
    assert rep[1]["n"] == 0 and not rep[1]["within_tol"]
    assert not D.benford_mad(df, "v").collect()[0]["conforms"]


def test_benford_scope_excludes_only_null_zero_nonfinite(spark):
    rows = [(x,) for x in _benford_sample(1200)]
    # negative and tiny magnitudes ARE in scope ('%.6e' mantissa lead
    # digit: 1e-9 -> 1, 8e-7 -> 8); only NULL/0/NaN/inf fall out
    rows += [(None,), (0.0,), (1e-9,), (8e-7,), (-3.5,),
             (float("nan"),), (float("inf"),)]
    df = spark.createDataFrame(rows, "v double")
    rep = D.benford_report(df, "v").collect()
    assert rep[0]["rows"] == 1207
    assert rep[0]["n_scoped"] == 1203  # NULL, 0, nan, inf excluded
    counts = {r["digit"]: r["n"] for r in rep}
    assert counts[3] >= 1 and counts[8] >= 1


def test_benford_min_rows_and_tol_lints(spark):
    df = spark.createDataFrame([(1.0,)] * 10, "v double")
    with pytest.raises(SchemaError, match="below min_rows"):
        D.benford_report(df, "v")
    with pytest.raises(SchemaError, match="tol must be in"):
        D.benford_report(df, "v", tol=0.0, min_rows=1)
    with pytest.raises(SchemaError, match="min_rows must be >= 1"):
        D.benford_report(df, "v", min_rows=0)
    # fixture-scale override works
    rep = D.benford_report(df, "v", min_rows=10).collect()
    assert sum(r["n"] for r in rep) == 10


def test_benford_rule_empty_scope_is_unmeasurable_not_crash(spark):
    # SUM over zero rows is NULL: a `when` matching nothing (or an empty
    # table) must emit the documented 'unmeasurable' violation, never
    # raise int(None) at finalize
    from mdvalidate_spark.spec import BenfordRule

    df = spark.createDataFrame(
        [(f"f{i}", 100.0 + i) for i in range(5)], "feed string, v double"
    )
    rule = BenfordRule("bz", column="v", when="feed = 'ZZZ'")
    viols, mets = D.benford_rule_results(df, rule, "r1")
    v = viols.collect()
    assert len(v) == 1 and v[0]["actual"].startswith("unmeasurable: 0")
    m = {r["metric"]: r["value"] for r in mets.collect()}
    assert m["benford_n_scoped"] == 0.0 and m["benford_mad"] is None
    # empty INPUT frame, same contract
    viols2, _ = D.benford_rule_results(df.limit(0), rule, "r1")
    assert viols2.count() == 1
    with pytest.raises(SchemaError, match="min_rows must be >= 1"):
        D.benford_rule_results(
            df, BenfordRule("b0", column="v", min_rows=0), "r1"
        )


def test_benford_partials_merge_equals_full_scan(spark):
    """Digit partials accumulated over disjoint batches merge to the
    bit-identical full-scan report (the manifest-partial pattern)."""
    rows = [(i, x) for i, x in enumerate(_benford_sample(3000))]
    rows.append((3000, None))
    rows.append((3001, 0.0))
    df = spark.createDataFrame(rows, "id long, v double").withColumn(
        "partition_id", (F.col("id") % 3).cast("int")
    )
    partials = None
    for b in range(3):
        p = D.benford_digit_partials(df.where(F.col("id") % 3 == b), "v")
        partials = p if partials is None else partials.unionByName(p)
    inc = D.benford_from_partials(partials, "v").collect()
    full = D.benford_report(df, "v").collect()
    assert [tuple(r) for r in inc] == [tuple(r) for r in full]


def test_benford_partials_guards_and_empty(spark):
    df = spark.createDataFrame(
        [(1, 5.0)], "partition_id int, v double"
    )
    partials = D.benford_digit_partials(df, "v")
    with pytest.raises(SchemaError, match="below min_rows"):
        D.benford_from_partials(partials, "v")
    with pytest.raises(SchemaError, match="min_rows must be >= 1"):
        D.benford_from_partials(partials, "v", min_rows=0)
    rep = D.benford_from_partials(partials, "v", min_rows=1).collect()
    assert {r["digit"]: r["n"] for r in rep}[5] == 1
    # zero accumulated partials: loud unmeasurable, not int(None)
    with pytest.raises(SchemaError, match="below min_rows"):
        D.benford_from_partials(partials.limit(0), "v", min_rows=1)


# -------------------------------------------------------- missingness


def _mdf(spark):
    # a, b co-missing (same 30 rows, broken-decoder shape); c independent
    rows = []
    for i in range(200):
        broken = i < 30
        c_null = i % 5 == 0
        rows.append(
            (
                i,
                None if broken else float(i),
                None if broken else f"s{i}",
                None if c_null else i * 2,
            )
        )
    return spark.createDataFrame(rows, "id long, a double, b string, c long")


def test_null_correlation_coupled_pair_detected(spark):
    df = _mdf(spark)
    rep = {(r["col_a"], r["col_b"]): r for r in M.null_correlation(df, ["a", "b", "c"]).collect()}
    ab = rep[("a", "b")]
    assert ab["null_both"] == 30 and ab["jaccard"] == 1.0 and ab["phi"] == 1.0
    # independent pair: phi near 0
    ac = rep[("a", "c")]
    assert ac["phi"] is not None and abs(ac["phi"]) < 0.2
    # deterministic lexicographic pair order
    assert list(rep) == [("a", "b"), ("a", "c"), ("b", "c")]


def test_null_correlation_degenerate_mask_is_null_not_zero(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "x long, y string")
    # y always NULL, x never NULL: no variance on either side
    r = M.null_correlation(df.select("x", "y"), ["x", "y"]).collect()[0]
    assert r["phi"] is None and r["null_both"] == 0 and r["jaccard"] == 0.0


def test_null_correlation_empty_frame_degenerate_not_crash(spark):
    # SUM over zero rows is NULL: an empty partition/table must yield the
    # degenerate rows (n=0, jaccard/phi NULL), not int(None)
    df = _mdf(spark).limit(0)
    rep = M.null_correlation(df, ["a", "b"]).collect()
    assert len(rep) == 1
    r = rep[0]
    assert r["rows"] == 0 and r["null_both"] == 0
    assert r["jaccard"] is None and r["phi"] is None
    assert M.null_correlation_violations(df, ["a", "b"]).count() == 0


def test_null_correlation_lints(spark):
    df = _mdf(spark)
    with pytest.raises(SchemaError, match="at least 2"):
        M.null_correlation(df, ["a"])
    with pytest.raises(SchemaError, match="duplicate"):
        M.null_correlation(df, ["a", "a"])
    with pytest.raises(SchemaError, match="not in the input schema"):
        M.null_correlation(df, ["a", "zz"])
    with pytest.raises(SchemaError, match="max_cols"):
        M.null_correlation(df, ["id", "a", "b", "c"], max_cols=3)
    with pytest.raises(SchemaError, match="max_phi must be in"):
        M.null_correlation_violations(df, ["a", "b"], max_phi=1.5)


def test_null_correlation_violations_gate(spark):
    df = _mdf(spark)
    viols = M.null_correlation_violations(
        df, ["a", "b", "c"], max_phi=0.5
    ).collect()
    assert len(viols) == 1
    v = viols[0]
    assert (v["col_a"], v["col_b"]) == ("a", "b")
    assert v["kind"] == "null_correlation"
    assert "phi 1.000000 (co-missing 30 of 200 rows)" == v["actual"]
