"""Benford first-digit conformance (operators/digits.py) and
co-missingness profiling (operators/missingness.py)."""

import math
import random

import pytest

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


def test_benford_scope_excludes_null_zero_subunit(spark):
    rows = [(x,) for x in _benford_sample(1200)]
    rows += [(None,), (0.0,), (1e-9,), (-3.5,)]  # negative IS in scope
    df = spark.createDataFrame(rows, "v double")
    rep = D.benford_report(df, "v").collect()
    assert rep[0]["rows"] == 1204
    assert rep[0]["n_scoped"] == 1201  # NULL, 0, 1e-9 excluded; -3.5 kept
    assert {r["digit"]: r["n"] for r in rep}[3] >= 1


def test_benford_min_rows_and_tol_lints(spark):
    df = spark.createDataFrame([(1.0,)] * 10, "v double")
    with pytest.raises(SchemaError, match="below min_rows"):
        D.benford_report(df, "v")
    with pytest.raises(SchemaError, match="tol must be in"):
        D.benford_report(df, "v", tol=0.0, min_rows=1)
    # fixture-scale override works
    rep = D.benford_report(df, "v", min_rows=10).collect()
    assert sum(r["n"] for r in rep) == 10


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
