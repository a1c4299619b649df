"""Corpus-mix validation (operators/mixture.py): observed share vs a
declared target mix, row- and weight-denominated."""

import pytest

from mdvalidate_spark.errors import SchemaError
from mdvalidate_spark.operators import mixture as M


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, lang string, toks long")


@pytest.fixture(scope="module")
def corpus(spark):
    rows = (
        [(i, "en", 100) for i in range(60)]
        + [(i + 100, "fr", 10) for i in range(30)]
        + [(i + 200, "zh", 10) for i in range(10)]
    )
    df = _df(spark, rows).cache()
    df.count()
    yield df
    df.unpersist()


def test_mixture_report_row_shares_and_both_edge_directions(spark, corpus):
    """Row-share mix: observed-but-unlisted gets target 0, targeted-but-
    absent observes 0 — both whole-share deviations, both loud."""
    targets = {"en": 0.6, "fr": 0.3, "ja": 0.1}  # zh unlisted, ja absent
    rep = {
        r["group_value"]: r
        for r in M.mixture_report(corpus, "lang", targets, tol=0.02).collect()
    }
    assert set(rep) == {"en", "fr", "zh", "ja"}
    assert rep["en"]["observed_share"] == 0.6 and rep["en"]["within_tol"]
    assert rep["fr"]["observed_share"] == 0.3 and rep["fr"]["within_tol"]
    # zh: observed 0.1 vs implicit target 0 -> dev 0.1 -> out of tol
    assert rep["zh"]["target_share"] == 0.0 and not rep["zh"]["within_tol"]
    # ja: targeted 0.1, absent -> dev 0.1 -> out of tol
    assert rep["ja"]["observed_weight"] == 0.0 and not rep["ja"]["within_tol"]


def test_mixture_weighted_shares_differ_from_row_shares(spark, corpus):
    """Token-weighted mix: en dominates by weight (6000 of 6400) even
    though rows are 60/100 — the unit matters and both are supported."""
    targets = {"en": 0.9375, "fr": 0.046875, "zh": 0.015625}
    rep = {
        r["group_value"]: r
        for r in M.mixture_report(
            corpus, "lang", targets, weight_col="toks", tol=0.001
        ).collect()
    }
    assert rep["en"]["observed_weight"] == 6000.0
    assert rep["en"]["observed_share"] == 0.9375 and rep["en"]["within_tol"]
    assert rep["fr"]["within_tol"] and rep["zh"]["within_tol"]


def test_mixture_null_group_participates(spark):
    df = _df(spark, [(1, None, 5), (2, "en", 5)])
    rep = {
        r["group_value"]: r
        for r in M.mixture_report(
            df, "lang", {"en": 1.0}, tol=0.02
        ).collect()
    }
    assert None in rep and rep[None]["observed_share"] == 0.5
    assert not rep[None]["within_tol"]


def test_mixture_target_lints(spark, corpus):
    with pytest.raises(SchemaError, match="sum to 1"):
        M.mixture_report(corpus, "lang", {"en": 0.5})
    with pytest.raises(SchemaError, match="must be in"):
        M.mixture_report(corpus, "lang", {"en": 1.5, "fr": -0.5})
    with pytest.raises(SchemaError, match="asserts nothing"):
        M.mixture_report(corpus, "lang", {})
    with pytest.raises(SchemaError, match="groups"):
        M.mixture_report(corpus, "id", {"1": 1.0}, max_groups=5)


def test_mixture_non_string_target_keys_normalized(spark):
    """Int/bool dict keys must join against Spark's cast-to-string groups
    (booleans render 'true'/'false' in Spark, not Python's 'True')."""
    df = spark.createDataFrame(
        [(1, 1, True), (2, 1, True), (3, 2, False), (4, 2, True)],
        "id long, bin int, flag boolean",
    )
    rep = {
        r["group_value"]: r
        for r in M.mixture_report(df, "bin", {1: 0.5, 2: 0.5}, tol=0.01).collect()
    }
    assert set(rep) == {"1", "2"}
    assert rep["1"]["within_tol"] and rep["2"]["within_tol"]
    rep = {
        r["group_value"]: r
        for r in M.mixture_report(
            df, "flag", {True: 0.75, False: 0.25}, tol=0.01
        ).collect()
    }
    assert set(rep) == {"true", "false"}
    assert rep["true"]["observed_share"] == 0.75


def test_mixture_rounding_half_away_from_zero(spark):
    """A dyadic share (exact 6dp tie) must round like Spark/DuckDB
    (half-away-from-zero), not Python's banker's rounding."""
    assert M._r6(0.0078125) == 0.007813  # round() would give 0.007812
    assert M._r6(-0.0078125) == -0.007813


def test_mixture_param_lints(spark, corpus):
    with pytest.raises(SchemaError, match="tol must be in"):
        M.mixture_report(corpus, "lang", {"en": 1.0}, tol=-0.01)
    with pytest.raises(SchemaError, match="tol must be in"):
        M.mixture_report(corpus, "lang", {"en": 1.0}, tol=5)
    with pytest.raises(SchemaError, match="is None"):
        M.mixture_report(corpus, "lang", {"en": 0.5, "fr": None})
    tgt_null = spark.createDataFrame(
        [("en", 0.5), ("fr", None)], "lang string, target double"
    )
    with pytest.raises(SchemaError, match="is NULL"):
        M.mixture_report(corpus, "lang", tgt_null)
    tgt_dup = spark.createDataFrame(
        [("en", 0.5), ("en", 0.5)], "lang string, target double"
    )
    with pytest.raises(SchemaError, match="more than once"):
        M.mixture_report(corpus, "lang", tgt_dup)


def test_mixture_violations_shape(spark, corpus):
    viols = M.mixture_violations(
        corpus, "lang", {"en": 0.6, "fr": 0.4}, tol=0.02
    ).collect()
    # zh unlisted (dev 0.1) and fr short (0.3 vs 0.4) both fire
    got = {r["group_value"]: r for r in viols}
    assert set(got) == {"zh", "fr"}
    assert got["fr"]["kind"] == "mixture"
    assert "0.400000" in got["fr"]["expected"]
    assert got["fr"]["actual"] == "0.300000 of rows"
