"""Constraint suggestion: profile a table, draft the Spec that would have
enforced its observed invariants, and guarantee the draft validates clean
on the profiled table (the ratchet property)."""

import pytest

from mdvalidate_spark.operators.suggest import suggest_spec, suggestion_rows
from mdvalidate_spark.run import ValidationRun
from mdvalidate_spark.spec import (
    DomainRule,
    NotNullRule,
    RangeRule,
    SchemaRule,
    UniqueRule,
)


@pytest.fixture(scope="module")
def frame(spark):
    df = spark.createDataFrame(
        [
            ("k1", "red", 10, 1.5, None),
            ("k2", "blue", 20, -2.0, "x"),
            ("k3", "red", 30, 0.25, "y"),
        ],
        "id string, color string, n int, score double, opt string",
    ).cache()
    df.count()
    yield df
    df.unpersist()


def test_suggestions_match_observed_invariants(spark, frame):
    spec = suggest_spec(frame, "id", exact=True)
    by_id = {r.id: r for r in spec.rules}

    # id: unique string, 3 distinct <= 16 -> domain+not_null+unique
    assert isinstance(by_id["suggest_unique_id"], UniqueRule)
    assert isinstance(by_id["suggest_not_null_id"], NotNullRule)
    # color: low-cardinality -> sorted domain, no unique (3 rows, 2 distinct)
    dom = by_id["suggest_domain_color"]
    assert isinstance(dom, DomainRule) and dom.values == ("blue", "red")
    assert "suggest_unique_color" not in by_id
    # n: numeric envelope
    rng = by_id["suggest_range_n"]
    assert isinstance(rng, RangeRule) and (rng.min, rng.max) == (10.0, 30.0)
    assert by_id["suggest_range_score"].min == -2.0
    # opt has a NULL -> no not_null suggestion
    assert "suggest_not_null_opt" not in by_id
    # schema pin covers every column with its dtype
    schema = by_id["suggest_schema"]
    assert isinstance(schema, SchemaRule)
    assert dict(schema.expected)["n"] == "int"


def test_suggested_spec_is_deterministic(spark, frame):
    assert suggest_spec(frame, "id", exact=True) == suggest_spec(
        frame, "id", exact=True
    )


def test_ratchet_suggested_spec_validates_clean(spark, frame):
    spec = suggest_spec(frame, "id", exact=True)
    run = ValidationRun(spark, spec, frame)
    run.validate_pending()
    rep = run.finalize()
    assert rep.violations.count() == 0
    assert rep.exit_code == 0


def test_approx_mode_profiles_without_exact_aggregates(spark, frame):
    spec = suggest_spec(frame, "id", exact=False)
    # sketch mode still produces the envelope + domain families; uniqueness
    # with margin 0.0 demands exact equality of the HLL estimate — may or
    # may not fire, but the spec itself must compile and validate clean
    run = ValidationRun(spark, spec, frame)
    run.validate_pending()
    # HLL (exact in sparse mode at this size) keeps the ratchet property
    assert run.finalize().exit_code == 0


def test_suggestion_rows_shape(spark, frame):
    spec = suggest_spec(frame, "id", exact=True)
    rows = suggestion_rows(spark, spec)
    assert rows.columns == ["column_name", "kind", "detail"]
    kinds = {r["kind"] for r in rows.collect()}
    assert kinds == {"domain", "not_null", "range", "unique"}
