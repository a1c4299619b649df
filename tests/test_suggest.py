"""Constraint suggestion: profile a table, draft the Spec that would have
enforced its observed invariants, and guarantee the draft validates clean
on the profiled table (the ratchet property)."""

import pytest

from mdvalidate_spark.operators.suggest import suggest_spec, suggestion_rows
from mdvalidate_spark.run import ValidationRun
from mdvalidate_spark.spec import (
    DomainRule,
    MetricBoundRule,
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
    assert kinds == {
        "domain",
        "not_null",
        "range",
        "unique",
        "bound_count",
        "bound_null_rate",
        "bound_p99",
    }


def test_gate_suggestions(spark, frame):
    spec = suggest_spec(frame, "id", exact=True)
    by_id = {r.id: r for r in spec.rules}
    # opt has 1 NULL of 3: no not_null, but a null-rate ratchet with
    # permissive headroom — ceil((1/3)*1.25*1e6)/1e6
    gate = by_id["suggest_null_rate_opt"]
    assert isinstance(gate, MetricBoundRule) and gate.metric == "null_rate"
    assert gate.max == pytest.approx(0.416667, abs=1e-9)
    # volume floor on the table
    vol = by_id["suggest_volume"]
    assert vol.metric == "count" and vol.min == 2.0 and vol.column == "id"
    # no string column wider than the domain cap -> no distinct envelope
    assert not any(r.id.startswith("suggest_distinct_") for r in spec.rules)
    # numeric columns get a p99 tail gate with relative headroom:
    # p99(n) over {10,20,30} = 29.8 -> 29.8 + 2.98 = 32.78
    tail = by_id["suggest_p99_n"]
    assert tail.metric == "p99" and tail.max == pytest.approx(32.78, abs=1e-6)


def test_gate_suggestions_can_be_disabled(spark, frame):
    spec = suggest_spec(frame, "id", exact=True, gates=False)
    assert not any(isinstance(r, MetricBoundRule) for r in spec.rules)


def test_unique_candidates_exactly_confirmed_in_sketch_mode(spark):
    # `almost` has one duplicate (199/200 distinct): a loose margin makes it
    # a sketch-pass candidate, but the exact confirmation must reject it —
    # an unconfirmed UniqueRule would fail on the profiled table. The true
    # key `id` must survive confirmation even if its HLL estimate dips.
    rows = [(f"k{i}", f"a{i if i else 1}") for i in range(200)]
    df = spark.createDataFrame(rows, "id string, almost string")
    spec = suggest_spec(df, "id", exact=False, unique_margin=0.05)
    ids = {r.id for r in spec.rules}
    assert "suggest_unique_id" in ids
    assert "suggest_unique_almost" not in ids
    run = ValidationRun(spark, spec, df)
    run.validate_pending()
    assert run.finalize().exit_code == 0
    # opting out of confirmation takes the sketch's word: the loose margin
    # now (wrongly, by design) admits the near-unique column
    unconfirmed = suggest_spec(
        df, "id", exact=False, unique_margin=0.05, confirm_unique=False
    )
    assert "suggest_unique_almost" in {r.id for r in unconfirmed.rules}


def test_distinct_envelope_for_wide_string_columns(spark):
    df = spark.createDataFrame(
        [(f"k{i}", f"tok{i % 40}") for i in range(200)],
        "id string, token string",
    )
    spec = suggest_spec(df, "id", exact=True, domain_max_distinct=16)
    by_id = {r.id: r for r in spec.rules}
    env = by_id["suggest_distinct_token"]
    assert isinstance(env, MetricBoundRule) and env.metric == "distinct"
    assert env.min == 36.0 and env.max == 44.0  # floor(40*.9), ceil(40*1.1)
    assert "suggest_domain_token" not in by_id
    # and the drafted spec still validates clean on the profiled frame
    run = ValidationRun(spark, spec, df)
    run.validate_pending()
    assert run.finalize().exit_code == 0
