"""MetricBoundRule: assertions on aggregate metrics — the constraint layer
over the profiling layer (ColumnStatsRule reports, this rule judges).
Reference lineage: the {min,max} extras enforced on repeated-list lengths
(matcher_extras.rs:129-157, lists.rs:168-264) generalized from counts to any
column-level aggregate. Covers: every metric family in and out of bounds,
open bounds, when-scoping, NULL-metric loudness, exact vs sketch modes, the
fused one-pass plan shape, compile lints, JSON round-trip, and the
validate_table lifecycle (exit code + report frames)."""

import tempfile

import pytest
from pyspark.sql import functions as F

from mdvalidate_spark import MetricBoundRule, Spec, validate_table
from mdvalidate_spark.compile import compile_spec
from mdvalidate_spark.errors import InvalidBoundsError, SchemaError
from mdvalidate_spark.operators import agg_rules
from mdvalidate_spark.spec_io import rule_from_dict, rule_to_dict


@pytest.fixture(scope="module")
def df(spark):
    # 100 rows: v = 0..99, cat cycles a,b,c,d; caption NULL every 20th
    d = spark.range(0, 100, 1, 4).select(
        (F.col("id") % 4).cast("int").alias("partition_id"),
        F.col("id").cast("string").alias("key"),
        F.col("id").cast("double").alias("v"),
        F.element_at(
            F.array(F.lit("a"), F.lit("b"), F.lit("c"), F.lit("d")),
            (F.col("id") % 4 + 1).cast("int"),
        ).alias("cat"),
        F.when(F.col("id") % 20 != 0, F.concat(F.lit("c"), F.col("id"))).alias(
            "caption"
        ),
    ).cache()
    d.count()
    yield d
    d.unpersist()


def _run(df, rules, **kw):
    return agg_rules.metric_bound_results(df, rules, "r", **kw)


def _viols(v):
    return {r["rule_id"]: r for r in v.collect()}


def _mets(m):
    return {r["rule_id"]: r["value"] for r in m.collect()}


def test_every_metric_family_values(spark, df):
    rules = (
        MetricBoundRule("m_count", column="v", metric="count", min=0),
        MetricBoundRule("m_nr", column="caption", metric="null_rate", max=1.0),
        MetricBoundRule("m_dist", column="cat", metric="distinct", min=0, exact=True),
        MetricBoundRule("m_mean", column="v", metric="mean", min=0),
        MetricBoundRule("m_std", column="v", metric="stddev", min=0),
        MetricBoundRule("m_min", column="v", metric="min", min=-1),
        MetricBoundRule("m_max", column="v", metric="max", max=1e9),
        MetricBoundRule("m_p50", column="v", metric="p50", min=0, exact=True),
    )
    v, m = _run(df, rules)
    assert v.count() == 0  # all bounds satisfied
    got = _mets(m)
    assert got["m_count"] == 100.0
    assert got["m_nr"] == pytest.approx(0.05)  # 5 NULLs / 100
    assert got["m_dist"] == 4.0
    assert got["m_mean"] == pytest.approx(49.5)
    assert got["m_min"] == 0.0 and got["m_max"] == 99.0
    assert got["m_p50"] == pytest.approx(49.5)


def test_bounds_fire_with_expected_shape(spark, df):
    rules = (
        MetricBoundRule("too_many_nulls", column="caption",
                        metric="null_rate", max=0.01),
        MetricBoundRule("card_window", column="cat", metric="distinct",
                        min=5, max=10, exact=True),
        MetricBoundRule("fine", column="v", metric="mean", min=0, max=100),
    )
    v, m = _run(df, rules)
    got = _viols(v)
    assert set(got) == {"too_many_nulls", "card_window"}
    r = got["too_many_nulls"]
    assert r["kind"] == "metric_bound"
    assert r["image_id"] == "null_rate"  # the metric names the violation
    assert r["column"] == "caption"
    assert r["expected"] == "null_rate in [None, 0.01]"
    assert float(r["actual"]) == pytest.approx(0.05)
    # metrics still report EVERY rule's observed value, violating or not
    assert set(_mets(m)) == {"too_many_nulls", "card_window", "fine"}


def test_open_bounds_one_sided(spark, df):
    v, _ = _run(df, (
        MetricBoundRule("lo_only", column="v", metric="min", min=5.0),
        MetricBoundRule("hi_only", column="v", metric="max", max=50.0),
    ))
    got = _viols(v)
    assert set(got) == {"lo_only", "hi_only"}
    assert float(got["lo_only"]["actual"]) == 0.0
    assert float(got["hi_only"]["actual"]) == 99.0


def test_when_scopes_the_aggregate(spark, df):
    v, m = _run(df, (
        MetricBoundRule("cat_a_count", column="v", metric="count",
                        min=30, when="cat = 'a'"),
        MetricBoundRule("cat_a_mean", column="v", metric="mean",
                        min=0, when="cat = 'a'"),
    ))
    got = _mets(m)
    assert got["cat_a_count"] == 25.0  # 100/4 in scope
    assert got["cat_a_mean"] == pytest.approx(48.0)  # mean of 0,4,...,96
    assert set(_viols(v)) == {"cat_a_count"}  # 25 < 30


def test_null_metric_is_loud(spark, df):
    """mean over an empty scope is NULL — must VIOLATE with 'no value',
    never silently pass (drift's empty-side contract)."""
    v, m = _run(df, (
        MetricBoundRule("ghost", column="v", metric="mean", min=0,
                        when="cat = 'zzz'"),
    ))
    got = _viols(v)
    assert got["ghost"]["actual"] == "no value"
    assert _mets(m)["ghost"] is None


def test_exact_vs_sketch_modes(spark, df):
    v, m = _run(df, (
        MetricBoundRule("d_exact", column="v", metric="distinct",
                        min=0, exact=True),
        MetricBoundRule("d_approx", column="v", metric="distinct", min=0),
        MetricBoundRule("q_approx", column="v", metric="p95", min=0),
    ))
    got = _mets(m)
    assert got["d_exact"] == 100.0
    assert abs(got["d_approx"] - 100.0) / 100.0 < 0.05  # HLL++ error
    assert abs(got["q_approx"] - 94.05) < 2.0  # sketch quantile
    assert v.count() == 0


def test_fused_single_pass_plan(spark, df):
    """All rules fuse into ONE aggregation over the scan: a single pair of
    HashAggregates (partial + final), no Python UDF anywhere."""
    rules = tuple(
        MetricBoundRule(f"m{i}", column="v", metric=mt, min=0)
        for i, mt in enumerate(["count", "mean", "stddev", "min", "max"])
    )
    _, m = _run(df, rules)
    plan = m._jdf.queryExecution().executedPlan().toString()
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan
    import re

    # the melt runs over the 1-row wide agg: exactly one final/partial pair
    assert len(re.findall(r"HashAggregate", plan)) <= 2


def test_compile_lints(spark):
    with pytest.raises(SchemaError, match="unknown metric"):
        compile_spec(
            Spec(rules=(MetricBoundRule("x", column="v", metric="median", min=0),),
                 key_column="key"),
            ["key", "v", "partition_id"],
        )
    with pytest.raises(SchemaError, match="min and/or max"):
        compile_spec(
            Spec(rules=(MetricBoundRule("x", column="v", metric="mean"),),
                 key_column="key"),
            ["key", "v", "partition_id"],
        )
    with pytest.raises(InvalidBoundsError):
        compile_spec(
            Spec(rules=(MetricBoundRule("x", column="v", metric="mean",
                                        min=10, max=1),), key_column="key"),
            ["key", "v", "partition_id"],
        )
    with pytest.raises(SchemaError, match="max_violation_rate"):
        compile_spec(
            Spec(rules=(MetricBoundRule("x", column="v", metric="mean",
                                        min=0, max_violation_rate=0.1),),
                 key_column="key"),
            ["key", "v", "partition_id"],
        )
    # p0 / p100 are degenerate (that's min/max) — rejected
    with pytest.raises(SchemaError, match="unknown metric"):
        compile_spec(
            Spec(rules=(MetricBoundRule("x", column="v", metric="p0", min=0),),
                 key_column="key"),
            ["key", "v", "partition_id"],
        )


def test_numeric_requirement_at_run_init(spark, df):
    with pytest.raises(SchemaError, match="numeric"):
        validate_table(
            spark, df,
            Spec(rules=(MetricBoundRule("x", column="cat", metric="mean",
                                        min=0),), key_column="key",
                 n_partitions=4),
            checkpoint_dir=tempfile.mkdtemp(),
        )
    # count / null_rate / distinct are fine on strings
    rep = validate_table(
        spark, df,
        Spec(rules=(MetricBoundRule("ok", column="cat", metric="distinct",
                                    min=1, exact=True),), key_column="key",
             n_partitions=4),
        checkpoint_dir=tempfile.mkdtemp(),
    )
    assert rep.exit_code == 0


def test_lifecycle_exit_code_and_report(spark, df):
    spec = Spec(rules=(
        MetricBoundRule("nulls", column="caption", metric="null_rate",
                        max=0.01),
        MetricBoundRule("p99v", column="v", metric="p99", max=1000.0,
                        exact=True),
    ), key_column="key", n_partitions=4)
    rep = validate_table(spark, df, spec, checkpoint_dir=tempfile.mkdtemp())
    assert rep.exit_code == 1
    rows = rep.violations.where("kind = 'metric_bound'").collect()
    assert [r["rule_id"] for r in rows] == ["nulls"]
    mets = {
        r["rule_id"]: r["value"]
        for r in rep.metrics.where(
            "rule_id in ('nulls', 'p99v')"
        ).collect()
    }
    assert mets["nulls"] == pytest.approx(0.05)
    assert mets["p99v"] == pytest.approx(98.01)


def test_json_round_trip():
    r = MetricBoundRule("rt", column="v", metric="p99.9", min=1.5, max=2.5,
                        exact=True, when="cat = 'a'")
    assert rule_from_dict(rule_to_dict(r)) == r


# ------------------------------------------------------ per-group bounds


def test_grouped_bounds_flag_offending_groups_only(spark, df):
    """group_by: the same assertion made of EVERY group; image_id carries
    the offending group's key. cat 'd' holds v=3,7,...,99 → max 99; bound
    max(v) <= 98 per cat flags exactly 'd'."""
    v, m = _run(df, (MetricBoundRule("gmax", column="v", metric="max",
                                    max=98.0, group_by="cat"),))
    rows = v.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["image_id"] == "d" and r["kind"] == "metric_bound"
    assert "per cat" in r["expected"] and r["actual"] == "99.0"
    mets = {(x["rule_id"], x["metric"]): x["value"] for x in m.collect()}
    assert mets[("gmax", "groups_total")] == 4.0
    assert mets[("gmax", "groups_violated")] == 1.0


def test_grouped_bounds_null_group_is_real_and_metric_null_is_loud(spark):
    d = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), (None, 50.0), ("b", None)],
        "cat string, v double",
    )
    # mean per cat <= 10: __null__ group mean=50 violates; group b has no
    # non-null v → NULL mean → loud 'no value'
    v, m = _run(d, (MetricBoundRule("gmean", column="v", metric="mean",
                                    max=10.0, group_by="cat"),))
    got = {r["image_id"]: r["actual"] for r in v.collect()}
    assert got == {"__null__": "50.0", "b": "no value"}
    mets = {x["metric"]: x["value"] for x in m.collect()}
    assert mets["groups_total"] == 3.0 and mets["groups_violated"] == 2.0


def test_grouped_and_global_bounds_mix_in_one_spec(spark, df):
    """Grouped rules ride alongside global ones through the lifecycle; the
    grouped pass is a single groupBy aggregation (one Exchange)."""
    spec = Spec(
        rules=(
            MetricBoundRule("g_p95", column="v", metric="p95", max=50.0,
                            group_by="cat", exact=True),
            MetricBoundRule("g_cnt", column="v", metric="count", min=10.0,
                            group_by="cat"),
            MetricBoundRule("all_mean", column="v", metric="mean", max=200.0),
        ),
        key_column="key",
        n_partitions=4,
    )
    rep = validate_table(spark, df, spec, run_id="g1")
    viol = {(r["rule_id"], r["image_id"]) for r in rep.violations.collect()}
    # every cat's p95 > 50 (values run to 96-99); counts are 25 ≥ 10; the
    # global mean (49.5) passes
    assert viol == {("g_p95", c) for c in ("a", "b", "c", "d")}
    assert rep.exit_code == 1
    mets = {
        (r["rule_id"], r["metric"]): r["value"] for r in rep.metrics.collect()
    }
    assert mets[("g_cnt", "groups_violated")] == 0.0
    assert mets[("all_mean", "mean")] == pytest.approx(49.5)


def test_grouped_bounds_single_exchange_plan(spark, df):
    v, _ = _run(df, (
        MetricBoundRule("g1", column="v", metric="mean", max=10.0, group_by="cat"),
        MetricBoundRule("g2", column="v", metric="count", min=1.0, group_by="cat"),
    ))
    plan = v._jdf.queryExecution().executedPlan().toString()
    # the violations frame is a union of two branches: the per-group agg
    # (one partial+final Exchange pair, all rules fused) plus the 1-row
    # emptiness-check summary (its own agg + single-partition Exchange)
    assert plan.count("Exchange") <= 4
    assert "PythonUDF" not in plan


def test_grouped_bounds_empty_table_is_loud(spark):
    """Zero groups (truncated/empty table) must violate per rule — the
    grouped analog of the ungrouped NULL-metric 'no value' contract — and
    groups_violated must read 0.0, not NULL."""
    d = spark.createDataFrame([], "cat string, v double")
    v, m = _run(d, (
        MetricBoundRule("g1", column="v", metric="mean", max=10.0, group_by="cat"),
        MetricBoundRule("g2", column="v", metric="count", min=1.0, group_by="cat"),
    ))
    rows = {(r["rule_id"], r["image_id"], r["actual"]) for r in v.collect()}
    assert rows == {
        ("g1", "__no_groups__", "0 groups"),
        ("g2", "__no_groups__", "0 groups"),
    }
    mets = {(r["rule_id"], r["metric"]): r["value"] for r in m.collect()}
    assert mets[("g1", "groups_total")] == 0.0
    assert mets[("g1", "groups_violated")] == 0.0


def test_boundless_rule_rejected_on_direct_api_call(spark, df):
    """ADVICE r3: metric_bound_results is a public operator API callable
    without compile_spec (the bench entry calls it directly) — a boundless
    rule must raise a typed SchemaError, not a bare IndexError downstream,
    for both the global and the grouped path."""
    for rule in (
        MetricBoundRule("b0", column="v", metric="mean"),
        MetricBoundRule("b1", column="v", metric="mean", group_by="cat"),
    ):
        with pytest.raises(SchemaError, match="at least one of min/max"):
            agg_rules.metric_bound_results(df, (rule,), "t")
