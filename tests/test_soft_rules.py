"""Soft-rule (Rule.max_violation_rate) verdict semantics: violations are
always detected and reported; the run's exit code tolerates a declared
per-rule violation RATE (violations / rows validated). Hard rules (no rate)
keep the reference's any-violation-fails semantics (main.rs:86-90). Totals
stay EXACT under max_violations_per_rule because the verdict reads the
aggregation-only violations_total metrics, never the sampled row frame."""

import pytest
from pyspark.sql import functions as F

from mdvalidate_spark.compile import compile_spec
from mdvalidate_spark.errors import SchemaError
from mdvalidate_spark.run import validate_table
from mdvalidate_spark.spec import (
    CaptureRule,
    ColumnStatsRule,
    RegexRule,
    Spec,
    UniqueRule,
)

N = 1000
BAD = 100  # ids divisible by 10 violate the regex


def _frame(spark):
    """1000 rows; `code` is 'ok' except every 10th row ('XX') → exact 10%
    violation rate against ^ok$."""
    return spark.range(N).select(
        "id",
        F.format_string("img%07d", F.col("id")).alias("image_id"),
        F.when(F.col("id") % 10 == 0, "XX").otherwise("ok").alias("code"),
    )


def _spec(rate, cap=None, extra=()):
    return Spec(
        key_column="image_id",
        rules=(
            RegexRule(
                "code_ok", column="code", pattern="^ok$",
                max_violation_rate=rate,
            ),
            *extra,
        ),
        max_violations_per_rule=cap,
    )


def test_soft_rule_under_budget_passes_but_reports(spark):
    rep = validate_table(spark, _frame(spark), _spec(rate=0.2), run_id="soft-ok")
    assert rep.exit_code == 0
    # tolerated ≠ hidden: every violation row is still there
    assert rep.violations.where("rule_id = 'code_ok'").count() == BAD


def test_soft_rule_over_budget_fails(spark):
    rep = validate_table(spark, _frame(spark), _spec(rate=0.05), run_id="soft-over")
    assert rep.exit_code == 1


def test_rate_boundary_is_inclusive(spark):
    # exactly 10% violations vs rate=0.1: ≤ passes (budget, not strict bound)
    rep = validate_table(spark, _frame(spark), _spec(rate=0.1), run_id="soft-eq")
    assert rep.exit_code == 0


def test_hard_rule_alongside_soft_still_fails(spark):
    spec = _spec(
        rate=0.2,
        extra=(RegexRule("img_key", column="image_id", pattern="^img9"),),
    )
    rep = validate_table(spark, _frame(spark), spec, run_id="soft-hard")
    assert rep.exit_code == 1  # the hard rule has violations


def test_soft_verdict_exact_under_violation_cap(spark):
    """With max_violations_per_rule=5 the frame holds ≤5 sampled rows, but
    the verdict must use the EXACT total (100/1000 = 10%): rate 0.05 fails,
    rate 0.2 passes — sampled arithmetic would pass both (5/1000)."""
    rep = validate_table(
        spark, _frame(spark), _spec(rate=0.05, cap=5), run_id="soft-cap-f"
    )
    assert rep.exit_code == 1
    # the cap is per (rule, partition): ≤ 5 × n_partitions rows materialized
    assert rep.violations.where("rule_id = 'code_ok'").count() <= 5 * 8 < BAD

    rep2 = validate_table(
        spark, _frame(spark), _spec(rate=0.2, cap=5), run_id="soft-cap-p"
    )
    assert rep2.exit_code == 0


def test_soft_rate_on_global_rule_with_cap(spark):
    """Group-stage rules ride the same exact-totals path (uc_totals). A
    unique rule emits ONE violation per duplicated key: ids fold onto 850
    keys, so keys 0..149 appear twice → exactly 150 violations / 1000 rows
    = 15%."""
    df = _frame(spark).withColumn(
        "dup_key", (F.col("id") % 850).cast("string")
    )
    spec = Spec(
        key_column="image_id",
        rules=(
            UniqueRule("uniq", columns=("dup_key",),
                       max_violation_rate=0.2),
        ),
        max_violations_per_rule=5,
    )
    rep = validate_table(spark, df, spec, run_id="soft-uniq-p")
    assert rep.exit_code == 0  # 150 dup keys / 1000 rows = 15% ≤ 20%
    spec2 = Spec(
        key_column="image_id",
        rules=(
            UniqueRule("uniq", columns=("dup_key",),
                       max_violation_rate=0.1),
        ),
        max_violations_per_rule=5,
    )
    rep2 = validate_table(spark, df, spec2, run_id="soft-uniq-f")
    assert rep2.exit_code == 1  # 15% > 10%, exact despite the cap


def test_compile_lints(spark):
    with pytest.raises(SchemaError, match=r"max_violation_rate must be in"):
        compile_spec(_spec(rate=1.0))
    with pytest.raises(SchemaError, match=r"max_violation_rate must be in"):
        compile_spec(_spec(rate=-0.1))
    with pytest.raises(SchemaError, match="metric-only"):
        compile_spec(Spec(
            key_column="k",
            rules=(ColumnStatsRule("s", column="c",
                                   max_violation_rate=0.1),),
        ))
    with pytest.raises(SchemaError, match="metric-only"):
        compile_spec(Spec(
            key_column="k",
            rules=(CaptureRule("c", column="c", pattern="(x)",
                               max_violation_rate=0.1),),
        ))
