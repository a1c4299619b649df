"""Smoke validation: deterministic keyed sampling + Wilson-bounded
rate estimation (operators/smoke.py, run.smoke_validate)."""

import math

import pytest
from pyspark.sql import functions as F

from mdvalidate_spark.operators import smoke
from mdvalidate_spark.run import smoke_validate, validate_table
from mdvalidate_spark.sources.synthetic import synthetic_images
from mdvalidate_spark.spec import (
    NotNullRule,
    RangeRule,
    RegexRule,
    Spec,
    UniqueRule,
)

ROWS = 4000


@pytest.fixture(scope="module")
def images(spark):
    df = synthetic_images(spark, ROWS, with_bytes=False).cache()
    df.count()
    yield df
    df.unpersist()


def _spec():
    return Spec(
        rules=(
            NotNullRule("nn_cap", column="caption"),
            RangeRule("r_w", column="w", min=1, max=4096),
            RegexRule("rx_cap", column="caption", pattern=r"A photo .*"),
            UniqueRule("uq_id", columns=("image_id",)),
        ),
        key_column="image_id",
        partition_column="partition_id",
    )


# ------------------------------------------------------------ predicate


def test_sample_threshold_values():
    # exact fraction→hex mapping at the 8-hex-digit resolution
    assert smoke.sample_threshold(0.5) == "80000000"
    assert smoke.sample_threshold(1 / 16) == "10000000"
    with pytest.raises(ValueError):
        smoke.sample_threshold(0.0)
    with pytest.raises(ValueError):
        smoke.sample_threshold(1.5)


def test_sample_is_deterministic_and_fractional(spark, images):
    p = 0.2
    pred = smoke.sample_predicate("image_id", p)
    a = images.where(pred)
    n1, n2 = a.count(), images.where(pred).count()
    assert n1 == n2  # same sample on re-evaluation
    # binomial(ROWS, 0.2): expect ~800; 5 sigma ≈ 127
    assert abs(n1 - ROWS * p) < 5 * math.sqrt(ROWS * p * (1 - p))
    # nested sampling: a smaller fraction's sample is a subset (thresholds
    # are ordered) — lets a user cheaply widen a smoke run
    b = images.where(smoke.sample_predicate("image_id", 0.05))
    assert b.join(a, "image_id", "left_anti").count() == 0


def test_sample_fraction_one_is_everything(spark, images):
    assert images.where(smoke.sample_predicate("image_id", 1.0)).count() == ROWS


def test_sample_matches_duckdb_semantics(spark, images):
    """The predicate's documented oracle form selects the identical keys."""
    import duckdb

    thr = smoke.sample_threshold(0.1)
    keys = sorted(
        r["image_id"]
        for r in images.where(smoke.sample_predicate("image_id", 0.1))
        .select("image_id")
        .collect()
    )
    pdf = images.select("image_id").toPandas()
    want = sorted(
        duckdb.sql(
            "SELECT image_id FROM pdf "
            f"WHERE substr(md5(CAST(image_id AS VARCHAR)), 1, 8) < '{thr}'"
        ).df()["image_id"]
    )
    assert keys == want and len(keys) > 0


# --------------------------------------------------------------- wilson


def test_wilson_interval_known_values():
    # k=0: lower bound exactly 0, upper strictly positive (honest at zero)
    lo, hi = smoke.wilson_interval(0, 100)
    assert lo == 0.0 and 0.0 < hi < 0.05
    # symmetric case p=0.5, large n: tight around 0.5
    lo, hi = smoke.wilson_interval(500, 1000)
    assert 0.468 < lo < 0.5 < hi < 0.532
    # n=0: no evidence → (0, 1)
    assert smoke.wilson_interval(3, 0) == (0.0, 1.0)
    # coverage-shaped sanity: interval always contains the point estimate
    for k, n in [(1, 7), (6, 7), (13, 10000)]:
        lo, hi = smoke.wilson_interval(k, n)
        assert lo <= k / n <= hi


# ---------------------------------------------------------- end-to-end


def _metric(rep, rule_id, metric):
    rows = rep.metrics.where(
        (F.col("rule_id") == rule_id) & (F.col("metric") == metric)
    ).collect()
    assert len(rows) == 1, (rule_id, metric, rows)
    return rows[0]["value"]


def test_smoke_validate_estimates_bracket_truth(spark, images):
    """The Wilson interval from a 25% smoke run brackets the TRUE full-run
    violation rate for every row-shaped rule, and the sample row count is
    the true keyed-sample size."""
    spec = _spec()
    frac = 0.25
    full = validate_table(spark, images, spec, run_id="r-full")
    rep = smoke_validate(spark, images, spec, frac, run_id="r-smoke")

    n = _metric(rep, smoke.SMOKE_RULE_ID, "sample_rows")
    assert n == images.where(
        smoke.sample_predicate("image_id", frac)
    ).count()
    assert _metric(rep, smoke.SMOKE_RULE_ID, "sample_fraction") == frac

    true_counts = {
        r["rule_id"]: r["k"]
        for r in full.violations.groupBy("rule_id")
        .agg(F.count(F.lit(1)).alias("k"))
        .collect()
    }
    for rule in spec.rules:
        true_rate = true_counts.get(rule.id, 0) / ROWS
        lo = _metric(rep, rule.id, "smoke_rate_lo")
        hi = _metric(rep, rule.id, "smoke_rate_hi")
        assert lo <= true_rate <= hi, (rule.id, lo, true_rate, hi)
        # extrapolation is rate-consistent: est_total = k / fraction
        k = _metric(rep, rule.id, "smoke_violations")
        assert _metric(rep, rule.id, "smoke_est_total") == pytest.approx(
            k / frac
        )


def test_smoke_clean_rule_emits_zero_row(spark, images):
    """A rule with no violations in the sample still gets estimation rows —
    the 0-rate CI is the point of a smoke run on healthy data."""
    spec = Spec(
        rules=(RangeRule("r_huge", column="h", min=0, max=10**9),),
        key_column="image_id",
        partition_column="partition_id",
    )
    rep = smoke_validate(spark, images, spec, 0.2, run_id="r-clean")
    assert _metric(rep, "r_huge", "smoke_violations") == 0.0
    assert _metric(rep, "r_huge", "smoke_rate_lo") == 0.0
    assert 0.0 < _metric(rep, "r_huge", "smoke_rate_hi") < 0.02


def test_smoke_counts_survive_violation_cap(spark, images):
    """With max_violations_per_rule set, the materialized rows are a
    sample but smoke estimation uses the exact violations_total metric
    rows — estimates identical to the uncapped run."""
    base = _spec()
    capped = Spec(
        rules=base.rules,
        key_column="image_id",
        partition_column="partition_id",
        max_violations_per_rule=1,
    )
    frac = 0.25
    a = smoke_validate(spark, images, base, frac, run_id="r-sm-u")
    b = smoke_validate(spark, images, capped, frac, run_id="r-sm-c")
    for rule in base.rules:
        for m in ("smoke_violations", "smoke_rate", "smoke_est_total"):
            assert _metric(a, rule.id, m) == _metric(b, rule.id, m), (
                rule.id,
                m,
            )


def test_smoke_key_coherent_duplicates(spark, images):
    """Sampling by key keeps every copy of a sampled key: within the
    sample, duplicate detection equals running uniqueness on the sample
    frame directly (no half-sampled key groups)."""
    spec = Spec(
        rules=(UniqueRule("uq", columns=("image_id",)),),
        key_column="image_id",
        partition_column="partition_id",
    )
    frac = 0.5
    rep = smoke_validate(spark, images, spec, frac, run_id="r-kc")
    sample = images.where(smoke.sample_predicate("image_id", frac))
    # engine emits ONE violation row per duplicated key (count=n in actual)
    want = sample.groupBy("image_id").count().where("count > 1").count()
    assert want > 0  # non-vacuous: the sample caught planted duplicates
    assert _metric(rep, "uq", "smoke_violations") == float(want)
