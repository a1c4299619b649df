"""Cross-RUN distribution drift from persisted KLL sketches
(agg_rules.quantile_drift_from_partials): two runs' quantile-sketch
partials merged and compared as a two-sample KS statistic WITHOUT
rescanning either run's table — the distribution-level counterpart of
compare_metric_runs (operators/regression.py compares scalar metrics;
this compares whole CDFs). Reference analog: mdvalidate re-checks the
full document on EOF (validator.rs:162-168); at 10^12 rows the only
affordable "re-check" of run N-1 is one that reads O(sketch) bytes.

Covers: exactness below sketch capacity vs a numpy-computed classic
two-sample KS, zero drift on identical inputs, violation emission past
the threshold, grid-coverage sufficiency (mass >= 1/n_points), the
empty-side missing-data violation, and the float family."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from mdvalidate_spark.operators import agg_rules
from mdvalidate_spark.spec import ColumnStatsRule


def _rule(col="v", kll_k=8192):
    # quantiles=(0.5,) switches the partials on; the drift statistic uses
    # the sketch itself, not the requested quantile points
    return ColumnStatsRule(
        "ks_v", column=col, incremental=True, quantiles=(0.5,), kll_k=kll_k
    )


def _partials(spark, values, rule, run_id, dtype="bigint"):
    df = spark.createDataFrame(
        [(i % 4, x) for i, x in enumerate(values)],
        f"partition_id int, {rule.column} {dtype}",
    )
    return agg_rules.column_stats_partials(df, (rule,), run_id)


def _exact_ks(a, b):
    """classic two-sample KS: max |ecdf_a - ecdf_b| over all data values."""
    a, b = np.asarray(a, dtype=float), np.asarray(b, dtype=float)
    grid = np.unique(np.concatenate([a, b]))
    ra = np.searchsorted(np.sort(a), grid, side="right") / len(a)
    rb = np.searchsorted(np.sort(b), grid, side="right") / len(b)
    return float(np.max(np.abs(ra - rb)))


def test_ks_exact_below_capacity(spark):
    rule = _rule()
    va = [0] * 50 + [1] * 30 + [2] * 20
    vb = [0] * 30 + [1] * 30 + [2] * 40
    viol, metrics, n = agg_rules.quantile_drift_from_partials(
        _partials(spark, va, rule, "a"),
        _partials(spark, vb, rule, "b"),
        rule,
        "r",
        threshold=0.1,
    )
    m = {r["metric"]: r["value"] for r in metrics.collect()}
    # ecdfs: a=(.5,.8,1) b=(.3,.6,1) -> KS=0.2, exactly what numpy says
    assert m["ks_stat"] == pytest.approx(_exact_ks(va, vb))
    assert m["ks_stat"] == pytest.approx(0.2)
    assert (m["n_baseline"], m["n_current"]) == (100.0, 100.0)
    assert n == 1  # 0.2 > 0.1
    v = viol.collect()[0]
    assert v["kind"] == "drift" and v["image_id"] == "run_vs_run"


def test_ks_identical_distribution_silent(spark):
    rule = _rule()
    vals = list(range(10)) * 40
    viol, metrics, n = agg_rules.quantile_drift_from_partials(
        _partials(spark, vals, rule, "a"),
        _partials(spark, vals, rule, "b"),
        rule,
        "r",
        threshold=0.01,
    )
    m = {r["metric"]: r["value"] for r in metrics.collect()}
    assert m["ks_stat"] == 0.0
    assert n == 0 and viol.count() == 0


def test_ks_matches_numpy_on_skewed_integers(spark):
    """Pseudo-random-ish integer data (deterministic arithmetic mix), every
    value's mass >= 1/n_points on at least one side, sketches below
    capacity -> the grid KS must equal numpy's classic two-sample KS."""
    rule = _rule()
    va = [(i * i * 7 + i) % 11 for i in range(600)]
    vb = [(i * i * 5 + 3 * i) % 13 for i in range(500)]
    _, metrics, _ = agg_rules.quantile_drift_from_partials(
        _partials(spark, va, rule, "a"),
        _partials(spark, vb, rule, "b"),
        rule,
        "r",
        n_points=32,
    )
    m = {r["metric"]: r["value"] for r in metrics.collect()}
    assert m["ks_stat"] == pytest.approx(_exact_ks(va, vb), abs=1e-12)


def test_ks_double_family(spark):
    rule = _rule()
    va = [x / 4.0 for x in ([0] * 40 + [1] * 40 + [2] * 20)]
    vb = [x / 4.0 for x in ([0] * 20 + [1] * 40 + [2] * 40)]
    _, metrics, _ = agg_rules.quantile_drift_from_partials(
        _partials(spark, va, rule, "a", dtype="double"),
        _partials(spark, vb, rule, "b", dtype="double"),
        rule,
        "r",
    )
    m = {r["metric"]: r["value"] for r in metrics.collect()}
    assert m["ks_stat"] == pytest.approx(_exact_ks(va, vb))


def test_empty_side_is_missing_data_not_zero_drift(spark):
    """an absent baseline must NOT read as 'no drift' — it is a violation
    of its own kind (same contract as drift_ops' empty probe group)."""
    rule = _rule()
    pa = _partials(spark, [0, 1, 2], rule, "a")
    empty = pa.where(F.lit(False))
    for a, b, side in ((empty, pa, "baseline"), (pa, empty, "current")):
        viol, metrics, n = agg_rules.quantile_drift_from_partials(
            a, b, rule, "r"
        )
        assert n == 1
        v = viol.collect()[0]
        assert v["image_id"] == side and v["actual"] == "no sketch"
        assert metrics.count() == 0


def test_threshold_gates_violation_not_metric(spark):
    rule = _rule()
    va = [0] * 50 + [1] * 50
    vb = [0] * 45 + [1] * 55  # KS = 0.05
    viol, metrics, n = agg_rules.quantile_drift_from_partials(
        _partials(spark, va, rule, "a"),
        _partials(spark, vb, rule, "b"),
        rule,
        "r",
        threshold=0.1,
    )
    m = {r["metric"]: r["value"] for r in metrics.collect()}
    assert m["ks_stat"] == pytest.approx(0.05)
    assert n == 0 and viol.count() == 0
