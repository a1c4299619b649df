"""Cross-run metric regression tests (operators/regression.py)."""

import pytest
from pyspark.sql import functions as F

from mdvalidate_spark.operators.regression import compare_metric_runs

DDL = "rule_id string, metric string, value double, value_str string"


def _mf(spark, rows):
    return spark.createDataFrame(rows, DDL)


def test_numeric_regression_and_tolerance(spark):
    base = _mf(spark, [("s", "count", 1000.0, None), ("s", "null_rate", 0.01, None)])
    cur = _mf(spark, [("s", "count", 1050.0, None), ("s", "null_rate", 0.2, None)])
    # 5% count move under rel_tol=0.1 -> only null_rate regresses
    out = {r["metric"]: r for r in compare_metric_runs(cur, base, rel_tol=0.1).collect()}
    assert set(out) == {"null_rate"}
    r = out["null_rate"]
    assert r["kind"] == "regressed"
    assert r["delta"] == pytest.approx(0.19)
    assert r["rel_delta"] == pytest.approx(19.0)
    # per-metric override loosens it
    assert (
        compare_metric_runs(cur, base, rel_tol=0.1, tolerances={"null_rate": 25.0}).count()
        == 0
    )


def test_zero_baseline_governed_by_abs_tol(spark):
    base = _mf(spark, [("s", "violations_total", 0.0, None)])
    cur = _mf(spark, [("s", "violations_total", 3.0, None)])
    assert compare_metric_runs(cur, base, rel_tol=0.5).count() == 1  # abs_tol=0
    assert compare_metric_runs(cur, base, rel_tol=0.5, abs_tol=5.0).count() == 0
    got = compare_metric_runs(cur, base).collect()[0]
    assert got["rel_delta"] is None  # undefined on a zero baseline


def test_string_change_and_presence(spark):
    base = _mf(
        spark,
        [("s", "min", None, "alpha"), ("s", "max", None, "zeta"), ("gone", "count", 5.0, None)],
    )
    cur = _mf(
        spark,
        [("s", "min", None, "beta"), ("s", "max", None, "zeta"), ("new", "count", 7.0, None)],
    )
    out = {(r["rule_id"], r["metric"]): r["kind"] for r in compare_metric_runs(cur, base).collect()}
    assert out == {
        ("s", "min"): "changed",
        ("gone", "count"): "disappeared",
        ("new", "count"): "appeared",
    }
    off = compare_metric_runs(cur, base, check_presence=False).collect()
    assert {r["kind"] for r in off} == {"changed"}
    sel = compare_metric_runs(cur, base, metrics=("max",)).collect()
    assert sel == []


def test_end_to_end_two_snapshots(spark, tmp_path):
    """Real lifecycle: validate a small snapshot, validate a larger one,
    compare the persisted metrics — count/distinct regress, min stays."""
    from mdvalidate_spark import validate_table
    from mdvalidate_spark.sources.synthetic import synthetic_images
    from mdvalidate_spark.spec import ColumnStatsRule, Spec

    spec = Spec(
        rules=(ColumnStatsRule("w_stats", column="w", exact_distinct=True),),
        key_column="image_id",
        n_partitions=4,
    )
    small = synthetic_images(spark, 200, with_bytes=False)
    big = synthetic_images(spark, 400, with_bytes=False)
    rep_a = validate_table(spark, small, spec, checkpoint_dir=str(tmp_path / "a"))
    rep_b = validate_table(spark, big, spec, checkpoint_dir=str(tmp_path / "b"))
    out = {
        r["metric"]: r
        for r in compare_metric_runs(rep_b.metrics, rep_a.metrics, rel_tol=0.1).collect()
    }
    assert out["count"]["kind"] == "regressed"
    assert out["count"]["baseline_value"] == 200.0
    assert out["count"]["current_value"] == 400.0
    # the larger snapshot crosses the w-injection cadence (rows//250): a
    # w=0 row appears, so the min metric string flips 32 -> 0 — exactly the
    # "new bad value entered the table" signal this operator exists for
    assert out["min"]["kind"] == "changed"
    assert (out["min"]["baseline_str"], out["min"]["current_str"]) == ("32", "0")


def test_diff_violations_new_resolved_and_stable(spark):
    """Set diff on the (rule_id, image_id, column) identity: rows only in
    current → new, only in baseline → resolved, in both → absent — and an
    'actual' drift alone (count=3 → count=4) does NOT re-alert."""
    from mdvalidate_spark.operators.regression import diff_violations

    ddl = (
        "run_id string, partition_id int, rule_id string, image_id string, "
        "column string, expected string, actual string, kind string"
    )
    base = spark.createDataFrame(
        [
            ("b", 0, "r1", "k1", "c", "e", "count=3", "dup"),   # stays (actual drifts)
            ("b", 0, "r1", "k2", "c", "e", "x", "dup"),         # resolved
            ("b", 0, "r2", "k1", "c", "e", "x", "range"),       # resolved
        ],
        ddl,
    )
    cur = spark.createDataFrame(
        [
            ("c", 0, "r1", "k1", "c", "e", "count=4", "dup"),   # same identity
            ("c", 0, "r1", "k9", "c", "e", "y", "dup"),         # new
        ],
        ddl,
    )
    d = diff_violations(cur, base)
    got = {(r["rule_id"], r["image_id"], r["status"]) for r in d.collect()}
    assert got == {
        ("r1", "k9", "new"),
        ("r1", "k2", "resolved"),
        ("r2", "k1", "resolved"),
    }
    # resolved rows carry the BASELINE values (what got fixed)
    res = {r["image_id"]: r["actual"] for r in d.where("status='resolved'").collect()}
    assert res == {"k2": "x", "k1": "x"}


def test_diff_violations_identical_runs_empty(spark):
    from mdvalidate_spark.operators.regression import diff_violations

    ddl = (
        "run_id string, partition_id int, rule_id string, image_id string, "
        "column string, expected string, actual string, kind string"
    )
    v = spark.createDataFrame([("a", 0, "r", "k", "c", "e", "x", "kind")], ddl)
    assert diff_violations(v, v).count() == 0


# ------------------------------------------------- metric-history anomalies

HDDL = "rule_id string, metric string, value double, value_str string, run_id string"


def _hist(spark, metric, values, rule="s"):
    return spark.createDataFrame(
        [(rule, metric, float(v), None, f"r{i}") for i, v in enumerate(values)], HDDL
    )


def test_anomaly_learns_per_metric_scale(spark):
    """A fixed rel_tol can't serve both a noisy and a stable metric; the
    MAD envelope judges each against its own history."""
    from mdvalidate_spark.operators.regression import anomaly_metric_history

    hist = _hist(spark, "count", [1000, 1200, 900, 1100, 1000]).unionByName(
        _hist(spark, "null_rate", [0.010, 0.011, 0.009, 0.010, 0.012])
    )
    # count noise band ~100s: 1350 is fine at k=3; null_rate 0.02 is wild
    cur = _mf(spark, [("s", "count", 1350.0, None), ("s", "null_rate", 0.02, None)])
    out = {r["metric"]: r for r in anomaly_metric_history(hist, cur, k=3.0).collect()}
    assert set(out) == {"null_rate"}
    r = out["null_rate"]
    assert r["kind"] == "anomalous" and r["n_runs"] == 5
    assert r["center"] == pytest.approx(0.010)
    assert r["score"] > 3.0


def test_anomaly_robust_to_one_bad_history_run(spark):
    """One past incident in the history must not widen the envelope the way
    it would for mean/stddev (median/MAD shrugs it off)."""
    from mdvalidate_spark.operators.regression import anomaly_metric_history

    hist = _hist(spark, "count", [1000, 1010, 990, 1005, 50000])  # one incident
    cur = _mf(spark, [("s", "count", 1500.0, None)])
    out = anomaly_metric_history(hist, cur, k=3.0).collect()
    assert len(out) == 1 and out[0]["kind"] == "anomalous"
    # center stays at the healthy level, not dragged toward the incident
    assert out[0]["center"] == pytest.approx(1005.0)


def test_anomaly_constant_history_and_abs_tol(spark):
    """MAD = 0 (constant history): any deviation beyond abs_tol flags, with
    a NULL score (no division blowup); within abs_tol passes."""
    from mdvalidate_spark.operators.regression import anomaly_metric_history

    hist = _hist(spark, "distinct", [42, 42, 42, 42])
    cur = _mf(spark, [("s", "distinct", 43.0, None)])
    out = anomaly_metric_history(hist, cur, k=3.0).collect()
    assert len(out) == 1 and out[0]["score"] is None and out[0]["spread"] == 0.0
    assert anomaly_metric_history(hist, cur, k=3.0, abs_tol=2.0).count() == 0


def test_anomaly_min_runs_gate_and_no_history_flag(spark):
    from mdvalidate_spark.operators.regression import anomaly_metric_history

    hist = _hist(spark, "count", [1000, 1001])  # 2 runs < min_runs=3
    cur = _mf(spark, [("s", "count", 9999.0, None), ("s", "fresh", 1.0, None)])
    assert anomaly_metric_history(hist, cur).count() == 0  # silent skip default
    loud = {
        r["metric"]: r
        for r in anomaly_metric_history(hist, cur, flag_missing_history=True).collect()
    }
    assert {m for m in loud} == {"count", "fresh"}
    assert all(r["kind"] == "no_history" for r in loud.values())
    assert loud["fresh"]["n_runs"] == 0 and loud["count"]["n_runs"] == 2


def test_anomaly_end_to_end_persisted_run_history(spark, tmp_path):
    """Real lifecycle: four runs over steady snapshots persist their metric
    frames (run_id riding along, as the results sink stores them); a fifth
    run over a half-sized snapshot is judged against that history — count
    flags anomalous, the stable min/max metrics stay quiet."""
    from pyspark.sql import functions as F

    from mdvalidate_spark import validate_table
    from mdvalidate_spark.operators.regression import anomaly_metric_history
    from mdvalidate_spark.sources.synthetic import synthetic_images
    from mdvalidate_spark.spec import ColumnStatsRule, Spec

    spec = Spec(
        rules=(ColumnStatsRule("w_stats", column="w", exact_distinct=True),),
        key_column="image_id",
        n_partitions=4,
    )
    hist_frames = []
    for i, n in enumerate([400, 404, 398, 402]):  # steady daily volumes
        rep = validate_table(
            spark,
            synthetic_images(spark, n, with_bytes=False),
            spec,
            checkpoint_dir=str(tmp_path / f"h{i}"),
            run_id=f"day{i}",
        )
        hist_frames.append(rep.metrics.withColumn("run_id", F.lit(f"day{i}")))
    history = hist_frames[0]
    for f2 in hist_frames[1:]:
        history = history.unionByName(f2)
    cur = validate_table(
        spark,
        synthetic_images(spark, 200, with_bytes=False),  # broken ingest
        spec,
        checkpoint_dir=str(tmp_path / "cur"),
        run_id="today",
    )
    out = {
        r["metric"]: r
        for r in anomaly_metric_history(history, cur.metrics, k=3.0).collect()
    }
    assert "count" in out and out["count"]["kind"] == "anomalous"
    assert out["count"]["current_value"] == 200.0
    assert out["count"]["n_runs"] == 4
    assert "min" not in out and "max" not in out


def test_anomaly_per_series_envelopes_not_pooled(spark):
    """Group-keyed metric rows (value_str = group) are separate SERIES: a
    per-source psi_stat history must give each source its own envelope —
    pooling across sources would flag a quiet-but-offset source and miss a
    genuinely shifted one hiding inside the pooled spread."""
    from mdvalidate_spark.operators.regression import anomaly_metric_history

    rows = []
    for run in range(4):
        # source A lives around 10 (tight), source B around 0.1 (tight)
        rows.append(("sweep", "psi_stat", 10.0 + 0.01 * run, "A", f"r{run}"))
        rows.append(("sweep", "psi_stat", 0.10 + 0.001 * run, "B", f"r{run}"))
    hist = spark.createDataFrame(rows, HDDL)
    cur = spark.createDataFrame(
        [
            ("sweep", "psi_stat", 10.02, "A", None),  # normal for A
            ("sweep", "psi_stat", 0.50, "B", None),   # wild for B, but well
                                                       # inside A's pooled band
        ],
        HDDL,
    )
    out = anomaly_metric_history(hist, cur, k=3.0).collect()
    assert len(out) == 1
    assert out[0]["value_str"] == "B" and out[0]["kind"] == "anomalous"
    assert out[0]["n_runs"] == 4
