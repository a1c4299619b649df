"""Incremental mergeable column stats (ColumnStatsRule.incremental):
per-partition partials with Datasketches HLL sketches, persisted under the
checkpoint and merged at finalize WITHOUT rescanning the table — the north
rule's "cardinality via HyperLogLog sketches merged" made concrete. Covers:
partial/merge parity with the full-scan path, HLL accuracy at high
cardinality, exactness at low cardinality (sparse mode), the resume path
(new run merges reloaded partials + new batches), and the compile lint."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from mdvalidate_spark.compile import compile_spec
from mdvalidate_spark.errors import SchemaError
from mdvalidate_spark.operators import agg_rules
from mdvalidate_spark.run import ValidationRun, validate_table
from mdvalidate_spark.sources.synthetic import synthetic_images
from mdvalidate_spark.spec import ColumnStatsRule, Spec

ROWS = 2000


@pytest.fixture(scope="module")
def images(spark):
    df = synthetic_images(spark, ROWS, with_bytes=False).cache()
    df.count()
    yield df
    df.unpersist()


def _metrics_map(metrics_df, rule_ids):
    return {
        (r["rule_id"], r["metric"]): (r["value"], r["value_str"])
        for r in metrics_df.collect()
        if r["rule_id"] in rule_ids
    }


def test_partials_merge_parity_with_full_scan(spark, images):
    rules = (
        ColumnStatsRule("s_fmt", column="fmt", incremental=True),
        ColumnStatsRule("s_w", column="w", incremental=True),
    )
    partials = agg_rules.column_stats_partials(images, rules, "r")
    merged = agg_rules.column_stats_from_partials(partials, rules, "r")
    full = agg_rules.column_stats_metrics(
        images,
        (
            ColumnStatsRule("s_fmt", column="fmt", exact_distinct=True),
            ColumnStatsRule("s_w", column="w", exact_distinct=True),
        ),
        "r",
    )
    m = _metrics_map(merged, {"s_fmt", "s_w"})
    f = _metrics_map(full, {"s_fmt", "s_w"})
    # count / null_rate / min / max are EXACT through the merge; distinct is
    # exact too at these cardinalities (HLL sparse mode)
    assert m == f
    # partials shape: one row per partition, a real sketch binary per rule
    prows = partials.collect()
    assert len(prows) == images.select("partition_id").distinct().count()
    assert all(len(r["s_fmt__sketch"]) > 0 for r in prows)


def test_hll_accuracy_high_cardinality(spark):
    df = spark.range(0, 200000, 1, 16).select(
        (F.col("id") % 8).cast("int").alias("partition_id"),
        (F.col("id") % 50000).alias("key"),
    )
    rule = ColumnStatsRule("s_key", column="key", incremental=True)
    merged = agg_rules.column_stats_from_partials(
        agg_rules.column_stats_partials(df, (rule,), "r"), (rule,), "r"
    )
    est = {
        r["metric"]: r["value"] for r in merged.collect()
    }["distinct"]
    assert abs(est - 50000) / 50000 < 0.05


def test_non_sketchable_type_casts_to_string(spark):
    df = spark.range(0, 1000, 1, 4).select(
        (F.col("id") % 4).cast("int").alias("partition_id"),
        (F.col("id") % 100 / 7.0).alias("dbl"),
    )
    rule = ColumnStatsRule("s_dbl", column="dbl", incremental=True)
    merged = agg_rules.column_stats_from_partials(
        agg_rules.column_stats_partials(df, (rule,), "r"), (rule,), "r"
    )
    m = {r["metric"]: (r["value"], r["value_str"]) for r in merged.collect()}
    assert m["distinct"][0] == 100.0  # exact (sparse mode)
    assert m["count"][0] == 1000.0
    # min/max merge on the NATIVE double, not its string form
    assert float(m["min"][1]) == 0.0
    assert float(m["max"][1]) == pytest.approx(99 / 7.0)


def test_incremental_through_run_and_resume(spark, images):
    rules = (
        ColumnStatsRule("inc_fmt", column="fmt", incremental=True),
        ColumnStatsRule("inc_cap", column="caption", incremental=True),
    )
    spec = Spec(rules=rules, key_column="image_id", n_partitions=8)
    ckpt = tempfile.mkdtemp()
    try:
        # first run: only 3 partitions (batch_size=3, fast exit via manual loop)
        run1 = ValidationRun(
            spark, spec, images, run_id="r-inc", checkpoint_dir=ckpt
        )
        pending = run1.pending_partitions()
        run1._validate_batch(pending[:3])
        assert sorted(run1.pending_partitions()) == sorted(pending[3:])

        # resume in a NEW run object: reloads the 3 persisted partials,
        # validates the rest, merges at finalize — never rescanning the
        # first 3 partitions
        run2 = ValidationRun(
            spark, spec, images, run_id="r-inc", checkpoint_dir=ckpt
        )
        assert sorted(run2.pending_partitions()) == sorted(pending[3:])
        report = run2.validate()

        fresh = validate_table(
            spark, images,
            Spec(rules=rules, key_column="image_id", n_partitions=8),
            run_id="r-fresh",
        )
        got = _metrics_map(report.metrics, {"inc_fmt", "inc_cap"})
        want = _metrics_map(fresh.metrics, {"inc_fmt", "inc_cap"})
        # count / null_rate / min / max are exact and identical both paths;
        # the distinct ESTIMATE is merge-order-sensitive past HLL sparse
        # mode (Datasketches property: byte-identical sketches, slightly
        # different union estimates), so compare it by tolerance instead
        got_dist = got.pop(("inc_cap", "distinct"))[0]
        want_dist = want.pop(("inc_cap", "distinct"))[0]
        assert got == want
        exact_dist = images.select("caption").distinct().count()
        assert abs(got_dist - exact_dist) / exact_dist < 0.02
        assert abs(want_dist - exact_dist) / exact_dist < 0.02
        # low-cardinality column: sparse mode is exact on BOTH paths
        assert got[("inc_fmt", "distinct")] == want[("inc_fmt", "distinct")]
        # and the values are right in absolute terms
        assert got[("inc_fmt", "count")][0] == float(ROWS)
        n_null = images.where(F.col("caption").isNull()).count()
        assert got[("inc_cap", "null_rate")][0] == pytest.approx(n_null / ROWS)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def test_compile_lint_incremental_exclusions(spark):
    for bad in (
        ColumnStatsRule("b1", column="w", incremental=True, exact_quantiles=True),
        ColumnStatsRule("b2", column="w", incremental=True, exact_distinct=True),
    ):
        with pytest.raises(SchemaError):
            compile_spec(Spec(rules=(bad,), key_column="image_id"))
    # mixing incremental (incl. KLL quantiles) and full-scan rules is fine
    compile_spec(
        Spec(
            rules=(
                ColumnStatsRule("ok1", column="w", incremental=True, quantiles=(0.5,)),
                ColumnStatsRule("ok2", column="w", quantiles=(0.5,)),
            ),
            key_column="image_id",
        )
    )


def test_kll_quantiles_merge_accuracy(spark):
    # uniform 0..99999 over 16 splits, 8 partitions: merged KLL p50/p95
    # must land within ~2% RANK error of the exact quantile (k=200 → 1.65%)
    df = spark.range(0, 100000, 1, 16).select(
        (F.col("id") % 8).cast("int").alias("partition_id"),
        F.col("id").cast("double").alias("v"),
        F.col("id").alias("vi"),
    )
    rules = (
        ColumnStatsRule("k_dbl", column="v", incremental=True, quantiles=(0.5, 0.95)),
        ColumnStatsRule("k_int", column="vi", incremental=True, quantiles=(0.5,)),
    )
    merged = agg_rules.column_stats_from_partials(
        agg_rules.column_stats_partials(df, rules, "r"), rules, "r"
    )
    m = {(r["rule_id"], r["metric"]): r["value"] for r in merged.collect()}
    assert abs(m[("k_dbl", "p50")] - 50000) < 2500
    assert abs(m[("k_dbl", "p95")] - 95000) < 2500
    assert abs(m[("k_int", "p50")] - 50000) < 2500
    # non-numeric column + incremental quantiles → SchemaError at build
    sdf = df.withColumn("s", F.col("v").cast("string"))
    with pytest.raises(SchemaError):
        agg_rules.column_stats_partials(
            sdf,
            (ColumnStatsRule("bad", column="s", incremental=True, quantiles=(0.5,)),),
            "r",
        )


def test_kll_quantiles_survive_checkpoint_roundtrip(spark, images, tmp_path):
    # partials written per batch, reloaded by a resumed run: the KLL binary
    # must merge identically after the parquet round-trip
    rule = ColumnStatsRule("k_w", column="w", incremental=True, quantiles=(0.5,))
    spec = Spec(rules=(rule,), key_column="image_id", n_partitions=8)
    ckpt = str(tmp_path / "ck")
    run1 = ValidationRun(spark, spec, images, run_id="r-kll", checkpoint_dir=ckpt)
    run1._validate_batch(run1.pending_partitions()[:4])
    run2 = ValidationRun(spark, spec, images, run_id="r-kll", checkpoint_dir=ckpt)
    rep = run2.validate()
    got = {r["metric"]: r["value"] for r in rep.metrics.collect() if r["rule_id"] == "k_w"}
    # KLL returns an observed value at ~the requested rank: assert the
    # estimate lands inside a generous exact-rank bracket [p30, p70]
    lo, hi = images.agg(
        F.expr("percentile(w, 0.3)"), F.expr("percentile(w, 0.7)")
    ).collect()[0]
    assert lo <= got["p50"] <= hi
    assert got["count"] == float(ROWS)


def test_scoped_stats_partials_merge_parity(spark, images):
    """`when`-scoped stats through the partials path merge to the same
    numbers as the scoped full-scan path AND as a manual pre-filter — the
    conditional-aggregation gate is exact end-to-end."""
    when = "fmt = 'png'"
    rules = (
        ColumnStatsRule("s_w", column="w", incremental=True, when=when),
    )
    partials = agg_rules.column_stats_partials(images, rules, "r")
    merged = agg_rules.column_stats_from_partials(partials, rules, "r")
    full = agg_rules.column_stats_metrics(
        images,
        (ColumnStatsRule("s_w", column="w", exact_distinct=True, when=when),),
        "r",
    )
    manual = agg_rules.column_stats_metrics(
        images.where(when),
        (ColumnStatsRule("s_w", column="w", exact_distinct=True),),
        "r",
    )
    m = _metrics_map(merged, {"s_w"})
    f = _metrics_map(full, {"s_w"})
    x = _metrics_map(manual, {"s_w"})
    assert m == f == x
    # non-vacuous: the scope is a strict subset of the table
    assert 0 < f[("s_w", "count")][0] < ROWS


def test_moments_partials_merge_parity(spark, images):
    """(Σx, Σx²) partials merge to the full-scan mean/stddev (approx: the
    partials path is the naive algebraic form, the full scan the stable
    built-in — equal to float tolerance), and the scope gate composes."""
    for when in ("", "fmt = 'png'"):
        rules = (
            ColumnStatsRule(
                "m_w", column="w", incremental=True, moments=True, when=when
            ),
        )
        partials = agg_rules.column_stats_partials(images, rules, "r")
        merged = agg_rules.column_stats_from_partials(partials, rules, "r")
        got = {
            r["metric"]: r["value"]
            for r in merged.where("metric IN ('mean','stddev')").collect()
        }
        base = images.where(when) if when else images
        want = base.agg(
            F.avg("w").alias("mean"), F.stddev_samp("w").alias("sd")
        ).collect()[0]
        assert got["mean"] == pytest.approx(want["mean"], rel=1e-9), when
        assert got["stddev"] == pytest.approx(want["sd"], rel=1e-9), when


def test_moments_partials_checkpoint_roundtrip(spark, images, tmp_path):
    """Moment partials survive a parquet round-trip (they are plain doubles
    next to the sketch binaries) and still merge to the same numbers."""
    rules = (
        ColumnStatsRule("m_w", column="w", incremental=True, moments=True),
    )
    p = str(tmp_path / "partials")
    agg_rules.column_stats_partials(images, rules, "r").write.parquet(p)
    merged = agg_rules.column_stats_from_partials(
        spark.read.parquet(p), rules, "r"
    )
    got = {
        r["metric"]: r["value"]
        for r in merged.where("metric IN ('mean','stddev')").collect()
    }
    want = images.agg(
        F.avg("w").alias("mean"), F.stddev_samp("w").alias("sd")
    ).collect()[0]
    assert got["mean"] == pytest.approx(want["mean"], rel=1e-9)
    assert got["stddev"] == pytest.approx(want["sd"], rel=1e-9)
