"""Bounded violation output (operators/sampling.py): at 10^12 rows a hot
rule makes the violations sink itself web-scale, so the engine can cap the
materialized rows per (rule, partition) while keeping exact totals as
metric rows. Covers: the two-phase cap operator (bound + determinism),
the ValidationRun wiring (manifest/exit-code totals stay EXACT under a
cap; metrics carry violations_total), spec/CLI plumbing, and a hot-rule
case where every row violates."""

import pytest
from pyspark.sql import functions as F

from mdvalidate_spark.operators import sampling
from mdvalidate_spark.run import validate_table
from mdvalidate_spark.sources.synthetic import (
    dim_source,
    synthetic_images,
)
from mdvalidate_spark.spec import (
    DomainRule,
    NotNullRule,
    RangeRule,
    RegexRule,
    Spec,
    UniqueRule,
)

ROWS = 1000


def _viol_frame(spark, n_per_rule=200, n_parts=4):
    """Synthetic violations-shaped frame: two rules, one hot."""
    rows = []
    for i in range(n_per_rule):
        rows.append(("r", i % n_parts, "hot_rule", f"id{i:05d}", "c", "e", "a", "k"))
    for i in range(10):
        rows.append(("r", i % n_parts, "cold_rule", f"id{i:05d}", "c", "e", "a", "k"))
    return spark.createDataFrame(
        rows,
        "run_id string, partition_id int, rule_id string, image_id string, "
        "column string, expected string, actual string, kind string",
    ).repartition(8)  # spread so the local phase actually has >1 split


def test_cap_bound_and_determinism(spark):
    df = _viol_frame(spark)
    capped = sampling.cap_violations(df, 5)
    out = capped.collect()
    by_group = {}
    for r in out:
        by_group.setdefault((r["rule_id"], r["partition_id"]), []).append(r["image_id"])
    # bound: ≤ 5 per (rule, partition); hot rule hits the cap exactly
    for (rule, pid), ids in by_group.items():
        assert len(ids) <= 5
        if rule == "hot_rule":
            assert len(ids) == 5
    # determinism: the sample is the LOWEST ids per group (total order), and
    # a re-evaluation returns the identical set
    hot0 = sorted(by_group[("hot_rule", 0)])
    expected = sorted(f"id{i:05d}" for i in range(0, 200, 4))[:5]
    assert hot0 == expected
    again = {
        (r["rule_id"], r["partition_id"], r["image_id"])
        for r in sampling.cap_violations(df, 5).collect()
    }
    assert again == {(r["rule_id"], r["partition_id"], r["image_id"]) for r in out}


def test_count_metrics_exact(spark):
    df = _viol_frame(spark)
    m = {
        (r["rule_id"], r["partition_id"]): r["value"]
        for r in sampling.violation_count_metrics(df, "r").collect()
    }
    assert m[("hot_rule", 0)] == 50.0
    assert m[("cold_rule", 3)] == 2.0
    assert all(r["metric"] == "violations_total" for r in
               sampling.violation_count_metrics(df, "r").collect())


@pytest.fixture(scope="module")
def images(spark):
    df = synthetic_images(spark, ROWS, with_bytes=False).cache()
    df.count()
    yield df
    df.unpersist()


def _spec(cap=None):
    return Spec(
        rules=(
            NotNullRule("caption_not_null", column="caption"),
            RegexRule("caption_regex", column="caption",
                      pattern=r"A photo number \d+ of \w+"),
            RangeRule("w_range", column="w", min=1, max=10000),
            DomainRule("fmt_domain", column="fmt", values=("jpeg", "png", "webp")),
            # hot rule: ~2/3 of rows violate — the case the cap exists for
            DomainRule("fmt_png_only", column="fmt", values=("png",)),
            UniqueRule("unique_image_id", columns=("image_id",)),
        ),
        key_column="image_id",
        n_partitions=8,
        max_violations_per_rule=cap,
    )


def test_run_capped_totals_exact_rows_bounded(spark, images):
    dims = {"dim_source": dim_source(spark)}
    full = validate_table(spark, images, _spec(None), dims=dims, run_id="r-uncapped")
    capped = validate_table(spark, images, _spec(2), dims=dims, run_id="r-capped")

    n_full = full.violations.count()
    n_capped = capped.violations.count()
    assert n_capped <= 2 * 6 * 8 < n_full

    # manifest + exit code totals stay EXACT under the cap
    full_manifest = {
        (r["partition_id"], r["violations"]) for r in full.manifest.collect()
    }
    capped_manifest = {
        (r["partition_id"], r["violations"]) for r in capped.manifest.collect()
    }
    assert capped_manifest == full_manifest
    assert capped.exit_code == full.exit_code == 1

    # violations_total metric rows reconstruct the exact per-rule counts
    totals = {
        r["rule_id"]: r["n"]
        for r in capped.metrics.where(F.col("metric") == "violations_total")
        .groupBy("rule_id").agg(F.sum("value").cast("long").alias("n"))
        .collect()
    }
    full_counts = {
        r["rule_id"]: r["n"]
        for r in full.violations.groupBy("rule_id")
        .agg(F.count("*").alias("n")).collect()
    }
    assert totals == full_counts

    # the sample is a SUBSET of the full violation set
    key = lambda r: (r["rule_id"], r["image_id"], r["column"], r["kind"])  # noqa: E731
    assert {key(r) for r in capped.violations.collect()} <= {
        key(r) for r in full.violations.collect()
    }


def test_run_capped_hot_rule_every_row_violates(spark, images):
    # pathological rule: EVERY caption fails → uncapped output would be one
    # row per input row; capped output is 1 per (rule, partition)
    spec = Spec(
        rules=(RegexRule("impossible", column="caption", pattern=r"ZZZNEVER"),),
        key_column="image_id",
        n_partitions=8,
        max_violations_per_rule=1,
    )
    rep = validate_table(spark, images, spec, run_id="r-hot")
    assert rep.violations.count() == 8
    total = rep.metrics.where(F.col("metric") == "violations_total").agg(
        F.sum("value").cast("long").alias("n")
    ).collect()[0]["n"]
    nonnull_captions = images.where(F.col("caption").isNotNull()).count()
    assert total == nonnull_captions
    assert sum(r["violations"] for r in rep.manifest.collect()) == nonnull_captions


def test_cap_property_random_frames(spark):
    """Property over random violation frames: the cap is (a) idempotent
    across evaluations, (b) a subset of the full set, (c) exactly
    min(group size, cap) rows per (rule, partition), (d) the LOWEST rows
    by the total order. Random shapes via seeded stdlib random (hypothesis
    strategies don't mix with a shared SparkSession fixture's lifetime)."""
    import random

    rnd = random.Random(1234)
    for trial in range(3):
        n_rules = rnd.randint(1, 3)
        n_parts = rnd.randint(1, 4)
        rows = []
        for i in range(rnd.randint(1, 400)):
            rows.append((
                "r", rnd.randrange(n_parts), f"rule{rnd.randrange(n_rules)}",
                f"id{i:05d}", "c", "e", "a", "k",
            ))
        df = spark.createDataFrame(
            rows,
            "run_id string, partition_id int, rule_id string, image_id string, "
            "column string, expected string, actual string, kind string",
        ).repartition(rnd.randint(1, 6))
        cap = rnd.randint(1, 7)
        key = lambda r: (r["rule_id"], r["partition_id"], r["image_id"])  # noqa: E731
        got = sorted(map(key, sampling.cap_violations(df, cap).collect()))
        again = sorted(map(key, sampling.cap_violations(df, cap).collect()))
        assert got == again, f"trial {trial}: cap not deterministic"
        full = sorted(map(key, df.collect()))
        assert set(got) <= set(full)
        from collections import Counter

        sizes = Counter((r, p) for r, p, _ in full)
        got_sizes = Counter((r, p) for r, p, _ in got)
        for g, n in sizes.items():
            assert got_sizes[g] == min(n, cap), f"trial {trial}: {g}"
        # lowest-by-order: per group, the capped ids are the first ids
        by_group = {}
        for r, p, i in full:
            by_group.setdefault((r, p), []).append(i)
        for g, ids in by_group.items():
            expect = sorted(ids)[:cap]
            have = sorted(i for r, p, i in got if (r, p) == g)
            assert have == expect, f"trial {trial}: {g}"


def test_spec_io_and_cli_plumbing(tmp_path):
    import json

    from mdvalidate_spark.cli import parse_args
    from mdvalidate_spark.spec_io import spec_from_dict, spec_to_dict

    spec = _spec(7)
    rt = spec_from_dict(spec_to_dict(spec))
    assert rt.max_violations_per_rule == 7
    assert spec_from_dict(json.loads(json.dumps(spec_to_dict(_spec(None))))
                          ).max_violations_per_rule is None

    args = parse_args([
        "--spec", "s.json", "--table", "t", "--max-violations-per-rule", "3",
    ])
    assert args.max_violations_per_rule == 3
