"""Cross-partition distinct-overlap audit (operators/overlap.py): theta
sketches are EXACT below retention, so planted overlaps check by equality;
the guard refuses group explosions instead of flooding the pair stage."""

import pytest
from pyspark.sql import functions as F

from mdvalidate_spark.errors import SchemaError
from mdvalidate_spark.operators.overlap import group_sketches, partition_overlap


def _planted(spark):
    # group 0: values 0..99; group 1: 50..149 (50 common); group 2: 1000..1009
    rows = (
        [(0, v) for v in range(100)]
        + [(1, v) for v in range(50, 150)]
        + [(2, v) for v in range(1000, 1010)]
        # duplicates must not inflate distinct counts
        + [(0, v) for v in range(25)]
        + [(1, None)]
    )
    return spark.createDataFrame(rows, "partition_id int, v int").repartition(8)


def test_planted_overlap_exact(spark):
    out = {
        (r["g_a"], r["g_b"]): r
        for r in partition_overlap(_planted(spark), "v").collect()
    }
    assert set(out) == {(0, 1), (0, 2), (1, 2)}
    r01 = out[(0, 1)]
    assert (r01["n_a"], r01["n_b"], r01["n_common"]) == (100.0, 100.0, 50.0)
    assert r01["jaccard"] == pytest.approx(50.0 / 150.0)
    assert out[(0, 2)]["n_common"] == 0.0
    assert out[(0, 2)]["jaccard"] == 0.0


def test_guard_refuses_group_explosion(spark):
    df = spark.range(0, 1000).select(
        F.col("id").cast("int").alias("partition_id"), F.col("id").alias("v")
    )
    with pytest.raises(SchemaError, match="max_groups"):
        partition_overlap(df, "v", max_groups=16)
    # lazy-guard path: a caller-supplied group count is trusted (no job) and
    # still refuses when over the cap
    with pytest.raises(SchemaError, match="max_groups"):
        partition_overlap(df, "v", max_groups=16, n_groups=1000)
    # with an in-bounds hint the audit builds LAZILY and still computes
    # correctly (3 real groups)
    small = _planted(spark)
    out = partition_overlap(small, "v", n_groups=3)
    assert out.count() == 3


def test_non_sketchable_type_and_custom_group(spark):
    # (i // 2) decouples the value stream from the shard parity — both
    # shards see the full value set {0.0 .. 9.0}
    df = spark.createDataFrame(
        [(f"s{i % 2}", float((i // 2) % 10)) for i in range(100)],
        "shard string, val double",
    )
    out = partition_overlap(df, "val", group_col="shard").collect()
    assert len(out) == 1
    assert out[0]["n_common"] == 10.0 and out[0]["jaccard"] == 1.0


def test_overlap_rule_through_run(spark):
    from mdvalidate_spark.run import validate_table
    from mdvalidate_spark.spec import OverlapRule, Spec

    df = _planted(spark)
    spec = Spec(
        rules=(
            OverlapRule("no_leak", column="v", max_jaccard=0.2),
            OverlapRule("no_big_common", column="v", max_common=60),
        ),
        key_column="v",
        partition_column="partition_id",
    )
    rep = validate_table(spark, df, spec, run_id="r-ov")
    rows = {(r["rule_id"], r["image_id"]): r for r in rep.violations.collect()}
    # only the (0,1) pair breaches jaccard 1/3 > 0.2; neither breaches
    # common>60 (they share 50)
    assert set(rows) == {("no_leak", "0|1")}
    v = rows[("no_leak", "0|1")]
    assert v["kind"] == "overlap" and "jaccard=0.333333" in v["actual"]
    assert rep.exit_code == 1

    # clean bound → green run
    ok = validate_table(
        spark, df,
        Spec(rules=(OverlapRule("loose", column="v", max_jaccard=0.9),),
             key_column="v", partition_column="partition_id"),
        run_id="r-ov-ok",
    )
    assert ok.exit_code == 0


def test_overlap_rule_compile_and_spec_io(spark):
    from mdvalidate_spark.compile import compile_spec
    from mdvalidate_spark.spec import OverlapRule, Spec
    from mdvalidate_spark.spec_io import spec_from_dict, spec_to_dict

    with pytest.raises(SchemaError):
        compile_spec(Spec(rules=(OverlapRule("o", column="v"),), key_column="v"))
    with pytest.raises(SchemaError):
        compile_spec(
            Spec(rules=(OverlapRule("o", column="v", max_jaccard=1.5),),
                 key_column="v")
        )
    spec = Spec(
        rules=(OverlapRule("o", column="v", max_jaccard=0.5, max_groups=64),),
        key_column="v",
    )
    rt = spec_from_dict(spec_to_dict(spec))
    assert rt.rules[0] == spec.rules[0]


def test_group_sketches_shape(spark):
    sks = group_sketches(_planted(spark), "v").collect()
    assert {r["g"] for r in sks} == {0, 1, 2}
    assert all(len(r["sk"]) > 0 for r in sks)
    with pytest.raises(SchemaError):
        group_sketches(_planted(spark), "nope")
