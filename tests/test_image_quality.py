"""Pixel-space quality / degeneracy detection: image_quality_stats +
degenerate_image_violations over the dedicated synthetic_quality_images
fixture (blank / saturated / undecodable plants + a brightness-shifted
partition as a drift probe)."""

import pytest
from pyspark.sql import functions as F

from mdvalidate_spark.errors import KIND_DEGENERATE, SchemaError
from mdvalidate_spark.operators.multimodal import (
    degenerate_image_violations,
    image_quality_stats,
)
from mdvalidate_spark.sources.synthetic import synthetic_quality_images

ROWS = 600
N_PARTS = 8


def expected_class(i: int) -> str | None:
    """The fixture's injection contract, precedence-ordered (synthetic.py)."""
    if i % 23 == 11:
        return "undecodable"
    if i % 13 == 5 or i % 17 == 7:
        return "blank_image"
    if i % 19 == 3:
        return "saturated_image"
    return None


@pytest.fixture(scope="module")
def qimages(spark):
    df = synthetic_quality_images(spark, ROWS, n_partitions=N_PARTS).cache()
    df.count()
    yield df
    df.unpersist()


def test_fixture_deterministic(spark, qimages):
    again = synthetic_quality_images(spark, ROWS, n_partitions=N_PARTS)
    a = {r["image_id"]: bytes(r["bytes"]) for r in qimages.collect()}
    b = {r["image_id"]: bytes(r["bytes"]) for r in again.collect()}
    assert a == b


def test_quality_stats_values(spark, qimages):
    stats = {r["image_id"]: r for r in image_quality_stats(qimages).collect()}
    assert len(stats) == ROWS
    for i in range(ROWS):
        r = stats[f"qimg{i:09d}"]
        cls = expected_class(i)
        if cls == "undecodable":
            assert not r["ok"] and r["brightness"] is None
            continue
        assert r["ok"] and (r["w"], r["h"]) == (48, 48)
        if i % 13 == 5:  # solid level-3: zero variance, all-min
            assert r["contrast"] == 0.0 and abs(r["brightness"] - 3.0) < 1e-9
            assert r["min_px"] == r["max_px"] == 3
            assert r["saturated_frac"] == 0.0
        elif i % 17 == 7:  # solid white: zero variance, fully saturated
            assert r["contrast"] == 0.0 and r["brightness"] == 255.0
            assert r["saturated_frac"] == 1.0
        elif i % 19 == 3:  # binary 0/255 noise: max saturation, huge contrast
            assert r["saturated_frac"] == 1.0
            assert r["contrast"] > 100
        else:  # noise (possibly brightness-shifted): mid stats, unsaturated
            assert 90 < r["brightness"] < 200
            assert r["contrast"] > 10
            assert r["saturated_frac"] < 0.1


def test_quality_stats_passthrough_columns(spark, qimages):
    out = image_quality_stats(qimages, passthrough=("partition_id", "fmt"))
    # the kernel echoes its own decoded fmt AND the passthrough fmt column:
    # passthrough names must not collide, so pick distinct ones in real use —
    # here rename to prove arbitrary extra columns survive the Arrow kernel
    out2 = image_quality_stats(
        qimages.withColumnRenamed("fmt", "fmt_col"),
        passthrough=("partition_id", "fmt_col"),
    )
    rows = out2.where("ok").limit(5).collect()
    assert all(r["partition_id"] is not None and r["fmt_col"] in ("png", "jpeg", "webp") for r in rows)
    assert "partition_id" in out.columns


def test_degenerate_classes_match_plant_exactly(spark, qimages):
    got = {
        r["image_id"]: r["class"]
        for r in degenerate_image_violations(qimages).collect()
    }
    want = {
        f"qimg{i:09d}": expected_class(i)
        for i in range(ROWS)
        if expected_class(i) is not None
    }
    assert got == want


def test_degenerate_violation_row_shape(spark, qimages):
    row = degenerate_image_violations(qimages).orderBy("image_id").first()
    assert row["rule_id"] == "degenerate_image"
    assert row["kind"] == KIND_DEGENERATE
    assert row["expected"] and row["actual"]


def test_degenerate_param_guards(spark, qimages):
    with pytest.raises(SchemaError, match="contrast_floor"):
        degenerate_image_violations(qimages, contrast_floor=-1.0)
    with pytest.raises(SchemaError, match="saturated_ceiling"):
        degenerate_image_violations(qimages, saturated_ceiling=0.0)
    with pytest.raises(SchemaError, match="saturated_ceiling"):
        degenerate_image_violations(qimages, saturated_ceiling=1.5)


def test_quality_stats_plan_map_only(spark, qimages):
    """The decode pass must stay a shuffle-free map: classification happens
    on the stats frame, never forcing a pre-aggregation of pixel data."""
    plan = image_quality_stats(qimages)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_brightness_drift_probe_partition(spark, qimages):
    """Partition P-1 plants a clip-free brightness shift (~+64): the stats
    frame must expose it as a per-partition mean gap — the decode-once input
    a DriftRule sweep consumes."""
    stats = image_quality_stats(qimages, passthrough=("partition_id",))
    means = (
        stats.where("ok AND contrast > 10 AND saturated_frac < 0.1")
        .groupBy("partition_id")
        .agg(F.avg("brightness").alias("b"))
        .collect()
    )
    by_pid = {r["partition_id"]: r["b"] for r in means}
    shifted = by_pid.pop(N_PARTS - 1)
    assert shifted > 175
    assert all(110 < v < 145 for v in by_pid.values())
