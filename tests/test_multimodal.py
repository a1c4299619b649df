"""Multimodal plumbing tests: image decode/feature/resize are real (codec);
audio/video are stubs whose Spark-side schema/batching must still be exact."""

import pytest
from pyspark.sql import functions as F

from mdvalidate_spark.operators import multimodal as M
from mdvalidate_spark.sources.synthetic import synthetic_images


@pytest.fixture(scope="module")
def images(spark):
    df = synthetic_images(spark, 60, with_bytes=True).cache()
    df.count()
    yield df
    df.unpersist()


def test_image_features_values(spark, images):
    feats = M.image_features(images).cache()
    ok = feats.where("ok")
    assert ok.count() == 60  # every payload decodes (injections re-encode valid)
    row = ok.first()
    # random uint8 noise → channel means near 127.5, nonzero contrast
    for c in ("mean_r", "mean_g", "mean_b", "brightness"):
        assert 100 < row[c] < 155
    assert row["contrast"] > 10
    # decoded dims echo the container, matching (w,h) for un-injected rows
    joined = feats.join(images.select(F.col("image_id"), F.col("w").alias("tw")), "image_id")
    clean = joined.where((F.col("tw") >= 1) & (F.col("tw") <= 10000))
    assert clean.where(F.col("w") != F.col("tw")).count() == 0
    feats.unpersist()


def test_image_features_bad_payload_row(spark, images):
    bad = images.withColumn(
        "bytes", F.when(F.col("i") == 5, F.lit(b"junk")).otherwise(F.col("bytes"))
    )
    feats = M.image_features(bad)
    nok = feats.where("NOT ok").collect()
    assert len(nok) == 1 and nok[0]["w"] is None


def test_image_resize_roundtrip(spark, images):
    from mdvalidate_spark.functions import codec

    out = M.image_resize(images, 16, 16)
    rows = out.where("ok").limit(3).collect()
    assert len(rows) == 3
    for r in rows:
        arr, fmt, w, h = codec.decode(bytes(r["bytes"]))
        assert (w, h) == (16, 16) and fmt == "png"
        assert (r["w"], r["h"]) == (16, 16)


def test_audio_stub_schema_and_rows(spark, images):
    clips = images.selectExpr("image_id as clip_id", "bytes as audio")
    out = M.audio_features(clips)
    assert [f.name for f in out.schema.fields] == [
        "clip_id", "ok", "n_samples", "sample_rate", "rms",
    ]
    rows = out.collect()
    assert len(rows) == 60 and all(not r["ok"] for r in rows)


def test_video_stub_flatmap_shape(spark, images):
    vids = images.limit(4).selectExpr("image_id as video_id", "bytes as video")
    out = M.video_frame_sample(vids, every_n=10)
    rows = out.collect()
    assert len(rows) == 4
    assert all(r["frame_idx"] == -1 and not r["ok"] for r in rows)


# ------------------------------------------------------- aspect buckets


def test_aspect_buckets_exact_nearest_and_ties(spark):
    from mdvalidate_spark.operators.multimodal import aspect_buckets

    buckets = [(64, 64), (80, 48), (48, 80)]
    df = spark.createDataFrame(
        [
            (1, 100, 100),   # square → bucket 0
            (2, 160, 96),    # exactly 80:48 → bucket 1
            (3, 96, 160),    # exactly 48:80 → bucket 2
            (4, 110, 100),   # slightly landscape, nearest square
        ],
        "image_id long, w int, h int",
    )
    out = {r.image_id: r for r in aspect_buckets(df, "w", "h", buckets).collect()}
    assert out[1].bucket_idx == 0 and out[1].bucket_w == 64
    assert out[2].bucket_idx == 1
    assert out[3].bucket_idx == 2
    assert out[4].bucket_idx == 0


def test_aspect_buckets_tie_goes_to_lowest_index(spark):
    from mdvalidate_spark.operators.multimodal import aspect_buckets

    # aspect 1:1 sits exactly between 5:4 (1.25) and 3:4 (0.75)
    df = spark.createDataFrame([(1, 50, 50)], "image_id long, w int, h int")
    out = aspect_buckets(df, "w", "h", [(5, 4), (3, 4)]).first()
    assert out.bucket_idx == 0


def test_aspect_buckets_matches_bruteforce(spark):
    from fractions import Fraction

    from mdvalidate_spark.operators.multimodal import aspect_buckets

    buckets = [(64, 64), (80, 48), (48, 80), (96, 32), (32, 96)]
    df = spark.range(500).select(
        F.col("id").alias("image_id"),
        (F.col("id") % 97 + 32).cast("int").alias("w"),
        (F.col("id") % 53 + 16).cast("int").alias("h"),
    )
    got = {r.image_id: r.bucket_idx for r in aspect_buckets(df, "w", "h", buckets).collect()}
    for i in range(500):
        w, h = i % 97 + 32, i % 53 + 16
        dists = [abs(Fraction(w, h) - Fraction(bw, bh)) for bw, bh in buckets]
        assert got[i] == dists.index(min(dists)), (i, w, h)


def test_aspect_buckets_null_and_invalid_dims(spark):
    from mdvalidate_spark.operators.multimodal import aspect_buckets

    df = spark.createDataFrame(
        [(1, None, 50), (2, 0, 50), (3, 50, -1), (4, 50, 50)],
        "image_id long, w int, h int",
    )
    out = {r.image_id: r for r in aspect_buckets(df, "w", "h", [(1, 1)]).collect()}
    for i in (1, 2, 3):
        assert out[i].bucket_idx is None and out[i].bucket_w is None
    assert out[4].bucket_idx == 0


def test_aspect_buckets_plan_map_only(spark):
    from mdvalidate_spark.operators.multimodal import aspect_buckets

    df = spark.range(100).select(
        F.col("id").alias("image_id"),
        F.lit(64).alias("w"),
        F.lit(48).alias("h"),
    )
    p = (
        aspect_buckets(df, "w", "h", [(64, 64), (80, 48)])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in p and "Join" not in p and "Python" not in p


def test_aspect_buckets_refusals(spark):
    from mdvalidate_spark.errors import SchemaError
    from mdvalidate_spark.operators.multimodal import aspect_buckets

    df = spark.createDataFrame([(1, 10, 10)], "image_id long, w int, h int")
    import pytest as _pt

    with _pt.raises(SchemaError, match="at least one"):
        aspect_buckets(df, "w", "h", [])
    with _pt.raises(SchemaError, match="positive"):
        aspect_buckets(df, "w", "h", [(0, 64)])


def test_bucketed_resize_end_to_end(spark):
    # the full multi-resolution pipeline: dims → nearest bucket → per-row
    # resize to the bucket, one pass, mixed targets in one batch
    from mdvalidate_spark.functions import codec
    from mdvalidate_spark.operators.multimodal import (
        aspect_buckets,
        image_resize_bucketed,
    )

    import numpy as np

    buckets = [(16, 16), (24, 12), (12, 24)]
    rows = []
    for i, (w, h) in enumerate([(30, 31), (50, 24), (13, 29), (16, 16)]):
        arr = np.full((h, w, 3), (i * 40) % 255, dtype=np.uint8)
        rows.append((str(i), codec.encode(arr, "png"), w, h))
    df = spark.createDataFrame(rows, "image_id string, bytes binary, w int, h int")

    bucketed = aspect_buckets(df, "w", "h", buckets)
    out = image_resize_bucketed(bucketed)
    got = {r.image_id: r for r in out.collect()}
    exp = {r.image_id: (r.bucket_w, r.bucket_h) for r in bucketed.collect()}
    assert all(g.ok for g in got.values())
    for iid, (bw, bh) in exp.items():
        assert (got[iid].w, got[iid].h) == (bw, bh)
        arr, _, w, h = codec.decode(bytes(got[iid].bytes))
        assert (w, h) == (bw, bh)


def test_bucketed_resize_null_targets_yield_not_ok(spark):
    from mdvalidate_spark.operators.multimodal import image_resize_bucketed

    df = spark.createDataFrame(
        [("a", bytearray(b"junk"), None, None)],
        "image_id string, bytes binary, bucket_w int, bucket_h int",
    )
    r = image_resize_bucketed(df).first()
    assert r.ok is False and r.bytes is None


def test_aspect_buckets_scales_to_real_bucket_lists(spark):
    # regression: the chained-when fold grew the Catalyst tree ~3^n and
    # OOM'd the driver at ~10 buckets; the aggregate() fold is linear —
    # a real SDXL-sized list (40 buckets) must both build and be correct
    from fractions import Fraction

    from mdvalidate_spark.operators.multimodal import aspect_buckets

    buckets = [(64 + 8 * i, 64 + 8 * ((i * 7) % 13)) for i in range(40)]
    df = spark.range(200).select(
        F.col("id").alias("image_id"),
        (F.col("id") % 89 + 40).cast("int").alias("w"),
        (F.col("id") % 47 + 24).cast("int").alias("h"),
    )
    got = {r.image_id: r.bucket_idx for r in aspect_buckets(df, "w", "h", buckets).collect()}
    for i in range(200):
        w, h = i % 89 + 40, i % 47 + 24
        dists = [abs(Fraction(w, h) - Fraction(bw, bh)) for bw, bh in buckets]
        assert got[i] == dists.index(min(dists)), (i, w, h)


# ------------------------------------------------ signature bit balance


def test_bit_balance_exact_counts(spark):
    from mdvalidate_spark.operators.multimodal import signature_bit_balance

    # 0b0110 (=6), 0b0011 (=3), -1 (all 64 bits set), NULL (excluded)
    df = spark.createDataFrame(
        [(6,), (3,), (-1,), (None,)], "phash long"
    )
    prof = {r["bit"]: r for r in signature_bit_balance(df, bits=4).collect()}
    assert set(prof) == {0, 1, 2, 3}
    assert all(r["rows"] == 3 for r in prof.values())
    # bit0: 6->0, 3->1, -1->1 = 2; bit1: 1+1+1=3; bit2: 1+0+1=2; bit3: 0+0+1=1
    assert [prof[i]["ones"] for i in range(4)] == [2, 3, 2, 1]
    assert prof[1]["ones_rate"] == 1.0 and prof[1]["deviation"] == 0.5
    assert prof[3]["ones_rate"] == pytest.approx(0.333333)


def test_bit_balance_negative_top_bit_and_plan(spark):
    from mdvalidate_spark.operators.multimodal import signature_bit_balance

    df = spark.createDataFrame([(-1,), (1,)], "phash long")
    prof = {r["bit"]: r for r in signature_bit_balance(df).collect()}
    assert len(prof) == 64
    assert prof[63]["ones"] == 1  # arithmetic shift: sign bit of -1
    assert prof[0]["ones"] == 2
    plan = (
        signature_bit_balance(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one global aggregation, no window/join/Python on the path
    assert "collect_set" not in plan and "BatchEvalPython" not in plan


def test_bit_violations_stuck_and_empty_loud(spark):
    from mdvalidate_spark.operators.multimodal import (
        signature_bit_violations,
    )

    import random

    rnd = random.Random(3)
    # healthy 6-bit random signatures, but bit 2 forced to 0 (stuck)
    rows = [(rnd.getrandbits(6) & ~4,) for _ in range(400)]
    df = spark.createDataFrame(rows, "phash long")
    bad = signature_bit_violations(df, bits=6, max_deviation=0.2).collect()
    assert [r["bit"] for r in bad] == [2] and bad[0]["ones"] == 0
    # empty scope: every bit alerts with NULL rate (loud, not a silent pass)
    empty = spark.createDataFrame([], "phash long")
    out = signature_bit_violations(empty, bits=6, max_deviation=0.2).collect()
    assert len(out) == 6
    assert all(r["ones_rate"] is None and r["rows"] == 0 for r in out)
    with pytest.raises(ValueError):
        signature_bit_violations(df, max_deviation=0.5)
