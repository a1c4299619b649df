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
