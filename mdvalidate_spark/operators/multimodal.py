"""Multimodal column operators: decode / feature-extract / resize /
frame-sample over opaque binary payloads with typed metadata.

Architecture: image/audio/video payloads are opaque `binary` columns; all
pixel/sample-touching work runs as Arrow-batched `mapInPandas` stages with
explicit output StructTypes — the Spark-side plumbing (schema, partitioning,
UDF signature, batch shape) is real and tested. The image path decodes with
the repo's deterministic codec (functions/codec.py); audio/video decoding
needs libs absent from this container, so those kernels are STUBBED behind
NotImplementedError with the full plumbing in place — swap the marked inner
function for a real decoder and nothing else changes.

Reference lineage: the fenced-code-block body capture (reference:
walkers/validators/code.rs:189-205) — opaque payload, typed metadata
(info-string ≙ fmt column), dedicated kernel.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import codec
from .pixel import degenerate_class_exprs, quality_stats

IMAGE_FEATURES_SCHEMA = (
    "image_id string, ok boolean, w int, h int, fmt string, "
    "mean_r double, mean_g double, mean_b double, brightness double, contrast double"
)


def image_features(
    df: DataFrame, bytes_col: str = "bytes", id_col: str = "image_id"
) -> DataFrame:
    """Decode images and emit per-channel statistics — the feature-extraction
    stage of a multimodal pipeline. Vectorized batch decode; undecodable
    payloads yield ok=false rows rather than failing the task."""
    cols = df.select(F.col(id_col).cast("string").alias("image_id"), F.col(bytes_col).alias("b"))

    def extract(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for iid, data in zip(pdf["image_id"], pdf["b"]):
                try:
                    arr, fmt, w, h = codec.decode(bytes(data))
                except Exception:
                    rows.append((iid, False, None, None, None, None, None, None, None, None))
                    continue
                f = arr.astype(np.float64)
                means = f.mean(axis=(0, 1))
                rows.append(
                    (
                        iid, True, w, h, fmt,
                        float(means[0]), float(means[1]), float(means[2]),
                        float(f.mean()), float(f.std()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "ok", "w", "h", "fmt",
                    "mean_r", "mean_g", "mean_b", "brightness", "contrast",
                ],
            )

    return cols.mapInPandas(extract, schema=IMAGE_FEATURES_SCHEMA)


RESIZE_SCHEMA = "image_id string, ok boolean, bytes binary, w int, h int"


def image_resize(
    df: DataFrame,
    target_w: int,
    target_h: int,
    bytes_col: str = "bytes",
    id_col: str = "image_id",
    fmt: str = "png",
) -> DataFrame:
    """Deterministic nearest-neighbor resize, re-encoded with the codec —
    the thumbnail/normalize stage. One kernel serves both this fixed-target
    form and the per-row bucketed form: this delegates to
    ``image_resize_bucketed`` with the target inlined as literal columns,
    so the resize math and error rows can never diverge between the two."""
    return image_resize_bucketed(
        df.withColumn("__tw", F.lit(int(target_w))).withColumn(
            "__th", F.lit(int(target_h))
        ),
        bytes_col=bytes_col,
        id_col=id_col,
        w_col="__tw",
        h_col="__th",
        fmt=fmt,
    )


def image_resize_bucketed(
    df: DataFrame,
    bytes_col: str = "bytes",
    id_col: str = "image_id",
    w_col: str = "bucket_w",
    h_col: str = "bucket_h",
    fmt: str = "png",
) -> DataFrame:
    """Multi-resolution resize: each image resized to ITS OWN target dims
    from ``w_col``/``h_col`` — the stage after ``aspect_buckets`` assigns
    them, so a whole corpus normalizes to its bucket set in one pass
    instead of one job per bucket. Same Arrow kernel shape as
    ``image_resize``; rows with NULL/invalid targets (unbucketable dims
    upstream) yield ok=false rather than failing the task. Output keeps
    the bucket dims columns so the writer can partition by bucket — the
    layout a bucketed training loader reads back without shuffling."""
    cols = df.select(
        F.col(id_col).cast("string").alias("image_id"),
        F.col(bytes_col).alias("b"),
        F.col(w_col).cast("int").alias("tw"),
        F.col(h_col).cast("int").alias("th"),
    )

    def resize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for iid, data, tw, th in zip(
                pdf["image_id"], pdf["b"], pdf["tw"], pdf["th"]
            ):
                if pd.isna(tw) or pd.isna(th) or tw <= 0 or th <= 0:
                    rows.append((iid, False, None, None, None))
                    continue
                tw, th = int(tw), int(th)
                try:
                    arr, _, w, h = codec.decode(bytes(data))
                    yi = (np.arange(th) * h // th).clip(0, h - 1)
                    xi = (np.arange(tw) * w // tw).clip(0, w - 1)
                    out = arr[yi][:, xi]
                    rows.append((iid, True, codec.encode(out, fmt), tw, th))
                except Exception:
                    rows.append((iid, False, None, None, None))
            yield pd.DataFrame(
                rows, columns=["image_id", "ok", "bytes", "w", "h"]
            )

    return cols.mapInPandas(resize, schema=RESIZE_SCHEMA)


AUDIO_FEATURES_SCHEMA = (
    "clip_id string, ok boolean, n_samples long, sample_rate int, rms double"
)


def audio_features(
    df: DataFrame, bytes_col: str = "audio", id_col: str = "clip_id"
) -> DataFrame:
    """Audio feature extraction — STUB: the container has no audio codec
    libraries. The mapInPandas plumbing (schema, batching, null handling) is
    real; the inner decode raises NotImplementedError. Replace `_decode_audio`
    with e.g. soundfile/librosa and the stage works unchanged."""
    cols = df.select(F.col(id_col).cast("string").alias("clip_id"), F.col(bytes_col).alias("b"))

    def _decode_audio(data: bytes):
        raise NotImplementedError(
            "audio decode requires an audio library not present in this environment"
        )

    def extract(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for cid, data in zip(pdf["clip_id"], pdf["b"]):
                try:
                    samples, rate = _decode_audio(bytes(data))
                    rms = float(np.sqrt(np.mean(np.square(samples))))
                    rows.append((cid, True, len(samples), rate, rms))
                except NotImplementedError:
                    rows.append((cid, False, None, None, None))
            yield pd.DataFrame(
                rows, columns=["clip_id", "ok", "n_samples", "sample_rate", "rms"]
            )

    return cols.mapInPandas(extract, schema=AUDIO_FEATURES_SCHEMA)


FRAME_SAMPLE_SCHEMA = "video_id string, frame_idx int, ok boolean, frame binary"


def video_frame_sample(
    df: DataFrame,
    every_n: int = 30,
    bytes_col: str = "video",
    id_col: str = "video_id",
) -> DataFrame:
    """Frame sampling — STUB for the same reason (no video codecs here); one
    output row per sampled frame (a flat-map shape: mapInPandas yielding more
    rows than input). Replace `_iter_frames` with e.g. PyAV."""
    cols = df.select(F.col(id_col).cast("string").alias("video_id"), F.col(bytes_col).alias("b"))

    def _iter_frames(data: bytes):
        raise NotImplementedError(
            "video decode requires a video library not present in this environment"
        )

    def sample(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for vid, data in zip(pdf["video_id"], pdf["b"]):
                try:
                    for idx, frame in enumerate(_iter_frames(bytes(data))):
                        if idx % every_n == 0:
                            rows.append((vid, idx, True, frame))
                except NotImplementedError:
                    rows.append((vid, -1, False, None))
            yield pd.DataFrame(rows, columns=["video_id", "frame_idx", "ok", "frame"])

    return cols.mapInPandas(sample, schema=FRAME_SAMPLE_SCHEMA)


def aspect_buckets(
    df: DataFrame,
    w_col: str,
    h_col: str,
    buckets,
    *,
    idx_col: str = "bucket_idx",
) -> DataFrame:
    """Multi-resolution training buckets (the SDXL-style bucketing step):
    assign each image the nearest aspect-ratio bucket from a curated
    ``buckets`` list of (bw, bh) pairs, so batches group by bucket and
    tensors stack without padding or distortion.

    Nearest is decided in EXACT integer arithmetic — the candidate
    minimizing |w·bh − bw·h| / (h·bh), compared cross-multiplied so no
    float ever enters (u16 dims × u16 buckets stay far inside int64) —
    ties go to the lowest bucket index. The curated list is inlined as
    literals: a codegen'd comparison fold, map-only, no join, no shuffle,
    no UDF. Rows with NULL/non-positive dims get a NULL bucket (a
    RangeRule/NotNullRule owns rejecting them).

    Returns df + (idx_col, bucket_w, bucket_h)."""
    from ..errors import SchemaError

    buckets = [(int(bw), int(bh)) for bw, bh in buckets]
    if not buckets:
        raise SchemaError("aspect_buckets needs at least one (bw, bh) bucket")
    for bw, bh in buckets:
        if bw <= 0 or bh <= 0:
            raise SchemaError(f"bucket dims must be positive, got ({bw}, {bh})")

    w = F.col(w_col).cast("long")
    h = F.col(h_col).cast("long")

    def num(i):
        bw, bh = buckets[i]
        return F.abs(w * F.lit(bh) - F.lit(bw) * h)

    # linear-size fold: an aggregate() over (num, bh, idx) structs keeps the
    # Catalyst tree O(n_buckets) — a chained when() fold triples the tree per
    # bucket (~3^n nodes) and OOMs the driver at ~10 buckets, far below real
    # SDXL bucket lists (20-40). Comparison stays exact cross-multiplied
    # int64; strict < keeps the earlier index on ties.
    items = F.array(
        *[
            F.struct(
                num(i).alias("n"),
                F.lit(buckets[i][1]).cast("long").alias("b"),
                F.lit(i).alias("i"),
            )
            for i in range(len(buckets))
        ]
    )
    if len(buckets) == 1:
        best = F.element_at(items, 1)
    else:
        best = F.aggregate(
            F.slice(items, 2, len(buckets) - 1),
            F.element_at(items, 1),
            lambda acc, x: F.when(
                x["n"] * acc["b"] < acc["n"] * x["b"], x
            ).otherwise(acc),
        )
    best_i = best["i"]

    valid = w.isNotNull() & h.isNotNull() & (w > 0) & (h > 0)
    idx = F.when(valid, best_i)
    bws = F.array(*[F.lit(bw) for bw, _ in buckets])
    bhs = F.array(*[F.lit(bh) for _, bh in buckets])
    # explicit when(): constant folding of a literal single-bucket array
    # can otherwise short-circuit element_at past the NULL index
    return (
        df.withColumn(idx_col, idx)
        .withColumn(
            "bucket_w",
            F.when(valid, F.element_at(bws, best_i + 1)),
        )
        .withColumn(
            "bucket_h",
            F.when(valid, F.element_at(bhs, best_i + 1)),
        )
    )


# ------------------------------------------------ signature bit balance


def signature_bit_balance(
    df: DataFrame,
    sig_col: str = "phash",
    bits: int = 64,
) -> DataFrame:
    """Per-bit ones-rate of an integer signature column — the corpus-health
    audit for phash-like signatures (north star: "uniqueness checks on
    image_id and phash"): over a diverse image corpus every phash bit should
    sit near 50% ones. A bit stuck at 0/1 means a broken hasher build or a
    truncated signature pipeline; a strong corpus-wide skew means a
    degenerate corpus (solid-color thumbnails, one template) or mass
    duplication — each invisible to per-image checks and to uniqueness
    (distinct-but-degenerate signatures pass both). The image-axis sibling
    of the Benford / Zipf distribution-shape gates.

    One aggregation pass: ``bits`` conditional sums (``shiftright & 1`` —
    arithmetic shift, identical for negative int64 in Spark and DuckDB)
    plus a non-NULL count, all map-side combined into ONE row, then exploded
    driver-free into the ``bits``-row profile. No shuffle beyond the global
    aggregation's single-partition exchange; NULL signatures are excluded
    from the denominator (NotNullRule owns them). Empty scope yields NULL
    rates — loud, never a fake 0.5.

    Output: (bit, ones, rows, ones_rate, deviation) with rate/deviation
    rounded to 6 dp (the engine↔oracle parity convention)."""
    if not 1 <= bits <= 64:
        raise ValueError(f"signature_bit_balance: bits must be in [1, 64], got {bits}")
    s = F.col(sig_col)
    aggs = [F.count(s).alias("__rows")] + [
        F.sum(F.shiftright(s, i).bitwiseAND(F.lit(1))).alias(f"__b{i}")
        for i in range(bits)
    ]
    one = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(i).alias("bit"),
                F.coalesce(F.col(f"__b{i}"), F.lit(0)).cast("long").alias("ones"),
            )
            for i in range(bits)
        ]
    )
    rate = F.when(
        F.col("rows") > 0, F.round(F.col("ones") / F.col("rows"), 6)
    )
    return (
        one.select(
            F.explode(entries).alias("__e"), F.col("__rows").alias("rows")
        )
        .select(
            F.col("__e.bit").alias("bit"),
            F.col("__e.ones").alias("ones"),
            "rows",
        )
        .select(
            "bit",
            "ones",
            "rows",
            rate.alias("ones_rate"),
            F.round(F.abs(rate - F.lit(0.5)), 6).alias("deviation"),
        )
    )


def signature_bit_violations(
    df: DataFrame,
    sig_col: str = "phash",
    bits: int = 64,
    max_deviation: float = 0.2,
) -> DataFrame:
    """Gate form: the profile rows whose deviation exceeds
    ``max_deviation`` — plus, loudly, every bit when the scope was empty
    (NULL rate must alert, not silently pass: an all-NULL signature column
    is the worst version of the failure this audit exists to catch)."""
    if not 0 <= max_deviation < 0.5:
        raise ValueError(
            "signature_bit_violations: max_deviation must be in [0, 0.5), "
            f"got {max_deviation}"
        )
    prof = signature_bit_balance(df, sig_col, bits)
    return prof.where(
        F.col("deviation").isNull() | (F.col("deviation") > max_deviation)
    )


# ------------------------------------------------ image quality / degeneracy


IMAGE_QUALITY_SCHEMA_BASE = (
    "image_id string, ok boolean, w int, h int, fmt string, "
    "brightness double, contrast double, min_px int, max_px int, "
    "saturated_frac double, channel_diff double"
)


def image_quality_stats(
    df: DataFrame,
    bytes_col: str = "bytes",
    id_col: str = "image_id",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Per-image pixel-space quality statistics — the decode-once input to
    blank-image detection and pixel-stat drift: brightness (global mean),
    contrast (global std), min/max pixel level, and saturated_frac (share of
    samples pinned at 0 or 255). Undecodable payloads yield ok=false rows
    with NULL stats rather than failing the task (the classification layer
    owns reporting them).

    ``passthrough`` carries extra columns (e.g. partition_id) through the
    kernel unchanged so the stats frame can feed DriftRule sweeps without a
    join back to the source.

    Scale shape: one Arrow-batched mapInPandas pass, partition-parallel, no
    shuffle; per-image work is vectorized numpy over the decoded array and
    the output is a few doubles per image — the 100 TB corpus reduces to a
    stats table ~10^5x smaller before any aggregation runs. Reference
    analog: the fenced-code body kernel (walkers/validators/code.rs:189-205)
    — opaque payload, dedicated vectorized kernel, typed verdict columns."""
    passthrough = tuple(passthrough)
    sel = [
        F.col(id_col).cast("string").alias("image_id"),
        F.col(bytes_col).alias("b"),
    ] + [F.col(c) for c in passthrough]
    cols = df.select(*sel)
    pass_schema = "".join(
        f", {f.name} {f.dataType.simpleString()}"
        for f in cols.schema.fields[2:]
    )
    out_cols = [
        "image_id", "ok", "w", "h", "fmt",
        "brightness", "contrast", "min_px", "max_px", "saturated_frac",
        "channel_diff",
    ] + list(passthrough)

    def extract(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            extras = [pdf[c] for c in passthrough]
            for iid, data, *rest in zip(pdf["image_id"], pdf["b"], *extras):
                if data is None:
                    # missing payload is NotNullRule's job: ok stays NULL so
                    # the degenerate classifier skips it — same contract as
                    # the spec-rule form (pixel.py _check_one /
                    # quality_only_results), keeping the two surfaces in
                    # verdict parity on identical input
                    rows.append(
                        (iid, None, None, None, None,
                         None, None, None, None, None, None, *rest)
                    )
                    continue
                try:
                    arr, fmt, w, h = codec.decode(data)
                except Exception:
                    rows.append(
                        (iid, False, None, None, None,
                         None, None, None, None, None, None, *rest)
                    )
                    continue
                b, c, sat, cd = quality_stats(arr)  # shared with pixel stage
                rows.append(
                    (
                        iid, True, w, h, fmt,
                        b, c, int(arr.min()), int(arr.max()), sat, cd, *rest,
                    )
                )
            yield pd.DataFrame(rows, columns=out_cols)

    return cols.mapInPandas(
        extract, schema=IMAGE_QUALITY_SCHEMA_BASE + pass_schema
    )


def degenerate_image_violations(
    df: DataFrame,
    bytes_col: str = "bytes",
    id_col: str = "image_id",
    contrast_floor: float = 1.0,
    saturated_ceiling: float = 0.95,
    grayscale_floor: float | None = None,
    rule_id: str = "degenerate_image",
) -> DataFrame:
    """Blank / degenerate image detection: one violation row per image whose
    decoded pixels carry (almost) no signal — the corpus-poisoning rows a
    schema-level validator never sees because their headers, dims, captions
    and even phashes all look healthy. Three classes, checked in order:

      undecodable     payload fails to decode at all
      blank_image     contrast (global std) < ``contrast_floor`` — a solid
                      or near-solid color (covers all-black AND all-white;
                      a solid image has zero variance whatever its level)
      saturated_image ``saturated_frac`` > ``saturated_ceiling`` — nearly
                      every sample pinned at 0/255 (binary clip art, broken
                      tone mapping) while still technically having contrast
      grayscale_image (opt-in: ``grayscale_floor`` is not None) mean
                      inter-channel difference < floor — color collapsed to
                      gray while stored as RGB (a broken conversion stage);
                      off by default because a grayscale corpus is a mix
                      question, not poison

    The decode runs ONCE (image_quality_stats); classification is pure
    column algebra over the tiny stats frame, so the expensive pass stays a
    shuffle-free map and thresholds can be retuned without re-decoding.
    Output shape matches the engine's violation convention:
    (image_id, rule_id, kind, class, expected, actual)."""
    from ..errors import KIND_DEGENERATE, SchemaError

    if contrast_floor < 0:
        raise SchemaError(
            f"degenerate_image_violations: contrast_floor must be >= 0, "
            f"got {contrast_floor}"
        )
    if not 0 < saturated_ceiling <= 1:
        raise SchemaError(
            f"degenerate_image_violations: saturated_ceiling must be in "
            f"(0, 1], got {saturated_ceiling}"
        )
    if grayscale_floor is not None and grayscale_floor < 0:
        raise SchemaError(
            f"degenerate_image_violations: grayscale_floor must be >= 0, "
            f"got {grayscale_floor}"
        )
    stats = image_quality_stats(df, bytes_col=bytes_col, id_col=id_col)
    klass, expected, actual = degenerate_class_exprs(
        "ok", contrast_floor, saturated_ceiling, grayscale_floor
    )
    return (
        stats.where(F.col("ok").isNotNull())
        .withColumn("class", klass)
        .where(F.col("class").isNotNull())
        .select(
            "image_id",
            F.lit(rule_id).alias("rule_id"),
            F.lit(KIND_DEGENERATE).alias("kind"),
            "class",
            expected.alias("expected"),
            actual.alias("actual"),
        )
    )


def quality_drift_sweep(
    df: DataFrame,
    group_col: str,
    metric: str = "brightness",
    bytes_col: str = "bytes",
    id_col: str = "image_id",
    method: str = "psi",
    threshold: float = 0.2,
    n_bins: int = 16,
    run_id: str = "quality_drift",
    contrast_floor: float = 1.0,
    saturated_ceiling: float = 0.95,
):
    """Pixel-stat drift BETWEEN partitions — the north rule's KS/PSI sweep
    applied to a DECODED statistic (brightness / contrast / saturated_frac /
    channel_diff) instead of a stored column: the one-decode
    ``image_quality_stats`` pass reduces the corpus to a few doubles per
    image, then the standard leave-one-out sweep (operators/drift.py
    drift_sweep: bins once from the global distribution, ONE
    groupBy(group, bin) pass) flags the shards whose pixel distribution
    diverged — a re-encoded feed, a tone-mapping regression, a camera white-
    balance drift that every header/metadata check waves through.

    Returns (violations, metrics, n_violations) exactly like
    ``drift_sweep`` (the flagged group is in the violation's image_id slot
    as ``<group_col>=<value>``, matching the sweep convention).
    Cost shape: the decode pass dominates and is shuffle-free; the sweep
    itself runs on the stats frame (10^5x smaller) — retuning the drift
    threshold or bins re-runs only the cheap half.

    ``contrast_floor``/``saturated_ceiling`` define which rows count as
    degenerate and are excluded from the sweep; pass the SAME values your
    DegenerateImageRule uses so the swept "individually fine" population
    matches the run's own degeneracy verdicts (defaults mirror the rule's
    defaults)."""
    from ..errors import SchemaError
    from ..spec import DriftRule
    from .drift import drift_sweep

    allowed = ("brightness", "contrast", "saturated_frac", "channel_diff")
    if metric not in allowed:
        raise SchemaError(
            f"quality_drift_sweep: metric must be one of {allowed}, "
            f"got {metric!r}"
        )
    # re-guard the DegenerateImageRule compile lints these thresholds
    # mirror (the _guard_sampled_key precedent for public operator APIs):
    # out-of-range values silently sweep an empty/meaningless population
    if contrast_floor < 0:
        raise SchemaError(
            f"quality_drift_sweep: contrast_floor must be >= 0, got "
            f"{contrast_floor}"
        )
    if not 0 < saturated_ceiling <= 1:
        raise SchemaError(
            f"quality_drift_sweep: saturated_ceiling must be in (0, 1], "
            f"got {saturated_ceiling}"
        )
    # degenerate rows (blank/saturated extremes, at the CALLER-declared
    # class thresholds) are excluded: they are the degenerate RULE's
    # verdict, and their pinned values would smear the healthy population's
    # histogram tails with cross-partition noise — the sweep judges the
    # distribution of images that are individually fine
    stats = image_quality_stats(
        df, bytes_col=bytes_col, id_col=id_col, passthrough=(group_col,)
    ).where(
        F.col("ok")
        & (F.col("contrast") >= F.lit(float(contrast_floor)))
        & (F.col("saturated_frac") <= F.lit(float(saturated_ceiling)))
    )
    rule = DriftRule(
        f"quality_drift_{metric}",
        column=metric,
        sweep_by=group_col,
        method=method,
        threshold=threshold,
        n_bins=n_bins,
    )
    return drift_sweep(stats, rule, run_id)
