"""Pixel-stage validation: Arrow-batched decode + verify.

The reference analog is fenced-code *body* validation (reference:
walkers/validators/code.rs:189-205) — an opaque payload checked by a dedicated
kernel. Here the payload is the image bytes; the kernel runs as mapInPandas
(Iterator[pd.DataFrame] → Iterator[pd.DataFrame]), so bytes cross the
JVM→Python boundary once per Arrow batch, never per row (input_hint mandate).

This is the ONLY stage that reads the `bytes` column; every other stage's scan
is column-pruned away from it (check ReadSchema in .explain — at 100 TB the
difference between scanning bytes and not is the whole game).

Per-image checks, early-exit on first failure (the reference's "one error
once" non-cascade, cmd.rs:368-398):
  1. decodable            → kind=pixel  expected=decodable
  2. container fmt == fmt → kind=pixel  (fmt column lies about the payload)
  3. decoded dims == (w,h)→ kind=pixel
  4. recomputed phash     → kind=pixel  (stamp-derived, quantization-proof)
  5. PSNR vs regenerated reference ≥ psnr_min (lossy) / exact (lossless)

Output is one narrow row per image (ok, fail detail, psnr); the run layer
derives violation rows and per-partition metrics from it in one pass.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import KIND_PIXEL
from ..functions import codec
from ..spec import PixelRule

CHECK_SCHEMA = (
    "partition_id int, image_id string, ok boolean, expected string, "
    "actual string, psnr double"
)


def _check_one(row, psnr_min: float):
    """Returns (ok, expected, actual, psnr)."""
    data = row.bytes
    if data is None:
        return True, None, None, None  # missing payload is NotNullRule's job
    try:
        arr, dfmt, dw, dh = codec.decode(bytes(data))
    except Exception as e:  # noqa: BLE001 - any decode failure is a violation
        return False, "decodable", f"decode error: {type(e).__name__}", None
    if dfmt != row.fmt:
        return False, f"payload fmt {row.fmt}", dfmt, None
    if (dw, dh) != (row.w, row.h):
        return False, f"dims ({row.w}, {row.h})", f"({dw}, {dh})", None
    pid = codec.read_pattern_id(arr)
    if codec.phash_of_pattern(pid) != row.phash:
        return False, f"phash {row.phash}", str(codec.phash_of_pattern(pid)), None
    orig = codec.base_image(pid, dw, dh)
    p = codec.psnr(arr, orig)
    if codec.is_lossless(dfmt):
        if not np.array_equal(arr, orig):
            return False, "exact pixels (lossless)", f"psnr={p:.2f}", p
    elif p < psnr_min:
        return False, f"psnr >= {psnr_min}", f"psnr={p:.2f}", p
    return True, None, None, (None if p == float("inf") else p)


def pixel_check_results(df: DataFrame, rule: PixelRule, key_column: str) -> DataFrame:
    """Decode + verify every image → one result row per image."""
    psnr_min = rule.psnr_min
    cols = df.select(
        F.col("partition_id").cast("int"),
        F.col(key_column).cast("string").alias("image_id"),
        F.col(rule.bytes_column).alias("bytes"),
        F.col(rule.w_column).cast("int").alias("w"),
        F.col(rule.h_column).cast("int").alias("h"),
        F.col(rule.fmt_column).alias("fmt"),
        F.col(rule.phash_column).cast("long").alias("phash"),
    )

    def run_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "partition_id": pdf["partition_id"],
                "image_id": pdf["image_id"],
                "ok": [],
                "expected": [],
                "actual": [],
                "psnr": [],
            }
            for row in pdf.itertuples(index=False):
                ok, exp, act, p = _check_one(row, psnr_min)
                out["ok"].append(ok)
                out["expected"].append(exp)
                out["actual"].append(act)
                out["psnr"].append(p)
            yield pd.DataFrame(out)

    return cols.mapInPandas(run_batches, schema=CHECK_SCHEMA)


def pixel_outputs(
    checks: DataFrame, rule: PixelRule, run_id: str
) -> tuple[DataFrame, DataFrame]:
    """Derive (violations, per-partition metrics) from check results.

    Caller should persist `checks` when both outputs are consumed (the run
    layer does) so images decode exactly once per batch.
    """
    violations = checks.where(~F.col("ok")).select(
        F.lit(run_id).alias("run_id"),
        F.col("partition_id"),
        F.lit(rule.id).alias("rule_id"),
        F.col("image_id"),
        F.lit(rule.bytes_column).alias("column"),
        F.col("expected"),
        F.col("actual"),
        F.lit(KIND_PIXEL).alias("kind"),
    )
    metrics = (
        checks.groupBy("partition_id")
        .agg(
            F.count(F.lit(1)).alias("checked"),
            F.sum(F.when(F.col("ok"), 0).otherwise(1)).alias("failed"),
            F.avg("psnr").alias("avg_psnr"),
        )
        .select(
            F.lit(run_id).alias("run_id"),
            F.col("partition_id"),
            F.explode(
                F.array(
                    F.struct(
                        F.lit("pixel_checked").alias("metric"),
                        F.col("checked").cast("double").alias("value"),
                    ),
                    F.struct(
                        F.lit("pixel_failed").alias("metric"),
                        F.col("failed").cast("double").alias("value"),
                    ),
                    F.struct(
                        F.lit("avg_psnr").alias("metric"),
                        F.col("avg_psnr").cast("double").alias("value"),
                    ),
                )
            ).alias("m"),
        )
        .select(
            "run_id",
            "partition_id",
            F.lit(rule.id).alias("rule_id"),
            F.col("m.metric").alias("metric"),
            F.col("m.value").alias("value"),
            F.lit(None).cast("string").alias("value_str"),
        )
    )
    return violations, metrics
