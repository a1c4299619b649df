"""Key-skew diagnostics: heavy hitters and skew statistics for a column.

North-rule context: the engine HANDLES phash-hotspot skew (salted two-phase
uniqueness, AQE skew joins) — this module DETECTS it, so a pipeline can
flag a shard whose key distribution would melt a downstream join before
that join runs at 10^12 rows.

Scale shape:
- ``top_keys`` — exact top-k by frequency: groupBy(key).count() is one
  shuffle with map-side combine (partial_count), and the global top-k goes
  through TakeOrdered (orderBy+limit fuses to TakeOrderedAndProject — a
  per-partition heap + driver merge of k·P candidates, never a full sort
  shuffle).
- ``skew_stats`` — scalar skew profile in the same aggregation family:
  total rows, distinct keys (HLL), top-1 share, and the p50/p99 frequency
  quantiles of the per-key count distribution (how hot the hot keys are
  relative to the median key).
- ``cms_depth/width`` pytest cross-check lives in tests: count_min_sketch
  estimates upper-bound the exact counts — the sketch is the streaming/
  mergeable variant of this diagnostic when a second pass is too expensive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def top_keys(df: DataFrame, column: str, k: int = 10) -> DataFrame:
    """Exact k most frequent values of ``column`` (count desc, value asc —
    total order, so results are deterministic under ties)."""
    return (
        df.where(F.col(column).isNotNull())
        .groupBy(F.col(column).alias("key"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("key").asc())
        .limit(k)
    )


def skew_stats(df: DataFrame, column: str, exact: bool = False) -> DataFrame:
    """One-row skew profile of ``column``'s key distribution:
    rows, distinct keys, max/median/p99 per-key frequency, top-1 share.
    Two aggregations total (per-key counts → distribution scalars). The
    frequency quantiles default to the approx_percentile sketch (the count
    frame has one row PER DISTINCT KEY — exact percentile over 10^9 keys
    is a sort); ``exact=True`` for fixture-scale oracle parity."""
    counts = (
        df.where(F.col(column).isNotNull())
        .groupBy(column)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pq = (
        (lambda q: F.expr(f"percentile(n, {q})"))
        if exact
        else (lambda q: F.expr(f"approx_percentile(n, {q}, 10000)").cast("double"))
    )
    return counts.agg(
        F.sum("n").cast("double").alias("rows"),
        F.count(F.lit(1)).cast("double").alias("distinct_keys"),
        F.max("n").cast("double").alias("max_freq"),
        pq(0.5).alias("p50_freq"),
        pq(0.99).alias("p99_freq"),
    ).select(
        "rows",
        "distinct_keys",
        "max_freq",
        "p50_freq",
        "p99_freq",
        (F.col("max_freq") / F.col("rows")).alias("top1_share"),
        (F.col("p99_freq") / F.col("p50_freq")).alias("p99_to_median"),
    )
