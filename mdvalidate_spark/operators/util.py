"""Shared operator utilities."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame


def round6(x: float) -> float:
    """Half-away-from-zero rounding at 6dp — matches Spark F.round and
    DuckDB round(); Python's builtin round() is banker's and flips dyadic
    ties, which hash-mismatches the oracle at the boundary."""
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition a narrow input if it arrives with fewer partitions than the
    cluster can use (e.g. a single small parquet file). Signature-heavy
    operators (minhash/simhash/SRP) are CPU-bound per row, so a one-off round
    robin shuffle is cheap insurance; at real scale inputs arrive with
    thousands of splits and this is a no-op."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
