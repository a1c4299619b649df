"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


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
