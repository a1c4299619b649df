"""Bounded violation output — deterministic per-(rule, partition) sample cap.

The reference materializes EVERY violation (validator.rs:86-93 collects all
errors into the report) — correct for one document, fatal at 10^12 rows
where one pathological rule (say, every caption fails a regex) makes the
violations sink itself web-scale: the results table would receive up to one
row per input row. The engine keeps the reference's EXACT per-rule /
per-partition counts — computed by an aggregation-only pass whose map-side
partials never materialize violation rows anywhere (``violation_count_
metrics``) — and bounds the materialized violation ROWS to a deterministic
sample per (rule_id, partition_id) (``cap_violations``).

Scale shape: the cap uses the same two-phase local-then-global rank as the
similarity top-k (similarity.py:23-90). Phase 1 ranks within
(rule, partition, input split): the shuffle key includes
``spark_partition_id()``, so a hot rule's rows spread over every input
split instead of landing on one reducer, and each group is bounded by its
split's size. Phase 2 ranks only the survivors — at most cap × n_splits
rows per (rule, partition) — to the final cap. Order is total
(image_id, column, kind), so the sample is reproducible run-over-run and
resume-stable: re-validating a partition regenerates the identical rows,
keeping the checkpoint's dynamic-partition overwrite idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: total order over violation rows within one (rule_id, partition_id) group —
#: (image_id, column, kind) is unique per rule for every row-level kind (a
#: rule checks one column and emits at most one row per input row; composite
#: rules emit only the first failing segment).
_ORDER = ("image_id", "column", "kind")

VIOLATIONS_TOTAL = "violations_total"


def cap_violations(viol: DataFrame, cap: int) -> DataFrame:
    """At most ``cap`` violation rows per (rule_id, partition_id),
    deterministically chosen (lowest by image_id, column, kind)."""
    order = [F.col(c).asc_nulls_first() for c in _ORDER]
    w_local = Window.partitionBy("rule_id", "partition_id", "_s").orderBy(*order)
    local = (
        viol.withColumn("_s", F.spark_partition_id())
        .withColumn("_r", F.row_number().over(w_local))
        .where(F.col("_r") <= cap)
        .drop("_r")
    )
    w_global = Window.partitionBy("rule_id", "partition_id").orderBy(*order)
    return (
        local.withColumn("_r", F.row_number().over(w_global))
        .where(F.col("_r") <= cap)
        .drop("_r", "_s")
    )


def violation_count_metrics(viol: DataFrame, run_id: str) -> DataFrame:
    """Exact per-(rule, partition) violation totals as metrics rows
    (metric='violations_total') — the information a row cap would otherwise
    lose. Aggregation-only: map-side count partials, one tiny shuffle, no
    violation row ever materialized to a sink."""
    return (
        viol.groupBy("partition_id", "rule_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit(run_id).alias("run_id"),
            F.col("partition_id").cast("int").alias("partition_id"),
            F.col("rule_id"),
            F.lit(VIOLATIONS_TOTAL).alias("metric"),
            F.col("n").cast("double").alias("value"),
            F.lit(None).cast("string").alias("value_str"),
        )
    )
