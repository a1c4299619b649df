"""Result-table schemas (FIXTURES.md §3).

violations mirrors the reference's NodeContentMismatch payload
{expected, actual, kind} (errors.rs:332-341) plus row/rule addressing;
metrics is the long-form analog of the matches-JSON capture object
(validator.rs:33-36); manifest is the resume checkpoint, the analog of
NodePosPair (node_pos_pair.rs:4-52).
"""

from __future__ import annotations

from pyspark.sql import types as T

VIOLATIONS_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("rule_id", T.StringType()),
        T.StructField("image_id", T.StringType()),
        T.StructField("column", T.StringType()),
        T.StructField("expected", T.StringType()),
        T.StructField("actual", T.StringType()),
        T.StructField("kind", T.StringType()),
    ]
)

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("rule_id", T.StringType()),
        T.StructField("metric", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("value_str", T.StringType()),
    ]
)

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("status", T.StringType()),
        T.StructField("rows", T.LongType()),
        T.StructField("violations", T.LongType()),
        T.StructField("started_at", T.StringType()),
        T.StructField("finished_at", T.StringType()),
    ]
)

# struct used inside the fused row pass before explode
VIOLATION_STRUCT = T.StructType(
    [
        T.StructField("rule_id", T.StringType()),
        T.StructField("column", T.StringType()),
        T.StructField("expected", T.StringType()),
        T.StructField("actual", T.StringType()),
        T.StructField("kind", T.StringType()),
    ]
)
