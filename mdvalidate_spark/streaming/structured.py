"""Structured Streaming validation.

Two surfaces:

1. ``stream_row_violations`` — validate an unbounded stream with the fused
   row-rule pass. Row rules are stateless column predicates, so they apply to
   a streaming DataFrame unchanged (the same codegen'd select); violations
   flow to any streaming sink. This is the true-streaming analog of the
   reference's chunk loop: each micro-batch is a chunk, the sink is the
   accumulated error list.

2. ``windowed_count_rule`` — the `{min,max}` cardinality bound over event-time
   tumbling windows with a watermark for late data (the streaming
   re-expression of CountRule / repeated-matcher bounds,
   reference: containers.rs:316-349). Emits one row per closed window whose
   count left [min, max].

Both keep everything in built-in operators — no Python in the hot path — so
they run identically under `trigger(availableNow=True)` batch-drain (used in
tests) and continuous micro-batches on a cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..compile import ConstraintProgram
from ..operators.row_rules import _check
from ..spec import CountRule


def stream_row_violations(
    stream_df: DataFrame, program: ConstraintProgram, run_id: str
) -> DataFrame:
    """Fused row pass on a streaming DataFrame → streaming violations.

    Same expression tree as the batch executor (operators/row_rules.py); the
    partition id is the micro-batch-stable hash of the key.
    """
    spec = program.spec
    key = F.col(spec.key_column).cast("string")
    checks = [_check(r) for r in program.row_rules]
    return (
        stream_df.withColumn(
            "partition_id",
            F.pmod(F.xxhash64(F.col(spec.key_column)), F.lit(spec.n_partitions)).cast("int"),
        )
        .select(
            F.col("partition_id"),
            key.alias("_key"),
            F.array_compact(F.array(*checks)).alias("_v"),
        )
        .where(F.size("_v") > 0)
        .select(
            F.lit(run_id).alias("run_id"),
            "partition_id",
            F.explode("_v").alias("v"),
            "_key",
        )
        .select(
            "run_id",
            "partition_id",
            F.col("v.rule_id").alias("rule_id"),
            F.col("_key").alias("image_id"),
            F.col("v.column").alias("column"),
            F.col("v.expected").alias("expected"),
            F.col("v.actual").alias("actual"),
            F.col("v.kind").alias("kind"),
        )
    )


def stream_ref_violations(
    stream_df: DataFrame,
    rule,
    dim: DataFrame,
    run_id: str,
    key_column: str,
    n_partitions: int = 8,
) -> DataFrame:
    """Referential integrity on an unbounded stream: a STREAM-STATIC
    broadcast left-anti join — a stateless join shape (no watermark, no
    state store: every micro-batch joins independently against the static
    dimension, which Spark re-reads per batch so a refreshed dim table is
    picked up). Single-column and composite-tuple keys ride the SAME batch
    implementation (operators/ref_rules.py) — the expression tree is
    stateless, so it applies to a streaming frame unchanged; only the
    partition id (micro-batch-stable key hash) is attached here."""
    from ..operators.ref_rules import ref_violations

    with_pid = stream_df.withColumn(
        "partition_id",
        F.pmod(F.xxhash64(F.col(key_column)), F.lit(n_partitions)).cast(
            "int"
        ),
    )
    return ref_violations(with_pid, rule, dim, run_id, key_column)


def windowed_count_rule(
    stream_df: DataFrame,
    rule: CountRule,
    ts_column: str,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    run_id: str = "stream",
) -> DataFrame:
    """Event-time cardinality bound: count per (group, tumbling window) with
    watermarked late-data handling; violations for out-of-bounds windows.

    Output mode must be 'append' downstream — rows emit once the watermark
    closes a window, so each violation is final (no retraction needed).
    """
    group_cols = [F.window(F.col(ts_column), window).alias("win")] + [
        F.col(c) for c in rule.group_by
    ]
    counted = (
        stream_df.withWatermark(ts_column, watermark)
        .groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    conds = []
    if rule.min is not None:
        conds.append(F.col("n") < rule.min)
    if rule.max is not None:
        conds.append(F.col("n") > rule.max)
    fail = conds[0] if len(conds) == 1 else (conds[0] | conds[1]) if conds else F.lit(False)
    key = (
        F.concat_ws("|", F.col("win.start").cast("string"), *[F.col(c) for c in rule.group_by])
        if rule.group_by
        else F.col("win.start").cast("string")
    )
    return counted.where(fail).select(
        F.lit(run_id).alias("run_id"),
        F.lit(None).cast("int").alias("partition_id"),
        F.lit(rule.id).alias("rule_id"),
        key.alias("image_id"),
        F.lit(",".join(rule.group_by) or "window").alias("column"),
        F.lit(f"count in [{rule.min}, {rule.max}]").alias("expected"),
        F.col("n").cast("string").alias("actual"),
        F.lit("count").alias("kind"),
    )


def stream_stats_partials(
    stream_df: DataFrame,
    rules,
    partials_dir: str,
    checkpoint_dir: str,
    run_id: str = "stream",
    trigger: dict | None = None,
):
    """Continuous incremental stats: each micro-batch appends ONE mergeable
    partials row (count / non-null / native min-max / HLL sketch / optional
    KLL quantile sketch — same layout as the batch engine's
    column_stats_partials) keyed by the micro-batch id. The accumulated
    directory merges on demand with ``merged_stream_stats`` in O(#batches),
    so "profile the stream so far" never replays the stream.

    Exactly-once: the write is a dynamic partition overwrite on
    partition_id = batch_id, so a replayed micro-batch (foreachBatch
    replays after failure) overwrites its own partial instead of
    double-counting. Returns the started StreamingQuery."""
    from ..operators.agg_rules import column_stats_partials

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        p = column_stats_partials(
            batch_df.withColumn("partition_id", F.lit(int(batch_id)).cast("int")),
            tuple(rules),
            run_id,
        )
        (
            p.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("partition_id")
            .parquet(partials_dir)
        )

    writer = (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger or {"availableNow": True}))
    )
    return writer.start()


def merged_stream_stats(spark, rules, partials_dir: str, run_id: str = "stream"):
    """Merge everything ``stream_stats_partials`` accumulated so far into
    the standard long metrics rows — O(#micro-batches), no stream replay."""
    from ..operators.agg_rules import column_stats_from_partials

    partials = spark.read.parquet(partials_dir)
    return column_stats_from_partials(partials, tuple(rules), run_id)


def windowed_drift_rule(
    stream_df: DataFrame,
    rule,
    inner_edges: list[float],
    ref_hist: list[float],
    ts_column: str,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    run_id: str = "stream",
) -> DataFrame:
    """Per-window distribution drift vs a FROZEN reference profile (the
    streaming re-expression of DriftRule; profile from
    drift.reference_histogram on reference data).

    Streaming DataFrames allow ONE aggregation, so the histogram is built as
    nb pivoted sum(when(bin==i)) columns in a single watermarked
    groupBy(window) — then PSI (closed form over literals) or KS (cumulative
    sums over literals) is pure column algebra on that row. Append mode: one
    final violation row per closed drifted window, no retraction, no Python.
    """
    import math as _math

    from ..operators.drift import _EPS, _bin_expr

    categorical = getattr(rule, "categorical", False)
    if categorical and rule.method != "psi":
        # same invariant compile_spec enforces for batch rules — this entry
        # point takes rules directly, so it must enforce it itself (KS over
        # nominal categories depends on the arbitrary frequency ranking)
        raise ValueError(f"rule {rule.id!r}: categorical drift requires method='psi'")
    nb = len(inner_edges) + 1
    val = F.expr(rule.expr) if getattr(rule, "expr", None) else F.col(rule.column)
    x = val.cast("string") if categorical else val.cast("double")
    bin_expr = _bin_expr(x, list(inner_edges), categorical)
    counted = (
        stream_df.where(x.isNotNull())
        .withWatermark(ts_column, watermark)
        .groupBy(F.window(F.col(ts_column), window).alias("win"))
        .agg(
            *[
                F.sum(F.when(bin_expr == i, 1).otherwise(0)).alias(f"_b{i}")
                for i in range(nb)
            ]
        )
    )
    total = sum([F.col(f"_b{i}") for i in range(nb)], F.lit(0)).cast("double")
    dens = [F.col(f"_b{i}") / total for i in range(nb)]
    if rule.method == "psi":
        stat = sum(
            [
                (p - F.lit(q)) * (F.log(p + F.lit(_EPS)) - F.lit(_math.log(q + _EPS)))
                for p, q in zip(dens, ref_hist)
            ],
            F.lit(0.0),
        )
    else:  # ks: max abs difference of cumulative densities
        cum_q = 0.0
        terms = []
        cum_p = F.lit(0.0)
        for p, q in zip(dens, ref_hist):
            cum_p = cum_p + p
            cum_q += q
            terms.append(F.abs(cum_p - F.lit(cum_q)))
        stat = F.greatest(*terms) if len(terms) > 1 else terms[0]
    return counted.select(
        F.lit(run_id).alias("run_id"),
        F.lit(None).cast("int").alias("partition_id"),
        F.lit(rule.id).alias("rule_id"),
        F.col("win.start").cast("string").alias("image_id"),
        F.lit(rule.expr or rule.column).alias("column"),
        F.lit(f"{rule.method} <= {rule.threshold}").alias("expected"),
        F.round(stat, 6).cast("string").alias("actual"),
        F.lit("drift").alias("kind"),
    ).where(stat > rule.threshold)


def stream_volume_anomaly(
    spark,
    rule_id: str,
    partials_dir: str,
    k: float = 3.0,
    abs_tol: float = 0.0,
    min_batches: int = 4,
) -> DataFrame:
    """Per-MICRO-BATCH volume anomaly from the partials
    ``stream_stats_partials`` already persisted — the streaming face of
    ``operators.skew.volume_anomaly``: flag micro-batches whose row count
    is abnormal for this stream's own batch-size history (a dead upstream
    shard shows up as a starved batch, a replayed producer as a doubled
    one), in O(#batches) without touching the stream or its source again.

    ``rule_id`` names which ColumnStatsRule's ``__rows`` partial to read —
    any rule registered in the partials works; an unscoped rule counts the
    whole batch. Output shape and envelope semantics are exactly
    ``volume_anomaly``'s (partition = the micro-batch id, MAD envelope,
    kind ∈ {over_volume, under_volume}); ``min_batches`` plays
    ``min_partitions``' role.
    """
    from ..operators.skew import volume_anomaly_from_counts

    counts = spark.read.parquet(partials_dir).select(
        F.col("partition_id").cast("string").alias("partition"),
        F.col(f"{rule_id}__rows").cast("double").alias("n_rows"),
    )
    return volume_anomaly_from_counts(
        counts, k=k, abs_tol=abs_tol, min_partitions=min_batches
    )
