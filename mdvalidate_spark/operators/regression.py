"""Cross-run metric regression: compare THIS run's metrics against a
baseline run's metrics table and emit violation rows where a metric moved
beyond tolerance — validation over TIME, not just over data.

A single run's stats (count, null_rate, distinct, quantiles, entropy, …)
say whether the table satisfies its contract today; production data breaks
more often by DRIFTING — yesterday's ingest had 10^9 rows and today's has
10^7, a null_rate crept from 0.001 to 0.2, the distinct cardinality of a
join key collapsed. The reference engine re-validates files as they change
(watch mode, cmd.rs); the analog for a metrics-producing validator is
comparing successive runs' metric tables. Every ``ValidationRun`` already
persists its metrics to the results sink, so the baseline is one read away:

    prev = read_table(spark, "iceberg:warehouse.validation_metrics")
    prev = prev.where(F.col("run_id") == last_good_run)
    regressions = compare_metric_runs(report.metrics, prev, rel_tol=0.1)

Scale: metric tables are O(rules × metrics) rows — KBs at any data scale —
so the full-outer join here is trivial by construction; the expensive part
(producing the metrics) already happened inside the runs being compared.

Output shape: (rule_id, metric, baseline_value, current_value, delta,
rel_delta, baseline_str, current_str, kind) with kind ∈
{regressed, appeared, disappeared, changed}.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OUT_DDL = (
    "rule_id string, metric string, baseline_value double, "
    "current_value double, delta double, rel_delta double, "
    "baseline_str string, current_str string, kind string"
)


def compare_metric_runs(
    current: DataFrame,
    baseline: DataFrame,
    rel_tol: float = 0.1,
    abs_tol: float = 0.0,
    tolerances: dict[str, float] | None = None,
    metrics: tuple[str, ...] = (),
    check_strings: bool = True,
    check_presence: bool = True,
) -> DataFrame:
    """Compare two metric frames (the long shape every stats/profile
    operator emits: rule_id, metric, value, value_str; a ``partition_id``
    column, if present, is filtered to the global NULL rows).

    - numeric metrics: violation (kind ``regressed``) when
      |cur − base| > max(abs_tol, tol·|base|), where tol is
      ``tolerances[metric]`` if given else ``rel_tol``. A baseline of 0
      makes the relative term vacuous — ``abs_tol`` governs.
    - string metrics (value NULL, value_str set — min/max of string
      columns): kind ``changed`` on inequality, if ``check_strings``.
    - presence: a (rule_id, metric) present on one side only becomes
      ``appeared`` / ``disappeared``, if ``check_presence`` — a rule
      silently dropped from the spec is itself a regression.
    - ``metrics`` restricts the comparison to the named metrics.

    rel_delta is (cur − base)/|base| (NULL when base = 0); delta is
    cur − base. Both sides' raw values ride along for triage.
    """
    tolerances = tolerances or {}

    def _side(df: DataFrame, tag: str) -> DataFrame:
        if "partition_id" in df.columns:
            df = df.where(F.col("partition_id").isNull())
        if metrics:
            df = df.where(F.col("metric").isin(list(metrics)))
        return df.select(
            "rule_id",
            "metric",
            F.col("value").alias(f"{tag}_value"),
            F.col("value_str").alias(f"{tag}_str"),
            F.lit(True).alias(f"{tag}_present"),
        )

    cur = _side(current, "current")
    base = _side(baseline, "baseline")
    j = base.join(cur, ["rule_id", "metric"], "full_outer")

    bv, cv = F.col("baseline_value"), F.col("current_value")
    tol_expr = F.lit(float(rel_tol))
    for m, t in tolerances.items():
        tol_expr = F.when(F.col("metric") == m, F.lit(float(t))).otherwise(tol_expr)
    bound = F.greatest(F.lit(float(abs_tol)), tol_expr * F.abs(bv))
    delta = cv - bv
    numeric = bv.isNotNull() & cv.isNotNull()
    strings = (
        F.col("baseline_str").isNotNull()
        & F.col("current_str").isNotNull()
        & bv.isNull()
        & cv.isNull()
    )
    kind = (
        F.when(F.col("baseline_present").isNull(), F.lit("appeared"))
        .when(F.col("current_present").isNull(), F.lit("disappeared"))
        .when(numeric & (F.abs(delta) > bound), F.lit("regressed"))
        .when(
            strings & (F.col("baseline_str") != F.col("current_str")),
            F.lit("changed") if check_strings else F.lit(None),
        )
        .otherwise(F.lit(None))
    )
    out = j.withColumn("kind", kind).where(F.col("kind").isNotNull())
    if not check_presence:
        out = out.where(~F.col("kind").isin(["appeared", "disappeared"]))
    return out.select(
        "rule_id",
        "metric",
        bv.alias("baseline_value"),
        cv.alias("current_value"),
        delta.alias("delta"),
        F.when(F.abs(bv) > 0, delta / F.abs(bv)).alias("rel_delta"),
        "baseline_str",
        "current_str",
        "kind",
    )


def diff_violations(
    current: DataFrame,
    baseline: DataFrame,
    identity: tuple[str, ...] = ("rule_id", "image_id", "column"),
) -> DataFrame:
    """Violation-SET diff between two runs: which violations are NEW since
    the baseline (acknowledged) run, and which RESOLVED — the ratchet that
    turns a validator into an operational gate. A 10^12-row table almost
    never goes from red to green in one sweep; the deployable contract is
    "no NEW violations since the acked baseline, and here is what got
    fixed".

    ``identity`` defaults to (rule_id, image_id, column): ``actual`` is
    deliberately NOT part of the identity, so the same broken key drifting
    from count=3 to count=4 stays ONE acknowledged violation instead of
    re-alerting every run.

    Output: the full violation rows, plus ``status`` ∈ {new, resolved}
    (resolved rows carry the BASELINE run's values — that is what got
    fixed).

    Plan/scale: two left-anti joins shuffled on the identity key — the
    exact-set-difference minimum. Violation tables are bounded by
    ``max_violations_per_rule`` in the recommended configuration; when
    diffing capped (sampled) sinks the diff is exact ON THE SAMPLES, so ack
    workflows at full exactness should diff uncapped sinks or per-rule
    totals (compare_metric_runs on ``violations_total``)."""
    idc = list(identity)
    new = current.join(
        baseline.select(*idc).dropDuplicates(), on=idc, how="left_anti"
    ).withColumn("status", F.lit("new"))
    resolved = baseline.join(
        current.select(*idc).dropDuplicates(), on=idc, how="left_anti"
    ).withColumn("status", F.lit("resolved"))
    return new.unionByName(resolved)


def anomaly_metric_history(
    history: DataFrame,
    current: DataFrame,
    k: float = 3.0,
    abs_tol: float = 0.0,
    min_runs: int = 3,
    metrics: tuple[str, ...] = (),
    flag_missing_history: bool = False,
) -> DataFrame:
    """Metric anomaly detection against a HISTORY of runs — the rolling
    generalization of :func:`compare_metric_runs` (one acked baseline).

    ``compare_metric_runs`` answers "did this metric move vs the last good
    run"; a pipeline that reruns daily needs "is today's value abnormal for
    this metric's OWN history" — a fixed rel_tol is simultaneously too tight
    for noisy metrics and too loose for stable ones. This gate learns the
    per-(rule_id, metric) scale from the history itself, with robust
    statistics so past incidents don't poison the envelope (one bad run
    shifts a mean/stddev envelope; it barely moves a median/MAD one):

        center = median(value over history runs)
        spread = MAD = median(|value − center|)
        flag when |current − center| > max(abs_tol, k · 1.4826 · MAD)

    1.4826·MAD estimates σ under normality, so ``k`` reads like a z-score.
    A perfectly constant history has MAD = 0 — then ANY deviation beyond
    ``abs_tol`` flags (the tightest honest envelope, not a division blowup;
    ``score`` is NULL there).

    ``history`` is the union of prior runs' metric frames and MUST carry
    ``run_id`` (the results sink already persists it); ``current`` is one
    run's frame. Both use the long metrics shape (rule_id, metric, value,
    value_str); ``partition_id``, if present, is filtered to the global NULL
    rows on both sides. String metrics (value NULL) have no ordering and are
    ``compare_metric_runs``'s job (kind=changed).

    The series identity is (rule_id, metric, value_str): per-GROUP metric
    rows (a sweep rule's psi_stat per source, grouped bounds' summaries)
    carry their group key in ``value_str``, and each group's series gets
    its OWN envelope — pooling them would judge a quiet source against
    every source's spread at once and lose the group attribution. Frames
    without a ``value_str`` column behave as single-series (NULL key).

    (rule_id, metric) groups with fewer than ``min_runs`` history runs are
    not judged; with ``flag_missing_history=True`` they emit a loud
    ``no_history`` row instead of a silent pass (a brand-new metric
    slipping in unjudged is itself a finding).

    Scale: metric frames are O(rules × metrics × runs) rows — KBs at any
    data scale (the 10^12-row work already happened inside the runs), so
    the two exact-median aggregations and the final join are trivial by
    construction; everything is column algebra, no Python, and the output
    is replayable in ANSI SQL (the driver oracle does exactly that).
    """

    def _side(df: DataFrame, keep_run: bool) -> DataFrame:
        if "partition_id" in df.columns:
            df = df.where(F.col("partition_id").isNull())
        if metrics:
            df = df.where(F.col("metric").isin(list(metrics)))
        # NULL-safe series key ("" sentinel) so the group-keyed metric rows
        # join correctly; restored to a real NULL on output
        series = (
            F.coalesce(F.col("value_str").cast("string"), F.lit(""))
            if "value_str" in df.columns
            else F.lit("")
        )
        cols = ["rule_id", "metric", series.alias("series"), "value"]
        if keep_run:
            cols.append(F.col("run_id"))
        return df.select(*cols).where(F.col("value").isNotNull())

    hist = _side(history, keep_run=True)
    cur = _side(current, keep_run=False)
    key = ["rule_id", "metric", "series"]

    centers = hist.groupBy(*key).agg(
        F.expr("percentile(value, 0.5)").alias("center"),
        F.count_distinct("run_id").alias("n_runs"),
    )
    spreads = (
        hist.join(centers, key)
        .groupBy(*key)
        .agg(F.expr("percentile(abs(value - center), 0.5)").alias("spread"))
    )
    stats = centers.join(spreads, key)

    j = cur.join(stats, key, "left")
    dev = F.abs(F.col("value") - F.col("center"))
    sigma = F.lit(1.4826) * F.col("spread")
    bound = F.greatest(F.lit(float(abs_tol)), F.lit(float(k)) * sigma)
    judged = F.col("n_runs").isNotNull() & (F.col("n_runs") >= F.lit(int(min_runs)))
    kind = (
        F.when(~judged, F.lit("no_history" if flag_missing_history else None))
        .when(dev > bound, F.lit("anomalous"))
        .otherwise(F.lit(None))
    )
    return (
        j.withColumn("kind", kind)
        .where(F.col("kind").isNotNull())
        .select(
            "rule_id",
            "metric",
            F.nullif(F.col("series"), F.lit("")).alias("value_str"),
            F.coalesce(F.col("n_runs"), F.lit(0)).alias("n_runs"),
            "center",
            "spread",
            F.col("value").alias("current_value"),
            F.when(judged, bound).alias("bound"),
            F.when(judged & (sigma > 0), dev / sigma).alias("score"),
            "kind",
        )
    )
