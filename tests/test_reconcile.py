"""Snapshot reconciliation: bucket fingerprints, diff, row drill-down.

Covers operators/reconcile.py: fingerprint determinism + order
invariance + mergeability, diff classification (values_changed vs
membership_changed), row-level drill-down statuses (added / removed /
changed incl. duplicate-key multiplicity), the bucket pre-filter paths
(IN-literal and broadcast semi-join), and the schema refusals.
"""

import pytest
from pyspark.sql import functions as F

from mdvalidate_spark.errors import SchemaError
from mdvalidate_spark.operators.reconcile import (
    MAX_BUCKETS,
    fingerprint_diff,
    reconcile_rows,
    table_fingerprint,
)


@pytest.fixture(scope="module")
def snap(spark):
    """old/new snapshot pair with known edits: key 7 value-changed,
    key 13 removed, key 900 added, key 21 duplicated in new."""
    rows = [(i, f"s{i % 5}", i * 10) for i in range(1, 61)]
    old = spark.createDataFrame(rows, "k bigint, status string, v bigint")
    new_rows = [r for r in rows if r[0] != 13]
    new_rows = [
        (k, "MUTATED" if k == 7 else s, v) for (k, s, v) in new_rows
    ]
    new_rows.append((900, "s0", 9000))
    new_rows.append((21, "s1", 210))  # duplicate of existing key 21
    new = spark.createDataFrame(new_rows, "k bigint, status string, v bigint")
    return old, new


def test_fingerprint_deterministic_and_order_invariant(spark, snap):
    old, _ = snap
    a = {r["bucket"]: r for r in table_fingerprint(old, ["k"], n_buckets=8).collect()}
    shuffled = old.orderBy(F.rand(42))
    b = {r["bucket"]: r for r in table_fingerprint(shuffled, ["k"], n_buckets=8).collect()}
    assert set(a) == set(b)
    for bk in a:
        assert a[bk]["n_rows"] == b[bk]["n_rows"]
        assert a[bk]["key_sum"] == b[bk]["key_sum"]
        assert a[bk]["row_sum"] == b[bk]["row_sum"]
    assert sum(r["n_rows"] for r in a.values()) == 60


def test_fingerprint_value_column_order_irrelevant(spark, snap):
    """Physical column order must not change the fingerprint (default
    value set is sorted by name)."""
    old, _ = snap
    perm = old.select("v", "k", "status")
    a = sorted(table_fingerprint(old, ["k"], n_buckets=4).collect())
    b = sorted(table_fingerprint(perm, ["k"], n_buckets=4).collect())
    assert a == b


def test_fingerprint_partials_merge(spark, snap):
    """Partials from two disjoint scans sum to the full-table
    fingerprint — the incremental-manifest contract."""
    old, _ = snap
    lo = old.where("k <= 30")
    hi = old.where("k > 30")
    merged = (
        table_fingerprint(lo, ["k"], n_buckets=8)
        .unionByName(table_fingerprint(hi, ["k"], n_buckets=8))
        .groupBy("bucket")
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("key_sum").cast("decimal(38,0)").alias("key_sum"),
            F.sum("row_sum").cast("decimal(38,0)").alias("row_sum"),
        )
    )
    full = {r["bucket"]: r for r in table_fingerprint(old, ["k"], n_buckets=8).collect()}
    for r in merged.collect():
        f = full[r["bucket"]]
        assert (r["n_rows"], r["key_sum"], r["row_sum"]) == (
            f["n_rows"], f["key_sum"], f["row_sum"],
        )


def test_diff_classification(spark, snap):
    old, new = snap
    n_buckets = 256  # wide enough that the 4 edited keys land apart
    ofp = table_fingerprint(old, ["k"], n_buckets=n_buckets)
    nfp = table_fingerprint(new, ["k"], n_buckets=n_buckets)
    diff = {r["bucket"]: r for r in fingerprint_diff(ofp, nfp).collect()}
    # identical snapshots → empty diff
    assert fingerprint_diff(ofp, ofp).count() == 0
    statuses = sorted(r["status"] for r in diff.values())
    # key 7: value change only → values_changed; keys 13/900/21 edits
    # touch membership (count or key_sum)
    assert "values_changed" in statuses
    assert statuses.count("membership_changed") == 3
    total_old = sum(r["n_old"] for r in diff.values())
    total_new = sum(r["n_new"] for r in diff.values())
    # -1 (removed 13) +1 (added 900) +1 (dup 21) over the changed buckets
    assert total_new - total_old == 1


def test_diff_keep_matches(spark, snap):
    old, new = snap
    ofp = table_fingerprint(old, ["k"], n_buckets=4)
    nfp = table_fingerprint(new, ["k"], n_buckets=4)
    kept = fingerprint_diff(ofp, nfp, keep_matches=True)
    assert kept.count() == 4
    assert set(kept.schema.names) == {"bucket", "status", "n_old", "n_new"}


def test_reconcile_rows_statuses(spark, snap):
    old, new = snap
    out = {r["k"]: r for r in reconcile_rows(old, new, ["k"]).collect()}
    assert set(out) == {7, 13, 900, 21}
    assert out[7]["status"] == "changed"
    assert out[13]["status"] == "removed" and out[13]["n_new"] == 0
    assert out[900]["status"] == "added" and out[900]["n_old"] == 0
    # duplicate key: multiplicity change reports changed, not a pair blowup
    assert out[21]["status"] == "changed"
    assert (out[21]["n_old"], out[21]["n_new"]) == (1, 2)


def test_reconcile_rows_bucket_prefilter_matches_full(spark, snap):
    """Drill-down restricted to the changed buckets finds exactly the
    same rows as the full reconciliation."""
    old, new = snap
    n_buckets = 64
    diff = fingerprint_diff(
        table_fingerprint(old, ["k"], n_buckets=n_buckets),
        table_fingerprint(new, ["k"], n_buckets=n_buckets),
    )
    buckets = [r["bucket"] for r in diff.collect()]
    filtered = sorted(
        (r["k"], r["status"])
        for r in reconcile_rows(
            old, new, ["k"], n_buckets=n_buckets, buckets=buckets
        ).collect()
    )
    full = sorted(
        (r["k"], r["status"]) for r in reconcile_rows(old, new, ["k"]).collect()
    )
    assert filtered == full


def test_reconcile_rows_broadcast_path(spark, snap):
    """>256 bucket ids switches the pre-filter to a broadcast semi-join;
    results are identical to the IN-literal path."""
    old, new = snap
    n_buckets = 1024
    all_buckets = list(range(n_buckets))  # > _IN_LITERAL_BUDGET
    out = sorted(
        (r["k"], r["status"])
        for r in reconcile_rows(
            old, new, ["k"], n_buckets=n_buckets, buckets=all_buckets
        ).collect()
    )
    full = sorted(
        (r["k"], r["status"]) for r in reconcile_rows(old, new, ["k"]).collect()
    )
    assert out == full


def test_null_values_and_null_safety(spark):
    """NULL vs empty-string vs 'NULL' literal are distinct contents; a
    NULL→value flip is detected."""
    old = spark.createDataFrame(
        [(1, None), (2, ""), (3, "NULL")], "k bigint, s string"
    )
    new = spark.createDataFrame(
        [(1, ""), (2, ""), (3, "NULL")], "k bigint, s string"
    )
    out = {r["k"]: r["status"] for r in reconcile_rows(old, new, ["k"]).collect()}
    assert out == {1: "changed"}


def test_refusals(spark, snap):
    old, new = snap
    with pytest.raises(SchemaError, match="non-empty"):
        table_fingerprint(old, [])
    with pytest.raises(SchemaError, match="unknown key"):
        table_fingerprint(old, ["nope"])
    with pytest.raises(SchemaError, match="unknown value"):
        table_fingerprint(old, ["k"], ["nope"])
    with pytest.raises(SchemaError, match="both key and value"):
        table_fingerprint(old, ["k"], ["k"])
    with pytest.raises(SchemaError, match="n_buckets"):
        table_fingerprint(old, ["k"], n_buckets=MAX_BUCKETS + 1)
    with pytest.raises(SchemaError, match="disagree on value columns"):
        reconcile_rows(old, new.withColumnRenamed("v", "w"), ["k"])


def test_fingerprint_plan_is_one_scan_no_python(spark, snap):
    """The fingerprint is a single map-side-combined hash aggregate over
    one scan — no shuffle-heavy surprises, no Python in the plan."""
    old, _ = snap
    plan = table_fingerprint(old, ["k"], n_buckets=8)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert plan.count("HashAggregate") == 2  # partial + final, nothing more


def test_hash_terms_are_decimal38_before_summation(spark, snap):
    """Regression: Spark widens a sum intermediate by only 10 digits of
    precision, so summing decimal(20,0) hash terms overflows to NULL near
    10^30 — within the module's own 10^12-rows-per-bucket envelope — and
    fingerprint_diff's coalesce-to-0 would classify the corrupted bucket
    as a match. The terms must be decimal(38,0) BEFORE the sum."""
    from pyspark.sql.types import DecimalType

    from mdvalidate_spark.operators.reconcile import (
        _enc,
        _h60,
        partition_fingerprint,
    )

    old, _ = snap
    term = old.select(_h60(_enc(["k"])).alias("h")).schema["h"].dataType
    assert term == DecimalType(38, 0)
    fp = table_fingerprint(old, ["k"], n_buckets=4)
    for c in ("key_sum", "row_sum"):
        assert fp.schema[c].dataType == DecimalType(38, 0)
    pf = partition_fingerprint(
        old.withColumn("partition_id", (F.col("k") % 4).cast("int")), ["k"]
    )
    for c in ("key_sum", "row_sum"):
        assert pf.schema[c].dataType == DecimalType(38, 0)
    # and the analyzed sum plan must not contain a narrower decimal sum
    plan = fp._jdf.queryExecution().analyzed().toString()
    assert "decimal(30,0)" not in plan


def test_bucket_prefilter_survives_conflicting_column_names(spark):
    """The reconciled table may itself carry 'bucket'/'_b' columns (common
    in bucketed tables) — the broadcast-semi-join pre-filter must neither
    clobber them nor produce an ambiguous join condition."""
    rows = [(i, i % 7, i % 3, f"v{i}") for i in range(1, 401)]
    ddl = "k bigint, bucket bigint, _b bigint, val string"
    old = spark.createDataFrame(rows, ddl)
    new_rows = [
        (k, b, b2, "MUTATED" if k in (5, 105) else v)
        for (k, b, b2, v) in rows
        if k != 33
    ]
    new = spark.createDataFrame(new_rows, ddl)
    # >256 bucket ids forces the broadcast-semi-join path
    got = reconcile_rows(
        old, new, ["k"], n_buckets=1024, buckets=range(1024)
    )
    full = reconcile_rows(old, new, ["k"], n_buckets=1024, buckets=None)
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in full.collect()
    }
    assert {r["k"] for r in got.collect()} == {5, 105, 33}


def test_reconcile_rows_has_docstring(spark):
    # regression: a `"""...""" % const` first statement is an expression,
    # not a docstring — help()/autodoc saw None
    assert reconcile_rows.__doc__ is not None
    assert "broadcast semi-join" in reconcile_rows.__doc__
