"""Key-skew diagnostics (operators/skew.py): exact top-k heavy hitters
(TakeOrdered plan — no full sort shuffle), the one-row skew profile, and a
count-min-sketch cross-check (CMS estimates must upper-bound exact counts
— the mergeable one-pass variant of the same diagnostic)."""

from pyspark.sql import functions as F

from mdvalidate_spark.operators.skew import skew_stats, top_keys


def _skewed(spark):
    # key 0: 500 rows; keys 1..50: 10 rows each; keys 51..550: 1 row each
    rows = [(0,)] * 500 + [(k,) for k in range(1, 51) for _ in range(10)] + [
        (k,) for k in range(51, 551)
    ]
    return spark.createDataFrame(rows, "key int").repartition(8)


def test_top_keys_exact_and_deterministic(spark):
    df = _skewed(spark)
    got = [(r["key"], r["n"]) for r in top_keys(df, "key", 5).collect()]
    assert got[0] == (0, 500)
    # keys 1..50 all tie at 10 — tie-break by key asc makes the cut stable
    assert got[1:] == [(1, 10), (2, 10), (3, 10), (4, 10)]
    again = [(r["key"], r["n"]) for r in top_keys(df, "key", 5).collect()]
    assert got == again


def test_top_keys_plan_uses_take_ordered(spark):
    plan = top_keys(_skewed(spark), "key", 5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, "top-k must not run a full sort"


def test_skew_stats_values(spark):
    r = skew_stats(_skewed(spark), "key", exact=True).collect()[0]
    assert r["rows"] == 1500.0
    assert r["distinct_keys"] == 551.0
    assert r["max_freq"] == 500.0
    assert r["p50_freq"] == 1.0
    assert r["top1_share"] == 500.0 / 1500.0
    assert r["p99_to_median"] >= 10.0  # hot keys ~10x+ the median key


def test_cms_upper_bounds_exact(spark):
    df = _skewed(spark)
    sk = df.agg(
        F.count_min_sketch(F.col("key"), F.lit(0.005), F.lit(0.99), F.lit(42)).alias("s")
    ).collect()[0]["s"]
    jvm = spark.sparkContext._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bytes(sk))
    exact = {r["key"]: r["n"] for r in top_keys(df, "key", 3).collect()}
    for k, n in exact.items():
        est = cms.estimateCount(k)
        assert est >= n  # CMS never underestimates
        assert est <= n + 0.01 * 1500  # eps * total bound


# ----------------------------------------------------- volume anomaly


def _parted(spark, sizes: dict):
    rows = [(p, i) for p, n in sizes.items() for i in range(n)]
    return spark.createDataFrame(rows, "day string, x int")


def test_volume_anomaly_gap_and_flood(spark):
    from mdvalidate_spark.operators.skew import volume_anomaly

    sizes = {f"d{i}": 100 + (i % 3) for i in range(10)}  # ~uniform band
    sizes["gap"] = 8        # dead upstream shard
    sizes["flood"] = 240    # double ingest
    out = {r["partition"]: r for r in volume_anomaly(_parted(spark, sizes), "day").collect()}
    assert set(out) == {"gap", "flood"}
    assert out["gap"]["kind"] == "under_volume"
    assert out["flood"]["kind"] == "over_volume"
    assert out["gap"]["n_rows"] == 8.0 and out["gap"]["score"] > 3.0


def test_volume_anomaly_uniform_quiet_and_null_partition(spark):
    from mdvalidate_spark.operators.skew import volume_anomaly

    sizes = {f"d{i}": 100 + (i % 5) for i in range(8)}
    df = _parted(spark, sizes)
    assert volume_anomaly(df, "day", k=3.0, abs_tol=10.0).count() == 0
    # NULL partition is a real key: a big unpartitioned backfill flags
    nulls = spark.createDataFrame([(None, i) for i in range(300)], "day string, x int")
    out = volume_anomaly(df.unionByName(nulls), "day").collect()
    assert len(out) == 1 and out[0]["partition"] == "__null__"
    assert out[0]["kind"] == "over_volume"


def test_volume_anomaly_min_partitions_empty(spark):
    from mdvalidate_spark.operators.skew import volume_anomaly

    df = _parted(spark, {"a": 100, "b": 5, "c": 100})
    assert volume_anomaly(df, "day", min_partitions=4).count() == 0
    assert volume_anomaly(df, "day", min_partitions=3).count() == 1
