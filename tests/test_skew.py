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
