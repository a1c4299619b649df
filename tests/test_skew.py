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


# ---------------------------------------------------------------- concentration


def test_concentration_report_exact_and_tiebreak(spark):
    from mdvalidate_spark.operators.skew import concentration_report

    # 4x a, 3x b, 3x c, one NULL: top=a share=4/10, hhi=(16+9+9)/100
    rows = [("a",)] * 4 + [("b",)] * 3 + [("c",)] * 3 + [(None,)]
    df = spark.createDataFrame(rows, "v string")
    r = concentration_report(df, "v").collect()[0]
    assert (r["rows"], r["n_scoped"], r["distinct_values"]) == (11, 10, 3)
    assert r["top_value"] == "a" and r["top_share"] == 0.4
    assert r["hhi"] == 0.34
    # tie on count -> lowest value wins (total order, deterministic)
    tie = spark.createDataFrame([("z",), ("b",), ("z",), ("b",)], "v string")
    assert concentration_report(tie, "v").collect()[0]["top_value"] == "b"
    # non-string columns go through a string cast for reporting
    ints = spark.createDataFrame([(7,), (7,), (3,)], "v int")
    ri = concentration_report(ints, "v").collect()[0]
    assert ri["top_value"] == "7" and ri["distinct_values"] == 2


def test_concentration_rule_results_bounds_and_when(spark):
    from mdvalidate_spark.errors import KIND_CONCENTRATION, SchemaError
    from mdvalidate_spark.operators.skew import concentration_rule_results
    from mdvalidate_spark.spec import ConcentrationRule

    rows = [("a", 1)] * 6 + [("b", 1)] * 2 + [("c", 0)] * 2
    df = spark.createDataFrame(rows, "v string, flag int")

    # top_share 0.6 fires the share bound, hhi (0.36+0.04+0.04=0.44) the hhi bound
    v, m = concentration_rule_results(
        df, ConcentrationRule("c1", column="v", max_top_share=0.5, max_hhi=0.4),
        "r",
    )
    got = {r["expected"]: r["actual"] for r in v.collect()}
    assert set(got) == {"top_share <= 0.5", "hhi <= 0.4"}
    assert "top value 'a' share=0.600000 (6 of 10)" in got["top_share <= 0.5"]
    assert "hhi=0.440000" in got["hhi <= 0.4"]
    assert all(r["kind"] == KIND_CONCENTRATION for r in v.collect())
    mm = {r["metric"]: (r["value"], r["value_str"]) for r in m.collect()}
    assert mm["concentration_top_share"] == (0.6, None)
    assert mm["concentration_hhi"] == (0.44, None)
    assert mm["concentration_top_value"] == (None, "a")

    # `when` scope: flag=1 only -> shares over 8 rows (a 6/8, b 2/8)
    v2, m2 = concentration_rule_results(
        df,
        ConcentrationRule("c2", column="v", max_top_share=0.7, when="flag = 1"),
        "r",
    )
    assert v2.count() == 1  # 0.75 > 0.7
    mm2 = {r["metric"]: r["value"] for r in m2.collect()}
    assert mm2["concentration_n_scoped"] == 8.0
    assert mm2["concentration_distinct"] == 2.0

    # passing bounds -> no violations, metrics still emitted
    v3, m3 = concentration_rule_results(
        df, ConcentrationRule("c3", column="v", max_top_share=0.61), "r"
    )
    assert v3.count() == 0 and m3.count() == 5

    # boundless rule refused at the operator API (no compile needed)
    import pytest as _pt

    with _pt.raises(SchemaError):
        concentration_rule_results(
            df, ConcentrationRule("c4", column="v"), "r"
        )


def test_concentration_unmeasurable_and_empty_scope(spark):
    from mdvalidate_spark.operators.skew import (
        concentration_report,
        concentration_rule_results,
    )
    from mdvalidate_spark.spec import ConcentrationRule

    df = spark.createDataFrame([("a",)] * 3, "v string")
    v, m = concentration_rule_results(
        df, ConcentrationRule("c", column="v", max_hhi=0.9, min_rows=100), "r"
    )
    rows = v.collect()
    assert len(rows) == 1 and "unmeasurable: 3 in-scope" in rows[0]["actual"]

    # zero in-scope rows (all NULL): loud, no division by zero anywhere
    nulls = spark.createDataFrame([(None,)] * 4, "v string")
    v2, m2 = concentration_rule_results(
        nulls, ConcentrationRule("c", column="v", max_top_share=0.5), "r"
    )
    assert "unmeasurable: 0 in-scope" in v2.collect()[0]["actual"]
    mm = {r["metric"]: r["value"] for r in m2.collect()}
    assert mm["concentration_top_share"] is None
    assert mm["concentration_hhi"] is None
    rep = concentration_report(nulls, "v").collect()[0]
    assert rep["top_value"] is None and rep["hhi"] is None

    # min_rows < 1 refused at the operator API (the compile-lint mirror):
    # min_rows=0 would let a zero-scope scan reach the bound comparison
    # with NULL shares instead of a verdict
    import pytest as _pt

    from mdvalidate_spark.errors import SchemaError
    from mdvalidate_spark.operators.skew import (
        CONCENTRATION_PARTIALS_DDL,
        concentration_rule_results_from_partials,
    )

    bad = ConcentrationRule("c", column="v", max_top_share=0.5, min_rows=0)
    with _pt.raises(SchemaError, match="min_rows must be >= 1"):
        concentration_rule_results(nulls, bad, "r")
    empty_partials = spark.createDataFrame([], CONCENTRATION_PARTIALS_DDL)
    with _pt.raises(SchemaError, match="min_rows must be >= 1"):
        concentration_rule_results_from_partials(empty_partials, bad, "r")


def test_concentration_through_spec_compile_and_run(spark):
    from mdvalidate_spark import validate_table
    from mdvalidate_spark.compile import compile_spec
    from mdvalidate_spark.errors import SchemaError
    from mdvalidate_spark.spec import ConcentrationRule, Spec
    from mdvalidate_spark.spec_io import rule_from_dict, rule_to_dict

    r = ConcentrationRule(
        "dom", column="v", max_top_share=0.5, max_hhi=0.3, min_rows=2
    )
    assert rule_from_dict(rule_to_dict(r)) == r

    df = spark.createDataFrame(
        [("a", f"k{i}") for i in range(7)] + [("b", "k7"), ("c", "k8")],
        "v string, k string",
    )
    import pytest as _pt

    for bad in (
        ConcentrationRule("x", column="v"),  # no bound
        ConcentrationRule("x", column="v", max_top_share=0.0),  # not a share
        ConcentrationRule("x", column="v", max_hhi=1.5),
        ConcentrationRule("x", column="v", max_top_share=0.5, min_rows=0),
        ConcentrationRule("x", column="", max_top_share=0.5),
    ):
        with _pt.raises(SchemaError):
            compile_spec(Spec(rules=[bad]), df.schema)

    spec = Spec(key_column="k", rules=[r])
    rep = validate_table(spark, df, spec, run_id="rc")
    v = [x for x in rep.violations.collect() if x["rule_id"] == "dom"]
    assert len(v) == 2 and rep.exit_code == 1  # 7/9 share + hhi both fire
    mets = rep.metrics.where("rule_id = 'dom'").count()
    assert mets == 5


def test_concentration_grouped_bounds_and_edges(spark):
    from mdvalidate_spark.operators.skew import (
        concentration_by_group,
        concentration_rule_results,
    )
    from mdvalidate_spark.spec import ConcentrationRule

    rows = (
        [("f1", "a")] * 4 + [("f1", "b")]          # f1: a 4/5 dominant
        + [("f2", "x"), ("f2", "y"), ("f2", "z")]  # f2: uniform 1/3
        + [("f3", None), ("f3", None)]             # f3: zero in-scope
        + [(None, "a"), (None, "a"), (None, "c")]  # NULL group is real
    )
    df = spark.createDataFrame(rows, "feed string, v string")

    prof = {r["feed"]: r for r in concentration_by_group(df, "v", ("feed",)).collect()}
    assert prof["f1"]["top_share"] == 0.8 and prof["f1"]["top_value"] == "a"
    assert prof["f1"]["hhi"] == 0.68  # (16+1)/25
    assert prof["f2"]["top_value"] == "x"  # tie -> value ASC
    assert prof["f3"]["n_scoped"] == 0 and prof["f3"]["hhi"] is None
    assert prof[None]["top_share"] == 0.666667  # round-half-up micro units

    v, m = concentration_rule_results(
        df,
        ConcentrationRule(
            "g", column="v", group_by=("feed",), max_top_share=0.7, max_hhi=0.6
        ),
        "r",
    )
    got = {(r["image_id"], r["expected"]): r["actual"] for r in v.collect()}
    assert got[("f1", "top_share <= 0.7")] == (
        "top value 'a' share=0.800000 (4 of 5)"
    )
    assert got[("f1", "hhi <= 0.6")] == "hhi=0.680000 over 2 distinct values"
    # f3 has rows but zero in-scope values: loudly unmeasurable per group
    assert "unmeasurable: 0 in-scope" in got[("f3", "top_share <= 0.7, hhi <= 0.6")]
    # NULL group flagged under its own key (0.666667 < 0.7 but hhi 0.555556 < 0.6: quiet)
    assert (None, "top_share <= 0.7") not in got
    assert len(got) == 3
    assert m.count() == 0  # grouped mode emits no metric rows by contract

    # grouped matches the global operator run per group (arithmetic twin)
    from mdvalidate_spark.operators.skew import concentration_report

    for feed in ("f1", "f2"):
        g = concentration_report(
            df.where(F.col("feed") == feed), "v"
        ).collect()[0]
        assert (g["top_share"], g["hhi"]) == (
            prof[feed]["top_share"], prof[feed]["hhi"]
        )


def test_concentration_grouped_oracle_parity_with_nulls(spark):
    """The driver fixtures carry no NULL source/lang, so the grouped
    oracle SQL's NULL-group join and unmeasurable branch never execute
    there — lock engine/DuckDB agreement on a frame that exercises BOTH:
    a NULL group key (null-safe join) and an all-NULL-value group
    (unmeasurable branch), so a fixture regeneration with NULLs cannot
    make the oracle silently diverge."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entry
    from mdvalidate_spark.operators.skew import concentration_rule_results
    from mdvalidate_spark.spec import ConcentrationRule

    rows = (
        [("f1", "a")] * 4 + [("f1", "b")]          # dominant: fires both
        + [("f2", "x"), ("f2", "y"), ("f2", "z")]  # uniform: quiet
        + [("f3", None), ("f3", None)]             # all-NULL: unmeasurable
        + [(None, "a"), (None, "a"), (None, "c")]  # NULL group: fires share
    )
    df = spark.createDataFrame(rows, "source string, lang string")
    v, _ = concentration_rule_results(
        df,
        ConcentrationRule(
            "by_src", column="lang", group_by=("source",),
            max_top_share=0.5, max_hhi=0.35,
        ),
        "q",
    )
    def key(t):
        return (t[0] is None, t[0] or "", t[1], t[2])

    got = sorted(
        ((r["image_id"], r["expected"], r["actual"]) for r in v.collect()),
        key=key,
    )

    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(rows, columns=["source", "lang"])
    )
    want = sorted(
        (
            (r[3], r[5], r[6])
            for r in con.execute(entry._concentration_group_sql()).fetchall()
        ),
        key=key,
    )
    assert got == want
    # the NULL group and the unmeasurable group are both present
    assert any(k is None for k, _, _ in got)
    assert any("unmeasurable" in a for _, _, a in got)


def test_concentration_grouped_through_run_and_lints(spark):
    from mdvalidate_spark import validate_table
    from mdvalidate_spark.compile import compile_spec
    from mdvalidate_spark.errors import SchemaError
    from mdvalidate_spark.spec import ConcentrationRule, Spec
    from mdvalidate_spark.spec_io import rule_from_dict, rule_to_dict

    r = ConcentrationRule(
        "g", column="v", group_by=("feed",), max_top_share=0.5, when="ok"
    )
    assert rule_from_dict(rule_to_dict(r)) == r

    df = spark.createDataFrame(
        [("f1", "a", True, f"k{i}") for i in range(3)]
        + [("f1", "b", False, "k3"), ("f2", "a", True, "k4"),
           ("f2", "b", True, "k5")],
        "feed string, v string, ok boolean, k string",
    )
    import pytest as _pt

    with _pt.raises(SchemaError):  # column doubling as group key
        compile_spec(
            Spec(rules=[ConcentrationRule(
                "x", column="v", group_by=("v",), max_hhi=0.5)]),
            df.schema,
        )
    with _pt.raises(SchemaError):  # unknown group column
        compile_spec(
            Spec(rules=[ConcentrationRule(
                "x", column="v", group_by=("nope",), max_hhi=0.5)]),
            df.schema,
        )

    rep = validate_table(spark, df, Spec(key_column="k", rules=[r]), run_id="rg")
    v = [x for x in rep.violations.collect() if x["rule_id"] == "g"]
    # when="ok" drops f1's b row: f1 in-scope is 3x a -> share 1.0 fires;
    # f2 is a/b uniform -> 0.5 does not exceed 0.5 (strict >)
    assert len(v) == 1 and v[0]["image_id"] == "f1"
    assert "share=1.000000 (3 of 3)" in v[0]["actual"]
    assert rep.exit_code == 1


def test_concentration_incremental_through_run_and_resume(spark, tmp_path):
    """incremental=True rides the manifest-partial lifecycle: per-batch
    value-count partials persist under the checkpoint, a RESUMED run
    reloads the validated partitions' partials and finalizes without
    rescanning them, and the merged verdict + metrics are bit-identical
    to the full-scan rule (same merged counts through the same
    reduction). The BenfordRule incremental contract, keyed by value."""
    from mdvalidate_spark import validate_table
    from mdvalidate_spark.run import ValidationRun
    from mdvalidate_spark.spec import ConcentrationRule, Spec

    rows = [
        (f"k{i}", "en" if i % 3 else ("de" if i % 2 else "fr"), float(i))
        for i in range(600)
    ]
    df = spark.createDataFrame(rows, "k string, lang string, x double")
    inc = ConcentrationRule(
        "mix", column="lang", max_top_share=0.5, max_hhi=0.6,
        when="x >= 0.0", incremental=True,
    )
    spec = Spec(key_column="k", n_partitions=6, rules=[inc])
    ckpt = str(tmp_path / "ck")

    run1 = ValidationRun(spark, spec, df, run_id="r-c", checkpoint_dir=ckpt)
    pending = run1.pending_partitions()
    run1._validate_batch(pending[:3])

    run2 = ValidationRun(spark, spec, df, run_id="r-c", checkpoint_dir=ckpt)
    assert sorted(run2.pending_partitions()) == sorted(pending[3:])
    report = run2.validate()

    full = validate_table(
        spark, df,
        Spec(key_column="k", n_partitions=6, rules=[
            ConcentrationRule("mix", column="lang", max_top_share=0.5,
                              max_hhi=0.6, when="x >= 0.0"),
        ]),
        run_id="r-full",
    )

    def mm(rep):
        return sorted(
            (r["metric"], r["value"], r["value_str"])
            for r in rep.metrics.collect() if r["rule_id"] == "mix"
        )

    def vv(rep):
        return sorted(
            (r["expected"], r["actual"])
            for r in rep.violations.collect() if r["rule_id"] == "mix"
        )

    assert mm(report) == mm(full) and vv(report) == vv(full)
    # en is 2/3 dominant: the share bound fires identically on both paths
    assert len(vv(report)) == 1 and "share=0.666667" in vv(report)[0][1]

    # empty-scope first batch: part-file-less partials dir must reload
    # (explicit schema) and finalize on the loud degrade path
    never = Spec(key_column="k", n_partitions=6, rules=[
        ConcentrationRule("never", column="lang", max_hhi=0.9,
                          min_rows=10, when="x > 1e18", incremental=True),
    ])
    ck2 = str(tmp_path / "ck2")
    ra = ValidationRun(spark, never, df, run_id="r-e", checkpoint_dir=ck2)
    ra._validate_batch(ra.pending_partitions()[:2])
    rb = ValidationRun(spark, never, df, run_id="r-e", checkpoint_dir=ck2)
    rep2 = rb.validate()
    v = [r for r in rep2.violations.collect() if r["rule_id"] == "never"]
    assert len(v) == 1 and "unmeasurable: 0 in-scope" in v[0]["actual"]

    # incremental + group_by is refused at compile
    from mdvalidate_spark.compile import compile_spec
    from mdvalidate_spark.errors import SchemaError
    import pytest as _pt

    with _pt.raises(SchemaError):
        compile_spec(
            Spec(rules=[ConcentrationRule(
                "x", column="lang", group_by=("k",), max_hhi=0.5,
                incremental=True)]),
            df.schema,
        )
