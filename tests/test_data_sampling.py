"""Deterministic data sampling (operators/sampling.py, extraction family):
hash-derived membership — reproducible, parallelism-invariant, append-stable
— for eval holdouts, domain quotas, and per-stratum audit samples."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from mdvalidate_spark.errors import SchemaError
from mdvalidate_spark.operators.sampling import (
    holdout_split,
    sample_hash,
    sample_stratified,
)


@pytest.fixture(scope="module")
def corpus(spark):
    df = (
        spark.range(5000)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 7).cast("string").alias("grp"),
            (F.col("id") * 3 % 101).alias("v"),
        )
        .cache()
    )
    df.count()
    yield df
    df.unpersist()


@pytest.mark.parametrize("method", ["md5", "xxhash64"])
def test_sample_hash_deterministic_and_parallelism_invariant(corpus, method):
    a = sorted(r.k for r in sample_hash(corpus, ["k"], 0.2, method=method).collect())
    b = sorted(
        r.k
        for r in sample_hash(
            corpus.repartition(17), ["k"], 0.2, method=method
        ).collect()
    )
    assert a == b and len(a) > 0
    # rate lands near the nominal fraction (hash uniformity, n=5000)
    assert 0.15 < len(a) / 5000 < 0.25


@pytest.mark.parametrize("method", ["md5", "xxhash64"])
def test_sample_hash_append_stable(spark, corpus, method):
    before = set(r.k for r in sample_hash(corpus, ["k"], 0.1, method=method).collect())
    grown = corpus.unionByName(
        spark.range(5000, 7000).select(
            F.col("id").alias("k"),
            (F.col("id") % 7).cast("string").alias("grp"),
            (F.col("id") * 3 % 101).alias("v"),
        )
    )
    after = set(r.k for r in sample_hash(grown, ["k"], 0.1, method=method).collect())
    assert before == {k for k in after if k < 5000}  # old membership frozen


def test_sample_hash_salt_draws_independent_sample(corpus):
    a = set(r.k for r in sample_hash(corpus, ["k"], 0.2, salt="a").collect())
    b = set(r.k for r in sample_hash(corpus, ["k"], 0.2, salt="b").collect())
    assert a != b
    # overlap ~ 4% of rows (independent 20% draws), far from either set
    assert len(a & b) < min(len(a), len(b)) * 0.6


def test_sample_hash_is_map_only(corpus):
    plan = (
        sample_hash(corpus, ["k"], 0.5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Python" not in plan


def test_sample_hash_fraction_bounds(corpus):
    with pytest.raises(SchemaError, match="fraction"):
        sample_hash(corpus, ["k"], 1.5)
    with pytest.raises(SchemaError, match="method"):
        sample_hash(corpus, ["k"], 0.5, method="sha9000")
    assert sample_hash(corpus, ["k"], 0.0).count() == 0
    assert sample_hash(corpus, ["k"], 1.0).count() == 5000


def test_holdout_split_complements_sample(corpus):
    flagged = holdout_split(corpus, ["k"], 0.25, method="md5")
    held = set(r.k for r in flagged.where("is_holdout").collect())
    sampled = set(r.k for r in sample_hash(corpus, ["k"], 0.25, method="md5").collect())
    assert held == sampled  # same membership function, projected not filtered
    assert flagged.count() == 5000  # split, not sample: every row keeps a side


@pytest.mark.parametrize("method", ["md5", "xxhash64"])
def test_stratified_exact_k_and_matches_bruteforce(corpus, method):
    out = sample_stratified(
        corpus, "grp", 9, key_cols=["k"], method=method
    )
    sizes = {r.grp: r.n for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert sizes == {str(g): 9 for g in range(7)}

    # brute force: rank EVERYTHING per stratum by the same hash — the
    # pre-filter must not change the selected k
    from mdvalidate_spark.operators.sampling import _hash_cols, _key_str

    order, _ = _hash_cols(["k"], "", method)
    w = Window.partitionBy("grp").orderBy(order.asc(), _key_str(["k"]).asc())
    brute = (
        corpus.withColumn("r", F.row_number().over(w))
        .where("r <= 9")
        .select("k")
    )
    assert set(r.k for r in out.select("k").collect()) == set(
        r.k for r in brute.collect()
    )


def test_stratified_small_stratum_yields_all_rows(spark):
    df = spark.createDataFrame(
        [(i, "big") for i in range(100)] + [(900, "tiny"), (901, "tiny")],
        "k long, grp string",
    )
    out = sample_stratified(df, "grp", 5, key_cols=["k"])
    sizes = {r.grp: r.n for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert sizes == {"big": 5, "tiny": 2}  # min(k, |stratum|)


def test_stratified_deficit_fallback_is_exact(corpus):
    # oversample=1.0 makes the pre-filter tight enough that hash clumping
    # can starve strata — the deficit path must restore exactness
    out = sample_stratified(
        corpus, "grp", 25, key_cols=["k"], method="md5", oversample=1.0
    )
    sizes = {r.grp: r.n for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert sizes == {str(g): 25 for g in range(7)}


def test_stratified_refusals(spark, corpus):
    with pytest.raises(SchemaError, match="k must be positive"):
        sample_stratified(corpus, "grp", 0, key_cols=["k"])
    with pytest.raises(SchemaError, match="oversample"):
        sample_stratified(corpus, "grp", 5, key_cols=["k"], oversample=0.5)
    wide = spark.range(300).select(
        F.col("id").alias("k"), F.col("id").cast("string").alias("grp")
    )
    with pytest.raises(SchemaError, match="strata"):
        sample_stratified(wide, "grp", 1, key_cols=["k"], max_strata=100)


def test_multi_column_key_and_rank_column(corpus):
    out = sample_stratified(
        corpus, "grp", 3, key_cols=["grp", "k"], rank_col="rk"
    )
    assert out.where("rk < 1 or rk > 3").count() == 0
    assert out.count() == 21

# ------------------------------------------------------- weighted (mixing)


def test_sample_weighted_rates_honored(corpus):
    from mdvalidate_spark.operators.sampling import sample_weighted

    out = sample_weighted(
        corpus, "grp", {"0": 1.0, "1": 0.2, "2": 0.0}, key_cols=["k"]
    )
    sizes = {r.grp: r.n for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    n0 = corpus.where("grp = '0'").count()
    assert sizes.get("0") == n0  # rate 1.0 keeps everything
    assert "2" not in sizes  # rate 0.0 drops everything
    assert 0.1 * n0 < sizes.get("1", 0) < 0.3 * n0  # ~20%
    # default_fraction=0: unlisted groups (3..6) are excluded
    assert set(sizes) == {"0", "1"}


def test_sample_weighted_membership_matches_sample_hash(corpus):
    from mdvalidate_spark.operators.sampling import sample_weighted

    # a group sampled at rate f contains EXACTLY the sample_hash(f) members
    # of that group — same predicate, group-specific cutoff
    w = sample_weighted(corpus, "grp", {"3": 0.3}, key_cols=["k"], method="md5")
    flat = sample_hash(corpus.where("grp = '3'"), ["k"], 0.3, method="md5")
    assert set(r.k for r in w.collect()) == set(r.k for r in flat.collect())


def test_sample_weighted_rates_dataframe_and_default(spark, corpus):
    from mdvalidate_spark.operators.sampling import sample_weighted

    rates = spark.createDataFrame(
        [("5", 1.0)], "grp string, fraction double"
    )
    out = sample_weighted(
        corpus, "grp", rates, key_cols=["k"], default_fraction=1.0
    )
    assert out.count() == 5000  # listed at 1.0, everyone else defaults to 1.0


def test_sample_weighted_null_group_falls_to_default(spark):
    from mdvalidate_spark.operators.sampling import sample_weighted

    df = spark.createDataFrame(
        [(1, None), (2, "a"), (3, "a")], "k long, grp string"
    )
    kept = sample_weighted(
        df, "grp", {"a": 1.0}, key_cols=["k"], default_fraction=0.0
    )
    assert set(r.k for r in kept.collect()) == {2, 3}  # NULL group excluded
    kept_all = sample_weighted(
        df, "grp", {"a": 1.0}, key_cols=["k"], default_fraction=1.0
    )
    assert kept_all.count() == 3


def test_sample_weighted_refusals(spark, corpus):
    from mdvalidate_spark.operators.sampling import sample_weighted

    with pytest.raises(SchemaError, match="rate for group"):
        sample_weighted(corpus, "grp", {"0": 1.5}, key_cols=["k"])
    with pytest.raises(SchemaError, match="default_fraction"):
        sample_weighted(corpus, "grp", {"0": 0.5}, key_cols=["k"], default_fraction=-1)
    wide = spark.range(300).select(
        F.col("id").alias("k"), F.col("id").cast("string").alias("grp")
    )
    rates = wide.select("grp", F.lit(0.5).alias("fraction"))
    with pytest.raises(SchemaError, match="rate groups"):
        sample_weighted(wide, "grp", rates, key_cols=["k"], max_groups=100)


def test_sample_weighted_int_group_joins_rate(spark):
    from mdvalidate_spark.operators.sampling import sample_weighted

    # int group columns match dict keys through the string-normalized join
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 2).alias("grp")
    )
    out = sample_weighted(df, "grp", {0: 1.0}, key_cols=["k"])
    assert out.count() == 50 and out.where("grp != 0").count() == 0


def test_sample_hash_md5_full_fraction_keeps_everything(corpus):
    # regression: fraction≈1.0 rounds to a 16-hex-char cutoff that would
    # lexicographically undercut most 15-char hashes; the 'g' cap keeps all
    assert sample_hash(corpus, ["k"], 1.0, method="md5").count() == 5000
    assert sample_hash(corpus, ["k"], 0.9999999, method="md5").count() > 4990


def test_sample_weighted_md5_full_rate_keeps_group(corpus):
    from mdvalidate_spark.operators.sampling import sample_weighted

    out = sample_weighted(corpus, "grp", {"4": 1.0}, key_cols=["k"], method="md5")
    assert out.count() == corpus.where("grp = '4'").count()


def test_stratified_null_stratum_is_sampled(spark):
    # NULL stratum rows must not be silently dropped by an internal
    # null-unsafe join — they are the rows most worth auditing
    df = spark.createDataFrame(
        [(i, "a" if i % 2 else None) for i in range(200)], "k long, grp string"
    )
    out = sample_stratified(df, "grp", 7, key_cols=["k"])
    sizes = {r.grp: r.n for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert sizes == {"a": 7, None: 7}


def test_stratified_key_encoding_is_injective(spark):
    # ('a\x1f', 'b') and ('a', '\x1fb') are DIFFERENT strata
    df = spark.createDataFrame(
        [(1, "a\x1f", "b"), (2, "a", "\x1fb"), (3, "a\x1f", "b")],
        "k long, s1 string, s2 string",
    )
    out = sample_stratified(df, ["s1", "s2"], 5, key_cols=["k"])
    assert out.count() == 3  # both strata fully kept, none merged


def test_sample_weighted_boolean_group_matches_rate(spark):
    from mdvalidate_spark.operators.sampling import sample_weighted

    # regression: str(True)='True' vs Spark's 'true' rendering silently
    # detached boolean groups from their rates
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 2 == 0).alias("prem")
    )
    out = sample_weighted(df, "prem", {True: 1.0, False: 0.0}, key_cols=["k"])
    assert out.count() == 50 and out.where("NOT prem").count() == 0


def test_sample_weighted_duplicate_rate_rows_refused(spark, corpus):
    from mdvalidate_spark.operators.sampling import sample_weighted

    rates = spark.createDataFrame(
        [("1", 0.05), ("1", 0.2)], "grp string, fraction double"
    )
    with pytest.raises(SchemaError, match="duplicate rate"):
        sample_weighted(corpus, "grp", rates, key_cols=["k"])


def test_sample_weighted_null_fraction_refused(spark, corpus):
    from mdvalidate_spark.operators.sampling import sample_weighted

    rates = spark.createDataFrame(
        [("1", None)], "grp string, fraction double"
    )
    with pytest.raises(SchemaError, match="NULL fraction"):
        sample_weighted(corpus, "grp", rates, key_cols=["k"])


def test_sample_weighted_null_dict_rate_refused(corpus):
    from mdvalidate_spark.operators.sampling import sample_weighted

    with pytest.raises(SchemaError, match="NULL fraction"):
        sample_weighted(corpus, "grp", {"1": None}, key_cols=["k"])
