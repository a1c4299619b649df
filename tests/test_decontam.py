"""Decontamination: pinned values on crafted corpora, broadcast plan shape,
and the non-broadcast escape hatch."""

import pytest

from mdvalidate_spark.operators import decontam as DC

BENCH = [
    (100, "the quick brown fox jumps over the lazy dog"),
    (101, "pack my box with five dozen liquor jugs"),
]

CORPUS = [
    # exact 3-gram overlap with bench 100 ("quick brown fox", ...)
    (1, "a very quick brown fox indeed"),
    # overlaps BOTH bench docs
    (2, "the lazy dog can pack my box too"),
    # no shared 3-gram (words shared, but never 3 in a row)
    (3, "quick dog brown jumps fox lazy"),
    (4, "completely unrelated text about spark plans"),
    (5, ""),
    (6, None),
]


@pytest.fixture(scope="module")
def frames(spark):
    bench = spark.createDataFrame(BENCH, "doc_id int, text string")
    docs = spark.createDataFrame(CORPUS, "doc_id int, text string")
    return docs, bench


def test_contamination_values(spark, frames):
    docs, bench = frames
    rep = {r["doc_id"]: r for r in DC.contamination(docs, bench, k=3).collect()}
    assert set(rep) == {1, 2}
    assert rep[1]["n_hit_grams"] == 1  # "quick brown fox"
    assert rep[1]["n_bench_docs"] == 1
    assert rep[1]["example_gram"] == "quick brown fox"
    assert rep[2]["n_hit_grams"] == 2  # "the lazy dog" + "pack my box"
    assert rep[2]["n_bench_docs"] == 2


def test_contamination_k_sensitivity(spark, frames):
    docs, bench = frames
    # at k=4 doc 1's only shared run ("quick brown fox") is too short
    ids = {r["doc_id"] for r in DC.contamination(docs, bench, k=4).collect()}
    assert 1 not in ids


def test_violations_shape_and_min_hits(spark, frames):
    docs, bench = frames
    rows = DC.contamination_violations(docs, bench, k=3).collect()
    assert {r["doc_id"] for r in rows} == {1, 2}
    assert all(
        r["rule_id"] == "contamination_3gram" and r["kind"] == "contamination"
        for r in rows
    )
    strict = DC.contamination_violations(docs, bench, k=3, min_hits=2).collect()
    assert {r["doc_id"] for r in strict} == {2}


def test_benchmark_side_is_broadcast(spark, frames):
    docs, bench = frames
    plan = (
        DC.contamination(docs, bench, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    # escape hatch: no broadcast of the benchmark side
    plan_big = (
        DC.contamination(docs, bench, k=3, broadcast_benchmark=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" not in plan_big or "SortMergeJoin" in plan_big


def test_on_testdata_documents(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.where("doc_id % 17 = 0")
    rep = DC.contamination(docs, bench, k=3)
    rows = {r["doc_id"]: r for r in rep.collect()}
    # every benchmark doc trivially contaminates itself (identical k-grams)
    for b in bench.select("doc_id").collect():
        assert b["doc_id"] in rows


def test_split_leakage_finds_cross_side_twins(spark):
    from mdvalidate_spark.operators.decontam import split_leakage

    # 40 unique docs; plant copies of docs 0..9 under new keys — some copies
    # land on the opposite side of the 50% split and must be flagged
    base = [(i, f"unique document body number {i} with words") for i in range(40)]
    plants = [(1000 + i, base[i][1]) for i in range(10)]
    df = spark.createDataFrame(base + plants, "doc_id long, text string")
    leaks = split_leakage(df, ["doc_id"], 0.5, method="md5").collect()
    # every flagged row is a genuine cross-side twin
    from mdvalidate_spark.operators.sampling import sample_hash

    held = {r.doc_id for r in sample_hash(df, ["doc_id"], 0.5, method="md5").collect()}
    fps = {}
    for k, t in base + plants:
        fps.setdefault(t, []).append(k)
    expected = set()
    for t, ks in fps.items():
        holdout_ks = [k for k in ks if k in held]
        train_ks = [k for k in ks if k not in held]
        if train_ks:
            expected.update(holdout_ks)
    assert {r.doc_id for r in leaks} == expected
    assert len(leaks) > 0  # the plant actually straddled the boundary
    for r in leaks:
        assert r.n_train_twins >= 1 and r.train_example not in held


def test_split_leakage_clean_when_no_duplicates(spark):
    from mdvalidate_spark.operators.decontam import split_leakage

    df = spark.createDataFrame(
        [(i, f"totally distinct content {i}") for i in range(30)],
        "doc_id long, text string",
    )
    assert split_leakage(df, ["doc_id"], 0.3).count() == 0


def test_semantic_contamination_detects_planted_near_copy(spark):
    """A corpus vector that is a tiny perturbation of a bench vector is
    flagged with max_cos ≈ 1 and the right nearest id; orthogonal corpus
    vectors emit nothing."""
    bench = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    corpus = spark.createDataFrame(
        [
            (10, [0.999, 0.01, 0.0]),   # near bench 1
            (11, [0.0, 0.0, 1.0]),      # orthogonal to both
            (12, [0.01, 0.995, 0.0]),   # near bench 2
        ],
        "vec_id long, embedding array<double>",
    )
    out = {
        r["corpus_id"]: r
        for r in DC.semantic_contamination(corpus, bench, 0.95).collect()
    }
    assert set(out) == {10, 12}
    assert out[10]["nearest_bench_id"] == 1 and out[10]["max_cos"] > 0.99
    assert out[12]["nearest_bench_id"] == 2
    assert out[10]["n_bench_hits"] == 1


def test_semantic_contamination_tie_breaks_to_min_bench_id(spark):
    """Two identical bench vectors: nearest_bench_id is the SMALLER id and
    both count as hits — deterministic at any parallelism."""
    bench = spark.createDataFrame(
        [(7, [1.0, 0.0]), (3, [1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    corpus = spark.createDataFrame(
        [(99, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    [r] = DC.semantic_contamination(corpus, bench, 0.9).collect()
    assert r["nearest_bench_id"] == 3 and r["n_bench_hits"] == 2
    assert r["max_cos"] == 1.0


def test_semantic_contamination_null_and_ragged_drop_out(spark):
    """NULL and dimension-mismatched vectors never fabricate a verdict."""
    bench = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    corpus = spark.createDataFrame(
        [(10, None), (11, [1.0, 0.0, 0.0]), (12, [1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = DC.semantic_contamination(corpus, bench, 0.5).collect()
    assert {r["corpus_id"] for r in out} == {12}
