"""Incremental dedup index: exact/near probes against a persisted corpus
index, append-mode growth, and probe-never-scans-corpus plan shape."""

import pytest
from pyspark.sql import functions as F

from mdvalidate_spark.operators import dedup_index as DI

KNOWN = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "pack my box with five dozen liquor jugs"),
    (3, "a completely different known document about spark"),
]

NEW = [
    # exact twin of known 1 (normalization: case + whitespace)
    (101, "The  quick Brown fox\tjumps over the lazy DOG"),
    # near-dup of known 2 (last word changed: 5 of 7 union 3-shingles shared)
    (102, "pack my box with five dozen liquor cans"),
    # genuinely novel
    (103, "an entirely new piece of text never seen before today"),
]


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dedup-index"))
    known = spark.createDataFrame(KNOWN, "doc_id int, text string")
    DI.write_dedup_index(known, d, num_hashes=64, bands=32)
    return d


@pytest.fixture(scope="module")
def new_docs(spark):
    return spark.createDataFrame(NEW, "doc_id int, text string")


def test_probe_exact(spark, index_dir, new_docs):
    rows = DI.probe_exact(new_docs, index_dir).collect()
    assert [(r["doc_id"], r["known_id"]) for r in rows] == [(101, 1)]


def test_probe_near(spark, index_dir, new_docs):
    got = {
        (r["doc_id"], r["known_id"]): r["est_jaccard"]
        for r in DI.probe_near(
            new_docs, index_dir, num_hashes=64, bands=32, threshold=0.5
        ).collect()
    }
    assert (101, 1) in got and got[(101, 1)] == 1.0  # exact twin: all rows match
    assert (102, 2) in got and 0.5 <= got[(102, 2)] < 1.0  # true J = 5/7
    assert not any(doc == 103 for doc, _ in got)


def test_append_grows_index(spark, index_dir, new_docs, tmp_path):
    d = str(tmp_path / "grow")
    known = spark.createDataFrame(KNOWN, "doc_id int, text string")
    DI.write_dedup_index(known, d)
    # keep only novel docs, then append them to the index
    dup_ids = [r["doc_id"] for r in DI.probe_exact(new_docs, d).collect()]
    kept = new_docs.where(~F.col("doc_id").isin(dup_ids))
    DI.write_dedup_index(kept, d, mode="append")
    # the batch re-probed against the grown index now self-hits
    rows = DI.probe_exact(kept, d).collect()
    assert {(r["doc_id"], r["known_id"]) for r in rows} == {(102, 102), (103, 103)}


def test_probe_join_does_not_scan_text(spark, index_dir, new_docs):
    """The probe plan reads the INDEX parquet, never a corpus text column."""
    plan = (
        DI.probe_near(new_docs, index_dir, num_hashes=64, bands=32)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the only parquet scans are the index files (fp/sig/band/bucket)
    assert "bands" in plan
    for frag in plan.split("FileScan parquet"):
        if "ReadSchema" in frag and "text" in frag.split("ReadSchema")[1][:200]:
            raise AssertionError("probe plan reads a corpus text column")


def test_short_docs_never_enter_band_index(spark, tmp_path):
    """Docs below the shingle length produce NO band rows (an all-null
    signature would otherwise put every short doc in one mega-bucket)."""
    d = str(tmp_path / "short")
    df = spark.createDataFrame(
        [(1, "too short"), (2, ""), (3, None), (4, "long enough for shingles here")],
        "doc_id int, text string",
    )
    DI.write_dedup_index(df, d)
    bands = spark.read.parquet(f"{d}/bands")
    assert set(r["doc_id"] for r in bands.select("doc_id").distinct().collect()) == {4}
    # probing a batch of short docs yields no near candidates, not a blowup
    assert DI.probe_near(df.where("doc_id < 4"), d).count() == 0


def test_span_index_probe_and_append(spark, tmp_path):
    """Span-level contamination probe: a batch doc quoting a kept doc's
    span is flagged with the right witness; clean/short docs stay silent;
    append mode grows the index by exactly the new rows; the corpus text
    is never read by the probe."""
    from mdvalidate_spark.operators import dedup_index as DI

    shared = "this licence header paragraph travels between documents verbatim"
    corpus = spark.createDataFrame(
        [
            (1, shared + " plus corpus-only tail content one"),
            (2, "entirely unrelated corpus document text zz yy xx ww vv uu"),
        ],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    DI.write_span_index(corpus, idx, span_k=8, span_window=12)

    batch = spark.createDataFrame(
        [
            (100, "fresh intro then " + shared + " then fresh outro"),
            (101, "completely new material nothing shared at all qq rr ss tt"),
            (102, "tiny"),
        ],
        "doc_id long, text string",
    )
    out = DI.probe_spans(batch, idx, span_k=8, span_window=12)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {100}
    r = rows[100]
    assert r["n_known"] >= 1 and r["example_known_id"] == 1
    assert 0 < r["known_frac"] <= 1
    # the probe never reads the corpus TEXT — the only FileScans are the
    # narrow (doc_id, fp) postings (batch side is an in-memory frame here;
    # the index path itself is truncated in the AQE final-plan string, so
    # assert on the scanned COLUMNS, not the location)
    plan = out._jdf.queryExecution().executedPlan().toString()
    frags = plan.split("FileScan parquet")
    assert len(frags) > 1, "expected the spans index FileScan"
    for frag in frags[1:]:
        cols = frag.split("]")[0]  # "FileScan parquet [col1,col2" prefix
        assert "text" not in cols, cols

    # append: a new kept doc becomes probe-able
    kept = spark.createDataFrame(
        [(3, "brand new kept doc with its own repeated span payload here")],
        "doc_id long, text string",
    )
    DI.write_span_index(kept, idx, span_k=8, span_window=12, mode="append")
    batch2 = spark.createDataFrame(
        [(200, "prefix " + "brand new kept doc with its own repeated span payload here")],
        "doc_id long, text string",
    )
    out2 = {r["doc_id"]: r for r in
            DI.probe_spans(batch2, idx, span_k=8, span_window=12).collect()}
    assert 200 in out2 and out2[200]["example_known_id"] == 3
