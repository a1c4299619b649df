"""Text-analysis operator tests: deterministic values on crafted inputs plus
profile behavior on the driver testdata documents table."""

import pytest
from pyspark.sql import functions as F

from mdvalidate_spark.operators import text as T

DOCS = [
    (1, "The cat and the dog sat. The end!"),
    (2, "el perro y la casa de la playa es bonita"),
    (3, "der Hund und die Katze ist ein Tier nicht wahr"),
    (4, "le chat et les oiseaux est une belle chose des bois"),
    (5, ""),
    (6, None),
    (7, "xyzzy plugh qwerty"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string")


def profile_map(docs):
    return {r["doc_id"]: r for r in T.text_profile(docs, "text", "doc_id").collect()}


def test_token_counts(spark, docs):
    p = profile_map(docs)
    assert p[1]["n_tokens_ws"] == 8
    # BPE-ish: words + punctuation marks separately: 8 words + '.' + '!'
    assert p[1]["n_tokens_bpe"] == 10
    assert p[5]["n_tokens_ws"] == 0 and p[6]["n_tokens_ws"] == 0
    assert p[5]["n_tokens_bpe"] == 0 and p[6]["n_tokens_bpe"] == 0


def test_punct_and_alpha_ratio(spark, docs):
    p = profile_map(docs)
    text = DOCS[0][1]
    punct = sum(1 for c in text if not (c.isalnum() or c in " \t\n"))
    alpha = sum(1 for c in text if c.isalpha() and c.isascii())
    assert p[1]["punct_ratio"] == pytest.approx(punct / len(text), abs=1e-6)
    assert p[1]["alpha_ratio"] == pytest.approx(alpha / len(text), abs=1e-6)
    assert p[5]["punct_ratio"] == 0.0


def test_lang_id_markers(spark, docs):
    p = profile_map(docs)
    assert p[1]["lang_pred"] == "en"
    assert p[2]["lang_pred"] == "es"
    assert p[3]["lang_pred"] == "de"
    assert p[4]["lang_pred"] == "fr"
    assert p[7]["lang_pred"] == "und"  # no marker hits
    assert p[5]["lang_pred"] == "und" and p[6]["lang_pred"] == "und"


def test_quality_monotone_in_length(spark):
    df = spark.createDataFrame(
        [(1, "good clean words " * 1), (2, "good clean words " * 10)],
        "doc_id int, text string",
    )
    p = {r["doc_id"]: r["quality"] for r in T.text_profile(df).collect()}
    assert 0 < p[1] < p[2] <= 1.0


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "  hello world "), (3, "hello world!")],
        "doc_id int, text string",
    )
    fps = {r["doc_id"]: r["fp"] for r in df.select("doc_id", T.fingerprint_md5(F.col("text")).alias("fp")).collect()}
    assert fps[1] == fps[2]  # case + whitespace insensitive
    assert fps[1] != fps[3]


def test_shingles_and_winnow(spark):
    df = spark.createDataFrame([(1, "a b c d"), (2, "a b")], "doc_id int, text string")
    rows = df.select(
        "doc_id",
        T.shingles(F.col("text"), 3).alias("sh"),
        T.fingerprint_winnow(F.col("text"), 3).alias("fw"),
    ).collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert sorted(by_id[1]["sh"]) == ["a b c", "b c d"]
    assert by_id[2]["sh"] == []  # shorter than k
    assert by_id[2]["fw"] is not None  # falls back to whole-text hash


def test_profile_on_testdata_documents(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    prof = T.text_profile(docs)
    agg = prof.agg(
        F.count("*").alias("n"),
        F.min("n_tokens_ws").alias("mn"),
        F.avg("quality").alias("q"),
    ).first()
    assert agg["n"] == docs.count()
    assert agg["mn"] > 0
    assert 0.5 < agg["q"] <= 1.0
    # profile is a single narrow pass: no shuffle, no Python
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "PythonUDF" not in plan


# ----------------------------------------------- repetition signals

REP_DOCS = [
    # "the cat" ×3 (2-gram run), "the" ×3 of 7 words
    (1, "the cat the cat the cat sat"),
    # 5 lines (x,y,x,z,x): 2 repeated lines, 2/5 of line chars duplicated
    (2, "x\ny\nx\nz\nx\n"),
    (3, ""),
    (4, None),
    (5, "unique words only here now"),
    # CRLF twin of doc 2 must produce identical line metrics
    (6, "x\r\ny\r\nx\r\nz\r\nx\r\n"),
]


@pytest.fixture(scope="module")
def rep_docs(spark):
    return spark.createDataFrame(REP_DOCS, "doc_id int, text string")


def rep_map(df):
    return {
        r["doc_id"]: r for r in T.repetition_profile(df, "text", "doc_id").collect()
    }


def test_repetition_word_signals(spark, rep_docs):
    p = rep_map(rep_docs)
    d = p[1]  # 7 words, distinct {the, cat, sat}; norm len 27
    assert d["n_words"] == 7
    assert d["dup_word_frac"] == pytest.approx((7 - 3) / 7, abs=1e-6)
    assert d["top_word_frac"] == pytest.approx(3 / 7, abs=1e-6)
    # "the cat" occurs 3× (7 chars) of 27 normalized chars
    assert d["top_2gram_char_frac"] == pytest.approx(21 / 27, abs=1e-6)
    # "cat the cat" occurs 2× (11 chars)
    assert d["top_3gram_char_frac"] == pytest.approx(22 / 27, abs=1e-6)
    assert p[5]["dup_word_frac"] == 0.0
    assert p[5]["top_word_frac"] == pytest.approx(1 / 5, abs=1e-6)


def test_repetition_line_signals(spark, rep_docs):
    p = rep_map(rep_docs)
    for i in (2, 6):  # LF and CRLF twins agree exactly
        d = p[i]
        assert d["n_lines"] == 5
        assert d["dup_line_frac"] == pytest.approx(2 / 5, abs=1e-6)
        assert d["dup_line_char_frac"] == pytest.approx(2 / 5, abs=1e-6)
    assert p[1]["dup_line_frac"] == 0.0  # single line, no repeats


def test_repetition_empty_and_null(spark, rep_docs):
    p = rep_map(rep_docs)
    for i in (3, 4):
        assert p[i]["n_words"] == 0 and p[i]["n_lines"] == 0
        for m in (
            "dup_word_frac",
            "top_word_frac",
            "top_2gram_char_frac",
            "top_3gram_char_frac",
            "dup_line_frac",
            "dup_line_char_frac",
        ):
            assert p[i][m] == 0.0


def test_repetition_gate_min_words(spark, rep_docs):
    # every doc is shorter than the Gopher floor → no violations at all
    assert T.repetition_violations(rep_docs, "text", "doc_id").count() == 0
    # drop the floor: the boilerplate docs trip their gates
    rows = T.repetition_violations(
        rep_docs, "text", "doc_id", min_words=1
    ).collect()
    by_rule = {(r["doc_id"], r["rule_id"]) for r in rows}
    assert (2, "repetition_dup_line_frac") in by_rule
    assert (2, "repetition_dup_line_char_frac") in by_rule
    assert (1, "repetition_top_2gram_char_frac") in by_rule
    # custom gate dict: only the named gates are evaluated
    only = T.repetition_violations(
        rep_docs, "text", "doc_id", gates={"dup_line_frac": 0.3}, min_words=1
    ).collect()
    assert {r["rule_id"] for r in only} == {"repetition_dup_line_frac"}
    assert all(r["kind"] == "repetition" for r in only)


def test_repetition_plan_is_one_narrow_pass(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    prof = T.repetition_profile(docs)
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "PythonUDF" not in plan
    gate = T.repetition_violations(docs)
    plan = gate._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "PythonUDF" not in plan


# ----------------------------------------------- Gopher quality signals

QUAL_DOCS = [
    (1, "the cat and the dog be to of and that have with them all today"),
    (2, "- one\n- two\n- three\nplain line ends here...\nanother…"),
    (3, "### heading # tag # tag # more # symbols # here"),
    (4, ""),
    (5, None),
    (6, "12 34 56 78 90"),  # no alphabetic words
]


@pytest.fixture(scope="module")
def qual_docs(spark):
    return spark.createDataFrame(QUAL_DOCS, "doc_id int, text string")


def test_gopher_quality_values(spark, qual_docs):
    p = {r["doc_id"]: r for r in T.gopher_quality_profile(qual_docs).collect()}
    d = p[1]  # 15 words; stopword hits: the×2,and×2,be,to,of,that,have,with = 10
    assert d["n_words"] == 15
    assert d["n_stopwords"] == 10
    assert d["alpha_word_frac"] == pytest.approx(1.0)
    d = p[2]  # 5 lines: 3 bullets, 2 ellipsis-terminated
    assert d["n_lines"] == 5
    assert d["bullet_line_frac"] == pytest.approx(3 / 5, abs=1e-6)
    assert d["ellipsis_line_frac"] == pytest.approx(2 / 5, abs=1e-6)
    d = p[3]  # 6 '#' chars, 9 words
    assert d["symbol_word_ratio"] == pytest.approx(6 / 9, abs=1e-6)
    assert p[6]["alpha_word_frac"] == 0.0
    for i in (4, 5):
        assert p[i]["n_words"] == 0 and p[i]["mean_word_len"] == 0.0


def test_gopher_quality_gates(spark, qual_docs):
    rows = T.gopher_quality_violations(qual_docs).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add(r["rule_id"])
    # every crafted doc is under Gopher's 50-word floor
    for i in (1, 2, 3, 4, 5, 6):
        assert "gopher_n_words" in by_doc[i]
    assert "gopher_symbol_word_ratio" in by_doc[3]
    assert "gopher_alpha_word_frac" in by_doc[6]
    assert "gopher_n_stopwords" in by_doc[6]
    assert "gopher_n_stopwords" not in by_doc[1]
    assert all(r["kind"] == "quality" for r in rows)


def test_gopher_plan_is_one_narrow_pass(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for frame in (
        T.gopher_quality_profile(docs),
        T.gopher_quality_violations(docs),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "PythonUDF" not in plan


def test_top_gram_is_most_frequent_not_longest(spark):
    """Gopher semantics: the top n-gram is the MOST FREQUENT one — a unique
    long gram must not outrank a repeated short one."""
    # "a b" x3 (coverage 3*3=9); unique 2-grams like "ccc dddddddddd" (14)
    doc = "a b a b a b ccc dddddddddd eee"
    r = T.repetition_profile(
        spark.createDataFrame([(1, doc)], "doc_id int, text string")
    ).collect()[0]
    norm_len = len(doc)
    assert r["top_2gram_char_frac"] == pytest.approx(9 / norm_len, abs=1e-6)
    # all-unique doc: counts tie at 1, longest gram wins (deterministic)
    doc2 = "one two three dddddddddd"
    r2 = T.repetition_profile(
        spark.createDataFrame([(1, doc2)], "doc_id int, text string")
    ).collect()[0]
    assert r2["top_2gram_char_frac"] == pytest.approx(
        len("three dddddddddd") / len(doc2), abs=1e-6
    )


def test_tab_indented_bullets_and_padded_ellipsis(spark):
    df = spark.createDataFrame(
        [(1, "\t- tabbed bullet\n  * spaced bullet\nplain\ntrailing dots...\t\n")],
        "doc_id int, text string",
    )
    r = T.gopher_quality_profile(df).collect()[0]
    assert r["bullet_line_frac"] == pytest.approx(2 / 4, abs=1e-6)
    assert r["ellipsis_line_frac"] == pytest.approx(1 / 4, abs=1e-6)


def test_quality_rule_skips_null_text(spark):
    """TextQualityRule follows the content-rule NULL contract: a missing
    value is NotNullRule's report, never a zero-valued quality failure."""
    from mdvalidate_spark import Spec, TextQualityRule, compile_spec
    from mdvalidate_spark.operators.row_rules import (
        row_violations,
        with_partition_id,
    )

    df = spark.createDataFrame([(1, None)], "doc_id int, text string")
    spec = Spec(
        rules=(TextQualityRule("sw", column="text", metric="n_stopwords", min=2.0),),
        key_column="doc_id",
        n_partitions=2,
    )
    prog = compile_spec(spec, df.schema)
    assert row_violations(with_partition_id(df, spec), prog, "t").count() == 0


# ------------------------------------------------------------ zipf profile


def test_zipf_profile_exact_counts_and_tiebreak(spark):
    from mdvalidate_spark.operators.text import zipf_profile

    df = spark.createDataFrame(
        [
            ("a", "the cat the dog THE  bird"),  # normalize: case + runs
            ("b", "the fish\ncat"),
            ("c", None),  # NULL doc dropped
            ("d", ""),  # empty doc contributes nothing
        ],
        "doc_id string, text string",
    )
    got = [tuple(r) for r in zipf_profile(df, "text", top_n=4).collect()]
    # 'the' x4; tie at 2 ('cat') then ties at 1 break token-ascending
    assert got == [(1, "the", 4), (2, "cat", 2), (3, "bird", 1), (4, "dog", 1)]
    # min_count filters the singleton tail before ranking
    got2 = [
        tuple(r)
        for r in zipf_profile(df, "text", top_n=4, min_count=2).collect()
    ]
    assert got2 == [(1, "the", 4), (2, "cat", 2)]


def test_zipf_slope_matches_numpy(spark):
    import math

    import numpy as np

    from mdvalidate_spark.operators.text import zipf_profile, zipf_slope

    # synthetic corpus with a known head: token t_i appears ~ 1000/i times
    rows = []
    for i in range(1, 21):
        rows.extend(("d", f"t{i:02d}") for _ in range(1000 // i))
    df = spark.createDataFrame(rows, "doc_id string, text string")
    prof = zipf_profile(df, "text", top_n=20)
    row = zipf_slope(prof).collect()[0]
    ranks = np.log(np.arange(1, 21))
    counts = np.log(np.array([1000 // i for i in range(1, 21)]))
    slope_np = np.polyfit(ranks, counts, 1)[0]
    assert math.isclose(row.slope, slope_np, rel_tol=1e-9)
    assert row.n_ranks == 20
    assert 0.99 < row.r2 <= 1.0  # near-perfect power law by construction


def test_zipf_refusals_and_plan(spark):
    import pytest

    from mdvalidate_spark.errors import SchemaError
    from mdvalidate_spark.operators.text import zipf_profile

    df = spark.createDataFrame([("a", "x")], "doc_id string, text string")
    with pytest.raises(SchemaError, match="top_n"):
        zipf_profile(df, "text", top_n=0)
    with pytest.raises(SchemaError, match="min_count"):
        zipf_profile(df, "text", min_count=0)
    with pytest.raises(SchemaError, match="not in"):
        zipf_profile(df, "body")
    # head extraction must be a TakeOrdered heap, never a global sort
    plan = (
        zipf_profile(df, "text", top_n=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Exchange") == 1  # the wordcount shuffle only
    assert "Python" not in plan


# ------------------------------------------------- compressibility signal


def test_compressibility_signal_and_gate(spark):
    from mdvalidate_spark.operators.text import (
        compressibility,
        compressibility_violations,
    )

    import random

    rnd = random.Random(5)
    boiler = "spam " * 200                      # ratio -> ~0
    junk = "".join(chr(rnd.randint(33, 0x2FFF)) for _ in range(800))
    normal = " ".join(
        f"w{rnd.randint(0, 5000)} token{rnd.randint(0, 99)}" for _ in range(80)
    )
    df = spark.createDataFrame(
        [(1, boiler), (2, junk), (3, normal), (4, None), (5, "tiny")],
        "doc_id long, text string",
    )
    prof = {r["doc_id"]: r for r in compressibility(df).collect()}
    assert prof[4]["compression_ratio"] is None  # NULL text out of scope
    assert prof[1]["compression_ratio"] < 0.1
    assert prof[2]["compression_ratio"] > prof[3]["compression_ratio"]
    assert prof[3]["n_bytes"] == len(normal.encode())
    # determinism: byte-exact across calls (fixed level)
    again = {r["doc_id"]: r for r in compressibility(df).collect()}
    assert all(
        prof[k]["n_compressed"] == again[k]["n_compressed"] for k in (1, 2, 3)
    )
    bad = {r["doc_id"]: r["kind"]
           for r in compressibility_violations(
               df, min_ratio=0.15, max_ratio=0.6).collect()}
    assert bad.get(1) == "boilerplate"
    assert bad.get(2) == "junk"
    assert 3 not in bad and 5 not in bad  # normal passes; tiny skipped
    import pytest as _pt
    with _pt.raises(ValueError):
        compressibility_violations(df, min_ratio=0.9, max_ratio=0.5)
