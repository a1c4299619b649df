"""PiiRule / RepetitionRule as first-class spec rules: compile lints, fused
row-pass evaluation, when-scoping, spec_io round trip."""

import pytest
from pyspark.sql import functions as F

from mdvalidate_spark import PiiRule, RepetitionRule, Spec, compile_spec
from mdvalidate_spark.errors import SchemaError
from mdvalidate_spark.operators.row_rules import row_violations, with_partition_id
from mdvalidate_spark.spec_io import rule_from_dict

ROWS = [
    (1, "mail me at a@b.co please do not share it widely"),
    (2, "x y x y x y x y x y x y x y x y x y x y x y"),  # top-2gram heavy
    # long enough that its (unique) top 2-gram covers <20% of characters —
    # short unique-word docs legitimately trip the gate, hence min_words
    (3, "one perfectly ordinary caption about a photo of some dog with two "
        "birds near tall green trees beside the quiet river bank at dawn today"),
    (4, None),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id int, text string")


def _run(docs, *rules):
    spec = Spec(rules=tuple(rules), key_column="doc_id", n_partitions=4)
    prog = compile_spec(spec, docs.schema)
    return row_violations(with_partition_id(docs, spec), prog, "t").collect()


def test_pii_rule_fires(spark, docs):
    rows = _run(docs, PiiRule("no_pii", column="text"))
    assert {r["image_id"] for r in rows} == {"1"}
    v = rows[0]
    assert v["kind"] == "pii" and v["actual"] == "1 (email=1)"
    assert v["expected"] == "pii_total <= 0"


def test_pii_rule_kinds_scoping(spark, docs):
    # only phone counted → email-only doc is clean
    assert _run(docs, PiiRule("p", column="text", kinds=("phone",))) == []


def test_repetition_rule_fires(spark, docs):
    rows = _run(
        docs,
        RepetitionRule(
            "rep", column="text", metric="top_2gram_char_frac", max=0.2, min_words=12
        ),
    )
    assert {r["image_id"] for r in rows} == {"2"}
    assert rows[0]["kind"] == "repetition"
    # min_words floor puts the repetitive doc out of scope
    assert (
        _run(
            docs,
            RepetitionRule(
                "rep",
                column="text",
                metric="top_2gram_char_frac",
                max=0.2,
                min_words=40,
            ),
        )
        == []
    )


def test_when_scoping(spark, docs):
    rows = _run(docs, PiiRule("no_pii", column="text", when="doc_id > 1"))
    assert rows == []


def test_rules_ride_the_fused_pass(spark, docs):
    spec = Spec(
        rules=(
            PiiRule("no_pii", column="text"),
            RepetitionRule("rep", column="text", metric="dup_word_frac", max=0.5),
        ),
        key_column="doc_id",
        n_partitions=4,
    )
    prog = compile_spec(spec, docs.schema)
    v = row_violations(with_partition_id(docs, spec), prog, "t")
    plan = v._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "PythonUDF" not in plan


def test_compile_lints(spark, docs):
    with pytest.raises(SchemaError, match="unknown PII kind"):
        compile_spec(
            Spec(rules=(PiiRule("p", column="text", kinds=("dna",)),), key_column="doc_id")
        )
    with pytest.raises(SchemaError, match="max_total"):
        compile_spec(
            Spec(rules=(PiiRule("p", column="text", max_total=-1),), key_column="doc_id")
        )
    with pytest.raises(SchemaError, match="unknown repetition metric"):
        compile_spec(
            Spec(rules=(RepetitionRule("r", column="text", metric="vibes"),), key_column="doc_id")
        )
    with pytest.raises(SchemaError, match="fraction"):
        compile_spec(
            Spec(rules=(RepetitionRule("r", column="text", max=3.0),), key_column="doc_id")
        )
    # typed schema → non-string column rejected at compile, not mid-job
    with pytest.raises(SchemaError, match="must be STRING"):
        compile_spec(
            Spec(rules=(PiiRule("p", column="doc_id"),), key_column="doc_id"),
            docs.schema,
        )
    with pytest.raises(SchemaError, match="must be STRING"):
        compile_spec(
            Spec(rules=(RepetitionRule("r", column="doc_id"),), key_column="doc_id"),
            docs.schema,
        )


def test_spec_io_round_trip(spark):
    r = rule_from_dict(
        {"kind": "pii", "id": "p", "column": "caption", "kinds": ["email"]}
    )
    assert isinstance(r, PiiRule) and r.kinds == ("email",)
    r = rule_from_dict(
        {"kind": "repetition", "id": "r", "column": "caption", "metric": "dup_line_frac", "max": 0.25}
    )
    assert isinstance(r, RepetitionRule) and r.max == 0.25


def test_text_quality_rule(spark, docs):
    from mdvalidate_spark import TextQualityRule

    # doc 2 ("x y x y ...") has mean word length 1 — outside [3, 10]
    rows = _run(
        docs,
        TextQualityRule("wl", column="text", metric="mean_word_len", min=3.0, max=10.0),
    )
    fails = {r["image_id"] for r in rows}
    assert "2" in fails and all(r["kind"] == "quality" for r in rows)
    # open-ended: stop-word floor
    rows = _run(
        docs, TextQualityRule("sw", column="text", metric="n_stopwords", min=1.0)
    )
    assert "2" in {r["image_id"] for r in rows}  # no stopwords in x/y doc
    assert rows[0]["expected"].startswith("n_stopwords >=")


def test_text_quality_rule_lints(spark, docs):
    from mdvalidate_spark import TextQualityRule

    with pytest.raises(SchemaError, match="unknown quality metric"):
        compile_spec(
            Spec(rules=(TextQualityRule("q", column="text", metric="vibes", max=1.0),), key_column="doc_id")
        )
    with pytest.raises(SchemaError, match="needs min and/or max"):
        compile_spec(
            Spec(rules=(TextQualityRule("q", column="text"),), key_column="doc_id")
        )
    with pytest.raises(SchemaError, match="min"):
        compile_spec(
            Spec(rules=(TextQualityRule("q", column="text", min=5.0, max=1.0),), key_column="doc_id")
        )
    with pytest.raises(SchemaError, match="must be STRING"):
        compile_spec(
            Spec(rules=(TextQualityRule("q", column="doc_id", max=1.0),), key_column="doc_id"),
            docs.schema,
        )
    # spec_io round trip
    from mdvalidate_spark.spec_io import rule_from_dict
    r = rule_from_dict({"kind": "text_quality", "id": "q", "column": "caption", "metric": "alpha_word_frac", "min": 0.8})
    from mdvalidate_spark import TextQualityRule as TQ
    assert isinstance(r, TQ) and r.min == 0.8


def test_all_text_rules_fuse_in_one_pass(spark, docs):
    from mdvalidate_spark import PiiRule, RepetitionRule, TextQualityRule

    spec = Spec(
        rules=(
            PiiRule("p", column="text"),
            RepetitionRule("r", column="text", metric="dup_word_frac", max=0.5),
            TextQualityRule("q", column="text", metric="mean_word_len", min=3.0, max=10.0),
        ),
        key_column="doc_id",
        n_partitions=4,
    )
    prog = compile_spec(spec, docs.schema)
    v = row_violations(with_partition_id(docs, spec), prog, "t")
    plan = v._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "PythonUDF" not in plan
