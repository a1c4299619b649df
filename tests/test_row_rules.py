"""Golden tests for the fused row pass over the deterministic fixture —
the analog of the reference's exact-expected-errors test_case! macro
(tests/helpers/mod.rs:15-30)."""

import pytest
from pyspark.sql import functions as F

from mdvalidate_spark.compile import compile_spec
from mdvalidate_spark.operators.row_rules import row_violations, with_partition_id
from mdvalidate_spark.sources.synthetic import (
    expected_violation_counts,
    synthetic_images,
)
from mdvalidate_spark.spec import (
    DomainRule,
    LiteralRule,
    NotNullRule,
    RangeRule,
    RegexRule,
    Spec,
)

ROWS = 1000


@pytest.fixture(scope="module")
def images(spark):
    df = synthetic_images(spark, ROWS, with_bytes=False).cache()
    df.count()
    yield df
    df.unpersist()


def base_spec(rules):
    return Spec(rules=tuple(rules), key_column="image_id", n_partitions=8)


def run_rows(spark, df, rules):
    spec = base_spec(rules)
    prog = compile_spec(spec, df.columns)
    return row_violations(df, prog, "t")


def test_golden_counts_all_row_rules(spark, images):
    exp = expected_violation_counts(ROWS)
    v = run_rows(
        spark,
        images,
        [
            NotNullRule("nn", column="caption"),
            RegexRule("rx", column="caption", pattern=r"A photo number \d+ of \w+"),
            RangeRule("rg", column="w", min=1, max=10000),
            DomainRule("dm", column="fmt", values=("jpeg", "png", "webp")),
        ],
    )
    counts = {r["rule_id"]: r["n"] for r in v.groupBy("rule_id").agg(F.count("*").alias("n")).collect()}
    assert counts.get("nn", 0) == exp["caption_null"]
    assert counts.get("rx", 0) == exp["caption_regex"]
    assert counts.get("rg", 0) == exp["w_range"]
    assert counts.get("dm", 0) == exp["fmt_domain"]


def test_violation_payload_shape(spark, images):
    # expected/actual/kind mirror NodeContentMismatch (errors.rs:332-341)
    v = run_rows(spark, images, [DomainRule("dm", column="fmt", values=("jpeg", "png", "webp"))])
    row = v.orderBy("image_id").first()
    assert row["kind"] == "domain"
    assert row["actual"] == "bmp"
    assert "jpeg" in row["expected"]
    assert row["column"] == "fmt"
    assert row["image_id"].startswith("img")
    assert row["partition_id"] is not None


def test_null_values_skip_content_rules(spark, images):
    # "one error once" non-cascade (cmd.rs:368-398): NULL caption is flagged
    # by not-null only, never also by the regex rule
    v = run_rows(
        spark,
        images,
        [RegexRule("rx", column="caption", pattern=r"A photo number \d+ of \w+")],
    )
    nulls = images.where(F.col("caption").isNull()).count()
    assert nulls > 0
    joined = v.join(
        images.where(F.col("caption").isNull()).select("image_id"), "image_id"
    )
    assert joined.count() == 0


def test_literal_rule_against_other_column(spark, images):
    # caption round-trip equality (the input_hint "exact caption equality")
    df = images.withColumn("caption2", F.col("caption"))
    v = run_rows(spark, df, [LiteralRule("eq", column="caption", other_column="caption2")])
    assert v.count() == 0
    df_bad = images.withColumn("caption2", F.concat(F.col("caption"), F.lit("x")))
    v2 = run_rows(spark, df_bad, [LiteralRule("eq", column="caption", other_column="caption2")])
    assert v2.count() == images.where(F.col("caption").isNotNull()).count()


def test_row_pass_is_single_stage_jvm_only(spark, images):
    """The fused pass must stay inside whole-stage codegen: no Python eval,
    no shuffle (explode + filter are narrow)."""
    v = run_rows(
        spark,
        images,
        [
            RegexRule("rx", column="caption", pattern=r"A photo number \d+ of \w+"),
            RangeRule("rg", column="w", min=1, max=10000),
        ],
    )
    plan = v._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle in the row stage
    assert "PythonUDF" not in plan  # all-JVM kernels


def test_stable_partition_ids(spark, images):
    spec = base_spec([])
    a = with_partition_id(images.select("image_id", "caption"), spec)
    ids = dict(a.select("image_id", "partition_id").limit(100).collect())
    b = with_partition_id(images.select("image_id", "caption"), spec)
    ids2 = dict(b.select("image_id", "partition_id").limit(100).collect())
    assert ids == ids2
    assert all(0 <= p < 8 for p in ids.values())


def test_composite_rule_segment_taxonomy(spark):
    """CompositeRegexRule preserves the reference's Prefix/Matcher/Suffix
    violation kinds (matchers.rs:38-431, errors.rs:294-303) and reports only
    the FIRST failing segment per row ("one error once")."""
    from mdvalidate_spark.spec import CompositeRegexRule

    df = with_partition_id(
        spark.createDataFrame(
            [
                ("r1", "img://0042.png"),   # pass
                ("r2", "IMG://0042.png"),   # prefix fails
                ("r3", "img://x42.png"),    # matcher fails
                ("r4", "img://0042.jpg"),   # suffix fails
                ("r5", None),               # NULL → skipped entirely
            ],
            "image_id string, uri string",
        ),
        base_spec([]),
    )
    v = run_rows(
        spark,
        df,
        [CompositeRegexRule("uri_c", column="uri", prefix="img://",
                            pattern=r"[0-9]{4}", suffix=".png")],
    ).collect()
    got = {r["image_id"]: r for r in v}
    assert set(got) == {"r2", "r3", "r4"}  # exactly one violation per bad row
    assert got["r2"]["kind"] == "prefix"
    assert got["r2"]["expected"] == "img://" and got["r2"]["actual"] == "IMG://"
    assert got["r3"]["kind"] == "matcher"
    assert got["r3"]["actual"] == "x42.png"
    assert got["r4"]["kind"] == "suffix"
    assert got["r4"]["expected"] == ".png" and got["r4"]["actual"] == ".jpg"


def test_composite_rule_compile_lint(spark):
    """Composite pattern is linted at compile; it also counts as the
    column's single non-literal matcher (conflict with a RegexRule)."""
    from mdvalidate_spark.compile import compile_spec
    from mdvalidate_spark.errors import ConflictingRulesError, MalformedRegexError
    from mdvalidate_spark.spec import CompositeRegexRule, RegexRule, Spec

    with pytest.raises(MalformedRegexError):
        compile_spec(
            Spec(rules=(CompositeRegexRule("c", column="u", pattern="("),),
                 key_column="u"),
            ["u"],
        )
    with pytest.raises(ConflictingRulesError):
        compile_spec(
            Spec(
                rules=(
                    CompositeRegexRule("c", column="u", pattern="a"),
                    RegexRule("r", column="u", pattern="b"),
                ),
                key_column="u",
            ),
            ["u"],
        )


def test_composite_rule_stays_jvm_side(spark):
    """The composite pipeline is one codegen'd expression: no Exchange, no
    PythonUDF in the row stage (same plan-shape bar as the other row rules)."""
    from mdvalidate_spark.spec import CompositeRegexRule

    df = with_partition_id(
        spark.createDataFrame([("a", "img://1.png")], "image_id string, uri string"),
        base_spec([]),
    )
    v = run_rows(
        spark, df,
        [CompositeRegexRule("c", column="uri", prefix="img://", pattern=r"[0-9]+",
                            suffix=".png")],
    )
    plan = v._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "PythonUDF" not in plan.replace("PythonUDFRunner", "")


def test_nested_struct_column_targeting(spark):
    """Dotted struct paths resolve against df.schema at compile (QuoteVsQuote
    step-into, quotes.rs:21-66) and evaluate in the fused row pass."""
    from mdvalidate_spark.compile import compile_spec
    from mdvalidate_spark.errors import UnknownColumnError
    from mdvalidate_spark.spec import RangeRule, RegexRule, Spec

    df = spark.createDataFrame(
        [("a", (10, "png")), ("b", (9000, "png")), ("c", (20, "bmp"))],
        "image_id string, meta struct<width:int, fmt:string>",
    )
    spec = Spec(
        rules=(
            RangeRule("w", column="meta.width", min=1, max=1000),
            RegexRule("f", column="meta.fmt", pattern="png|jpeg"),
        ),
        key_column="image_id",
        n_partitions=2,
    )
    prog = compile_spec(spec, df.schema)
    v = row_violations(with_partition_id(df, spec), prog, "t").collect()
    got = {(r["image_id"], r["rule_id"]) for r in v}
    assert got == {("b", "w"), ("c", "f")}
    assert all(r["column"].startswith("meta.") for r in v)

    # bad nested path rejected at compile; dotted path against a plain
    # name list (no schema) also rejected — no silent acceptance
    with pytest.raises(UnknownColumnError):
        compile_spec(
            Spec(rules=(RangeRule("x", column="meta.nope", min=0),),
                 key_column="image_id"),
            df.schema,
        )
    with pytest.raises(UnknownColumnError):
        compile_spec(
            Spec(rules=(RangeRule("x", column="meta.width", min=0),),
                 key_column="image_id"),
            ["image_id", "meta"],
        )


def test_nested_struct_through_validation_run(spark):
    """ValidationRun compiles against df.schema, so nested targets work
    through the full lifecycle."""
    from mdvalidate_spark.run import validate_table
    from mdvalidate_spark.spec import RangeRule, Spec

    df = spark.createDataFrame(
        [("a", (10,)), ("b", (9000,))], "image_id string, meta struct<w:int>"
    )
    rep = validate_table(
        spark, df,
        Spec(rules=(RangeRule("w", column="meta.w", min=1, max=100),),
             key_column="image_id", n_partitions=2),
    )
    rows = rep.violations.collect()
    assert [r["image_id"] for r in rows] == ["b"]


# ------------------------------------------------- when (row-scope predicate)


def test_when_scopes_rule_to_matching_rows(spark, images):
    """A `when`-scoped rule fires only where the predicate is TRUE — parity
    with the unconditional rule evaluated over a pre-filtered frame."""
    rule = RangeRule("w_png", column="w", min=1.0, max=10000.0, when="fmt = 'png'")
    v = run_rows(spark, images, [rule]).collect()
    expected = run_rows(
        spark, images.where(F.col("fmt") == "png"),
        [RangeRule("w_png", column="w", min=1.0, max=10000.0)],
    ).collect()
    assert sorted(r["image_id"] for r in v) == sorted(
        r["image_id"] for r in expected
    )
    assert len(v) > 0  # non-vacuous on the fixture


def test_when_null_predicate_is_out_of_scope(spark):
    """FALSE and NULL predicate rows are both out of scope (pass)."""
    df = with_partition_id(
        spark.createDataFrame(
            [("a", "x", None), ("b", "x", "jpeg"), ("c", "x", "png")],
            "image_id string, v string, fmt string",
        ),
        base_spec([]),
    )
    rule = RegexRule("rx", column="v", pattern="[0-9]+", when="fmt = 'png'")
    v = run_rows(spark, df, [rule]).collect()
    assert [r["image_id"] for r in v] == ["c"]  # NULL fmt (a) passes


def test_when_predicate_validated_at_run_init(spark):
    """A typo'd or non-boolean `when` is a SchemaError before any job."""
    from mdvalidate_spark.errors import SchemaError
    from mdvalidate_spark.run import ValidationRun

    df = spark.createDataFrame([("a", 1)], "image_id string, w int")
    for bad in ("lenght(image_id) > 1", "w + 1"):
        with pytest.raises(SchemaError):
            ValidationRun(
                spark,
                base_spec([RangeRule("r", column="w", min=0.0, when=bad)]),
                df,
            )
    # a valid predicate constructs fine
    ValidationRun(
        spark, base_spec([RangeRule("r", column="w", min=0.0, when="w > 0")]), df
    )


def test_when_stays_in_fused_single_stage(spark, images):
    """The predicate gate is part of the fused row pass — no extra exchange,
    no Python."""
    rule = DomainRule("d", column="fmt", values=("png", "jpeg", "webp"),
                      when="w > 0")
    v = run_rows(spark, images, [rule])
    plan = v._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "PythonUDF" not in plan


# ----------------------------------------------------- vector (embeddings)


def _vec_df(spark):
    rows = [
        ("ok", [0.6, 0.8]),
        ("short", [1.0]),
        ("nan", [float("nan"), 1.0]),
        ("inf", [float("inf"), 1.0]),
        ("nullelem", [None, 1.0]),
        ("big", [30.0, 40.0]),
        ("nullvec", None),
    ]
    return with_partition_id(
        spark.createDataFrame(rows, "image_id string, emb array<float>"),
        base_spec([]),
    )


def test_vector_rule_taxonomy_and_precedence(spark):
    """dim → bad element → norm, first failure only; NULL vectors pass
    (NotNullRule's job)."""
    from mdvalidate_spark.spec import VectorRule

    rule = VectorRule("vec", column="emb", dim=2, min_norm=0.9, max_norm=1.1)
    v = {r["image_id"]: r for r in run_rows(spark, _vec_df(spark), [rule]).collect()}
    assert set(v) == {"short", "nan", "inf", "nullelem", "big"}
    assert v["short"]["kind"] == "dim_mismatch" and v["short"]["actual"] == "1"
    assert v["nan"]["kind"] == "nan"
    assert v["inf"]["kind"] == "nan"
    assert v["nullelem"]["kind"] == "nan"
    assert v["big"]["kind"] == "range" and v["big"]["actual"] == "50.000000"


def test_vector_rule_partial_checks(spark):
    """Each check is independently optional; a no-op rule is a SchemaError."""
    from mdvalidate_spark.errors import SchemaError
    from mdvalidate_spark.spec import VectorRule

    df = _vec_df(spark)
    only_dim = VectorRule("vd", column="emb", dim=2, forbid_nan=False)
    v = {r["image_id"] for r in run_rows(spark, df, [only_dim]).collect()}
    assert v == {"short"}
    only_norm = VectorRule(
        "vn", column="emb", min_norm=0.9, max_norm=1.1, forbid_nan=False
    )
    v = {r["image_id"] for r in run_rows(spark, df, [only_norm]).collect()}
    # NaN/Inf norms compare as > max in Spark's ordering; null element → null
    # norm → pass (documented: use forbid_nan to own those rows)
    assert "big" in v and "ok" not in v and "nullelem" not in v
    with pytest.raises(SchemaError):
        compile_spec(
            base_spec([VectorRule("v0", column="emb", forbid_nan=False)]),
            ["image_id", "emb"],
        )
    with pytest.raises(SchemaError):
        compile_spec(
            base_spec(
                [VectorRule("v1", column="emb", min_norm=2.0, max_norm=1.0)]
            ),
            ["image_id", "emb"],
        )


def test_vector_rule_single_stage_no_python(spark):
    from mdvalidate_spark.spec import VectorRule

    rule = VectorRule("vec", column="emb", dim=2, min_norm=0.9, max_norm=1.1)
    v = run_rows(spark, _vec_df(spark), [rule])
    plan = v._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "PythonUDF" not in plan


def _pair_df(spark):
    nan, inf = float("nan"), float("inf")
    rows = [
        ("ok", [1.0, 0.0], [1.0, 0.0]),          # cos 1.0
        ("mis", [1.0, 0.0], [0.0, 1.0]),         # cos 0.0 -> below floor
        ("anti", [1.0, 0.0], [-1.0, 0.0]),       # cos -1.0 -> below floor
        ("short", [1.0, 0.0], [1.0]),            # dim mismatch
        ("nan", [1.0, nan], [1.0, 0.0]),         # bad element side a
        ("inf", [1.0, 0.0], [inf, 0.0]),         # bad element side b
        ("zero", [0.0, 0.0], [1.0, 0.0]),        # zero norm -> no cosine
        ("nulla", None, [1.0, 0.0]),             # NULL vector -> out of scope
        ("nullelem", [1.0, None], [1.0, 0.0]),   # NULL element -> no cosine
    ]
    return with_partition_id(
        spark.createDataFrame(
            rows, "image_id string, a array<double>, b array<double>"
        ),
        base_spec([]),
    )


def test_alignment_rule_taxonomy_and_precedence(spark):
    """len mismatch → undefined cosine → band, first failure only; NULL
    vectors pass (NotNullRule's job); cosine rounded to 6 dp before the
    threshold compare."""
    from mdvalidate_spark.spec import AlignmentRule

    rule = AlignmentRule("al", column_a="a", column_b="b", min_cos=0.5)
    v = {r["image_id"]: r for r in run_rows(spark, _pair_df(spark), [rule]).collect()}
    assert set(v) == {"mis", "anti", "short", "nan", "inf", "zero", "nullelem"}
    assert v["short"]["kind"] == "dim_mismatch" and v["short"]["actual"] == "2!=1"
    for key in ("nan", "inf", "zero", "nullelem"):
        assert v[key]["kind"] == "nan", key
    assert v["mis"]["kind"] == "alignment" and v["mis"]["actual"] == "0.000000"
    assert v["anti"]["actual"] == "-1.000000"
    assert v["mis"]["expected"] == "cos >= 0.5"
    assert all(r["column"] == "a~b" for r in v.values())


def test_alignment_rule_ceiling_and_lints(spark):
    from mdvalidate_spark.errors import InvalidBoundsError, SchemaError
    from mdvalidate_spark.spec import AlignmentRule

    # ceiling: near-identity pairs are the violation (copied column)
    rule = AlignmentRule("al", column_a="a", column_b="b", max_cos=0.99)
    v = {r["image_id"]: r for r in run_rows(spark, _pair_df(spark), [rule]).collect()}
    assert v["ok"]["kind"] == "alignment" and v["ok"]["expected"] == "cos <= 0.99"
    assert "mis" not in v and "anti" not in v
    cols = ["image_id", "a", "b"]
    for bad in (
        AlignmentRule("b0", column_a="a", column_b="b"),           # band-less
        AlignmentRule("b1", column_a="a", column_b="a", min_cos=0.5),  # self
        AlignmentRule("b2", column_a="a", column_b="b", min_cos=1.5),  # range
        AlignmentRule("b3", column_a="a", column_b="", min_cos=0.5),   # empty
    ):
        with pytest.raises(SchemaError):
            compile_spec(base_spec([bad]), cols)
    with pytest.raises(InvalidBoundsError):
        compile_spec(
            base_spec(
                [AlignmentRule("b4", column_a="a", column_b="b",
                               min_cos=0.9, max_cos=0.1)]
            ),
            cols,
        )
    with pytest.raises(SchemaError):  # unknown column caught at compile
        compile_spec(
            base_spec(
                [AlignmentRule("b5", column_a="a", column_b="nope", min_cos=0.5)]
            ),
            cols,
        )


def test_alignment_rule_single_stage_no_python(spark):
    from mdvalidate_spark.spec import AlignmentRule

    rule = AlignmentRule("al", column_a="a", column_b="b", min_cos=0.5, max_cos=1.0)
    v = run_rows(spark, _pair_df(spark), [rule])
    plan = v._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "PythonUDF" not in plan


# ---------------------------------------------------- valid/quarantine split


def test_split_rows_partitions_the_table(spark, images):
    """valid ∪ quarantine = input; quarantine key set == violating key set
    from the report pass; valid rows carry no violation column."""
    from mdvalidate_spark.operators.row_rules import split_rows

    rules = [
        RegexRule("rx", column="caption", pattern=r"A photo number \d+ of \w+"),
        RangeRule("rg", column="w", min=1, max=10000),
        NotNullRule("nn", column="caption"),
    ]
    prog = compile_spec(base_spec(rules), images.columns)
    valid, quar = split_rows(images, prog)
    n_valid, n_quar = valid.count(), quar.count()
    assert n_valid + n_quar == ROWS
    report_keys = {
        r["image_id"]
        for r in run_rows(spark, with_partition_id(images, base_spec(rules)), rules).collect()
    }
    quar_keys = {str(r["image_id"]) for r in quar.select("image_id").collect()}
    assert quar_keys == report_keys
    assert "_violations" not in valid.columns
    # quarantine rows keep full payload + structured violations
    row = quar.limit(1).collect()[0]
    assert row["_violations"] and row["_violations"][0]["rule_id"] in {"rx", "rg", "nn"}


def test_split_rows_empty_program_all_valid(spark, images):
    from mdvalidate_spark.operators.row_rules import split_rows

    prog = compile_spec(base_spec([]), images.columns)
    valid, quar = split_rows(images, prog)
    assert quar.count() == 0
    assert valid.count() == ROWS


def test_with_row_violations_plan_jvm_single_stage(spark, images):
    from mdvalidate_spark.operators.row_rules import with_row_violations

    rules = [RangeRule("rg", column="w", min=1, max=10000)]
    prog = compile_spec(base_spec(rules), images.columns)
    ann = with_row_violations(images, prog)
    plan = ann._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "PythonUDF" not in plan


def test_write_split_one_scan_partition_pruned(spark, images, tmp_path):
    """One write partitioned by validity; reading the valid side prunes to
    its partition in-plan and round-trips the row count."""
    from mdvalidate_spark.operators.row_rules import split_rows, write_split

    rules = [RangeRule("rg", column="w", min=1, max=10000)]
    prog = compile_spec(base_spec(rules), images.columns)
    path = str(tmp_path / "split")
    p_valid, p_quar = write_split(images, prog, path)
    valid_df, quar_df = split_rows(images, prog)
    back = spark.read.parquet(path)
    # partition dirs round-trip as strings (Spark infers numerics/dates only)
    pruned = back.where(F.col("is_valid") == "true")
    assert pruned.count() == valid_df.count()
    assert back.where(F.col("is_valid") == "false").count() == quar_df.count()
    phys = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(is_valid" in phys or "is_valid" in phys.split("PartitionFilters")[1][:120]
    # quarantine side is self-describing json
    j = spark.read.parquet(p_quar).select("_violations").limit(1).collect()[0][0]
    assert '"rule_id"' in j


# ---------------------------------------------------------------- ExprRule


def _expr_fixture(spark):
    raw = spark.createDataFrame(
        [
            ("a", 10, 20, "xxxxxxxxxx"),   # 10*20=200 ok; len(text)=10 == n ok
            ("b", 100, 100, "xx"),          # 100*100=10000 > 5000 -> fail area
            ("c", 5, 5, "yyy"),             # area ok; n_chars=5 != len 3 -> fail len
            ("d", None, 4, "zz"),           # NULL input -> expr NULL -> out of scope
        ],
        "image_id string, w int, h int, caption string",
    ).withColumn("n_chars", F.when(F.col("image_id") == "c", 5).otherwise(F.length("caption")))
    return with_partition_id(raw, base_spec([]))


def test_expr_rule_cross_column_invariant(spark):
    from mdvalidate_spark.spec import ExprRule

    df = _expr_fixture(spark)
    v = run_rows(
        spark,
        df,
        [
            ExprRule("area", expr="w * h <= 5000", columns=("w", "h")),
            ExprRule(
                "len",
                expr="n_chars = length(caption)",
                columns=("n_chars", "caption"),
                actual_expr="concat(cast(n_chars as string), '!=', cast(length(caption) as string))",
            ),
        ],
    )
    rows = {(r["rule_id"], r["image_id"]): r for r in v.collect()}
    # exactly-FALSE fails; NULL result (row d) is out of scope
    assert set(rows) == {("area", "b"), ("len", "c")}
    area = rows[("area", "b")]
    assert area["kind"] == "expr"
    assert area["expected"] == "w * h <= 5000"
    assert area["actual"] is None  # no actual_expr
    assert area["column"] == "w,h"
    assert rows[("len", "c")]["actual"] == "5!=3"


def test_expr_rule_when_scopes(spark):
    from mdvalidate_spark.spec import ExprRule

    df = _expr_fixture(spark)
    v = run_rows(
        spark,
        df,
        [
            ExprRule(
                "area",
                expr="w * h <= 5000",
                columns=("w", "h", "image_id"),
                when="image_id <> 'b'",
            )
        ],
    )
    assert v.count() == 0  # the only violator is scoped out


def test_expr_rule_compile_and_init_validation(spark):
    from mdvalidate_spark.errors import SchemaError
    from mdvalidate_spark.run import ValidationRun
    from mdvalidate_spark.spec import ExprRule

    df = _expr_fixture(spark)
    # compile: empty expr / undeclared columns
    with pytest.raises(SchemaError):
        compile_spec(base_spec([ExprRule("e", expr="", columns=("w",))]))
    with pytest.raises(SchemaError):
        compile_spec(base_spec([ExprRule("e", expr="w > 0", columns=())]))
    # compile lint: declared column must exist
    with pytest.raises(SchemaError):
        compile_spec(
            base_spec([ExprRule("e", expr="nope > 0", columns=("nope",))]),
            df.columns,
        )
    # run init: expression reading an UNDECLARED column fails against the
    # pruned frame (loud, driver-side, before any job)
    with pytest.raises(SchemaError):
        ValidationRun(
            spark,
            base_spec([ExprRule("e", expr="w * h > 0", columns=("w",))]),
            df,
        )
    # run init: non-boolean expression rejected
    with pytest.raises(SchemaError):
        ValidationRun(
            spark,
            base_spec([ExprRule("e", expr="w + h", columns=("w", "h"))]),
            df,
        )
    # run init: bad actual_expr rejected
    with pytest.raises(SchemaError):
        ValidationRun(
            spark,
            base_spec(
                [
                    ExprRule(
                        "e",
                        expr="w > 0",
                        columns=("w",),
                        actual_expr="cast(h as string)",
                    )
                ]
            ),
            df,
        )


def test_expr_rule_stays_fused_jvm_only(spark, images):
    from mdvalidate_spark.spec import ExprRule

    v = run_rows(
        spark,
        images,
        [
            ExprRule("wh", expr="w <= h * 100", columns=("w", "h")),
            RangeRule("rg", column="w", min=1, max=10000),
        ],
    )
    plan = v._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "PythonUDF" not in plan


def test_expr_rule_spec_io_roundtrip(tmp_path):
    from mdvalidate_spark.spec import ExprRule
    from mdvalidate_spark.spec_io import load_spec, save_spec

    spec = base_spec(
        [ExprRule("e", expr="w > 0", columns=("w",), actual_expr="cast(w as string)")]
    )
    p = str(tmp_path / "spec.json")
    save_spec(spec, p)
    assert load_spec(p) == spec


# --------------------------------------------------------------- header rules


def _hdr_df(spark):
    """Six real MDV payloads (functions/codec.py encode), five mutated to hit
    each header-taxonomy branch exactly once."""
    from mdvalidate_spark.functions.codec import base_image, encode

    fmts = ["png", "jpeg", "webp"]
    rows = []
    for i in range(6):
        fmt = fmts[i % 3]
        rows.append([f"img{i}", bytearray(encode(base_image(i, 36, 24), fmt)), 36, 24, fmt])
    rows[1][1] = rows[1][1][:6]  # truncated mid-header
    rows[2][1] = bytearray(b"XXX") + rows[2][1][3:]  # wrong container magic
    rows[3][4] = "webp"  # fmt column lies (payload code byte says png)
    rows[4][2] = 99  # w column contradicts the header u16
    rows[5][3] = 7  # h column contradicts the header u16
    return with_partition_id(
        spark.createDataFrame(
            [tuple(r) for r in rows],
            "image_id string, bytes binary, w int, h int, fmt string",
        ),
        base_spec([]),
    )


def _mdv_header_rule(**kw):
    from mdvalidate_spark.functions.codec import FORMATS
    from mdvalidate_spark.spec import HeaderRule

    return HeaderRule(
        "hdr",
        column="bytes",
        magic="4D4456",
        fmt_column="fmt",
        fmt_codes={k: v[0] for k, v in FORMATS.items()},
        w_column="w",
        h_column="h",
        **kw,
    )


def test_header_rule_taxonomy_and_precedence(spark):
    """truncated → prefix → fmt_code → dim_mismatch, first failure only;
    clean real-codec payloads pass."""
    v = {r["image_id"]: r for r in run_rows(spark, _hdr_df(spark), [_mdv_header_rule()]).collect()}
    assert set(v) == {"img1", "img2", "img3", "img4", "img5"}
    assert v["img1"]["kind"] == "truncated" and v["img1"]["actual"] == "6"
    assert v["img2"]["kind"] == "prefix" and v["img2"]["actual"] == "585858"
    assert v["img3"]["kind"] == "fmt_code"
    assert v["img3"]["expected"] == "2" and v["img3"]["actual"] == "0"
    assert v["img4"]["kind"] == "dim_mismatch" and v["img4"]["column"] == "w"
    assert v["img4"]["expected"] == "99" and v["img4"]["actual"] == "36"
    assert v["img5"]["kind"] == "dim_mismatch" and v["img5"]["column"] == "h"


def test_header_rule_magic_by_fmt_and_unknown_fmt(spark):
    """Per-format magics of DIFFERENT lengths (real-world PNG/JPEG prefixes);
    a fmt value outside the mapping is out of scope (DomainRule's job)."""
    from mdvalidate_spark.spec import HeaderRule

    rows = [
        ("a", bytearray.fromhex("89504E470D0A1A0A" + "00" * 8), "png"),
        ("b", bytearray.fromhex("FFD8FF" + "00" * 13), "jpeg"),
        ("c", bytearray.fromhex("FFD8FF" + "00" * 13), "png"),  # jpeg bytes, png label
        ("d", bytearray.fromhex("00" * 16), "gif"),  # fmt not in mapping → pass
    ]
    df = with_partition_id(
        spark.createDataFrame(rows, "image_id string, bytes binary, fmt string"),
        base_spec([]),
    )
    rule = HeaderRule(
        "m",
        column="bytes",
        magic_by_fmt={"png": "89504E470D0A1A0A", "jpeg": "FFD8FF"},
        fmt_column="fmt",
    )
    v = {r["image_id"]: r for r in run_rows(spark, df, [rule]).collect()}
    assert set(v) == {"c"}
    assert v["c"]["kind"] == "prefix" and v["c"]["expected"] == "89504E470D0A1A0A"


def test_header_rule_truncation_gate_is_per_format(spark):
    """With per-format magics of different lengths, the truncation bound is
    the ROW'S OWN format's need, not the global max: a 4-byte payload is
    fine for jpeg (3-byte magic) but truncated for png (8-byte magic)."""
    from mdvalidate_spark.spec import HeaderRule

    rows = [
        ("jpeg_short_ok", bytearray.fromhex("FFD8FF00"), "jpeg"),   # 4B: passes
        ("png_short", bytearray.fromhex("89504E47"), "png"),        # 4B: truncated
        ("jpeg_tiny", bytearray.fromhex("FFD8"), "jpeg"),           # 2B: truncated
    ]
    df = with_partition_id(
        spark.createDataFrame(rows, "image_id string, bytes binary, fmt string"),
        base_spec([]),
    )
    rule = HeaderRule(
        "m",
        column="bytes",
        magic_by_fmt={"png": "89504E470D0A1A0A", "jpeg": "FFD8FF"},
        fmt_column="fmt",
    )
    v = {r["image_id"]: r for r in run_rows(spark, df, [rule]).collect()}
    assert set(v) == {"png_short", "jpeg_tiny"}
    assert v["png_short"]["kind"] == "truncated"
    assert v["png_short"]["expected"] == ">= 8 bytes"
    assert v["jpeg_tiny"]["kind"] == "truncated"
    assert v["jpeg_tiny"]["expected"] == ">= 3 bytes" and v["jpeg_tiny"]["actual"] == "2"


def test_header_rule_when_scope_and_null_pass(spark):
    """NULL payloads pass (NotNullRule owns them); `when` scopes the rule."""
    df = _hdr_df(spark).withColumn(
        "bytes", F.when(F.col("image_id") == "img2", F.lit(None)).otherwise(F.col("bytes"))
    )
    v = {r["image_id"] for r in run_rows(spark, df, [_mdv_header_rule()]).collect()}
    assert v == {"img1", "img3", "img4", "img5"}
    scoped = {
        r["image_id"]
        for r in run_rows(spark, df, [_mdv_header_rule(when="fmt = 'jpeg'")]).collect()
    }
    assert scoped == {"img1", "img4"}  # the two fmt='jpeg' violators


def test_header_rule_lints(spark):
    from mdvalidate_spark.errors import SchemaError
    from mdvalidate_spark.spec import HeaderRule

    cols = ["image_id", "bytes", "w", "h", "fmt"]
    for bad in [
        HeaderRule("h0", column="bytes"),  # checks nothing
        HeaderRule("h1", column="bytes", magic="4D4456", magic_by_fmt={"png": "89"},
                   fmt_column="fmt"),  # exclusive
        HeaderRule("h2", column="bytes", magic="4D445"),  # odd-length hex
        HeaderRule("h3", column="bytes", magic="4D44ZZ"),  # non-hex
        HeaderRule("h4", column="bytes", fmt_codes={"png": 0}),  # no fmt_column
        HeaderRule("h5", column="bytes", fmt_codes={"png": 300}, fmt_column="fmt"),
        HeaderRule("h6", column="bytes", magic="4D4456", code_offset=-1,
                   fmt_codes={"png": 0}, fmt_column="fmt"),
        HeaderRule("h7", column="bytes", w_column="w", h_column="h", h_offset=5),
        # code byte inside the w u16 field (ADVICE r3)
        HeaderRule("h8", column="bytes", fmt_codes={"png": 0}, fmt_column="fmt",
                   code_offset=4, w_column="w", w_offset=4),
        # code byte inside the h u16 field
        HeaderRule("h9", column="bytes", fmt_codes={"png": 0}, fmt_column="fmt",
                   code_offset=7, h_column="h", h_offset=6),
        # code byte inside the asserted magic prefix
        HeaderRule("h10", column="bytes", magic="4D445600",
                   fmt_codes={"png": 0}, fmt_column="fmt", code_offset=3),
    ]:
        with pytest.raises(SchemaError):
            compile_spec(base_spec([bad]), cols)


def test_header_rule_requires_binary_column_with_typed_schema(spark):
    """ADVICE r3: byte offsets are not character offsets — on a STRING
    column substring/hex mis-extract silently, so a typed schema must
    reject the rule at compile; a bare name list (no types) still passes."""
    from mdvalidate_spark.errors import SchemaError
    from mdvalidate_spark.spec import HeaderRule

    rule = HeaderRule("h", column="caption", magic="4D4456")
    df = spark.createDataFrame(
        [("k", "text", bytearray(b"MDV"))],
        "image_id string, caption string, bytes binary",
    )
    with pytest.raises(SchemaError, match="must be BINARY"):
        compile_spec(base_spec([rule]), df.schema)
    # name-list callers (no type info) keep compiling
    compile_spec(base_spec([rule]), ["image_id", "caption", "bytes"])
    # and a genuinely binary column passes the typed check
    compile_spec(
        base_spec([HeaderRule("h2", column="bytes", magic="4D4456")]), df.schema
    )


def test_header_rule_stays_fused_jvm_only(spark):
    v = run_rows(spark, _hdr_df(spark), [_mdv_header_rule()])
    plan = v._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "PythonUDF" not in plan


def test_header_rule_spec_io_roundtrip(tmp_path):
    from mdvalidate_spark.spec_io import load_spec, save_spec

    spec = base_spec([_mdv_header_rule()])
    p = str(tmp_path / "spec.json")
    save_spec(spec, p)
    assert load_spec(p) == spec


def test_header_rule_randomized_differential(spark):
    """Seeded randomized differential check: 200 payloads with random
    corruption classes; the fused column-algebra extraction (substring on
    binary + conv(hex)) must agree with a pure-Python struct reference on
    WHICH check fires first — or that none does — for every row."""
    import struct

    import numpy as np

    rng = np.random.default_rng(7)
    codes = {"png": 0, "jpeg": 1, "webp": 2}
    rows = []
    for i in range(200):
        w = int(rng.integers(0, 65536))
        h = int(rng.integers(0, 65536))
        fmt = ["png", "jpeg", "webp"][i % 3]
        tail = bytes(rng.integers(0, 256, size=int(rng.integers(0, 5))).tolist())
        payload = bytearray(b"MDV" + struct.pack("<BHH", codes[fmt], w, h) + tail)
        col_w, col_h = w, h
        corrupt = int(rng.integers(0, 6))
        if corrupt == 1:
            payload = payload[: int(rng.integers(0, 8))]
        elif corrupt == 2:
            payload[int(rng.integers(0, 3))] ^= 0xFF
        elif corrupt == 3:
            payload[3] = (payload[3] + 1 + int(rng.integers(0, 200))) % 256
        elif corrupt == 4:
            col_w = (w + 1 + int(rng.integers(0, 1000))) % 65536
        elif corrupt == 5:
            col_h = (h + 1 + int(rng.integers(0, 1000))) % 65536
        rows.append((f"p{i}", bytes(payload), col_w, col_h, fmt))

    def reference_kind(b, cw, ch, fmt):
        if len(b) < 8:
            return "truncated"
        if b[:3] != b"MDV":
            return "prefix"
        code, hw, hh = struct.unpack("<BHH", b[3:8])
        if code != codes[fmt]:
            return "fmt_code"
        if hw != cw:
            return "dim_mismatch"  # w
        if hh != ch:
            return "dim_mismatch"  # h
        return None

    want = {
        rid: k
        for rid, b, cw, ch, fmt in rows
        if (k := reference_kind(b, cw, ch, fmt)) is not None
    }
    df = with_partition_id(
        spark.createDataFrame(
            rows, "image_id string, bytes binary, w int, h int, fmt string"
        ),
        base_spec([]),
    )
    got = {
        r["image_id"]: r["kind"]
        for r in run_rows(spark, df, [_mdv_header_rule()]).collect()
    }
    assert got == want


# ------------------------------------------------------------- FormatRule


def _fmt_rows(spark, values, fmt, when=""):
    from mdvalidate_spark.spec import FormatRule

    df = spark.createDataFrame(
        [(str(i), v) for i, v in enumerate(values)], "image_id string, v string"
    )
    spec = base_spec([FormatRule("f", column="v", format=fmt, when=when)])
    prog = compile_spec(spec, df.schema)
    v = row_violations(with_partition_id(df, spec), prog, "t")
    return {r["image_id"] for r in v.collect()}, v


def test_format_int_double_uuid_shapes(spark):
    bad, v = _fmt_rows(
        spark, ["42", "-7", "+0", "4.2", "x9", "", None, "9 "], "int"
    )
    assert bad == {"3", "4", "5", "7"}  # NULL out of scope; "" and "9 " fail
    row = v.where(F.col("image_id") == "3").first()
    assert (row["kind"], row["expected"], row["actual"]) == ("format", "int", "4.2")
    bad, _ = _fmt_rows(
        spark, ["1", "-2.5", ".5", "3.", "1e-3", "2E+10", "1.2.3", "abc", "nan"], "double"
    )
    assert bad == {"6", "7", "8"}
    u = "123e4567-e89b-12d3-a456-426614174000"
    bad, _ = _fmt_rows(spark, [u, u.upper(), u[:-1], u.replace("-", "")], "uuid")
    assert bad == {"2", "3"}


def test_format_date_timestamp_strict_calendar(spark):
    # shape-valid but calendar-invalid values MUST fail (the pure-regex
    # check a FormatRule exists to improve on), lenient digit counts and
    # padding MUST fail (the pure-parse check some engines get wrong)
    bad, _ = _fmt_rows(
        spark,
        ["2020-01-02", "2020-13-02", "2020-02-30", "2020-1-2", " 2020-01-02", "0000-01-01"],
        "date",
    )
    assert bad == {"1", "2", "3", "4"}
    bad, _ = _fmt_rows(
        spark,
        ["2020-01-02 03:04:05", "2020-01-02 25:04:05", "2020-01-02", "2020-02-30 01:02:03"],
        "timestamp",
    )
    assert bad == {"1", "2", "3"}


def test_format_bool_json(spark):
    bad, _ = _fmt_rows(spark, ["true", "FALSE", "0", "1", "yes", "2"], "bool")
    assert bad == {"4", "5"}
    bad, _ = _fmt_rows(
        spark, ['{"a":1}', "[1,2]", "5", "null", '{a:1}', '{"a":1', "tru"], "json"
    )
    assert bad == {"4", "5", "6"}


def test_format_when_scope_and_lints(spark):
    from mdvalidate_spark.errors import SchemaError
    from mdvalidate_spark.spec import FormatRule

    bad, _ = _fmt_rows(spark, ["x", "7"], "int", when="v <> 'x'")
    assert bad == set()  # 'x' out of scope, '7' valid
    with pytest.raises(SchemaError, match="unknown format"):
        compile_spec(base_spec([FormatRule("f", column="v", format="ipv4")]), ["v"])
    df = spark.createDataFrame([(1,)], "v int")
    with pytest.raises(SchemaError, match="STRING"):
        compile_spec(
            base_spec([FormatRule("f", column="v", format="int")]), df.schema
        )


def test_format_fused_plan_no_shuffle_no_python(spark):
    from mdvalidate_spark.spec import FormatRule

    df = spark.createDataFrame([("1", "2020-01-02")], "image_id string, v string")
    spec = base_spec(
        [
            FormatRule("fd", column="v", format="date"),
            FormatRule("fj", column="v", format="json"),
            FormatRule("fi", column="v", format="int"),
        ]
    )
    prog = compile_spec(spec, df.schema)
    v = row_violations(with_partition_id(df, spec), prog, "t")
    plan = v._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "PythonUDF" not in plan


def test_alignment_rule_when_scope(spark):
    """AlignmentRule rides the generic row-scope gate: out-of-scope rows
    pass regardless of cosine."""
    from mdvalidate_spark.spec import AlignmentRule

    rule = AlignmentRule(
        "al", column_a="a", column_b="b", min_cos=0.5,
        when="image_id != 'mis'",
    )
    v = {r["image_id"] for r in run_rows(spark, _pair_df(spark), [rule]).collect()}
    assert "mis" not in v and "anti" in v
