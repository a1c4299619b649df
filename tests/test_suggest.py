"""Constraint suggestion: profile a table, draft the Spec that would have
enforced its observed invariants, and guarantee the draft validates clean
on the profiled table (the ratchet property)."""

import pytest

from mdvalidate_spark.operators.suggest import suggest_spec, suggestion_rows
from mdvalidate_spark.run import ValidationRun
from mdvalidate_spark.spec import (
    DomainRule,
    MetricBoundRule,
    NotNullRule,
    RangeRule,
    SchemaRule,
    UniqueRule,
)


@pytest.fixture(scope="module")
def frame(spark):
    df = spark.createDataFrame(
        [
            ("k1", "red", 10, 1.5, None),
            ("k2", "blue", 20, -2.0, "x"),
            ("k3", "red", 30, 0.25, "y"),
        ],
        "id string, color string, n int, score double, opt string",
    ).cache()
    df.count()
    yield df
    df.unpersist()


def test_suggestions_match_observed_invariants(spark, frame):
    spec = suggest_spec(frame, "id", exact=True)
    by_id = {r.id: r for r in spec.rules}

    # id: unique string, 3 distinct <= 16 -> domain+not_null+unique
    assert isinstance(by_id["suggest_unique_id"], UniqueRule)
    assert isinstance(by_id["suggest_not_null_id"], NotNullRule)
    # color: low-cardinality -> sorted domain, no unique (3 rows, 2 distinct)
    dom = by_id["suggest_domain_color"]
    assert isinstance(dom, DomainRule) and dom.values == ("blue", "red")
    assert "suggest_unique_color" not in by_id
    # n: numeric envelope
    rng = by_id["suggest_range_n"]
    assert isinstance(rng, RangeRule) and (rng.min, rng.max) == (10.0, 30.0)
    assert by_id["suggest_range_score"].min == -2.0
    # opt has a NULL -> no not_null suggestion
    assert "suggest_not_null_opt" not in by_id
    # schema pin covers every column with its dtype
    schema = by_id["suggest_schema"]
    assert isinstance(schema, SchemaRule)
    assert dict(schema.expected)["n"] == "int"


def test_suggested_spec_is_deterministic(spark, frame):
    assert suggest_spec(frame, "id", exact=True) == suggest_spec(
        frame, "id", exact=True
    )


def test_ratchet_suggested_spec_validates_clean(spark, frame):
    spec = suggest_spec(frame, "id", exact=True)
    run = ValidationRun(spark, spec, frame)
    run.validate_pending()
    rep = run.finalize()
    assert rep.violations.count() == 0
    assert rep.exit_code == 0


def test_approx_mode_profiles_without_exact_aggregates(spark, frame):
    spec = suggest_spec(frame, "id", exact=False)
    # sketch mode still produces the envelope + domain families; uniqueness
    # with margin 0.0 demands exact equality of the HLL estimate — may or
    # may not fire, but the spec itself must compile and validate clean
    run = ValidationRun(spark, spec, frame)
    run.validate_pending()
    # HLL (exact in sparse mode at this size) keeps the ratchet property
    assert run.finalize().exit_code == 0


def test_suggestion_rows_shape(spark, frame):
    spec = suggest_spec(frame, "id", exact=True)
    rows = suggestion_rows(spark, spec)
    assert rows.columns == ["column_name", "kind", "detail"]
    kinds = {r["kind"] for r in rows.collect()}
    assert kinds == {
        "domain",
        "not_null",
        "range",
        "unique",
        "bound_count",
        "bound_null_rate",
        "bound_p99",
    }


def test_gate_suggestions(spark, frame):
    spec = suggest_spec(frame, "id", exact=True)
    by_id = {r.id: r for r in spec.rules}
    # opt has 1 NULL of 3: no not_null, but a null-rate ratchet with
    # permissive headroom — ceil((1/3)*1.25*1e6)/1e6
    gate = by_id["suggest_null_rate_opt"]
    assert isinstance(gate, MetricBoundRule) and gate.metric == "null_rate"
    assert gate.max == pytest.approx(0.416667, abs=1e-9)
    # volume floor on the table
    vol = by_id["suggest_volume"]
    assert vol.metric == "count" and vol.min == 2.0 and vol.column == "id"
    # no string column wider than the domain cap -> no distinct envelope
    assert not any(r.id.startswith("suggest_distinct_") for r in spec.rules)
    # numeric columns get a p99 tail gate with relative headroom:
    # p99(n) over {10,20,30} = 29.8 -> 29.8 + 2.98 = 32.78
    tail = by_id["suggest_p99_n"]
    assert tail.metric == "p99" and tail.max == pytest.approx(32.78, abs=1e-6)


def test_gate_suggestions_can_be_disabled(spark, frame):
    spec = suggest_spec(frame, "id", exact=True, gates=False)
    assert not any(isinstance(r, MetricBoundRule) for r in spec.rules)


def test_unique_candidates_exactly_confirmed_in_sketch_mode(spark):
    # `almost` has one duplicate (199/200 distinct): a loose margin makes it
    # a sketch-pass candidate, but the exact confirmation must reject it —
    # an unconfirmed UniqueRule would fail on the profiled table. The true
    # key `id` must survive confirmation even if its HLL estimate dips.
    rows = [(f"k{i}", f"a{i if i else 1}") for i in range(200)]
    df = spark.createDataFrame(rows, "id string, almost string")
    spec = suggest_spec(df, "id", exact=False, unique_margin=0.05)
    ids = {r.id for r in spec.rules}
    assert "suggest_unique_id" in ids
    assert "suggest_unique_almost" not in ids
    run = ValidationRun(spark, spec, df)
    run.validate_pending()
    assert run.finalize().exit_code == 0
    # opting out of confirmation takes the sketch's word: the loose margin
    # now (wrongly, by design) admits the near-unique column
    unconfirmed = suggest_spec(
        df, "id", exact=False, unique_margin=0.05, confirm_unique=False
    )
    assert "suggest_unique_almost" in {r.id for r in unconfirmed.rules}


def test_distinct_envelope_for_wide_string_columns(spark):
    df = spark.createDataFrame(
        [(f"k{i}", f"tok{i % 40}") for i in range(200)],
        "id string, token string",
    )
    spec = suggest_spec(df, "id", exact=True, domain_max_distinct=16)
    by_id = {r.id: r for r in spec.rules}
    env = by_id["suggest_distinct_token"]
    assert isinstance(env, MetricBoundRule) and env.metric == "distinct"
    assert env.min == 36.0 and env.max == 44.0  # floor(40*.9), ceil(40*1.1)
    assert "suggest_domain_token" not in by_id
    # and the drafted spec still validates clean on the profiled frame
    run = ValidationRun(spark, spec, df)
    run.validate_pending()
    assert run.finalize().exit_code == 0


def test_drift_ratchet_snapshot_clean_then_fires(spark):
    """VERDICT r3 #3: profile once, ratchet everything. suggest_spec(
    drift=True) drafts DriftRule(reference=snapshot) gates; the persisted
    profile_snapshot validates CLEAN on the profiled table (PSI of a
    distribution against itself is 0) and FIRES on a planted shift —
    without ever rescanning the profiled table."""
    from pyspark.sql import functions as F

    from mdvalidate_spark.operators.suggest import suggest_profile_snapshot
    from mdvalidate_spark.spec import DriftRule

    base = spark.range(2000).select(
        F.concat(F.lit("k"), F.col("id")).alias("id"),
        (F.col("id") % 97).cast("double").alias("v"),
        F.element_at(
            F.array(F.lit("red"), F.lit("blue"), F.lit("green")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("color"),
    ).cache()
    base.count()

    spec = suggest_spec(base, "id", exact=True, drift=True)
    drs = {r.id: r for r in spec.rules if isinstance(r, DriftRule)}
    assert set(drs) == {"suggest_drift_v", "suggest_drift_color"}
    assert drs["suggest_drift_color"].categorical
    assert not drs["suggest_drift_v"].categorical

    snap = suggest_profile_snapshot(base, spec)
    # compact by construction: O(rules x bins) rows, never O(rows)
    assert snap.count() < 200

    dims = {"suggest_profile": snap}
    run = ValidationRun(spark, spec, base, dims=dims, run_id="ratchet-clean")
    run.validate_pending()
    rep = run.finalize()
    assert rep.exit_code == 0, rep.violations.collect()

    # planted shift: v doubled (numeric tail shift) + color collapsed to one
    # category — the p99/range gates would ALSO fire on v, so assert the
    # DRIFT rules specifically
    shifted = base.select(
        "id", (F.col("v") * 2).alias("v"), F.lit("red").alias("color")
    )
    run2 = ValidationRun(spark, spec, shifted, dims=dims, run_id="ratchet-shift")
    run2.validate_pending()
    rep2 = run2.finalize()
    fired = {
        r["rule_id"]
        for r in rep2.violations.where(F.col("kind") == "drift").collect()
    }
    assert fired == {"suggest_drift_v", "suggest_drift_color"}
    base.unpersist()


def test_snapshot_vs_live_reference_parity(spark):
    """drift_vs_snapshot must produce the SAME statistics and verdicts as
    drift_vs_reference on the same reference data — the snapshot is a
    lossless compaction for whole-table drift."""
    from pyspark.sql import functions as F

    from mdvalidate_spark.operators.drift import (
        drift_vs_reference,
        drift_vs_snapshot,
        is_snapshot,
        profile_snapshot,
    )
    from mdvalidate_spark.spec import DriftRule

    ref = spark.range(1000).select((F.col("id") % 50).cast("double").alias("v"))
    cand = spark.range(1000).select(((F.col("id") % 50) + 7).cast("double").alias("v"))
    rules = [
        DriftRule("d_ks", column="v", method="ks", threshold=0.05, exact_edges=True),
        DriftRule("d_psi", column="v", method="psi", threshold=0.05, exact_edges=True),
    ]
    v1, m1, n1 = drift_vs_reference(ref, cand, rules, "t")
    snap = profile_snapshot(ref, rules)
    assert is_snapshot(snap)
    v2, m2, n2 = drift_vs_snapshot(snap, cand, rules, "t")
    assert n1 == n2
    stats1 = {(r["rule_id"], r["metric"]): r["value"] for r in m1.collect()}
    stats2 = {(r["rule_id"], r["metric"]): r["value"] for r in m2.collect()}
    assert stats1 == stats2
    assert sorted(map(tuple, v1.collect())) == sorted(map(tuple, v2.collect()))
    # a rule missing from the snapshot refuses loudly (stale snapshot)
    extra = [DriftRule("d_new", column="v", method="psi", threshold=0.1)]
    with pytest.raises(ValueError, match="not present in the snapshot"):
        drift_vs_snapshot(snap, cand, extra, "t")


def test_snapshot_rejects_sweep_at_open(spark):
    """A snapshot is a whole-table profile — sweep_by against one must be a
    typed error at open, not a silent wrong comparison."""
    from pyspark.sql import functions as F

    from mdvalidate_spark.errors import SchemaError
    from mdvalidate_spark.operators.drift import profile_snapshot
    from mdvalidate_spark.spec import DriftRule, Spec

    df = spark.range(100).select(
        F.concat(F.lit("k"), F.col("id")).alias("id"),
        (F.col("id") % 7).cast("double").alias("v"),
        (F.col("id") % 4).cast("int").alias("g"),
    )
    snap = profile_snapshot(
        df, [DriftRule("d", column="v", method="psi", threshold=0.2)]
    )
    spec = Spec(
        rules=(
            DriftRule(
                "d", column="v", method="psi", threshold=0.2,
                sweep_by="g", reference="snap",
            ),
        ),
        key_column="id",
    )
    with pytest.raises(SchemaError, match="whole-table profile"):
        ValidationRun(spark, spec, df, dims={"snap": snap}, run_id="x")


def test_text_gates_drafted_and_clean(spark):
    """text_gates=True drafts PII + repetition ratchets for free-text
    columns and the draft validates clean on the profiled table."""
    from mdvalidate_spark import compile_spec
    from mdvalidate_spark.operators.row_rules import (
        row_violations,
        with_partition_id,
    )
    from mdvalidate_spark.spec import PiiRule, RepetitionRule

    base = (
        "line one about a dog\nline two about a cat\n"
        "a third line with more words than the others in it\n"
    )
    df = spark.createDataFrame(
        [
            (1, base * 2 + "contact a@b.co today"),
            (2, base + "footer\nfooter\n" + base),
            (3, "short text"),  # below min_words: excluded from ceilings
        ],
        "id int, text string",
    )
    # domain_max_distinct below the text cardinality: a text column that
    # fits a DomainRule keeps the (stronger) domain ratchet instead
    spec = suggest_spec(
        df, "id", exact=True, text_gates=True, text_min_avg_len=10.0,
        domain_max_distinct=2,
    )
    by_id = {r.id: r for r in spec.rules}
    pii = by_id["suggest_pii_text"]
    # observed ceiling 1 (the planted email) × 1.25 headroom, ceil → 2
    assert isinstance(pii, PiiRule) and pii.max_total == 2
    rep = by_id["suggest_rep_dup_line_frac_text"]
    assert isinstance(rep, RepetitionRule) and rep.min_words == 20
    assert 0.0 < rep.max <= 1.0

    prog = compile_spec(spec, df.schema)
    assert row_violations(with_partition_id(df, spec), prog, "t").count() == 0

    # rendering is deterministic and engine-reproducible
    rows = suggestion_rows(spark, spec).where("kind in ('pii','repetition')")
    details = {r["detail"] for r in rows.collect()}
    assert "pii_total <= 2" in details  # ceil(1 × 1.25)
    assert any(d.startswith("dup_line_frac <= ") for d in details)


def test_text_gates_off_by_default_and_skip_non_text(spark, frame):
    spec = suggest_spec(frame, "id", exact=True)
    assert not any(r.id.startswith(("suggest_pii", "suggest_rep")) for r in spec.rules)
    # short string columns (avg len < threshold) stay ungated even when on
    spec = suggest_spec(frame, "id", exact=True, text_gates=True)
    assert not any(r.id.startswith(("suggest_pii", "suggest_rep")) for r in spec.rules)


def test_format_gates_drafted_with_precedence(spark):
    """format_gates=True drafts FormatRule for stringly-typed columns,
    picking the MOST SPECIFIC candidate ('7' is a valid int AND double →
    int wins; 'true'/'0' is bool, not int, because '0' alone isn't enough),
    and the draft validates clean on the profiled table."""
    from mdvalidate_spark import compile_spec
    from mdvalidate_spark.operators.row_rules import (
        row_violations,
        with_partition_id,
    )
    from mdvalidate_spark.spec import FormatRule

    df = spark.createDataFrame(
        [
            (1, "7", "1.25", "2021-02-28", "true", "N/A", None),
            (2, "-12", "3", "2020-12-01", "0", "33", "x"),
            (3, "+0", "-2e3", "2021-01-31", "false", "2021-01-01", "y"),
        ],
        "id int, ints string, dbls string, days string, flags string, "
        "mixed string, opt string",
    )
    # domain budget below the column cardinalities: on a tiny fixture every
    # 3-distinct column would otherwise get the (stronger) DomainRule
    spec = suggest_spec(
        df, "id", exact=True, format_gates=True, domain_max_distinct=1
    )
    fmts = {
        r.column: r.format for r in spec.rules if isinstance(r, FormatRule)
    }
    assert fmts == {
        "ints": "int",       # all parse as int (and double — int wins)
        "dbls": "double",    # "1.25"/"-2e3" break int, all parse as double
        "days": "date",
        "flags": "bool",     # "true" breaks int/double; all in the bool set
        # mixed: no single format covers {"N/A","33","2021-01-01"} → no rule
        # opt: non-null values {"x","y"} match nothing → no rule
    }
    prog = compile_spec(spec, df.schema)
    assert row_violations(with_partition_id(df, spec), prog, "t").count() == 0

    rows = suggestion_rows(spark, spec).where("kind = 'format'")
    details = {(r["column_name"], r["detail"]) for r in rows.collect()}
    assert ("ints", "format = int") in details
    assert ("dbls", "format = double") in details


def test_format_gates_skip_domains_freetext_and_off_by_default(spark):
    from mdvalidate_spark.spec import FormatRule

    long_text = (
        "a long free-text paragraph with many distinct words that clearly "
        "crosses the average-length threshold for text-likeness"
    )
    df = spark.createDataFrame(
        [(1, "1", long_text + " one"), (2, "2", long_text + " two"),
         (3, "1", long_text + " three")],
        "id int, code string, body string",
    )
    # off by default
    spec = suggest_spec(df, "id", exact=True)
    assert not any(isinstance(r, FormatRule) for r in spec.rules)
    # on: 'code' fits a DomainRule (cardinality 2 ≤ 16) → domain wins, no
    # format probe; 'body' is free text (avg len ≥ threshold) → excluded
    spec = suggest_spec(df, "id", exact=True, format_gates=True)
    assert not any(isinstance(r, FormatRule) for r in spec.rules)
    # narrow the domain budget so 'code' stops being domain-sized → int gate
    spec = suggest_spec(
        df, "id", exact=True, format_gates=True, domain_max_distinct=1
    )
    fmts = {r.column: r.format for r in spec.rules if isinstance(r, FormatRule)}
    assert fmts == {"code": "int"}


def test_format_gates_unknown_candidate_raises(spark, frame):
    from mdvalidate_spark.errors import SchemaError

    with pytest.raises(SchemaError, match="unknown format candidates"):
        suggest_spec(
            frame, "id", exact=True, format_gates=True,
            format_candidates=("int", "ipv6"),
        )


def test_association_gates_drafted_and_clean(spark):
    """Pairs of domain-sized columns draft an AssociationRule band around
    the observed V; the draft validates CLEAN on the profiled table (the
    ratchet property), and the band has at least min_slack width even at
    V = 0 or V = 1."""
    from mdvalidate_spark.spec import AssociationRule
    from mdvalidate_spark import validate_table

    df = spark.createDataFrame(
        [(i, "p" if i % 2 == 0 else "q", "u" if i % 2 == 0 else "w")
         for i in range(24)],
        "id long, a string, b string",
    )
    spec = suggest_spec(df, "id", exact=True, association_gates=True)
    assoc = [r for r in spec.rules if isinstance(r, AssociationRule)]
    assert len(assoc) == 1
    [r] = assoc
    assert r.id == "suggest_assoc_a__b"
    # b fully determined by a: V = 1 -> band [1 - slack, 1]
    assert r.max_v == 1.0 and 0.8 <= r.min_v < 1.0
    report = validate_table(spark, df, spec)
    assert report.exit_code == 0

    # independent balanced pair: V = 0 -> band [0, slack], still clean
    df2 = spark.createDataFrame(
        [(i, "p" if i % 2 == 0 else "q", "u" if i < 12 else "w")
         for i in range(24)],
        "id long, a string, b string",
    )
    spec2 = suggest_spec(df2, "id", exact=True, association_gates=True)
    [r2] = [r for r in spec2.rules if isinstance(r, AssociationRule)]
    assert r2.min_v == 0.0 and r2.max_v == pytest.approx(0.05)
    assert validate_table(spark, df2, spec2).exit_code == 0


def test_association_gates_skip_constant_and_off_by_default(spark, frame):
    from mdvalidate_spark.spec import AssociationRule

    # off by default
    spec = suggest_spec(frame, "id", exact=True)
    assert not any(isinstance(r, AssociationRule) for r in spec.rules)
    # constant column pair -> dof 0 -> nothing drafted
    df = spark.createDataFrame(
        [(1, "p", "u"), (2, "q", "u")], "id long, a string, b string"
    )
    spec = suggest_spec(df, "id", exact=True, association_gates=True)
    assert not any(isinstance(r, AssociationRule) for r in spec.rules)


def test_association_gates_render_in_suggestion_rows(spark):
    df = spark.createDataFrame(
        [(i, "p" if i % 2 == 0 else "q", "u" if i % 2 == 0 else "w")
         for i in range(10)],
        "id long, a string, b string",
    )
    spec = suggest_spec(df, "id", exact=True, association_gates=True)
    rows = suggestion_rows(spark, spec).where("kind = 'association'").collect()
    assert len(rows) == 1
    assert rows[0]["column_name"] == "a,b"
    assert rows[0]["detail"].startswith("cramers_v in [")


def test_suggestion_rows_render_single_bound_rules(spark):
    """Single-bound ConcentrationRule / AssociationRule are advertised
    configurations ('and/or') — rendering a hand-written spec with only
    one bound set must not format None."""
    from mdvalidate_spark.spec import AssociationRule, ConcentrationRule, Spec

    spec = Spec(
        rules=(
            ConcentrationRule("c1", column="lang", max_hhi=0.3),
            ConcentrationRule("c2", column="src", max_top_share=0.4),
            AssociationRule("a1", col_a="x", col_b="y", min_v=0.2),
            AssociationRule("a2", col_a="x", col_b="z", max_v=0.8),
        )
    )
    got = {
        r["column_name"]: r["detail"]
        for r in suggestion_rows(spark, spec).collect()
    }
    assert got["lang"] == "hhi <= 0.300000"
    assert got["src"] == "top_share <= 0.400000"
    assert got["x,y"] == "cramers_v >= 0.200000"
    assert got["x,z"] == "cramers_v <= 0.800000"


def test_concentration_gates_drafted_clean_and_fire_on_shift(spark):
    """Domain-sized columns draft a ConcentrationRule dominance ratchet at
    the observed top_share/hhi plus headroom; the draft validates CLEAN on
    the profiled table, and FIRES when the mix collapses toward one value
    — the profile-once-ratchet-everything contract."""
    from mdvalidate_spark import validate_table
    from mdvalidate_spark.spec import ConcentrationRule

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else ("b" if i % 4 == 1 else "c"))
         for i in range(40)],
        "id long, cat string",
    )  # shares: a 0.5, b 0.25, c 0.25 -> hhi 0.375
    spec = suggest_spec(df, "id", exact=True, concentration_gates=True)
    conc = [r for r in spec.rules if isinstance(r, ConcentrationRule)]
    assert len(conc) == 1
    [r] = conc
    assert r.id == "suggest_concentration_cat" and r.column == "cat"
    assert r.max_top_share == 0.625  # ceil(500000 * 1.25) / 1e6
    assert r.max_hhi == 0.46875
    assert validate_table(spark, df, spec).exit_code == 0

    # the mix collapses: 90% 'a' (still a legal domain!) -> gate fires
    shifted = spark.createDataFrame(
        [(i, "a" if i % 10 != 9 else "b") for i in range(40)],
        "id long, cat string",
    )
    rep = validate_table(spark, shifted, spec)
    fired = [
        v for v in rep.violations.collect()
        if v["rule_id"] == "suggest_concentration_cat"
    ]
    assert len(fired) == 2 and rep.exit_code == 1  # share AND hhi

    # off by default; capped at 1.0 even with headroom on a hot mix
    assert not any(
        isinstance(r, ConcentrationRule)
        for r in suggest_spec(df, "id", exact=True).rules
    )
    hot = spark.createDataFrame(
        [(i, "x" if i else "y") for i in range(30)], "id long, cat string"
    )
    [rh] = [
        r for r in suggest_spec(
            hot, "id", exact=True, concentration_gates=True
        ).rules
        if isinstance(r, ConcentrationRule)
    ]
    assert rh.max_top_share == 1.0 and rh.max_hhi == 1.0

    rows = suggestion_rows(
        spark, suggest_spec(df, "id", exact=True, concentration_gates=True)
    )
    det = {
        r["column_name"]: r["detail"]
        for r in rows.where("kind = 'concentration'").collect()
    }
    assert det == {"cat": "top_share <= 0.625000, hhi <= 0.468750"}


def test_alignment_pairs_drafted_clean_and_fire_on_shift(spark):
    """Declared embedding pairs draft an AlignmentRule cosine floor at the
    observed minimum minus headroom; the draft validates CLEAN on the
    profiled table and FIRES on a mispaired batch."""
    from mdvalidate_spark import validate_table
    from mdvalidate_spark.spec import AlignmentRule

    # pairs with cosines 1.0 (identical) and ~0.6 (planted angle)
    rows = [(i, [1.0, 0.0], [1.0, 0.0]) for i in range(8)]
    rows += [(8 + i, [1.0, 0.0], [0.6, 0.8]) for i in range(4)]  # cos 0.6
    rows.append((99, None, [1.0, 0.0]))  # NULL vector: out of scope
    df = spark.createDataFrame(rows, "id long, a array<double>, b array<double>")
    spec = suggest_spec(
        df, "id", exact=True, alignment_pairs=(("a", "b"),),
        alignment_headroom=0.05,
    )
    al = [r for r in spec.rules if isinstance(r, AlignmentRule)]
    assert len(al) == 1
    [r] = al
    assert r.id == "suggest_align_a__b"
    assert r.min_cos == 0.55  # floor((0.6 - 0.05) * 1e6) / 1e6
    assert validate_table(spark, df, spec).exit_code == 0

    # mispaired batch: orthogonal vectors -> floor fires
    shifted = spark.createDataFrame(
        [(i, [1.0, 0.0], [0.0, 1.0]) for i in range(5)],
        "id long, a array<double>, b array<double>",
    )
    rep = validate_table(spark, shifted, spec)
    fired = [
        v for v in rep.violations.collect()
        if v["rule_id"] == "suggest_align_a__b"
    ]
    assert len(fired) == 5 and all(v["kind"] == "alignment" for v in fired)


def test_alignment_pairs_dirty_skipped_and_lints(spark):
    """A pair with dim-mismatch or undefined-cosine rows drafts NOTHING (a
    band would fail on day one regardless of floor); declared-pair mistakes
    are typed SchemaErrors before any Spark work on the pair pass."""
    from mdvalidate_spark.errors import SchemaError
    from mdvalidate_spark.spec import AlignmentRule

    dirty = spark.createDataFrame(
        [(1, [1.0, 0.0], [1.0, 0.0]), (2, [1.0, 0.0], [0.0, 0.0])],  # zero norm
        "id long, a array<double>, b array<double>",
    )
    spec = suggest_spec(dirty, "id", exact=True, alignment_pairs=(("a", "b"),))
    assert not any(isinstance(r, AlignmentRule) for r in spec.rules)
    mism = spark.createDataFrame(
        [(1, [1.0, 0.0], [1.0])],
        "id long, a array<double>, b array<double>",
    )
    spec = suggest_spec(mism, "id", exact=True, alignment_pairs=(("a", "b"),))
    assert not any(isinstance(r, AlignmentRule) for r in spec.rules)
    ok = spark.createDataFrame(
        [(1, [1.0, 0.0], [1.0, 0.0])],
        "id long, a array<double>, b array<double>",
    )
    for pairs in ((("a", "a"),), (("a", "nope"),), (("a", "id"),)):
        with pytest.raises(SchemaError):
            suggest_spec(ok, "id", exact=True, alignment_pairs=pairs)


def test_embedding_health_gates_drafted_clean_and_fire(spark):
    """The encoder-health ratchet: draft from the observed matrix, validate
    clean on the profiled table, fire on a collapsed batch."""
    import hashlib

    from mdvalidate_spark.run import validate_table
    from mdvalidate_spark.spec import Spec

    from pyspark.sql import functions as F

    def jit(i, j):
        return (hashlib.md5(f"{i}:{j}".encode()).digest()[0] / 255.0 - 0.5) * 2

    df = spark.createDataFrame(
        [(i, [jit(i, 0), jit(i, 1), jit(i, 2)]) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    spec = suggest_spec(
        df, "vec_id", exact=True, embedding_health_columns=("embedding",)
    )
    eh = [r for r in spec.rules if r.kind == "embedding_health"]
    assert len(eh) == 1
    rule = eh[0]
    assert rule.dim == 3 and rule.max_dead_dims == 0
    assert rule.min_rows == 30  # min(1000, rows_used)
    rows = suggestion_rows(spark, spec).where(
        "kind = 'embedding_health'"
    ).collect()
    assert len(rows) == 1 and rows[0]["column_name"] == "embedding"
    assert "dead_dims <= 0" in rows[0]["detail"]

    keyed = df.select(
        F.col("vec_id").cast("string").alias("image_id"), "embedding"
    )
    rep = validate_table(
        spark, keyed, Spec(key_column="image_id", rules=tuple(eh))
    )
    assert rep.exit_code == 0  # ratchet: clean on the profiled table
    collapsed = keyed.select(
        "image_id",
        F.transform("embedding", lambda x: F.lit(0.5)).alias("embedding"),
    )
    rep2 = validate_table(
        spark, collapsed, Spec(key_column="image_id", rules=tuple(eh))
    )
    assert rep2.exit_code == 1


def test_embedding_health_gates_skip_dirty_and_lints(spark):
    from mdvalidate_spark.errors import SchemaError

    mixed = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, 2.0, 3.0])],  # disagreeing dims
        "vec_id long, a array<double>",
    )
    spec = suggest_spec(
        mixed, "vec_id", exact=True, embedding_health_columns=("a",)
    )
    assert not [r for r in spec.rules if r.kind == "embedding_health"]

    with pytest.raises(SchemaError):
        suggest_spec(
            mixed, "vec_id", exact=True, embedding_health_columns=("missing",)
        )
    with pytest.raises(SchemaError):
        suggest_spec(
            mixed, "vec_id", exact=True, embedding_health_columns=("vec_id",)
        )
