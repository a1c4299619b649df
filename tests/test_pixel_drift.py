"""Pixel-stage and drift-stage tests (golden counts from the injection
contract; PSNR band checks; KS/PSI behavior on shifted vs unshifted data)."""

import pytest
from pyspark.sql import functions as F

from mdvalidate_spark.operators import drift as drift_ops
from mdvalidate_spark.operators import pixel as pixel_ops
from mdvalidate_spark.sources.synthetic import expected_violation_counts, synthetic_images
from mdvalidate_spark.spec import DriftRule, PixelRule

ROWS = 1000


@pytest.fixture(scope="module")
def images(spark):
    df = synthetic_images(spark, ROWS, with_bytes=True).cache()
    df.count()
    yield df
    df.unpersist()


def test_pixel_checks_golden_counts(spark, images):
    exp = expected_violation_counts(ROWS)
    rule = PixelRule("px")
    checks = pixel_ops.pixel_check_results(images, rule, "image_id").cache()
    v, m = pixel_ops.pixel_outputs(checks, rule, "t")
    fails = v.collect()
    # early-exit per image: fmt-injected rows fail fmt, dim-injected fail dims
    assert len(fails) == exp["fmt_domain"] + exp["w_range"]
    kinds = {r["image_id"]: r["expected"] for r in fails}
    assert sum("fmt" in e for e in kinds.values()) == exp["fmt_domain"]
    assert sum("dims" in e for e in kinds.values()) == exp["w_range"]
    # all surviving lossy images sit in the PSNR band
    psnrs = [
        r["psnr"] for r in checks.where("ok AND psnr IS NOT NULL").collect()
    ]
    assert psnrs and all(40.0 <= p <= 60.0 for p in psnrs)
    mets = {(r["partition_id"], r["metric"]): r["value"] for r in m.collect()}
    assert sum(v for (p, k), v in mets.items() if k == "pixel_checked") == ROWS
    checks.unpersist()


def test_pixel_detects_corrupt_bytes(spark, images):
    corrupted = images.withColumn(
        "bytes",
        F.when(F.col("i") == 0, F.lit(b"garbage")).otherwise(F.col("bytes")),
    )
    rule = PixelRule("px")
    checks = pixel_ops.pixel_check_results(corrupted, rule, "image_id")
    bad = checks.where("NOT ok AND expected = 'decodable'").collect()
    assert len(bad) == 1
    assert bad[0]["image_id"] == "img0000000000"


def test_pixel_detects_phash_mismatch(spark, images):
    tampered = images.withColumn(
        "phash", F.when(F.col("i") == 1, F.col("phash") + 1).otherwise(F.col("phash"))
    )
    checks = pixel_ops.pixel_check_results(tampered, PixelRule("px"), "image_id")
    bad = checks.where("NOT ok AND expected LIKE 'phash%'").collect()
    assert [b["image_id"] for b in bad] == ["img0000000001"]


def test_pixel_skips_null_bytes(spark):
    df = synthetic_images(spark, 100, with_bytes=False)
    checks = pixel_ops.pixel_check_results(df, PixelRule("px"), "image_id")
    assert checks.where("NOT ok").count() == 0


def test_drift_fires_on_shifted_partition(spark, images):
    # partition 7 has doubled w (the injected drift group)
    rule = DriftRule(
        "dr", column="w", group_column="partition_id", group_value="7",
        method="psi", threshold=0.2,
    )
    v, m, _ = drift_ops.drift_check(images, rule, "t")
    assert v.count() == 1
    stat = m.where("metric = 'psi_stat'").first()["value"]
    assert stat > 0.2


def test_drift_quiet_on_undrifted_partition(spark, images):
    clean = images.where(F.col("w").isin(32, 64, 128, 256))  # drop injected + drift
    rule = DriftRule(
        "dr", column="h", group_column="partition_id", group_value="3",
        method="psi", threshold=0.2,
    )
    v, m, _ = drift_ops.drift_check(clean, rule, "t")
    assert v.count() == 0


def test_ks_statistic_on_shifted_partition(spark, images):
    rule = DriftRule(
        "dr", column="w", group_column="partition_id", group_value="7",
        method="ks", threshold=0.1,
    )
    v, m, _ = drift_ops.drift_check(images, rule, "t")
    stat = m.first()["value"]
    assert 0.1 < stat <= 1.0
    assert v.count() == 1


def test_psi_ks_math():
    # pure-python kernel sanity
    assert drift_ops.psi([0.5, 0.5], [0.5, 0.5]) == pytest.approx(0.0)
    assert drift_ops.ks([1.0, 0.0], [0.0, 1.0]) == pytest.approx(1.0)
    assert drift_ops.psi([0.9, 0.1], [0.1, 0.9]) > 1.0


def test_drift_empty_probe_is_missing_data_violation(spark):
    """A probe group with zero rows must surface as 'non-empty probe group'
    (missing data), not a meaningless drift statistic."""
    from mdvalidate_spark.operators.drift import drift_check
    from mdvalidate_spark.spec import DriftRule
    from pyspark.sql import functions as F

    df = spark.range(100).select(
        F.col("id").cast("double").alias("v"), F.lit("present").alias("g")
    )
    rule = DriftRule("d", column="v", group_column="g", group_value="absent",
                     method="psi", threshold=0.2)
    viol, _, _n = drift_check(df, rule, "r")
    rows = viol.collect()
    assert len(rows) == 1
    assert rows[0]["expected"] == "non-empty probe group"
    assert rows[0]["actual"] == "0 rows"


def test_drift_exact_edges_matches_numpy(spark):
    """exact_edges=True derives bin edges from the exact percentile aggregate;
    PSI/KS then reproduce a numpy reimplementation of the same binned-ECDF
    pipeline bit-for-bit (this is what makes the DuckDB drift oracle a value
    check rather than rows-only)."""
    import math

    import numpy as np

    from mdvalidate_spark.operators.drift import drift_check
    from mdvalidate_spark.spec import DriftRule

    rows = [(float(i % 97) / 7.0 + (3.0 if i % 5 == 0 else 0.0),
             "probe" if i % 4 == 0 else "rest") for i in range(2000)]
    df = spark.createDataFrame(rows, "value double, grp string")
    rule = DriftRule("d", column="value", group_column="grp", group_value="probe",
                     method="psi", threshold=100.0, n_bins=8, exact_edges=True)
    _, m, _n = drift_check(df, rule, "t")
    got = m.collect()[0]["value"]

    x = np.array([v for v, g in rows])
    probe = np.array([g == "probe" for v, g in rows])
    ref = x[~probe]
    qs = np.linspace(0, 1, 9)
    edges = [round(float(e), 6) for e in np.quantile(ref, qs)]
    uniq = []
    for e in edges:
        if not uniq or e > uniq[-1]:
            uniq.append(e)
    inner = uniq[1:-1]
    def hist(vals):
        bins = np.sum(vals[:, None] > np.array(inner)[None, :], axis=1)
        c = np.bincount(bins, minlength=len(inner) + 1).astype(float)
        return c / c.sum()
    p, r = hist(x[probe]), hist(ref)
    want = sum((pi - ri) * math.log((pi + 1e-6) / (ri + 1e-6)) for pi, ri in zip(p, r))
    assert abs(got - want) < 1e-9


def test_categorical_drift_planted_shift(spark):
    """Categorical (frequency) drift: a probe group whose category mix is
    shifted is flagged; an identically distributed probe passes; KS over
    categories is rejected at compile (category order is arbitrary)."""
    import pytest

    from mdvalidate_spark.compile import compile_spec
    from mdvalidate_spark.errors import SchemaError
    from mdvalidate_spark.operators.drift import drift_check
    from mdvalidate_spark.spec import DriftRule, Spec

    rows = []
    for i in range(900):  # reference: uniform over a/b/c
        rows.append((("a", "b", "c")[i % 3], "ref"))
    for i in range(300):  # probe: all 'c' → shifted
        rows.append(("c", "probe"))
    df = spark.createDataFrame(rows, "cat string, grp string")
    rule = DriftRule("cd", column="cat", group_column="grp", group_value="probe",
                     method="psi", threshold=0.2, categorical=True)
    v, m, n = drift_check(df, rule, "t")
    assert n == 1 and m.collect()[0]["value"] > 0.2

    same = spark.createDataFrame(
        [(("a", "b", "c")[i % 3], g) for g in ("ref", "probe") for i in range(300)],
        "cat string, grp string",
    )
    _, m2, n2 = drift_check(same, rule, "t")
    assert n2 == 0 and abs(m2.collect()[0]["value"]) < 0.01

    with pytest.raises(SchemaError, match="categorical drift requires"):
        compile_spec(
            Spec(rules=(DriftRule("bad", column="cat", group_column="grp",
                                  group_value="probe", method="ks",
                                  categorical=True),), key_column="cat"),
            ["cat", "grp"],
        )


def test_expr_drift_caption_length(spark):
    """DriftRule.expr: the drifting quantity is a SQL expression — probe
    rows with systematically longer captions are flagged on length(caption)
    with no derived column materialized."""
    from mdvalidate_spark.operators.drift import drift_check
    from mdvalidate_spark.spec import DriftRule

    rows = [(f"cap {'x' * (i % 20)}", "ref") for i in range(800)]
    rows += [(f"cap {'y' * (200 + i % 20)}", "probe") for i in range(200)]
    df = spark.createDataFrame(rows, "caption string, grp string")
    rule = DriftRule("ld", expr="length(caption)", group_column="grp",
                     group_value="probe", method="psi", threshold=0.2)
    v, m, n = drift_check(df, rule, "t")
    assert n == 1
    row = v.collect()[0]
    assert row["column"] == "length(caption)"


def test_north_star_drift_profile_w_h_fmt_caption_length(spark):
    """The north rule's full drift profile — w, h, fmt (categorical
    frequencies), caption-length (derived expression) — through one
    ValidationRun over the synthetic images fixture."""
    from mdvalidate_spark.run import ValidationRun
    from mdvalidate_spark.sources.synthetic import synthetic_images
    from mdvalidate_spark.spec import DriftRule, Spec

    images = synthetic_images(spark, 3000, with_bytes=False, n_partitions=8)
    spec = Spec(
        rules=(
            DriftRule("w_drift", column="w", group_column="partition_id",
                      group_value="7", method="psi", threshold=10.0),
            DriftRule("h_drift", column="h", group_column="partition_id",
                      group_value="7", method="ks", threshold=10.0),
            DriftRule("fmt_drift", column="fmt", group_column="partition_id",
                      group_value="7", method="psi", threshold=10.0,
                      categorical=True),
            DriftRule("caplen_drift", expr="length(caption)",
                      group_column="partition_id", group_value="7",
                      method="psi", threshold=10.0),
        ),
        key_column="image_id",
        n_partitions=8,
    )
    rep = ValidationRun(spark, spec, images, run_id="profile").validate()
    stats = {r["rule_id"]: r["value"] for r in rep.metrics.collect()
             if r["metric"].endswith("_stat")}
    assert set(stats) == {"w_drift", "h_drift", "fmt_drift", "caplen_drift"}
    # thresholds were set unreachable: the profile reports, doesn't fail
    assert rep.exit_code == 0


def test_drift_rule_needs_column_or_expr(spark):
    import pytest

    from mdvalidate_spark.compile import compile_spec
    from mdvalidate_spark.errors import SchemaError
    from mdvalidate_spark.spec import DriftRule, Spec

    with pytest.raises(SchemaError, match="column or an expr"):
        compile_spec(
            Spec(rules=(DriftRule("d", group_column="g", group_value="x"),),
                 key_column="g"),
            ["g"],
        )


def test_drift_null_group_rows_belong_to_neither_side(spark):
    """Rows with a NULL group column have unknown membership: they must not
    be silently folded into the reference histogram (which would diverge
    from compute_edges' reference slice and from the SQL oracle)."""
    from mdvalidate_spark.operators.drift import drift_check
    from mdvalidate_spark.spec import DriftRule

    rows = [(("a", "b", "c")[i % 3], "ref") for i in range(300)]
    rows += [(("a", "b", "c")[i % 3], "probe") for i in range(300)]
    rows += [("zzz", None)] * 300  # unknown membership, alien category
    df = spark.createDataFrame(rows, "cat string, grp string")
    rule = DriftRule("cd", column="cat", group_column="grp", group_value="probe",
                     method="psi", threshold=0.2, categorical=True)
    _, m, n = drift_check(df, rule, "t")
    # ref and probe mixes are identical → PSI ~ 0 iff NULL-group rows were
    # excluded; folding them into ref would shift its densities and inflate PSI
    assert n == 0 and abs(m.collect()[0]["value"]) < 0.01


def test_drift_expr_typo_rejected_before_any_job(spark):
    """A typo'd DriftRule.expr must surface as a SchemaError at run
    construction (driver-side analysis), not an AnalysisException deep in
    finalize (ADVICE r2: DriftRule.targets can't enumerate expr inputs, so
    the compile lint alone would let it through)."""
    import pytest

    from mdvalidate_spark.errors import SchemaError
    from mdvalidate_spark.run import ValidationRun
    from mdvalidate_spark.spec import DriftRule, Spec

    df = spark.createDataFrame([("a", "x", 1)], "image_id string, g string, v int")
    spec = Spec(
        rules=(DriftRule("d", expr="lenght(image_id)", group_column="g",
                         group_value="x"),),
        key_column="image_id",
    )
    with pytest.raises(SchemaError, match="lenght"):
        ValidationRun(spark, spec, df)
    # the corrected expr constructs fine
    ok = Spec(
        rules=(DriftRule("d", expr="length(image_id)", group_column="g",
                         group_value="x"),),
        key_column="image_id",
    )
    ValidationRun(spark, ok, df)


# ------------------------------------------------------------- sweep rules


def _sweep_frame(spark, shift_group="c", n=3000):
    """3 equal groups over the same 0..9.9 sawtooth; ``shift_group`` gets +5."""
    groups = F.array(F.lit("a"), F.lit("b"), F.lit("c"))
    return spark.range(n).select(
        F.element_at(groups, (F.col("id") % 3 + 1).cast("int")).alias("g"),
        F.when(
            F.element_at(groups, (F.col("id") % 3 + 1).cast("int"))
            == shift_group,
            (F.col("id") % 100) / 10.0 + 5.0,
        )
        .otherwise((F.col("id") % 100) / 10.0)
        .alias("v"),
    )


def test_drift_sweep_flags_the_shifted_group(spark):
    """Per-group sweep (north rule: KS/PSI between partitions): the shifted
    group's leave-one-out statistic must dominate the unshifted groups'."""
    df = _sweep_frame(spark)
    rule = DriftRule("sw", column="v", sweep_by="g", method="psi",
                     threshold=5.0, exact_edges=True)
    viol, metrics, n = drift_ops.drift_check(df, rule, "t")
    stats = {r["value_str"]: r["value"] for r in metrics.collect()}
    assert set(stats) == {"a", "b", "c"}
    assert stats["c"] > 2 * stats["a"]
    assert stats["a"] == pytest.approx(stats["b"], rel=1e-9)  # symmetric
    rows = viol.collect()
    assert n == len(rows) == 1 and rows[0]["image_id"] == "g=c"


def test_drift_sweep_ks_and_leave_one_out_math(spark):
    """KS sweep on two groups: each group's leave-one-out reference is
    exactly the OTHER group, so the two statistics must be equal and match
    the direct two-sample computation."""
    df = _sweep_frame(spark).where(F.col("g") != "b")
    rule = DriftRule("swk", column="v", sweep_by="g", method="ks",
                     threshold=10.0, exact_edges=True)
    _, metrics, _ = drift_ops.drift_check(df, rule, "t")
    stats = {r["value_str"]: r["value"] for r in metrics.collect()}
    assert stats["a"] == pytest.approx(stats["c"], rel=1e-9)
    probe = DriftRule("two", column="v", group_column="g", group_value="c",
                      method="ks", threshold=10.0, exact_edges=True)
    # same bins: probe-vs-rest edges come from the reference slice (group a),
    # sweep edges from the global pool — so compare against the sweep's own
    # edges to isolate the leave-one-out arithmetic
    edges = drift_ops.compute_edges(df, rule)
    _, m2, _ = drift_ops.drift_check(df, probe, "t", edges=edges)
    direct = m2.collect()[0]["value"]
    assert stats["c"] == pytest.approx(direct, rel=1e-9)


def test_drift_sweep_single_group_emits_nothing(spark):
    """One group = no 'rest' to drift against: no metric, no violation,
    rather than a division-by-zero or a vacuous statistic."""
    df = spark.range(100).select(
        F.lit("only").alias("g"), (F.col("id") % 10).cast("double").alias("v")
    )
    rule = DriftRule("sw1", column="v", sweep_by="g", method="psi",
                     threshold=0.2)
    viol, metrics, n = drift_ops.drift_check(df, rule, "t")
    assert n == 0 and metrics.count() == 0 and viol.count() == 0


def test_drift_sweep_categorical(spark):
    """Categorical sweep: the group whose category mix diverges is flagged."""
    cats = F.array(F.lit("png"), F.lit("jpeg"), F.lit("webp"))
    df = spark.range(3000).select(
        F.when(F.col("id") % 3 == 0, "skewed").otherwise("normal").alias("g"),
        F.when(F.col("id") % 3 == 0, "png")  # skewed group: 100% png
        .otherwise(F.element_at(cats, (F.col("id") % 3 + 1).cast("int")))
        .alias("fmt"),
    )
    rule = DriftRule("swc", column="fmt", sweep_by="g", method="psi",
                     threshold=0.5, categorical=True)
    viol, metrics, n = drift_ops.drift_check(df, rule, "t")
    stats = {r["value_str"]: r["value"] for r in metrics.collect()}
    assert stats["skewed"] > rule.threshold
    assert n >= 1


def test_drift_sweep_compile_lints(spark):
    from mdvalidate_spark.compile import compile_spec
    from mdvalidate_spark.errors import SchemaError
    from mdvalidate_spark.spec import Spec

    with pytest.raises(SchemaError, match="mutually exclusive"):
        compile_spec(Spec(
            key_column="k",
            rules=(DriftRule("d", column="v", sweep_by="g",
                             group_column="h", group_value="x"),),
        ))
    with pytest.raises(SchemaError, match="group_column .*sweep_by .*reference"):
        compile_spec(Spec(
            key_column="k", rules=(DriftRule("d", column="v"),),
        ))


def test_drift_sweep_through_validation_run(spark):
    """Sweep rules ride the normal run lifecycle (edge prefetch included)."""
    from mdvalidate_spark.run import validate_table
    from mdvalidate_spark.spec import Spec

    df = _sweep_frame(spark).withColumn("image_id", F.expr("uuid()"))
    spec = Spec(
        key_column="image_id",
        rules=(DriftRule("sw", column="v", sweep_by="g", method="psi",
                         threshold=5.0, exact_edges=True),),
    )
    rep = validate_table(spark, df, spec, run_id="sweep-run")
    v = rep.violations.where(F.col("rule_id") == "sw").collect()
    assert len(v) == 1 and v[0]["image_id"] == "g=c"
    m = rep.metrics.where(F.col("rule_id") == "sw")
    assert m.count() == 3


def test_drift_sweep_key_like_column_refused(spark, monkeypatch):
    """Sweeping by a key-like column would ship one histogram per ROW to the
    driver — the guard must refuse loudly instead of flooding it."""
    monkeypatch.setattr(drift_ops, "SWEEP_MAX_HIST_ROWS", 50)
    df = spark.range(200).select(
        F.col("id").cast("string").alias("k"),
        (F.col("id") % 10).cast("double").alias("v"),
    )
    rule = DriftRule("swkey", column="v", sweep_by="k", method="psi",
                     threshold=0.2)
    with pytest.raises(ValueError, match="key-like"):
        drift_ops.drift_check(df, rule, "t")


# ----------------------------------------------------- two-table (reference)


def _ref_cand(spark, shift=0.0, n=2000):
    """Reference sawtooth 0..9.9 and a candidate shifted by ``shift``, with a
    matching categorical fmt column whose mix also shifts when ``shift``>0."""
    ref = spark.range(n).select(
        "id",
        ((F.col("id") % 100) / 10.0).alias("v"),
        F.when(F.col("id") % 4 == 0, "png").otherwise("jpeg").alias("fmt"),
    )
    cand = spark.range(n).select(
        "id",
        ((F.col("id") % 100) / 10.0 + F.lit(float(shift))).alias("v"),
        F.when(F.col("id") % 4 == 0, "webp" if shift else "png")
        .otherwise("jpeg")
        .alias("fmt"),
    )
    return ref, cand


def test_ref_drift_identical_tables_quiet(spark):
    """cand == ref ⇒ PSI ≈ 0, a metric row, zero violations."""
    ref, cand = _ref_cand(spark, shift=0.0)
    rule = DriftRule("rd", column="v", reference="yday", method="psi",
                     threshold=0.1, exact_edges=True)
    viol, metrics, n = drift_ops.drift_vs_reference(ref, cand, [rule], "t")
    assert n == 0 and viol.count() == 0
    m = metrics.collect()
    assert len(m) == 1 and m[0]["metric"] == "psi_stat"
    assert abs(m[0]["value"]) < 1e-9


def test_ref_drift_fires_on_shift(spark):
    """A +5 location shift of the candidate must breach the threshold."""
    ref, cand = _ref_cand(spark, shift=5.0)
    rule = DriftRule("rd", column="v", reference="yday", method="ks",
                     threshold=0.2, exact_edges=True)
    viol, metrics, n = drift_ops.drift_vs_reference(ref, cand, [rule], "t")
    rows = viol.collect()
    assert n == len(rows) == 1
    assert rows[0]["image_id"] == "candidate_vs_reference"
    assert metrics.collect()[0]["value"] > 0.2


def test_ref_drift_categorical_mix_shift(spark):
    """Categorical mode: the candidate's fmt mix (png→webp) drifts; webp is
    unseen in the reference so its mass lands in __other__."""
    ref, cand = _ref_cand(spark, shift=5.0)
    rule = DriftRule("rdc", column="fmt", reference="yday", method="psi",
                     threshold=0.5, categorical=True)
    viol, metrics, n = drift_ops.drift_vs_reference(ref, cand, [rule], "t")
    assert n == 1
    assert metrics.collect()[0]["value"] > 0.5


def test_ref_drift_fused_multi_rule_matches_single(spark):
    """One fused call over numeric+expr+categorical rules must yield the
    identical statistics as three separate calls (the stacked histogram
    pass changes the plan, never the math)."""
    ref, cand = _ref_cand(spark, shift=5.0)
    rules = [
        DriftRule("a", column="v", reference="y", method="psi",
                  threshold=99.0, exact_edges=True),
        DriftRule("b", expr="v * 2", reference="y", method="ks",
                  threshold=99.0, exact_edges=True),
        DriftRule("c", column="fmt", reference="y", method="psi",
                  threshold=99.0, categorical=True),
    ]
    _, fused, _ = drift_ops.drift_vs_reference(ref, cand, rules, "t")
    got = {r["rule_id"]: r["value"] for r in fused.collect()}
    for r in rules:
        _, single, _ = drift_ops.drift_vs_reference(ref, cand, [r], "t")
        want = single.collect()[0]["value"]
        assert got[r.id] == pytest.approx(want, rel=1e-12), r.id


def test_ref_drift_empty_candidate_is_missing_data(spark):
    ref, cand = _ref_cand(spark)
    rule = DriftRule("rd", column="v", reference="y", method="psi",
                     threshold=0.2, exact_edges=True)
    viol, metrics, n = drift_ops.drift_vs_reference(
        ref, cand.where(F.lit(False)), [rule], "t"
    )
    rows = viol.collect()
    assert n == 1 and rows[0]["expected"] == "non-empty candidate distribution"
    assert metrics.count() == 0


def test_ref_drift_null_values_skip_only_their_rule(spark):
    """NULL in one rule's column must not drop the row from OTHER rules'
    histograms (the stacked structs are per-rule nullable)."""
    ref, cand = _ref_cand(spark)
    cand2 = cand.withColumn(
        "v", F.when(F.col("id") % 2 == 0, None).otherwise(F.col("v"))
    )
    rules = [
        DriftRule("num", column="v", reference="y", method="psi",
                  threshold=99.0, exact_edges=True),
        DriftRule("cat", column="fmt", reference="y", method="psi",
                  threshold=99.0, categorical=True),
    ]
    _, metrics, _ = drift_ops.drift_vs_reference(ref, cand2, rules, "t")
    got = {r["rule_id"]: r["value"] for r in metrics.collect()}
    # fmt distribution untouched by v's nulls ⇒ PSI ≈ 0
    assert abs(got["cat"]) < 1e-9
    # v's surviving odd-id rows still form a valid (quiet) distribution
    assert "num" in got


def test_ref_drift_compile_lints(spark):
    from mdvalidate_spark.compile import compile_spec
    from mdvalidate_spark.errors import SchemaError
    from mdvalidate_spark.spec import Spec

    with pytest.raises(SchemaError, match="mutually exclusive"):
        compile_spec(Spec(
            key_column="k",
            rules=(DriftRule("d", column="v", reference="y",
                             group_column="g", group_value="x"),),
        ))
    # reference + sweep_by is NOT rejected: it is the per-group two-table
    # sweep (drift_sweep_vs_reference) — see
    # test_sweep_vs_reference_through_spec_lifecycle


def test_ref_drift_through_validation_run(spark):
    """Spec-level two-table drift: reference names a dims entry; the rule
    rides the normal lifecycle (edge prefetch against the REFERENCE frame
    included) and a missing dims entry is a SchemaError before any job."""
    from mdvalidate_spark.errors import SchemaError
    from mdvalidate_spark.run import validate_table
    from mdvalidate_spark.spec import Spec

    ref, cand = _ref_cand(spark, shift=5.0)
    cand = cand.withColumn("image_id", F.expr("uuid()"))
    spec = Spec(
        key_column="image_id",
        rules=(
            DriftRule("rd", column="v", reference="yday", method="psi",
                      threshold=0.5, exact_edges=True),
            DriftRule("rdc", column="fmt", reference="yday", method="psi",
                      threshold=0.5, categorical=True),
        ),
    )
    rep = validate_table(
        spark, cand, spec, dims={"yday": ref}, run_id="refdrift-run"
    )
    v = {r["rule_id"] for r in rep.violations.collect()}
    assert {"rd", "rdc"} <= v
    assert rep.metrics.where(F.col("rule_id") == "rd").count() == 1

    with pytest.raises(SchemaError, match="reference table"):
        validate_table(spark, cand, spec, run_id="refdrift-missing")


# --------------------------------------------- per-group two-table drift


def test_sweep_vs_reference_pins_shift_to_the_group(spark):
    """Candidate group 'b' is shifted vs the reference snapshot; every
    other group is identical — only b flags, and the whole-table dilution
    problem this exists to solve is demonstrated by construction."""
    from mdvalidate_spark.operators.drift import drift_sweep_vs_reference
    from mdvalidate_spark.spec import DriftRule

    ref = spark.range(0, 3000, 1, 4).select(
        F.element_at(
            F.array(F.lit("a"), F.lit("b"), F.lit("c")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("src"),
        (F.col("id") % 100).cast("double").alias("v"),
    )
    cand = ref.select(
        "src",
        F.when(F.col("src") == "b", F.col("v") + 500.0).otherwise(F.col("v")).alias("v"),
    )
    rule = DriftRule("g", column="v", sweep_by="src", method="psi",
                     threshold=0.2, n_bins=8, exact_edges=True)
    v, m, n = drift_sweep_vs_reference(ref, cand, rule, "t")
    flagged = {r["image_id"] for r in v.collect()}
    assert flagged == {"src=b"}
    stats = {r["value_str"]: r["value"] for r in m.collect()}
    assert stats["a"] == pytest.approx(0.0, abs=1e-9)
    assert stats["c"] == pytest.approx(0.0, abs=1e-9)
    assert stats["b"] > 0.2 and n == 1


def test_sweep_vs_reference_missing_groups_and_null_key(spark):
    """A group on one side only is a loud missing-data violation in either
    direction; NULL group keys audit as a real '__null__' group."""
    from mdvalidate_spark.operators.drift import drift_sweep_vs_reference
    from mdvalidate_spark.spec import DriftRule

    ref = spark.createDataFrame(
        [("a", float(i % 10)) for i in range(50)]
        + [("gone", float(i % 10)) for i in range(50)]
        + [(None, float(i % 10)) for i in range(50)],
        "src string, v double",
    )
    cand = spark.createDataFrame(
        [("a", float(i % 10)) for i in range(50)]
        + [("new", float(i % 10)) for i in range(50)]
        + [(None, float((i % 10) + 50)) for i in range(50)],  # null group shifted
        "src string, v double",
    )
    rule = DriftRule("g", column="v", sweep_by="src", method="psi",
                     threshold=0.2, n_bins=4, exact_edges=True)
    v, m, n = drift_sweep_vs_reference(ref, cand, rule, "t")
    got = {(r["image_id"], r["actual"]) for r in v.collect()}
    assert ("src=gone", "missing from candidate") in got
    assert ("src=new", "missing from reference") in got
    shifted = [r for r in v.collect() if r["image_id"] == "src=__null__"]
    assert len(shifted) == 1 and float(shifted[0]["actual"]) > 0.2


def test_sweep_vs_reference_through_spec_lifecycle(spark, tmp_path):
    """DriftRule(reference=..., sweep_by=...) routes to
    drift_sweep_vs_reference at finalize: the shifted group flags as a
    violation, per-group stats land in the metrics frame, exit code 1."""
    from mdvalidate_spark import validate_table
    from mdvalidate_spark.spec import DriftRule, Spec

    ref = spark.range(0, 3000, 1, 4).select(
        F.format_string("k%d", F.col("id")).alias("key"),
        F.element_at(
            F.array(F.lit("a"), F.lit("b"), F.lit("c")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("src"),
        (F.col("id") % 100).cast("double").alias("v"),
    )
    cand = ref.select(
        "key",
        "src",
        F.when(F.col("src") == "b", F.col("v") + 500.0)
        .otherwise(F.col("v"))
        .alias("v"),
    )
    spec = Spec(
        rules=(
            DriftRule("ref_sweep", column="v", sweep_by="src", method="psi",
                      threshold=0.2, n_bins=8, exact_edges=True,
                      reference="snap"),
        ),
        key_column="key",
        n_partitions=4,
    )
    rep = validate_table(spark, cand, spec, dims={"snap": ref}, run_id="rs")
    viols = rep.violations.collect()
    assert {r["image_id"] for r in viols} == {"src=b"}
    stats = {
        r["value_str"]: r["value"]
        for r in rep.metrics.where("metric = 'psi_stat'").collect()
    }
    assert set(stats) == {"a", "b", "c"} and stats["b"] > 0.2
    assert rep.exit_code == 1


def test_reference_sweep_compile_lints(spark):
    from mdvalidate_spark.compile import compile_spec
    from mdvalidate_spark.errors import SchemaError
    from mdvalidate_spark.spec import DriftRule, Spec

    cols = ["key", "src", "v"]
    # reference + sweep_by now compiles
    compile_spec(
        Spec(rules=(DriftRule("ok", column="v", sweep_by="src",
                              reference="snap"),), key_column="key"),
        cols,
    )
    # reference + probe slice still rejected
    with pytest.raises(SchemaError):
        compile_spec(
            Spec(rules=(DriftRule("bad", column="v", group_column="src",
                                  group_value="a", reference="snap"),),
                 key_column="key"),
            cols,
        )
    # reference + incremental rejected (no partials story for the ref side)
    with pytest.raises(SchemaError):
        compile_spec(
            Spec(rules=(DriftRule("bad2", column="v", sweep_by="src",
                                  reference="snap", incremental=True),),
                 key_column="key"),
            cols,
        )
