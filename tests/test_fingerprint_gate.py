"""Content-gated revalidation (run.py fingerprint_gate +
operators/reconcile.py partition_fingerprint).

A gated run persists per-partition content fingerprints at finalize; a
later gated run over a new snapshot of the same table re-validates ONLY
the partitions whose fingerprint moved, carrying the prior run's
persisted violations/lineage forward through the ordinary resume
reload. The gate must stand down entirely when the spec, the
fingerprinted column set, or any dimension table changes.
"""

import shutil

import pytest
from pyspark.sql import functions as F

from mdvalidate_spark.run import ValidationRun, validate_table
from mdvalidate_spark.sources.synthetic import dim_source, synthetic_images
from mdvalidate_spark.spec import (
    NotNullRule,
    RangeRule,
    RefIntegrityRule,
    RegexRule,
    Spec,
    UniqueRule,
)

ROWS = 600


def base_spec(extra=()):
    return Spec(
        rules=(
            NotNullRule("caption_not_null", column="caption"),
            RegexRule(
                "caption_regex",
                column="caption",
                pattern=r"A photo number \d+ of \w+",
            ),
            RangeRule("w_range", column="w", min=1, max=10000),
            UniqueRule("unique_image_id", columns=("image_id",)),
            RefIntegrityRule(
                "src_ref",
                column="source_id",
                dim_name="dim_source",
                dim_column="source_id",
            ),
            *extra,
        ),
        key_column="image_id",
        n_partitions=8,
    )


@pytest.fixture(scope="module")
def images(spark):
    df = synthetic_images(spark, ROWS, with_bytes=False).cache()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture()
def ck(tmp_path):
    d = str(tmp_path / "gate-ck")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def vset(report):
    return {
        (r["rule_id"], r["image_id"], r["column"], r["kind"])
        for r in report.violations.collect()
    }


def test_gate_skips_all_when_unchanged(spark, images, ck):
    dims = {"dim_source": dim_source(spark)}
    r1 = validate_table(
        spark, images, base_spec(), dims=dims, run_id="g1",
        checkpoint_dir=ck, fingerprint_gate=True,
    )
    baseline = vset(r1)
    run2 = ValidationRun(
        spark, base_spec(), images, dims=dims, run_id="g2",
        checkpoint_dir=ck, fingerprint_gate=True,
    )
    # identical content: every partition fingerprint matches → nothing
    # pending, all manifest entries carried + annotated
    assert run2.pending_partitions() == []
    assert sorted(run2.gate_skipped) == run2.all_partitions()
    assert all(
        run2.manifest.entries[p].get("fingerprint_skipped")
        for p in run2.gate_skipped
    )
    r2 = run2.validate()
    assert vset(r2) == baseline
    assert r2.exit_code == r1.exit_code


def test_gate_revalidates_only_changed_partition(spark, images, ck):
    dims = {"dim_source": dim_source(spark)}
    validate_table(
        spark, images, base_spec(), dims=dims, run_id="g1",
        checkpoint_dir=ck, fingerprint_gate=True,
    )
    # plant an edit on ONE key: its (derived) partition must revalidate,
    # the other 7 must carry forward
    mutated = images.withColumn(
        "w",
        F.when(F.col("image_id") == "img0000000007", F.lit(-5)).otherwise(
            F.col("w")
        ),
    )
    run2 = ValidationRun(
        spark, base_spec(), mutated, dims=dims, run_id="g2",
        checkpoint_dir=ck, fingerprint_gate=True,
    )
    pending = run2.pending_partitions()
    assert len(pending) == 1
    assert len(run2.gate_skipped) == 7
    r2 = run2.validate()
    # the gated result must equal a fresh ungated full validation
    fresh = validate_table(
        spark, mutated, base_spec(), dims=dims, run_id="fresh"
    )
    assert vset(r2) == vset(fresh)
    assert ("w_range", "img0000000007", "w", "range") in vset(r2)


def test_gate_stands_down_on_spec_change(spark, images, ck):
    dims = {"dim_source": dim_source(spark)}
    validate_table(
        spark, images, base_spec(), dims=dims, run_id="g1",
        checkpoint_dir=ck, fingerprint_gate=True,
    )
    changed = base_spec(extra=(RangeRule("h_range", column="h", min=1),))
    run2 = ValidationRun(
        spark, changed, images, dims=dims, run_id="g2",
        checkpoint_dir=ck, fingerprint_gate=True,
    )
    # a new rule could produce new verdicts anywhere: full revalidation
    assert run2.gate_skipped == []
    assert run2.pending_partitions() == run2.all_partitions()


def test_gate_stands_down_on_dim_change(spark, images, ck):
    dims = {"dim_source": dim_source(spark)}
    validate_table(
        spark, images, base_spec(), dims=dims, run_id="g1",
        checkpoint_dir=ck, fingerprint_gate=True,
    )
    shrunk = {"dim_source": dim_source(spark).where("source_id <> 'src0003'")}
    run2 = ValidationRun(
        spark, base_spec(), images, dims=shrunk, run_id="g2",
        checkpoint_dir=ck, fingerprint_gate=True,
    )
    # fact table unchanged but the dim moved: per-partition ref verdicts
    # may flip, so nothing may carry
    assert run2.gate_skipped == []
    assert run2.pending_partitions() == run2.all_partitions()
    r2 = run2.validate()
    fresh = validate_table(
        spark, images, base_spec(), dims=shrunk, run_id="fresh2"
    )
    assert vset(r2) == vset(fresh)


def test_gate_column_subset_trade_is_explicit(spark, images, ck):
    """An edit confined to a column OUTSIDE fingerprint_columns is
    invisible to the gate (the documented trade); including the column
    catches it."""
    dims = {"dim_source": dim_source(spark)}
    cols = ("caption", "w")
    validate_table(
        spark, images, base_spec(), dims=dims, run_id="g1",
        checkpoint_dir=ck, fingerprint_gate=True, fingerprint_columns=cols,
    )
    edited = images.withColumn(
        "h",
        F.when(F.col("image_id") == "img0000000011", F.lit(1)).otherwise(
            F.col("h")
        ),
    )
    run2 = ValidationRun(
        spark, base_spec(), edited, dims=dims, run_id="g2",
        checkpoint_dir=ck, fingerprint_gate=True, fingerprint_columns=cols,
    )
    assert run2.pending_partitions() == []  # h is not fingerprinted
    # widening the column set changes the gate identity → stands down
    run3 = ValidationRun(
        spark, base_spec(), edited, dims=dims, run_id="g3",
        checkpoint_dir=ck, fingerprint_gate=True,
        fingerprint_columns=("caption", "w", "h"),
    )
    assert run3.gate_skipped == []
    assert run3.pending_partitions() == run3.all_partitions()


def test_first_gated_run_writes_snapshot(spark, images, ck):
    import os

    dims = {"dim_source": dim_source(spark)}
    validate_table(
        spark, images, base_spec(), dims=dims, run_id="g1",
        checkpoint_dir=ck, fingerprint_gate=True,
    )
    assert os.path.exists(f"{ck}/fingerprint/meta.json")
    assert os.path.exists(f"{ck}/fingerprint/partitions")


def test_gate_requires_checkpoint_dir(spark, images):
    from mdvalidate_spark.errors import SchemaError

    # a gate with nowhere to persist its snapshot would silently
    # full-revalidate forever — refused at construction, not ignored
    with pytest.raises(SchemaError, match="checkpoint_dir"):
        ValidationRun(
            spark, base_spec(), images,
            dims={"dim_source": dim_source(spark)},
            fingerprint_gate=True,
        )


def test_gate_stands_down_after_interrupted_run(spark, images, ck):
    """A gated run that persisted its manifest but never finalized leaves
    the PRIOR run's fingerprint snapshot next to a NEWER manifest (and
    overwritten per-partition violations). A later gated run must not
    pair them — even when its content matches the snapshot exactly."""
    dims = {"dim_source": dim_source(spark)}
    validate_table(
        spark, images, base_spec(), dims=dims, run_id="g1",
        checkpoint_dir=ck, fingerprint_gate=True,
    )
    mutated = images.withColumn(
        "w",
        F.when(F.col("image_id") == "img0000000007", F.lit(-5)).otherwise(
            F.col("w")
        ),
    )
    run2 = ValidationRun(
        spark, base_spec(), mutated, dims=dims, run_id="g2",
        checkpoint_dir=ck, fingerprint_gate=True,
    )
    # interrupted: batches validated + manifest saved, finalize never runs
    run2.validate_pending()
    # content now REVERTS to the original snapshot: every partition
    # fingerprint matches g1's snapshot, but the checkpoint's manifest
    # belongs to g2 (incomplete) whose persisted violations describe the
    # mutated content — the gate must stand down and revalidate everything
    run3 = ValidationRun(
        spark, base_spec(), images, dims=dims, run_id="g3",
        checkpoint_dir=ck, fingerprint_gate=True,
    )
    assert run3.gate_skipped == []
    assert run3.pending_partitions() == run3.all_partitions()
    r3 = run3.validate()
    fresh = validate_table(
        spark, images, base_spec(), dims=dims, run_id="fresh-i"
    )
    assert vset(r3) == vset(fresh)


def test_gate_carries_failed_annotation(spark, images, ck):
    """Carried red partitions must keep the manifest's 'failed' marker —
    ops tooling listing failed partitions sees carried and freshly
    revalidated red partitions identically."""
    dims = {"dim_source": dim_source(spark)}
    run1 = ValidationRun(
        spark, base_spec(), images, dims=dims, run_id="g1",
        checkpoint_dir=ck, fingerprint_gate=True,
    )
    run1.validate()
    failed1 = {
        p for p, e in run1.manifest.entries.items() if e.get("failed")
    }
    assert failed1, "fixture must inject violations somewhere"
    run2 = ValidationRun(
        spark, base_spec(), images, dims=dims, run_id="g2",
        checkpoint_dir=ck, fingerprint_gate=True,
    )
    assert sorted(run2.gate_skipped) == run2.all_partitions()
    failed2 = {
        p for p, e in run2.manifest.entries.items() if e.get("failed")
    }
    assert failed2 == failed1


def test_gate_fast_fail_warns_and_writes_no_snapshot(spark, images, ck):
    """fast_fail aborts before finalize — the only place the snapshot is
    written — so a gated fast-fail run on a red table leaves the gate
    unarmed. That must be LOUD (warning), never silent: the caller would
    otherwise believe content gating is active while every later gated run
    fully revalidates."""
    import dataclasses
    import os

    dims = {"dim_source": dim_source(spark)}
    spec = dataclasses.replace(base_spec(), fast_fail=True)
    run = ValidationRun(
        spark, spec, images, dims=dims, run_id="gff1",
        checkpoint_dir=ck, fingerprint_gate=True,
    )
    with pytest.warns(UserWarning, match="no fingerprint snapshot"):
        rep = run.validate()
    assert rep.exit_code == 1
    assert not os.path.exists(os.path.join(ck, "fingerprint", "meta.json"))


def test_gate_unknown_fingerprint_column_refused(spark, images, ck):
    """A typo'd fingerprint_columns entry is a typed SchemaError at init,
    not an AnalysisException from the fingerprint scan after the snapshot
    write has started."""
    from mdvalidate_spark.errors import SchemaError

    with pytest.raises(SchemaError, match="fingerprint_columns"):
        ValidationRun(
            spark, base_spec(), images,
            dims={"dim_source": dim_source(spark)}, run_id="gbad",
            checkpoint_dir=ck, fingerprint_gate=True,
            fingerprint_columns=("w", "nope"),
        )
