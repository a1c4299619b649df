"""Native parquet-scan path tests: results must be identical to the Arrow
path, partition filtering must work, and the row-preservation guard must
force fallback when the DataFrame drops rows."""

import pytest
from pyspark.sql import functions as F

from mdvalidate_spark.operators import pixel as pixel_ops
from mdvalidate_spark.sources.native_scan import parquet_files
from mdvalidate_spark.sources.synthetic import synthetic_images
from mdvalidate_spark.spec import PixelRule

ROWS = 400


@pytest.fixture(scope="module")
def px_parquet(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("px") / "images")
    synthetic_images(spark, ROWS, with_bytes=True).write.mode("overwrite").parquet(path)
    return path


def checks_set(df):
    return {
        (r["image_id"], r["ok"], r["expected"]) for r in df.collect()
    }


def test_native_path_engages_on_parquet(spark, px_parquet):
    df = spark.read.parquet(px_parquet)
    assert parquet_files(df), "fixture must be file-backed"
    out = pixel_ops.pixel_check_results(df, PixelRule("px"), "image_id")
    plan = out._jdf.queryExecution().analyzed().toString()
    # native path scans a tiny path-list frame, not the images relation
    assert "path" in plan


def test_native_matches_arrow_exactly(spark, px_parquet):
    df = spark.read.parquet(px_parquet)
    native = pixel_ops.pixel_check_results(df, PixelRule("px"), "image_id")
    arrow = pixel_ops._pixel_arrow(df, PixelRule("px"), "image_id", None)
    assert checks_set(native) == checks_set(arrow)
    assert native.count() == ROWS


def test_native_partition_filter(spark, px_parquet):
    df = spark.read.parquet(px_parquet)
    sub = pixel_ops.pixel_check_results(
        df, PixelRule("px"), "image_id", partitions=[0, 3]
    )
    rows = sub.collect()
    assert rows and all(r["partition_id"] in (0, 3) for r in rows)
    expected = df.where(F.col("partition_id").isin([0, 3])).count()
    assert len(rows) == expected


def test_filtered_df_falls_back_to_arrow(spark, px_parquet):
    df = spark.read.parquet(px_parquet).where(F.col("w") == 32)
    out = pixel_ops.pixel_check_results(df, PixelRule("px"), "image_id")
    # fallback honors the filter — only w==32 rows checked
    assert out.count() == df.count()
    needed = {"image_id", "bytes", "w", "h", "fmt", "phash"}
    assert not pixel_ops._native_safe(df, needed)


def test_run_via_parquet_source_matches_inmemory(spark, px_parquet):
    """Full ValidationRun over the parquet-backed table (native pixel path)
    equals the in-memory run (Arrow path) violation-for-violation."""
    from mdvalidate_spark.run import validate_table
    from mdvalidate_spark.sources.synthetic import dim_source, full_images_spec

    spec = full_images_spec(with_pixel=True)
    dims = {"dim_source": dim_source(spark)}
    mem = validate_table(
        spark, synthetic_images(spark, ROWS, with_bytes=True), spec, dims=dims, run_id="m"
    )
    disk = validate_table(
        spark, spark.read.parquet(px_parquet), spec, dims=dims, run_id="d"
    )

    def vset(rep):
        return {
            (r["rule_id"], r["image_id"], r["kind"], r["expected"])
            for r in rep.violations.collect()
        }

    assert vset(mem) == vset(disk)


def test_engine_derived_partition_id_uses_arrow_path(spark, px_parquet, tmp_path):
    """A table WITHOUT a physical partition_id column (ids engine-derived via
    pmod(xxhash64)) must NOT take the native path: the raw-file reader cannot
    recompute the ids and would emit NULLs, desynchronizing manifest
    bookkeeping from the verdict. The run must still count pixel violations
    per partition."""
    from mdvalidate_spark.run import ValidationRun
    from mdvalidate_spark.sources.synthetic import dim_source, full_images_spec

    nopid = str(tmp_path / "nopid")
    spark.read.parquet(px_parquet).drop("partition_id").write.mode(
        "overwrite"
    ).parquet(nopid)
    df = spark.read.parquet(nopid)
    spec = full_images_spec(with_pixel=True, n_partitions=4)
    run = ValidationRun(spark, spec, df, dims={"dim_source": dim_source(spark)},
                        run_id="nopid")
    rep = run.validate()
    pixel_rows = rep.violations.where(F.col("rule_id") == "pixel")
    n_pixel = pixel_rows.count()
    assert n_pixel > 0  # fixture plants pixel violations
    # every pixel violation carries a REAL partition id (no NULL bucket)
    assert pixel_rows.where(F.col("partition_id").isNull()).count() == 0
    # and the manifest accounted for them
    assert run.manifest.total_violations >= n_pixel


def test_recomputed_column_uses_arrow_path(spark, px_parquet):
    """A frame that RECOMPUTED one of the kernel's columns (withColumn) must
    not take the native path — the raw files no longer match the frame."""
    df = spark.read.parquet(px_parquet).withColumn("fmt", F.lit("png"))
    needed = {"image_id", "bytes", "w", "h", "fmt", "phash"}
    assert not pixel_ops._native_safe(df, needed)
    # plain re-read stays eligible
    assert pixel_ops._native_safe(spark.read.parquet(px_parquet), needed)


def test_native_batch_prunes_row_groups(spark, tmp_path):
    """Incremental batches must not re-stream the whole table: row groups
    whose partition_id stats cannot overlap the batch are pruned driver-side
    (finer than file-level — a sorted multi-row-group file contributes only
    the row groups the batch touches)."""
    from mdvalidate_spark.sources.native_scan import footer_meta
    from mdvalidate_spark.sources.synthetic import synthetic_images

    p = str(tmp_path / "pxp")
    # one file per partition id → perfectly prunable stats
    synthetic_images(spark, 400, with_bytes=True, n_partitions=4).repartition(
        4, F.col("partition_id")
    ).sortWithinPartitions("partition_id").write.mode("overwrite").parquet(p)

    files = parquet_files(spark.read.parquet(p))
    kept = _overlapping_splits_helper(files, {0})
    total_rgs = sum(len(footer_meta(f)["rows"]) for f in files)
    kept_rgs = sum(
        (len(footer_meta(f)["rows"]) if hi < 0 else hi - lo)
        for f, lo, hi in kept
    )
    assert 0 < kept_rgs < total_rgs
    # and the end-to-end filtered run over the pruned splits stays exact
    df = spark.read.parquet(p)
    sub = pixel_ops.pixel_check_results(
        df, PixelRule("px"), "image_id", partitions=[0]
    )
    assert sub.count() == df.where(F.col("partition_id") == 0).count()


def _overlapping_splits_helper(files, pset):
    return pixel_ops._overlapping_splits(files, pset)


def test_row_group_splits_break_up_one_big_file(spark, tmp_path):
    """A single giant file must not serialize the stage behind one task:
    with fewer files than cores the native scan splits on row-group ranges,
    and the result is still exact vs the Arrow path."""
    import pyarrow.parquet as pq

    from mdvalidate_spark.sources.native_scan import row_group_splits
    from mdvalidate_spark.sources.synthetic import synthetic_images

    p = str(tmp_path / "one")
    synthetic_images(spark, 600, with_bytes=True).coalesce(1).write.option(
        "parquet.block.size", 64 * 1024  # tiny row groups → many per file
    ).mode("overwrite").parquet(p)
    df = spark.read.parquet(p)
    files = parquet_files(df)
    assert len(files) == 1
    assert pq.ParquetFile(files[0]).metadata.num_row_groups > 1

    splits = row_group_splits(files, target_rows=100)
    assert len(splits) > 1  # the skew case actually splits
    covered = set()
    for f, lo, hi in splits:  # disjoint, complete coverage
        assert f == files[0]
        rng = set(range(lo, hi))
        assert rng and not (rng & covered)
        covered |= rng
    assert covered == set(range(pq.ParquetFile(files[0]).metadata.num_row_groups))

    native = pixel_ops.pixel_check_results(df, PixelRule("px"), "image_id")
    arrow = pixel_ops._pixel_arrow(df, PixelRule("px"), "image_id", None)
    assert checks_set(native) == checks_set(arrow)


def test_gate_decision_cached_per_run(spark, px_parquet, monkeypatch):
    """The driver-side native-gate probe (file listing + footer schema +
    analyzed-plan allowlist) must run ONCE per cache, not once per call —
    the r2 bench regression was per-batch re-probing (VERDICT r2 #1)."""
    df = spark.read.parquet(px_parquet)
    calls = {"n": 0}
    real = pixel_ops._gate_decision

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(pixel_ops, "_gate_decision", counting)
    cache: dict = {}
    r1 = pixel_ops.pixel_check_results(df, PixelRule("px"), "image_id", cache=cache)
    r2 = pixel_ops.pixel_check_results(df, PixelRule("px"), "image_id", cache=cache)
    assert calls["n"] == 1
    gate_keys = [k for k in cache if isinstance(k, tuple) and k[0] == "gate"]
    assert len(gate_keys) == 1
    assert cache[gate_keys[0]][0] is True  # native path engaged and memoized
    assert checks_set(r1) == checks_set(r2)
    # a rule binding DIFFERENT columns must get its own gate decision
    pixel_ops.pixel_check_results(
        df, PixelRule("px2", phash_column="image_id"), "image_id", cache=cache
    )
    assert calls["n"] == 2


def test_footer_stats_cached_across_batches(spark, px_parquet, monkeypatch):
    """Row-group statistics for incremental-batch file pruning are read from
    each footer once per run, then served from the footer cache."""
    import pyarrow.parquet as pq

    df = spark.read.parquet(px_parquet)
    opened = {"n": 0}
    real_pf = pq.ParquetFile

    def counting_pf(*a, **k):
        opened["n"] += 1
        return real_pf(*a, **k)

    cache: dict = {}
    # prime the gate without counting its schema read
    pixel_ops.pixel_check_results(df, PixelRule("px"), "image_id", cache=cache)
    monkeypatch.setattr(pq, "ParquetFile", counting_pf)
    a = pixel_ops.pixel_check_results(
        df, PixelRule("px"), "image_id", partitions=[0, 1], cache=cache
    )
    a.count()
    n_files = len(parquet_files(df))
    first = opened["n"]
    assert first <= n_files  # at most one driver-side footer read per file
    b = pixel_ops.pixel_check_results(
        df, PixelRule("px"), "image_id", partitions=[2], cache=cache
    )
    b.count()
    assert opened["n"] == first  # second batch: zero new driver footer reads


def test_layout_report_flags_small_files(spark, tmp_path):
    from mdvalidate_spark.sources.layout import layout_report

    src = str(tmp_path / "shattered")
    # 40 tiny files: the classic streaming-sink dribble
    spark.range(4000).repartition(40).write.parquet(src)
    rep = layout_report(spark.read.parquet(src), target_file_bytes=1 << 20)
    assert rep["n_files"] == 40
    assert rep["total_rows"] == 4000
    assert rep["n_small_files"] == 40 and rep["small_bytes_frac"] == 1.0
    assert rep["suggested_partitions"] == 1  # everything fits one target file
    assert len(rep["smallest_files"]) == 10
    # a compacted rewrite at the suggestion is no longer flagged
    dst = str(tmp_path / "compacted")
    spark.read.parquet(src).repartition(rep["suggested_partitions"]).write.parquet(dst)
    rep2 = layout_report(
        spark.read.parquet(dst),
        target_file_bytes=1 << 20,
        small_file_bytes=1024,
    )
    assert rep2["n_files"] == 1 and rep2["n_small_files"] == 0


def test_layout_report_refusals(spark, tmp_path):
    from mdvalidate_spark.errors import SchemaError
    from mdvalidate_spark.sources.layout import layout_report

    import pytest as _pt

    with _pt.raises(SchemaError, match="file list"):
        layout_report([])
    src = str(tmp_path / "many")
    spark.range(100).repartition(8).write.parquet(src)
    with _pt.raises(SchemaError, match="max_files"):
        layout_report(spark.read.parquet(src), max_files=4)


def test_layout_report_accepts_file_scheme_uris(spark, tmp_path):
    # regression: raw inputFiles() URIs ('file:/...') hit os.path.getsize
    # unstripped and always raised FileNotFoundError
    from mdvalidate_spark.sources.layout import layout_report

    src = str(tmp_path / "uris")
    spark.range(100).repartition(2).write.parquet(src)
    uris = spark.read.parquet(src).inputFiles()
    assert all(u.startswith("file:") for u in uris)
    rep = layout_report(list(uris))
    assert rep["n_files"] == 2 and rep["total_rows"] == 100


def test_run_normalized_pid_keeps_native_path(spark, px_parquet):
    """REGRESSION: with_partition_id rewrites a data-supplied partition_id to
    coalesce(cast(pid as int), -1) (reserved partition for NULLs), which
    reads as a recomputed column in the analyzed plan. The run must still
    take the native pixel path — it probes its PRE-normalization scan frame
    and the native kernel replicates the normalization itself (_norm_pid).
    This silently cost ~5x for every data-partitioned table once."""
    from mdvalidate_spark.run import ValidationRun
    from mdvalidate_spark.sources.synthetic import dim_source, full_images_spec

    df = spark.read.parquet(px_parquet)
    run = ValidationRun(
        spark, full_images_spec(with_pixel=True), df,
        dims={"dim_source": dim_source(spark)}, run_id="normpid",
    )
    needed = {"image_id", "bytes", "w", "h", "fmt", "phash"}
    # the run frame IS normalized — its plan recomputes partition_id ...
    assert not pixel_ops._native_safe(run.df, needed)
    # ... but the gate, fed the scan frame like _validate_batch does, stays
    # native; assert through the public entry the run itself uses
    cache: dict = {}
    out = pixel_ops.pixel_check_results(
        run.df, PixelRule("px"), "image_id", cache=cache, scan_df=run._scan_df
    )
    gate_keys = [k for k in cache if isinstance(k, tuple) and k[0] == "gate"]
    assert cache[gate_keys[0]][0] is True, "native gate must engage"
    assert out.count() == ROWS
    run.release()


def test_null_pid_rows_validate_in_reserved_partition_native(spark, tmp_path):
    """NULL partition_id rows belong to the reserved partition -1. The
    native path must agree end-to-end: the kernel normalizes raw file pids,
    the batch filter matches -1, and the row-group pruner keeps null-bearing
    row groups (min/max statistics ignore NULLs)."""
    from mdvalidate_spark.run import ValidationRun
    from mdvalidate_spark.sources.synthetic import dim_source, full_images_spec

    src = str(tmp_path / "nullpid")
    base = synthetic_images(spark, 60, with_bytes=True)
    base.withColumn(
        "partition_id",
        F.when(F.crc32(F.col("image_id")) % 4 == 0, F.lit(None)).otherwise(
            F.col("partition_id")
        ),
    ).write.mode("overwrite").parquet(src)
    df = spark.read.parquet(src)
    n_null = df.where(F.col("partition_id").isNull()).count()
    assert n_null > 0, "fixture must plant NULL pids"

    # direct batch targeting the reserved partition reaches the NULL rows
    checks = pixel_ops.pixel_check_results(
        df, PixelRule("px"), "image_id", partitions=[-1]
    )
    rows = checks.collect()
    assert len(rows) == n_null
    assert all(r["partition_id"] == -1 for r in rows)

    # and the full run books them in the manifest under -1, natively
    run = ValidationRun(
        spark, full_images_spec(with_pixel=True), df,
        dims={"dim_source": dim_source(spark)}, run_id="nullpid",
    )
    run.validate()
    gate_keys = [
        k for k in run._pixel_cache if isinstance(k, tuple) and k[0] == "gate"
    ]
    assert gate_keys and run._pixel_cache[gate_keys[0]][0] is True
    assert run.manifest.entries[-1]["rows"] == n_null
    run.release()


def test_release_frees_every_cached_frame(spark, px_parquet):
    """A long-lived session validating many runs must be able to free the
    blocks a run persisted — and, because the pixel checks plan carries no
    run_id literal, an un-released run's blocks are silently plan-matched by
    the NEXT identical run (it measures the cache, not the engine; this
    corrupted a scaling measurement once)."""
    from mdvalidate_spark.run import ValidationRun
    from mdvalidate_spark.sources.synthetic import dim_source, full_images_spec

    jsc = spark.sparkContext._jsc.sc()
    # delta-based: earlier tests in the shared session may hold blocks
    # clearCache can't touch (localCheckpoint) — measure only OUR frames
    baseline = {i.id() for i in jsc.getRDDStorageInfo()}
    df = spark.read.parquet(px_parquet)
    run = ValidationRun(
        spark, full_images_spec(with_pixel=True), df,
        dims={"dim_source": dim_source(spark)}, run_id="rel",
    )
    rep = run.validate()
    rep.violations.count()
    ours = {i.id() for i in jsc.getRDDStorageInfo()} - baseline
    assert ours, "run persists frames"
    run.release()
    left = {i.id() for i in jsc.getRDDStorageInfo()} - baseline
    assert not left, f"release must free every run-persisted frame: {left}"


def test_derived_pid_over_pid_bearing_files_uses_arrow(spark, px_parquet, tmp_path):
    """A frame that DROPPED the files' physical partition_id (run ids then
    engine-derived via pmod) must NOT take the native path even though the
    footers still carry the column — the kernel would emit the stale file
    ids and desynchronize batch filtering + manifest bookkeeping from the
    run's partition space."""
    from mdvalidate_spark.run import ValidationRun
    from mdvalidate_spark.sources.synthetic import dim_source, full_images_spec

    df = spark.read.parquet(px_parquet).drop("partition_id")
    run = ValidationRun(
        spark, full_images_spec(with_pixel=True, n_partitions=4), df,
        dims={"dim_source": dim_source(spark)}, run_id="droppid",
    )
    rep = run.validate()
    gate_keys = [
        k for k in run._pixel_cache if isinstance(k, tuple) and k[0] == "gate"
    ]
    assert gate_keys and run._pixel_cache[gate_keys[0]][0] is False
    # every row still validated, booked under the DERIVED partition space
    assert sum(e["rows"] for e in run.manifest.entries.values()) == ROWS
    assert set(run.manifest.entries) == set(range(4))
    assert rep.violations.where(F.col("rule_id") == "pixel").count() > 0
    run.release()


def test_arrow_path_normalizes_null_pids(spark, tmp_path):
    """The Arrow fallback must route NULL pids to the reserved partition -1
    exactly like the native kernel — a raw NULL never matches isin, which
    would silently drop the -1 partition's rows from the batch that targets
    them whenever the gate falls back."""
    src = str(tmp_path / "nullpid_arrow")
    base = synthetic_images(spark, 40, with_bytes=True)
    base.withColumn(
        "partition_id",
        F.when(F.crc32(F.col("image_id")) % 4 == 0, F.lit(None)).otherwise(
            F.col("partition_id")
        ),
    ).write.mode("overwrite").parquet(src)
    df = spark.read.parquet(src)
    n_null = df.where(F.col("partition_id").isNull()).count()
    assert n_null > 0
    out = pixel_ops._pixel_arrow(df, PixelRule("px"), "image_id", [-1])
    rows = out.collect()
    assert len(rows) == n_null
    assert all(r["partition_id"] == -1 for r in rows)
    # and parity: arrow agrees with the native path on the same batch
    native = pixel_ops.pixel_check_results(
        df, PixelRule("px"), "image_id", partitions=[-1]
    )
    assert checks_set(out) == checks_set(native)


def test_column_report_bytes_and_encodings(spark, tmp_path):
    """Per-column footer audit: byte attribution, dictionary encodings,
    stats presence — all from metadata, no data read."""
    from pyspark.sql import functions as F

    from mdvalidate_spark.errors import SchemaError
    from mdvalidate_spark.sources.layout import column_report

    src = str(tmp_path / "cols")
    (
        spark.range(5000)
        .select(
            F.col("id"),
            # highly repetitive string -> dictionary-encodable, high ratio
            (F.col("id") % 3).cast("string").alias("cat"),
        )
        .repartition(2)
        .write.parquet(src)
    )
    rep = column_report(spark.read.parquet(src))
    assert rep["n_files"] == 2
    cols = rep["columns"]
    assert set(cols) == {"id", "cat"}
    for d in cols.values():
        assert d["compressed_bytes"] > 0 and d["n_chunks"] >= 2
        assert d["ratio"] is not None
        # Spark writes min/max statistics -> every chunk prunable
        assert d["n_chunks_without_stats"] == 0
        assert d["codecs"]  # codec recorded (snappy by default)
    # the 3-value string column dictionary-encodes
    assert any("DICTIONARY" in e for e in cols["cat"]["encodings"])
    assert rep["total_compressed_bytes"] == sum(
        d["compressed_bytes"] for d in cols.values()
    )
    with pytest.raises(SchemaError):
        column_report([])
    with pytest.raises(SchemaError):
        column_report(spark.read.parquet(src), max_files=1)


def test_cli_column_report(spark, tmp_path, capsys):
    import json

    from mdvalidate_spark import cli

    src = str(tmp_path / "clitable")
    spark.range(1000).selectExpr("id", "cast(id % 5 as string) as cat") \
        .write.parquet(src)
    code = cli.main(["--table", src, "--column-report", "--master", "local[2]"])
    assert code == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(rep["columns"]) == {"id", "cat"}
    assert rep["total_compressed_bytes"] > 0
