"""Table I/O: Iceberg-first input resolution with parquet fallback.

The engine's target input is an Iceberg table of image+caption pairs; this
sandbox ships no Iceberg runtime, so the same reference string resolves to
whichever is available:

  "iceberg:<catalog.db.table>"  — explicit Iceberg table identifier
  "<catalog.db.table>"          — treated as a catalog table if the session
                                  can resolve it (Iceberg/Hive/temp view)
  "/path/to/dir" | "s3://…"     — parquet directory (the fixture path here)

Iceberg is detected per-session (is the DataSource on the classpath?), so
the exact same spec/CLI invocation moves from the sandbox to a real cluster
by adding `--packages org.apache.iceberg:iceberg-spark-runtime-…` and a
catalog conf — no engine code changes.

The incremental/resume story maps onto this layer too: `list_partitions`
returns the physical work units a run's manifest tracks — Iceberg snapshot
files (via the `.files` metadata table) or parquet part-files. The reference
analog is the append-only chunk discovery of the streaming reader
(reference: validator.rs:101-149 — only the new tail is ever re-read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ICEBERG_PREFIX = "iceberg:"


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg DataSource is on the session's classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001 - classpath probe
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def _looks_like_path(ref: str) -> bool:
    return "/" in ref or ref.startswith(".") or "://" in ref


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    """Resolve a table reference to a DataFrame (see module doc for forms)."""
    if ref.startswith(ICEBERG_PREFIX):
        ident = ref[len(ICEBERG_PREFIX):]
        if not iceberg_available(spark):
            raise RuntimeError(
                f"table {ident!r} requested as Iceberg but no Iceberg runtime is "
                "on the classpath — launch with --packages org.apache.iceberg:"
                "iceberg-spark-runtime and a spark.sql.catalog.<name> conf"
            )
        return spark.read.format("iceberg").load(ident)
    if not _looks_like_path(ref):
        # catalog identifier: Iceberg catalogs, Hive tables, and temp views
        # all resolve through the session catalog
        return spark.table(ref)
    return spark.read.parquet(ref)


def list_partitions(spark: SparkSession, ref: str) -> list[str]:
    """Physical work units behind a table reference — the incremental
    validator diffs this listing against the run manifest so only new
    units are validated (Iceberg: one row per data file from the `.files`
    metadata table; parquet: one part-file per unit)."""
    if ref.startswith(ICEBERG_PREFIX):
        ident = ref[len(ICEBERG_PREFIX):]
        files = spark.read.format("iceberg").load(f"{ident}.files")
        return sorted(r["file_path"] for r in files.select("file_path").collect())
    return sorted(read_table(spark, ref).inputFiles())


def current_snapshot_id(spark: SparkSession, ref: str) -> str | None:
    """Iceberg snapshot id (resume watermark), None for non-Iceberg inputs —
    parquet fallback uses the file listing itself as the watermark."""
    if not ref.startswith(ICEBERG_PREFIX):
        return None
    ident = ref[len(ICEBERG_PREFIX):]
    snaps = spark.read.format("iceberg").load(f"{ident}.snapshots")
    row = snaps.orderBy("committed_at", ascending=False).select("snapshot_id").first()
    return str(row["snapshot_id"]) if row else None


def write_table(
    df: DataFrame,
    ref: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
) -> None:
    """Results-sink counterpart of read_table: the same reference forms
    route to Iceberg (``iceberg:<catalog.db.table>`` or a bare catalog
    identifier) or a parquet directory. On a real cluster the violations/
    metrics/manifest results land in an Iceberg results table (ACID append,
    snapshot history per run); in this sandbox the identical call writes
    parquet — no engine code changes between the two."""
    spark = df.sparkSession
    if ref.startswith(ICEBERG_PREFIX):
        ident = ref[len(ICEBERG_PREFIX):]
        if not iceberg_available(spark):
            raise RuntimeError(
                f"results table {ident!r} requested as Iceberg but no Iceberg "
                "runtime is on the classpath — launch with --packages "
                "org.apache.iceberg:iceberg-spark-runtime and a catalog conf"
            )
        w = df.writeTo(ident)
        if partition_by:
            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        if mode == "append":
            # results schemas grow over engine versions (e.g. the manifest
            # gained a lineage `seconds` column) — ask Iceberg to evolve the
            # table on append instead of failing a finished run at the write
            # step. Both option spellings are set (Iceberg accepted
            # `merge-schema` before standardizing on `mergeSchema`); on an
            # Iceberg build that honors neither, the operator fallback is
            # ALTER TABLE ... ADD COLUMN before the run.
            w = w.option("mergeSchema", "true").option("merge-schema", "true")
            w.append()  # partitioning comes from the existing table
        elif mode == "overwrite":
            w.createOrReplace()
        elif mode in ("error", "errorifexists"):
            w.create()  # raises TableAlreadyExists if present
        elif mode == "ignore":
            if not spark.catalog.tableExists(ident):
                w.create()
        else:
            raise ValueError(f"unknown write mode {mode!r}")
        return
    if not _looks_like_path(ref):
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.saveAsTable(ref)
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(ref)
