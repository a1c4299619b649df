"""Physical-layout diagnostics: the small-file audit every huge table needs.

At 10^12 rows the classic operational failure is not a wrong answer but a
scan that schedules millions of tiny tasks because the table was written
as under-sized files (streaming sinks, per-partition dribble, over-wide
repartition). This module reads ONLY parquet footers + filesystem sizes —
driver-side, one metadata fetch per file, no Spark job, no data read — and
reports the compaction decision: how far the layout is from a target file
size and what partition count a rewrite should use.

On an Iceberg table the manifest already carries these numbers; this is
the parquet-path equivalent, reusing the same footer reads the native
row-group pruner performs (native_scan.footer_meta).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

from .native_scan import parquet_files


def _file_size(path: str) -> int:
    import os

    if path.startswith("file:"):
        # raw inputFiles() URIs are percent-encoded file: URIs —
        # os.path.getsize wants a plain path (same normalization as
        # native_scan.parquet_files)
        from urllib.parse import unquote

        return os.path.getsize(
            unquote(path.removeprefix("file://").removeprefix("file:"))
        )
    if "://" not in path:
        return os.path.getsize(path)
    from pyarrow import fs as pafs

    filesystem, p = pafs.FileSystem.from_uri(path)
    return filesystem.get_file_info(p).size


def layout_report(
    source,
    *,
    target_file_bytes: int = 512 * 2**20,
    small_file_bytes: int | None = None,
    max_files: int = 100_000,
) -> dict:
    """Layout audit for a parquet-backed DataFrame (or explicit file list).

    Returns a dict: n_files, total_bytes, total_rows, total_row_groups,
    n_small_files / small_bytes_frac (files under ``small_file_bytes``,
    default target/4), median_file_bytes, suggested_partitions
    (= ceil(total_bytes / target_file_bytes) — the repartition() count a
    compaction rewrite should use), and the 10 smallest files for triage.

    Refuses above ``max_files``: a driver loop over millions of footers is
    the wrong tool — at that point the table catalog (Iceberg manifests)
    is the source of these numbers."""
    from ..errors import SchemaError

    files = parquet_files(source) if isinstance(source, DataFrame) else list(source)
    if not files:
        raise SchemaError(
            "layout_report needs a parquet-file-backed DataFrame or a "
            "non-empty file list"
        )
    if len(files) > max_files:
        raise SchemaError(
            f"layout_report: {len(files)} files exceeds max_files="
            f"{max_files} — read these numbers from the table catalog "
            "(Iceberg manifests) instead of a driver footer loop"
        )
    if small_file_bytes is None:
        small_file_bytes = target_file_bytes // 4

    import pyarrow.parquet as pq

    sizes, rows, groups = [], 0, 0
    for f in files:
        sizes.append((_file_size(f), f))
        md = pq.ParquetFile(f).metadata
        rows += md.num_rows
        groups += md.num_row_groups
    sizes.sort()
    total = sum(s for s, _ in sizes)
    small = [(s, f) for s, f in sizes if s < small_file_bytes]
    return {
        "n_files": len(files),
        "total_bytes": total,
        "total_rows": rows,
        "total_row_groups": groups,
        "n_small_files": len(small),
        "small_bytes_frac": (sum(s for s, _ in small) / total) if total else 0.0,
        "median_file_bytes": sizes[len(sizes) // 2][0],
        "suggested_partitions": max(1, math.ceil(total / target_file_bytes)),
        "smallest_files": [(f, s) for s, f in sizes[:10]],
    }


def column_report(
    source,
    *,
    max_files: int = 10_000,
) -> dict:
    """Per-COLUMN physical audit from the same parquet footers: where the
    bytes actually live and whether the layout can prune.

    For each leaf column, aggregated over every row-group chunk:
    ``compressed_bytes`` / ``uncompressed_bytes`` / ``ratio`` (≈1.0 on a
    large column = UNCOMPRESSED or incompressible payload — at 100 TB the
    difference between shipping 1× and 3× the bytes), the ``codecs`` and
    ``encodings`` actually used (a string column whose chunks carry no
    RLE_DICTIONARY encoding re-writes every repeated value — the classic
    silent 5× table bloat), ``n_chunks``, and ``n_chunks_without_stats``
    (chunks missing min/max statistics cannot be pruned by predicate
    pushdown OR by the native row-group-range scan — a scan that should
    read 1% reads 100%).

    Driver-side footer metadata only — no Spark job, no data read; refuses
    above ``max_files`` like layout_report (catalog territory). Returns
    {"columns": {name: {...}}, "n_files", "total_compressed_bytes"}."""
    from ..errors import SchemaError

    files = parquet_files(source) if isinstance(source, DataFrame) else list(source)
    if not files:
        raise SchemaError(
            "column_report needs a parquet-file-backed DataFrame or a "
            "non-empty file list"
        )
    if len(files) > max_files:
        raise SchemaError(
            f"column_report: {len(files)} files exceeds max_files="
            f"{max_files} — read these numbers from the table catalog "
            "(Iceberg manifests) instead of a driver footer loop"
        )
    import pyarrow.parquet as pq

    cols: dict[str, dict] = {}
    for f in files:
        md = pq.ParquetFile(f).metadata
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            for i in range(rg.num_columns):
                ch = rg.column(i)
                name = ch.path_in_schema
                d = cols.setdefault(
                    name,
                    {
                        "compressed_bytes": 0,
                        "uncompressed_bytes": 0,
                        "n_chunks": 0,
                        "n_chunks_without_stats": 0,
                        "codecs": set(),
                        "encodings": set(),
                    },
                )
                d["compressed_bytes"] += ch.total_compressed_size
                d["uncompressed_bytes"] += ch.total_uncompressed_size
                d["n_chunks"] += 1
                if ch.statistics is None or not ch.statistics.has_min_max:
                    d["n_chunks_without_stats"] += 1
                d["codecs"].add(ch.compression)
                d["encodings"].update(ch.encodings)
    for d in cols.values():
        d["codecs"] = sorted(d["codecs"])
        d["encodings"] = sorted(d["encodings"])
        d["ratio"] = (
            round(d["compressed_bytes"] / d["uncompressed_bytes"], 4)
            if d["uncompressed_bytes"]
            else None
        )
    return {
        "columns": cols,
        "n_files": len(files),
        "total_compressed_bytes": sum(
            d["compressed_bytes"] for d in cols.values()
        ),
    }
