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
