"""Native parquet scan: run a vectorized Python kernel over parquet files
read DIRECTLY by the Python workers (pyarrow C++), bypassing the JVM→Arrow
→Python serialization of binary columns.

Why this exists (measured, local[32], 240k images ≈ 2.2 GB of bytes):
  - JVM Arrow transfer of a BinaryType column: ~18 MB/s per core
    (≈0.5 ms/value serialization cost) → the pixel stage ran SLOWER with more
    cores as the driver JVM thrashed.
  - Native pyarrow read in the worker: full C++ scan speed; the pixel suite
    went from ~8k to ~38k images/s and scales with cores.

This is also the correct 100 TB architecture: the unit of work is a parquet
FILE (or row-group), so executors stream their own splits with zero JVM
copies — the same pattern Spark's binaryFile source and petastorm use. Works
with any pyarrow-supported filesystem (local, s3://, hdfs://) since workers
open paths themselves.

Trade-off: no Catalyst pushdown inside the kernel — pass `columns` for
pruning and `row_filter` for residual filtering (applied per batch in
pandas). Fall back to the DataFrame path for non-parquet sources.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def parquet_files(df: DataFrame) -> list[str]:
    """Physical parquet files behind a DataFrame ([] if not file-backed)."""
    try:
        files = df.inputFiles()
    except Exception:
        return []
    out = []
    for f in files:
        if not f.endswith(".parquet"):
            return []
        out.append(f.removeprefix("file://"))
    return out


def parquet_columns(files: list[str]) -> list[str]:
    import pyarrow.parquet as pq

    if not files:
        return []
    return list(pq.read_schema(files[0]).names)


def native_parquet_map(
    spark: SparkSession,
    files: list[str],
    columns: list[str],
    kernel: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
    row_filter: Callable[[pd.DataFrame], pd.DataFrame] | None = None,
    batch_rows: int = 4096,
) -> DataFrame:
    """Distribute file paths; each task pyarrow-streams its file's row groups
    (bounded memory via iter_batches) and applies `kernel` per batch."""
    fdf = spark.createDataFrame([(f,) for f in sorted(files)], "path string")
    fdf = fdf.repartition(max(len(files), 1))

    def scan(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        for pdf in it:
            for path in pdf["path"]:
                pf = pq.ParquetFile(path)
                for rb in pf.iter_batches(batch_size=batch_rows, columns=columns):
                    batch = rb.to_pandas()
                    if row_filter is not None:
                        batch = row_filter(batch)
                    if len(batch):
                        yield kernel(batch)

    return fdf.mapInPandas(scan, schema=schema)
