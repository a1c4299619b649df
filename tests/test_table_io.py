"""Table-reference resolution (sources/table_io.py): parquet paths, catalog
identifiers, and the Iceberg-requested-but-unavailable error path (this
sandbox ships no Iceberg runtime, so the graceful-degradation branch is the
one that can be exercised for real)."""

import pytest

from mdvalidate_spark.sources.table_io import (
    iceberg_available,
    list_partitions,
    current_snapshot_id,
    read_table,
)


@pytest.fixture(scope="module")
def pq_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tio") / "t.parquet")
    spark.range(0, 100, 1, 4).write.parquet(d)
    return d


def test_read_parquet_path(spark, pq_dir):
    assert read_table(spark, pq_dir).count() == 100


def test_read_catalog_identifier(spark):
    spark.range(7).createOrReplaceTempView("tio_view")
    assert read_table(spark, "tio_view").count() == 7


def test_iceberg_absent_is_detected_and_errors_clearly(spark):
    if iceberg_available(spark):
        pytest.skip("Iceberg runtime present — error path not reachable")
    with pytest.raises(RuntimeError, match="no Iceberg runtime"):
        read_table(spark, "iceberg:cat.db.images")


def test_list_partitions_parquet(spark, pq_dir):
    parts = list_partitions(spark, pq_dir)
    assert len(parts) == 4
    assert parts == sorted(parts)
    assert all(p.endswith(".parquet") for p in parts)


def test_snapshot_id_none_for_parquet(spark, pq_dir):
    assert current_snapshot_id(spark, pq_dir) is None
