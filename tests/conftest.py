import pytest

from mdvalidate_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="mdvalidate-tests",
        master="local[8]",
        shuffle_partitions=16,
        extra_conf={"spark.sql.warehouse.dir": "/tmp/mdv-warehouse"},
    )
    yield s
    s.stop()
