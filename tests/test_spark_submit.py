"""End-to-end spark-submit launch (the north rule's deployment form:
`spark-submit --py-files` on a cluster — here local[2] in a FRESH JVM and a
clean PYTHONPATH, so the library genuinely arrives via the --py-files zip,
not via the repo checkout)."""

import os
import shutil
import subprocess
import sys

import duckdb
import pytest

from mdvalidate_spark.sources.synthetic import dim_source, full_images_spec, synthetic_images
from mdvalidate_spark.spec_io import save_spec

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="no spark-submit on PATH"
)
def test_spark_submit_pyfiles_end_to_end(spark, tmp_path):
    # 1. build the deployment artifacts (zip + driver shim) the documented way
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "package_pyfiles.py")],
        check=True, capture_output=True, text=True, timeout=120,
    )
    zip_path = os.path.join(REPO, "dist", "mdvalidate_spark.zip")
    main_path = os.path.join(REPO, "dist", "submit_main.py")
    assert os.path.exists(zip_path) and os.path.exists(main_path)

    # 2. fixture inputs written by the test session
    table = str(tmp_path / "imgs")
    synthetic_images(spark, 300, with_bytes=False).write.parquet(table)
    dimp = str(tmp_path / "dim_source")
    dim_source(spark).write.parquet(dimp)
    specp = str(tmp_path / "spec.json")
    save_spec(full_images_spec(with_pixel=False), specp)
    out = str(tmp_path / "out")

    # 3. fresh JVM + clean PYTHONPATH + neutral cwd: the only route to the
    # library is the --py-files zip (this is exactly what executors on a real
    # cluster see)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            main_path,
            "--spec", specp,
            "--table", table,
            "--dim", f"dim_source={dimp}",
            "--output", out,
            "--run-id", "submit-e2e",
        ],
        capture_output=True, text=True, timeout=900, cwd=str(tmp_path), env=env,
    )
    assert proc.returncode == 1, (  # injected violations → red, not a crash
        f"rc={proc.returncode}\nstdout:\n{proc.stdout[-2000:]}\n"
        f"stderr:\n{proc.stderr[-2000:]}"
    )
    # 4. results parquet is real and complete (duckdb: no Spark dependency on
    # the assertion path)
    n_viol = duckdb.sql(
        f"SELECT count(*) FROM '{out}/violations/*.parquet'"
    ).fetchone()[0]
    assert n_viol > 0
    n_parts = duckdb.sql(
        f"SELECT count(*) FROM '{out}/manifest/*.parquet'"
    ).fetchone()[0]
    assert n_parts == 8
