"""The --py-files artifact must be self-contained: importing the package from
the zip ALONE (repo dir absent from sys.path) has to succeed, or a cluster
launch would die on the first executor import."""

import os
import subprocess
import sys


def test_pyfiles_zip_imports_standalone(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import package_pyfiles

    zip_path, main_path = package_pyfiles.build(str(tmp_path))
    assert os.path.exists(zip_path) and os.path.exists(main_path)

    probe = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        # simulate the executor: the repo checkout is NOT on the path
        "sys.path = [p for p in sys.path if not p.rstrip('/').endswith('repo')]; "
        "import mdvalidate_spark, mdvalidate_spark.cli, "
        "mdvalidate_spark.operators.dedup, mdvalidate_spark.spec_io; "
        "from mdvalidate_spark.spec import Spec, RegexRule; "
        "s = Spec(rules=(RegexRule('r', 'c', 'x+'),), n_partitions=4); "
        "print('ZIPOK', len(s.rules))"
    )
    out = subprocess.run(
        [sys.executable, "-c", probe, zip_path],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        timeout=120,
    )
    assert "ZIPOK 1" in out.stdout, (out.stdout, out.stderr)
