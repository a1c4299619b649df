"""Build the spark-submit artifacts: dist/mdvalidate_spark.zip + dist/submit_main.py.

spark-submit cannot run a module (`-m` is a plain-python idiom, not a
spark-submit one); the canonical cluster launch is a tiny driver script plus
the library shipped via --py-files:

    python tools/package_pyfiles.py
    spark-submit --py-files dist/mdvalidate_spark.zip dist/submit_main.py \
        --spec spec.json --table s3://bucket/images ...

The zip contains only the package (no tests, no caches), zipimport-safe —
every executor unpacks the same bytes, so library code and the driver script
can never skew.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "mdvalidate_spark"

LAUNCHER = """\
\"\"\"spark-submit driver script: thin shim over mdvalidate_spark.cli.main.

The library arrives via --py-files (already on sys.path when this runs).
\"\"\"
import sys

from mdvalidate_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
"""


def build(dist_dir: str | None = None) -> tuple[str, str]:
    dist = dist_dir or os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    zip_path = os.path.join(dist, f"{PKG}.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(os.path.join(REPO, PKG)):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    main_path = os.path.join(dist, "submit_main.py")
    with open(main_path, "w") as f:
        f.write(LAUNCHER)
    return zip_path, main_path


if __name__ == "__main__":
    zp, mp = build()
    print(f"wrote {zp}")
    print(f"wrote {mp}")
    print(
        "launch: spark-submit --py-files dist/mdvalidate_spark.zip "
        "dist/submit_main.py --spec spec.json --table <uri> ..."
    )
