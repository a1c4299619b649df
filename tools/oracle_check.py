"""Local replica of the driver's correctness harness: run each queries()
entry on Spark AND its oracle_sql() on DuckDB at a given sf dir, compare
row-count + schema + order-insensitive value hash.

Usage: python tools/oracle_check.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(rows: list[dict], columns: list[str]) -> str:
    cols = sorted(columns)
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c]
            if isinstance(v, float):
                v = f"{v:.6f}".rstrip("0").rstrip(".")
                if v == "-0":
                    v = "0"
            elif isinstance(v, (list, tuple)):
                v = "[" + ",".join(str(x) for x in v) + "]"
            vals.append(str(v))
        out.append("\x01".join(vals))
    out.sort()
    return hashlib.md5("\x02".join(out).encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from mdvalidate_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = [r.asDict() for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle)")
            continue
        try:
            ddf = con.sql(oracles[name])
            dcols = [d[0] for d in ddf.description]
            drows = [dict(zip(dcols, row)) for row in ddf.fetchall()]
        except Exception as e:
            print(f"FAIL  {name}: duckdb error {e}")
            n_fail += 1
            continue
        ok_count = len(srows) == len(drows)
        ok_schema = sorted(scols) == sorted(dcols)
        ok_hash = canon(srows, scols) == canon(drows, dcols) if ok_schema else False
        status = "OK  " if (ok_count and ok_schema and ok_hash) else "FAIL"
        if status == "FAIL":
            n_fail += 1
        print(
            f"{status}  {name}: spark={len(srows)} duck={len(drows)} "
            f"schema={'=' if ok_schema else sorted(scols) + sorted(dcols)} hash={'=' if ok_hash else '!'}"
        )
        if not ok_hash and ok_schema and srows and drows:
            sset = {canon([r], scols): r for r in srows}
            dset = {canon([r], dcols): r for r in drows}
            for h, r in list(sset.items())[:200]:
                if h not in dset:
                    print(f"    spark-only: {r}")
                    break
            for h, r in list(dset.items())[:200]:
                if h not in sset:
                    print(f"    duck-only:  {r}")
                    break
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
