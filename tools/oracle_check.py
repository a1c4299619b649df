"""Local replica of the driver's correctness harness: run each queries()
entry on Spark AND its oracle_sql() on DuckDB at a given sf dir, compare
row-count + schema + order-insensitive value hash.

STRICT by construction (round 5): canonicalization replicates the
driver's pandas-based `_canon` — results land in a pandas DataFrame
(Spark via toPandas, DuckDB via .df()), columns sorted by name, rows
sorted with DataFrame.sort_values over the raw values, then every cell
stringified with plain str() and hashed. No float trimming, no
list-joining: a DuckDB HUGEINT that arrives as float ("150000.0") will
mismatch a Spark long ("150000"), and an array-typed column will crash
sort_values with `unhashable type: 'list'` — exactly as the driver's
harness behaves (both classes shipped as r4 red rows because the old
replica canonicalizer was laxer).

Usage: python tools/oracle_check.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(df: pd.DataFrame) -> str:
    """Driver-replica canonical hash: sorted columns, sort_values over the
    raw cell values (raises TypeError on unhashable cells, like the
    driver), then str() every cell. Intentionally NOT forgiving."""
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort")
    out = "\x02".join(
        "\x01".join(str(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    )
    return hashlib.md5(out.encode()).hexdigest()


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
            spdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(spdf)} rows (no oracle)")
            continue
        try:
            dpdf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error {e}")
            n_fail += 1
            continue
        ok_count = len(spdf) == len(dpdf)
        ok_schema = sorted(spdf.columns) == sorted(dpdf.columns)
        if ok_schema:
            try:
                ok_hash = canon(spdf) == canon(dpdf)
                hash_err = None
            except Exception as e:  # driver would crash here too -> red row
                ok_hash = False
                hash_err = f"{type(e).__name__}: {e}"
        else:
            ok_hash, hash_err = False, None
        status = "OK  " if (ok_count and ok_schema and ok_hash) else "FAIL"
        if status == "FAIL":
            n_fail += 1
        print(
            f"{status}  {name}: spark={len(spdf)} duck={len(dpdf)} "
            f"schema={'=' if ok_schema else [sorted(spdf.columns), sorted(dpdf.columns)]} "
            f"hash={'=' if ok_hash else '!'}"
            + (f" canon-crash={hash_err}" if hash_err else "")
        )
        if not ok_hash and ok_schema and hash_err is None and len(spdf) and len(dpdf):
            cols = sorted(spdf.columns)
            srow_set = {canon(spdf.iloc[[i]]) for i in range(len(spdf))}
            drow_set = {canon(dpdf.iloc[[i]]) for i in range(len(dpdf))}
            for i in range(len(spdf)):
                if canon(spdf.iloc[[i]]) not in drow_set:
                    print(f"    spark-only: {spdf.iloc[i][cols].to_dict()}")
                    break
            for i in range(len(dpdf)):
                if canon(dpdf.iloc[[i]]) not in srow_set:
                    print(f"    duck-only:  {dpdf.iloc[i][cols].to_dict()}")
                    break
            # dtype drift is the usual culprit under strict mode
            sd = {c: str(spdf[c].dtype) for c in cols}
            dd = {c: str(dpdf[c].dtype) for c in cols}
            drift = {c: (sd[c], dd[c]) for c in cols if sd[c] != dd[c]}
            if drift:
                print(f"    dtype-drift: {drift}")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
