"""Local stand-in for the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same parquet, compare row count, schema (column names), and
order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [only_query_name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.tz_localize(None).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.round(6)
        elif s.dtype == object:
            df[c] = s.map(lambda x: None if x is None else (str(x) if not isinstance(x, (bytes, list)) else str(x)))
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("boolean")
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from data_pipelines_spark.session import get_spark

    spark = get_spark("oracle_check", master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spd = sdf.toPandas()
        except Exception as ex:
            print(f"FAIL  {name:28s} spark error: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name:28s} rows={len(spd)}  ({time.time()-t0:.1f}s)  [no oracle]")
            n_rows_only += 1
            continue
        try:
            opd = con.sql(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL  {name:28s} duckdb error: {str(ex).splitlines()[0]}")
            n_fail += 1
            continue
        a, b = _normalize(spd), _normalize(opd)
        if len(a) != len(b):
            print(f"FAIL  {name:28s} row count {len(a)} vs {len(b)}")
            n_fail += 1
            continue
        if list(a.columns) != list(b.columns):
            print(f"FAIL  {name:28s} columns {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False, atol=1e-6)
            print(f"PASS  {name:28s} rows={len(a)}  ({time.time()-t0:.1f}s)")
            n_pass += 1
        except AssertionError as ex:
            print(f"FAIL  {name:28s} value mismatch: {str(ex).splitlines()[-1][:150]}")
            # show a small diff sample
            neq = (a != b) & ~(a.isna() & b.isna())
            bad = neq.any(axis=1)
            if bad.any():
                print("  spark:", a[bad].head(3).to_dict("records"))
                print("  duck :", b[bad].head(3).to_dict("records"))
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
