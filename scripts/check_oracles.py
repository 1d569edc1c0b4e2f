#!/usr/bin/env python
"""Local twin of the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB over the same sf dir; compare row count,
column names, and values (columns sorted by name, rows sorted, exact match —
doubles included, since both sides are designed for bit-identical output).

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == np.float32:
            df[c] = df[c].astype(np.float64)
        if str(df[c].dtype) in ("int32", "int16", "int8", "uint32"):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from belb_spark.session import get_spark

    spark = get_spark("oracle_check", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = normalize(fn(spark, sf_dir).toPandas())
        t1 = time.time()
        if name not in oracles:
            print(f"  {name:32s} rows={len(sdf):8d}  (no oracle — rows-only) {t1 - t0:5.1f}s")
            continue
        odf = normalize(con.sql(oracles[name]).df())
        t2 = time.time()
        status = "OK"
        detail = ""
        if list(sdf.columns) != list(odf.columns):
            status = "SCHEMA-MISMATCH"
            detail = f"spark={list(sdf.columns)} oracle={list(odf.columns)}"
        elif len(sdf) != len(odf):
            status = "ROWCOUNT-MISMATCH"
            detail = f"spark={len(sdf)} oracle={len(odf)}"
        else:
            for c in sdf.columns:
                a, o = sdf[c], odf[c]
                if a.dtype == np.float64:
                    eq = np.allclose(a, o, rtol=0, atol=0, equal_nan=True)
                    if not eq:
                        close = np.allclose(a, o, rtol=1e-9, atol=1e-9, equal_nan=True)
                        status = "VALUE-NEAR" if close else "VALUE-MISMATCH"
                        bad = (~np.isclose(a, o, rtol=0, atol=0, equal_nan=True)).sum()
                        detail += f" col={c} ndiff={bad}"
                else:
                    if not a.equals(o):
                        status = "VALUE-MISMATCH"
                        bad = (a != o).sum()
                        detail += f" col={c} ndiff={bad}"
        flag = "✓" if status == "OK" else "✗"
        print(f"{flag} {name:32s} rows={len(sdf):8d} {status} {detail} "
              f"[spark {t1 - t0:4.1f}s duck {t2 - t1:4.1f}s]")
        if status != "OK":
            failures.append((name, status, detail))

    if failures:
        print(f"\n{len(failures)} FAILURES:")
        for f in failures:
            print(" ", f)
        return 1
    print("\nall oracle checks passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
