#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: load each query's parquet
dump (from graft.Verify), run its oracle SQL in DuckDB over the same testdata
tables, sort columns by name + rows by value, and diff.

Usage: python3 dev/check.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    cols = []
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            s = s.astype(str)
        cols.append(s)
    import pandas as pd
    out = pd.concat(cols, axis=1)
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out


def approx_equal(a, b):
    if a.shape != b.shape or list(a.columns) != list(b.columns):
        return False, f"shape/cols: {a.shape}{list(a.columns)} vs {b.shape}{list(b.columns)}"
    for c in a.columns:
        x, y = a[c], b[c]
        # dtype-strict: the driver's hash compare stringifies values, so an
        # int64-vs-float64 split (e.g. DuckDB HUGEINT sums) renders "123" vs
        # "123.0" and fails there even when numerically equal. Fail it here
        # too, so local green predicts driver green.
        if (x.dtype.kind in "iu") != (y.dtype.kind in "iu"):
            return False, f"col {c}: dtype split spark={x.dtype} oracle={y.dtype} (int-vs-float fails the driver hash)"
        if x.dtype.kind == "f" or y.dtype.kind == "f":
            import numpy as np
            xa, ya = x.astype(float).values, y.astype(float).values
            nan_ok = (np.isnan(xa) == np.isnan(ya)).all()
            diff = np.nanmax(np.abs(xa - ya)) if len(xa) else 0.0
            if not nan_ok or (len(xa) and diff > 0):
                return False, f"col {c}: max|diff|={diff} nan_ok={nan_ok}"
        else:
            if not (x.astype(str).values == y.astype(str).values).all():
                bad = (x.astype(str).values != y.astype(str).values).nonzero()[0][:5]
                return False, f"col {c}: mismatch rows {bad.tolist()} spark={x.iloc[bad].tolist()} oracle={y.iloc[bad].tolist()}"
    return True, ""


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark_df = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            duck_df = con.sql(sql).df()
            a, b = canon(spark_df), canon(duck_df)
            ok, why = approx_equal(a, b)
        except Exception as e:
            ok, why = False, f"EXC {e}"
        if ok:
            n_ok += 1
            print(f"  OK   {name} ({len(a)} rows)")
        else:
            n_bad += 1
            print(f"  FAIL {name}: {why}")
    print(f"== {n_ok} ok, {n_bad} fail")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
