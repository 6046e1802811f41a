#!/usr/bin/env python3
"""Time every oracle SQL in DuckDB over the testdata tables — the
same-workload comparator the judge holds graft.Bench against (the 2x
budget in BASELINE.md).

Usage: python3 dev/oracle_bench.py <sfDir> <oracleSqlJson> [query ...]
       (oracleSqlJson = the oracle_sql.json a graft.Verify run wrote)
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, oracle_json = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_json))
    per = {}
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            con.sql(sql).fetchall()
            per[name] = round(time.time() - t0, 4)
        except Exception as e:
            per[name] = None
            print(f"  FAIL {name}: {e}", file=sys.stderr)
    total = sum(v for v in per.values() if v is not None)
    print(json.dumps({"metric": "oracle_total", "value": round(total, 2),
                      "unit": "sec", "n": len(per), "queries": per}))


if __name__ == "__main__":
    main()
