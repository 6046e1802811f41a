#!/usr/bin/env python3
"""Time every oracle SQL in DuckDB over the testdata tables — the
same-workload comparator the judge holds graft.Bench against (the 2x
budget in BASELINE.md).

Usage: python3 dev/oracle_bench.py <sfDir> <oracleSqlJson> [query ...]
       (oracleSqlJson = the oracle_sql.json a graft.Verify run wrote)

Env: ORACLE_BENCH_TIMEOUT=<sec> — per-query cutoff (default: none).
A timed-out query is interrupted, recorded as "timeout", and excluded
from the total (the scaling experiment needs bounded wall time; at 10x
data some naive-recompute oracles run for hours).
"""
import json
import os
import sys
import threading
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def connect(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def main():
    sf_dir, oracle_json = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    timeout = float(os.environ.get("ORACLE_BENCH_TIMEOUT", "0")) or None
    con = connect(sf_dir)
    oracle = json.load(open(oracle_json))
    per = {}
    timeouts = []
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        interrupted = [False]
        timer = None
        if timeout:
            def fire():
                interrupted[0] = True
                con.interrupt()
            timer = threading.Timer(timeout, fire)
            timer.start()
        try:
            con.sql(sql).fetchall()
            per[name] = round(time.time() - t0, 4)
        except Exception as e:
            # classify by exception TYPE: our timer is the only caller of
            # con.interrupt(), so InterruptException with the flag set is a
            # timeout; any OTHER exception is a genuine failure even if it
            # surfaced after the timer fired (an elapsed-time guard here
            # would be dead code — the flag only sets once `timeout`
            # seconds have already passed)
            if interrupted[0] and isinstance(e, duckdb.InterruptException):
                per[name] = "timeout"
                timeouts.append(name)
            else:
                per[name] = None
                print(f"  FAIL {name}: {e}", file=sys.stderr)
        finally:
            if timer:
                timer.cancel()
        if interrupted[0] and per[name] != "timeout":
            # the timer fired while (or just as) the query finished —
            # cancel() cannot un-fire it, and the pending interrupt would
            # abort the NEXT query. A fresh connection drains it.
            con.close()
            con = connect(sf_dir)
        print(f"  {name}: {per[name]}", file=sys.stderr, flush=True)
    total = sum(v for v in per.values() if isinstance(v, float))
    print(json.dumps({"metric": "oracle_total", "value": round(total, 2),
                      "unit": "sec", "n": len(per), "timeouts": timeouts,
                      "queries": per}))


if __name__ == "__main__":
    main()
