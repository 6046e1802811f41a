#!/usr/bin/env python3
"""Build an N-fold FK-consistent replica of a testdata sf dir for the
scaling experiment in SCALE.md ("do the per-query constants amortize
with volume?").

Each replica shifts every key family by a disjoint offset so joins,
dedup fingerprints and ANN anchors behave exactly like the original
data (each user/order/doc replica is an independent copy — group sizes,
join fan-outs and near-dup structure are preserved, only cardinality
grows). Offsets are chosen to clear each table's key range while
staying clear of the suite's synthetic-key spaces (doc dupShift 1e6 →
doc ids shift by 1e5 and planted-dup ids stay disjoint; q79 fabricates
insert keys at +1e9 → order ids shift by 1e7; t41 maps suppliers to
+1e9 → supp/cust shifts stay far below).

Usage: python3 dev/mk_scale_replica.py <srcSfDir> <outDir> <replicas>
"""
import sys

import duckdb

# key column -> per-replica shift (must exceed the column's value range
# in the source dir, times the replica count, without colliding with
# any synthetic offset the suite itself adds)
SHIFTS = {
    "o_orderkey": 10_000_000,
    "l_orderkey": 10_000_000,
    "o_custkey": 1_000_000,
    "c_custkey": 1_000_000,
    "user_id": 1_000_000,
    "l_partkey": 1_000_000,
    "p_partkey": 1_000_000,
    "l_suppkey": 100_000,
    "s_suppkey": 100_000,
    "event_id": 10_000_000,
    "doc_id": 100_000,
    "vec_id": 100_000,  # multiple of 100: vec_id % 100 anchor density kept
}

# small dimensions replicate ONCE (their keys are referenced unshifted)
SINGLETON = {"nation", "region"}

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


# synthetic-offset guards: the suite plants doubled-corpus ids at
# doc_id/vec_id + 1e6, maps suppliers to +1e9 (t41), and fabricates
# merge-insert keys at o_orderkey + 1e9 (q79) — replicated ids must stay
# strictly below these spaces or fixtures silently corrupt
CEILINGS = {
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
    "o_orderkey": 1_000_000_000,
    "l_orderkey": 1_000_000_000,
    "s_suppkey": 1_000_000_000,
    "l_suppkey": 1_000_000_000,
    # t41 maps suppliers to +1e9 in a shared id space with customers
    "c_custkey": 1_000_000_000,
    "o_custkey": 1_000_000_000,
    "user_id": 1_000_000_000,
}


def main():
    src, out, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
    con = duckdb.connect()
    import os
    os.makedirs(out, exist_ok=True)
    # refuse shifts that would collide: every shifted column needs
    # max(value) < shift (replica ranges disjoint) and
    # max(value) + (n-1)*shift below its synthetic-offset ceiling
    for t in TABLES:
        if t in SINGLETON:
            continue
        cols = [r[0] for r in con.sql(
            f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()]
        for c in cols:
            if c not in SHIFTS:
                continue
            hi = con.sql(
                f"SELECT max({c}) FROM '{src}/{t}.parquet'").fetchone()[0]
            assert hi < SHIFTS[c], \
                f"{t}.{c}: max {hi} >= shift {SHIFTS[c]} (replicas collide)"
            top = hi + (n - 1) * SHIFTS[c]
            ceil_ = CEILINGS.get(c)
            assert ceil_ is None or top < ceil_, \
                f"{t}.{c}: replica {n - 1} reaches {top} >= synthetic " \
                f"offset {ceil_} — lower the replica count"
    for t in TABLES:
        cols = [r[0] for r in con.sql(
            f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()]
        if t in SINGLETON:
            con.sql(f"COPY (SELECT * FROM '{src}/{t}.parquet') TO "
                    f"'{out}/{t}.parquet' (FORMAT PARQUET)")
            continue
        sel = ", ".join(
            f"{c} + r * {SHIFTS[c]} AS {c}" if c in SHIFTS else c
            for c in cols)
        con.sql(
            f"COPY (SELECT {sel} FROM '{src}/{t}.parquet', "
            f"      range({n}) AS reps(r) ORDER BY r) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        print(t, con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0])


if __name__ == "__main__":
    main()
