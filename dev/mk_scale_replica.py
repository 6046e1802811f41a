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

Usage: python3 dev/mk_scale_replica.py <srcSfDir> <outDir> <replicas> \
           [--skew [frac]]

--skew (round 13) builds the HOT-KEY variant of the same replica: after
replication, one entity family absorbs ~frac (default 0.30) of the rows
in each skew-sensitive table — the dedup/join worst case the salting
and bucket-split machinery exists for:
  - lineitem: rows of ~frac of orders are REPOINTED at one hot
    o_orderkey (still FK-valid — the hot order exists in every
    replica's orders) → q38's fact⋈dim join develops one key holding
    ~frac of the fact side;
  - events:   ~frac of rows repoint user_id at one hot user → q73's
    skew audit sees a top-1 key at ~frac·n rows;
  - documents: ~frac of docs REWRITE their text to one shared
    boilerplate template + a doc-unique tail sized so family pairs
    share hot LSH bands (template shingles dominate) but stay BELOW
    the verify thresholds (unique tail ≈ half the shingle mass) —
    hot candidate buckets without a quadratic TRUE-pair output, i.e.
    wasted-candidate pressure on t06/t08/t70/t74/t76's split paths,
    not an output-size blowup both engines would share.
Selection is deterministic (key modulo), so reruns are reproducible
and the Spark run and its DuckDB comparator read identical bytes.
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


def skew_overrides(con, src, n, pct):
    """Per-table column-expression overrides for --skew: applied AFTER
    the replica shift, selected by base-key modulo (deterministic,
    uniform — source keys are sequential)."""
    hot_order = con.sql(
        f"SELECT min(o_orderkey) FROM '{src}/orders.parquet'").fetchone()[0]
    hot_user = con.sql(
        f"SELECT min(user_id) FROM '{src}/events.parquet'").fetchone()[0]
    tmpl = con.sql(
        f"SELECT substr(text, 1, 240) FROM '{src}/documents.parquet' "
        f"ORDER BY doc_id LIMIT 1").fetchone()[0].replace("'", "''")
    # doc-unique tail: 13 tokens carrying the REPLICATED doc id — enough
    # unique shingle mass that family pairs stay below the 0.8/0.9
    # verify thresholds while the shared template keeps their LSH bands
    # hot (the wasted-candidate regime the bucket split bounds)
    # hash-spread SHORT tails: md5-derived 6-hex-char tokens (NOT the raw
    # sequential id — near-consecutive ids share digit shingles and would
    # push family char-3 Jaccard against t08's 0.9 threshold). 8 short
    # unique tokens keep the template at ~60–70% of each doc's shingle
    # mass: family pairs verify BELOW both thresholds (J_tok ≈ 0.6–0.7 <
    # 0.8, J_char ≈ 0.4 < 0.9) while a large share of the family still
    # minhashes every band row onto TEMPLATE shingles — identical band
    # signatures, i.e. genuinely hot buckets for the split machinery.
    did = f"(doc_id + r * {SHIFTS['doc_id']})"
    tail = " || ".join(
        f"' q{i}x' || substr(md5(CAST({did} * 8 + {i} AS VARCHAR)), 1, 6)"
        for i in range(1, 9))
    return {
        ("lineitem", "l_orderkey"):
            f"CASE WHEN l_orderkey % 100 < {pct} THEN {hot_order} "
            f"ELSE l_orderkey + r * {SHIFTS['l_orderkey']} END AS l_orderkey",
        ("events", "user_id"):
            f"CASE WHEN user_id % 100 < {pct} THEN {hot_user} "
            f"ELSE user_id + r * {SHIFTS['user_id']} END AS user_id",
        ("documents", "text"):
            f"CASE WHEN doc_id % 100 < {pct} THEN '{tmpl}' || {tail} "
            f"ELSE text END AS text",
    }


def main():
    src, out, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
    skew = "--skew" in sys.argv[4:]
    frac = 0.30
    if skew:
        rest = [a for a in sys.argv[4:] if a != "--skew"]
        if rest:
            frac = float(rest[0])
    pct = round(frac * 100)
    con = duckdb.connect()
    import os
    os.makedirs(out, exist_ok=True)
    # 100x replicas (round 14): the default 1e5 doc/vec spacing crosses
    # the 1e6 synthetic-dup space at n >= 10 replicas x 10 spacing.
    # Drop to 1e4 — still clears sf0.1's id range (0..4999) and stays a
    # multiple of 100 so embeddings' vec_id % 100 anchor density holds.
    # Done BEFORE skew_overrides so the skew text tails embed the same
    # shifted ids the tables carry.
    if n * SHIFTS["doc_id"] >= CEILINGS["doc_id"]:
        SHIFTS["doc_id"] = SHIFTS["vec_id"] = 10_000
    overrides = skew_overrides(con, src, n, pct) if skew else {}
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
            overrides.get((t, c),
                f"{c} + r * {SHIFTS[c]} AS {c}" if c in SHIFTS else c)
            for c in cols)
        con.sql(
            f"COPY (SELECT {sel} FROM '{src}/{t}.parquet', "
            f"      range({n}) AS reps(r) ORDER BY r) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        print(t, con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0])


if __name__ == "__main__":
    main()
