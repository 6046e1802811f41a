package graft.queries

import org.apache.spark.sql.functions._
import graft.etl.{Normalize, Tables, TopK}

/** Parity queries: the reference's entire relational surface (SURVEY.md §2)
  * re-expressed over the driver's TPC-H-ish testdata. Role mapping per
  * FIXTURES.md §B: `customer`/`orders` play "store"/"fact" (the reference's
  * 商店序號-keyed KPI tables), `(l_suppkey, l_partkey)` plays
  * (store, branch) for the per-group top/bottom-k configs, and messy string
  * columns are fabricated deterministically to exercise the normalization
  * kit (reference `_to_number`/`_parse_month`, aggregate_by_store.py:112–119,
  * 436–446).
  *
  * Orders span 1995–2001 in the testdata; the YoY analogues use cur=2000,
  * prev=1999 (the reference compares string years "2025"/"2024",
  * aggregate_by_store.py:137–145).
  *
  * Scale notes: every query is a pure declarative plan — aggregations get
  * map-side partial agg, the month spine (12 rows) and dimension tables
  * broadcast, top-k is a single window shuffle on the group key, and no
  * query collects to the driver.
  */
object ParityQueries {

  // SURVEY §2.3 A1 + §2.2 P1: hash agg over two keys with SUM/AVG/COUNT
  // (reference groupby-sum, aggregate_by_store.py:147–154).
  // Price sums in exact integer cents / 1e-4 units (quantity sums are
  // already exact — integer-valued doubles add exactly below 2^53);
  // HALF_UP in integer division; ONE final division. See branchRatio's
  // comment for why a double price sum + round() is engine-dependent.
  private val q01 = Q(
    "q01_pricing_summary",
    (s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_quantity").cast("long").as("q_i"),
          round(col("l_extendedprice") * 100).cast("long").as("p_c"),
          (round(col("l_extendedprice") * 100).cast("long")
            * (lit(100L) - round(col("l_discount") * 100).cast("long")))
            .as("rev_e4"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("q_i")).as("q_i"), sum(col("p_c")).as("base_c"),
          sum(col("rev_e4")).as("rev_e4"), count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("q_i").cast("double").as("sum_qty"),
          (col("base_c").cast("double") / 100.0).as("sum_base_price"),
          (expr("(rev_e4 + 50) div 100").cast("double") / 100.0)
            .as("sum_disc_price"),
          (expr("(q_i * 20000 + n) div (2 * n)").cast("double") / 10000.0)
            .as("avg_qty"),
          col("n").as("count_order"))
    },
    Some("""
      WITH g AS (
        SELECT l_returnflag, l_linestatus,
               sum(CAST(l_quantity AS BIGINT)) AS q_i,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS base_c,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev_e4,
               count(*) AS n
        FROM lineitem GROUP BY 1, 2)
      SELECT l_returnflag, l_linestatus,
             CAST(q_i AS DOUBLE) AS sum_qty,
             CAST(base_c AS DOUBLE) / 100.0 AS sum_base_price,
             CAST((rev_e4 + 50) // 100 AS DOUBLE) / 100.0 AS sum_disc_price,
             CAST((q_i * 20000 + n) // (2 * n) AS DOUBLE) / 10000.0 AS avg_qty,
             n AS count_order
      FROM g
    """))

  // ---- q80: DECIMAL(38,0) accumulator seam (q01's aggregate) ----------
  //
  // SCALE.md's accumulator-magnitude bound, as a TESTED code path: q01's
  // 1e-4-unit BIGINT revenue sum is exact only below ~9e9 rows/group; at
  // 100 TB (~1e11 rows/group) the accumulator must widen to
  // DECIMAL(38,0). `FixedPoint.sumExact` makes that a declared plan-time
  // policy; this entry runs q01's aggregate through BOTH widths — the
  // long accumulator and the decimal accumulator the 100 TB bounds
  // select (rows=1e11, term=1e9 ⇒ decimal) — and emits their equality
  // as a hashed column, proving the widened path is bit-identical where
  // the narrow one is valid. FixedPointSpec covers the other side:
  // terms that overflow long fail loudly under ANSI on the long path
  // and sum exactly on the decimal path.
  private val q80 = Q(
    "q80_decimal_accumulator",
    (s, d) => {
      val terms = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus"),
          (round(col("l_extendedprice") * 100).cast("long")
            * (lit(100L) - round(col("l_discount") * 100).cast("long")))
            .as("rev_e4"))
      terms.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("rev_e4")).as("rev_long"),
          graft.etl.FixedPoint.sumExact(col("rev_e4"),
            rowsPerGroupBound = 100000000000L, // 1e11 rows/group (100 TB)
            termMagnitudeBound = 1000000000L)  // ~1e9 per 1e-4-unit term
            .as("_rev_dec"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("rev_long"),
          col("_rev_dec").cast("long").as("rev_dec"),
          (col("_rev_dec") === col("rev_long")).as("acc_equal"),
          col("n"))
    },
    Some("""
      WITH t AS (
        SELECT l_returnflag, l_linestatus,
               CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_e4
        FROM lineitem),
      g AS (
        SELECT l_returnflag, l_linestatus,
               CAST(sum(rev_e4) AS BIGINT) AS rev_long,
               sum(CAST(rev_e4 AS DECIMAL(38,0))) AS rev_dec_w,
               count(*) AS n
        FROM t GROUP BY 1, 2)
      SELECT l_returnflag, l_linestatus, rev_long,
             CAST(rev_dec_w AS BIGINT) AS rev_dec,
             rev_dec_w = rev_long AS acc_equal,
             n
      FROM g
    """))

  // §2.2 P9/P10 range + IN predicates, P1 projection. Filters sit directly
  // on the scan so parquet gets PushedFilters.
  private val q02 = Q(
    "q02_filter_project",
    (s, d) => {
      Tables.lineitem(s, d)
        .filter(
          col("l_quantity").between(30, 40) &&
            col("l_returnflag").isin("A", "R") &&
            col("l_shipdate") >= lit("1998-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_returnflag"))
    },
    Some("""
      SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
      FROM lineitem
      WHERE l_quantity BETWEEN 30 AND 40
        AND l_returnflag IN ('A', 'R')
        AND l_shipdate >= TIMESTAMP '1998-01-01'
    """))

  // Flagship: reference config 23-1/24-1 (aggregate_by_store.py:109–236,
  // 320–419): split years → groupby-sum → left join → YoY with
  // null-on-zero-prev (P14/P17) → rate vs a dimension measure → pct string
  // (P16). Joins J1/J2. Both joins broadcast at dimension size.
  private val q03 = Q(
    "q03_store_yoy",
    (s, d) => {
      val o = Tables.orders(s, d)
      def byYear(y: Int) =
        o.filter(year(col("o_orderdate")) === y)
          .groupBy(col("o_custkey"))
          .agg(sum(col("o_totalprice")).as(s"s$y"))
      val cust = Tables.customer(s, d)
        .select(col("c_custkey").as("o_custkey"), col("c_acctbal"))
      byYear(2000)
        .join(byYear(1999), Seq("o_custkey"), "left")
        .join(cust, Seq("o_custkey"), "left")
        .select(
          col("o_custkey").as("custkey"),
          round(coalesce(col("s2000"), lit(0)), 2).as("cur_total"),
          round(coalesce(col("s1999"), lit(0)), 2).as("prev_total"),
          round(Normalize.yoy(coalesce(col("s2000"), lit(0)),
            coalesce(col("s1999"), lit(0))), 6).as("yoy"),
          Normalize.fmtPct(Normalize.safeDiv(col("s2000"), col("c_acctbal")))
            .as("rate_pct"))
    },
    Some("""
      WITH cur  AS (SELECT o_custkey, sum(o_totalprice) s FROM orders
                    WHERE year(o_orderdate) = 2000 GROUP BY 1),
           prev AS (SELECT o_custkey, sum(o_totalprice) s FROM orders
                    WHERE year(o_orderdate) = 1999 GROUP BY 1)
      SELECT cur.o_custkey AS custkey,
             round(coalesce(cur.s, 0), 2)  AS cur_total,
             round(coalesce(prev.s, 0), 2) AS prev_total,
             round(CASE WHEN coalesce(prev.s, 0) <> 0
                        THEN (coalesce(cur.s, 0) - coalesce(prev.s, 0))
                             / coalesce(prev.s, 0) END, 6) AS yoy,
             CASE WHEN c.c_acctbal IS NULL OR c.c_acctbal = 0 THEN ''
                  ELSE printf('%.2f%%', round(cur.s / c.c_acctbal * 100, 2) + 0.0) END AS rate_pct
      FROM cur
      LEFT JOIN prev ON prev.o_custkey = cur.o_custkey
      LEFT JOIN customer c ON c.c_custkey = cur.o_custkey
    """))

  // Reference config 23-2 (aggregate_by_store.py:239–317): filter 2 years →
  // pivot year→columns (A3) → densify months 1..12 per store (A6, the
  // month-spine cross join replacing the reference's per-store Python
  // reindex loop at :287–293) → per-month YoY.
  private val q04 = Q(
    "q04_monthly_pivot_densify",
    (s, d) => {
      val f = Tables.orders(s, d)
        .filter(year(col("o_orderdate")).isin(1999, 2000))
        .select(col("o_custkey"),
          month(col("o_orderdate")).as("month"),
          year(col("o_orderdate")).as("yr"),
          col("o_totalprice"))
      val pv = f.groupBy(col("o_custkey"), col("month"))
        .pivot("yr", Seq(1999, 2000)).agg(sum(col("o_totalprice")))
        .withColumnRenamed("1999", "p1999")
        .withColumnRenamed("2000", "p2000")
      val spine = f.select(col("o_custkey")).distinct()
        .crossJoin(s.range(1, 13).select(col("id").cast("int").as("month")))
      spine.join(pv, Seq("o_custkey", "month"), "left")
        .select(
          col("o_custkey").as("custkey"),
          col("month"),
          round(coalesce(col("p1999"), lit(0)), 2).as("y1999"),
          round(coalesce(col("p2000"), lit(0)), 2).as("y2000"),
          round(Normalize.yoy(coalesce(col("p2000"), lit(0)),
            coalesce(col("p1999"), lit(0))), 6).as("yoy"))
    },
    Some("""
      WITH f AS (SELECT o_custkey, CAST(month(o_orderdate) AS INTEGER) AS mo,
                        year(o_orderdate) AS y, o_totalprice
                 FROM orders WHERE year(o_orderdate) IN (1999, 2000)),
           g AS (SELECT o_custkey, mo,
                        sum(CASE WHEN y = 1999 THEN o_totalprice END) s99,
                        sum(CASE WHEN y = 2000 THEN o_totalprice END) s00
                 FROM f GROUP BY 1, 2),
           spine AS (SELECT DISTINCT o_custkey FROM f),
           m AS (SELECT CAST(gs AS INTEGER) AS mo FROM generate_series(1, 12) t(gs))
      SELECT spine.o_custkey AS custkey, m.mo AS month,
             round(coalesce(g.s99, 0), 2) AS y1999,
             round(coalesce(g.s00, 0), 2) AS y2000,
             round(CASE WHEN coalesce(g.s99, 0) <> 0
                        THEN (coalesce(g.s00, 0) - g.s99) / g.s99 END, 6) AS yoy
      FROM spine CROSS JOIN m
      LEFT JOIN g ON g.o_custkey = spine.o_custkey AND g.mo = m.mo
    """))

  // Reference config 24-2 (aggregate_by_store.py:422–510): two fact
  // aggregates joined on a composite (store, month) key (J3), fill-0 on the
  // joined measure (P15), rate with null-on-zero-denominator (P14/P18).
  private val q05 = Q(
    "q05_monthly_rate",
    (s, d) => {
      val o2k = Tables.orders(s, d)
        .filter(year(col("o_orderdate")) === 2000)
        .select(col("o_custkey"), month(col("o_orderdate")).as("month"),
          col("o_orderkey"))
      val base = o2k.groupBy(col("o_custkey"), col("month"))
        .agg(count(lit(1)).as("orders_cnt"))
      val qty = Tables.lineitem(s, d)
        .join(o2k, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"), col("month"))
        .agg(sum(col("l_quantity")).as("qty"))
      base.join(qty, Seq("o_custkey", "month"), "left")
        .select(
          col("o_custkey").as("custkey"), col("month"),
          col("orders_cnt"),
          round(coalesce(col("qty"), lit(0)), 2).as("qty"),
          round(Normalize.safeDiv(coalesce(col("qty"), lit(0)),
            col("orders_cnt")), 6).as("rate"))
    },
    Some("""
      WITH o2k AS (SELECT o_custkey, CAST(month(o_orderdate) AS INTEGER) AS mo,
                          o_orderkey
                   FROM orders WHERE year(o_orderdate) = 2000),
           base AS (SELECT o_custkey, mo, count(*) AS orders_cnt
                    FROM o2k GROUP BY 1, 2),
           q AS (SELECT o_custkey, mo, sum(l_quantity) AS qty
                 FROM lineitem JOIN o2k ON l_orderkey = o_orderkey
                 GROUP BY 1, 2)
      SELECT base.o_custkey AS custkey, base.mo AS month, base.orders_cnt,
             round(coalesce(q.qty, 0), 2) AS qty,
             round(CASE WHEN base.orders_cnt <> 0
                        THEN coalesce(q.qty, 0) / base.orders_cnt END, 6) AS rate
      FROM base LEFT JOIN q ON q.o_custkey = base.o_custkey AND q.mo = base.mo
    """))

  // Money math in FIXED POINT: prices/discounts are exact 2-decimal
  // values, so round(x*100) recovers integer cents and the revenue sum
  // is an exact BIGINT in 1e-4 units — order-INDEPENDENT, unlike a
  // double sum, whose accumulation order differs between engines and
  // (at sf0.1) lands one group's sum within 1 ulp of a round(.,2)
  // half-boundary, flipping revenue by 0.01 and ratio by 1e-6. All
  // derived doubles come from single divisions of exact integers, which
  // ARE correctly rounded identically everywhere.
  private def branchRatio(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.spread(Tables.lineitem(s, d)
        .select("l_orderkey", "l_suppkey", "l_partkey", "l_extendedprice",
          "l_discount", "l_quantity"))
      .select(col("l_suppkey").as("suppkey"), col("l_partkey").as("partkey"),
        round(col("l_extendedprice") * 100).cast("long").as("p_c"),
        round(col("l_discount") * 100).cast("long").as("d_c"),
        col("l_quantity").cast("long").as("q_i"))
      .groupBy(col("suppkey"), col("partkey"))
      .agg(
        sum(col("p_c") * (lit(100L) - col("d_c"))).as("rev_e4"),
        sum(col("q_i")).as("q_i"))
      // HALF_UP happens in INTEGER math ((2a+b) div 2b), because round()
      // on a double half-boundary diverges across engines (Spark rounds
      // the shortest decimal repr, DuckDB the raw binary double); the
      // final single division of an exact integer is bit-identical.
      .select(col("suppkey"), col("partkey"),
        (expr("(rev_e4 + 50) div 100").cast("double") / 100.0).as("revenue"),
        col("q_i").cast("double").as("qty"),
        (when(col("q_i") =!= 0,
          expr("(rev_e4 * 200 + q_i) div (2 * q_i)")).cast("double")
          / 1000000.0).as("ratio"))

  private def branchSql(dir: String) = s"""
      WITH g AS (SELECT l_suppkey AS suppkey, l_partkey AS partkey,
                        sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                          AS rev_e4,
                        sum(CAST(l_quantity AS BIGINT)) AS q_i
                 FROM lineitem GROUP BY 1, 2),
           r AS (SELECT suppkey, partkey,
                        CAST((rev_e4 + 50) // 100 AS DOUBLE) / 100.0 AS revenue,
                        CAST(q_i AS DOUBLE) AS qty,
                        CAST(CASE WHEN q_i <> 0
                             THEN (rev_e4 * 200 + q_i) // (2 * q_i)
                             END AS DOUBLE) / 1000000.0 AS ratio
                 FROM g),
           k AS (SELECT *, CAST(row_number() OVER (
                        PARTITION BY suppkey ORDER BY ratio $dir, partkey ASC)
                      AS INTEGER) AS rnk
                 FROM r)
      SELECT * FROM k WHERE rnk <= 5
    """

  // Reference config 25-1 (aggregate_by_store.py:513–611): per-(store,
  // branch) ratio, top-5 branches per store DESC (O2). Deterministic
  // tie-break on branch id (SURVEY §2.5 note: the reference's pandas sort is
  // unstable under ties; we pin a total order in BOTH engines).
  private val q06 = Q(
    "q06_branch_top5",
    (s, d) => TopK.topK(branchRatio(s, d), Seq(col("suppkey")),
      col("ratio"), col("partkey"), 5),
    Some(branchSql("DESC")))

  // Reference config 25-2 (aggregate_by_store.py:614–723): bottom-5 ASC (O3).
  private val q07 = Q(
    "q07_branch_bottom5",
    (s, d) => TopK.bottomK(branchRatio(s, d), Seq(col("suppkey")),
      col("ratio"), col("partkey"), 5),
    Some(branchSql("ASC")))

  // §2.6 V1: set difference as anti-join (verify_fanout.py:32–48 missing/
  // extra file sets). Customers with no orders in the current year.
  private val q08 = Q(
    "q08_orphan_customers",
    (s, d) => {
      val o = Tables.orders(s, d)
        .filter(year(col("o_orderdate")) === 2001)
        .select(col("o_custkey"))
      Tables.customer(s, d)
        .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    },
    Some("""
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND year(o.o_orderdate) = 2001)
    """))

  // §2.6 V4 / §2.3 A5: presence precheck (verify_store_presence.py:35–63) —
  // per nation: how many customers, how many have orders.
  private val q09 = Q(
    "q09_presence_by_nation",
    (s, d) => {
      val has = Tables.orders(s, d).select(col("o_custkey")).distinct()
      Tables.customer(s, d)
        .join(has, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_customers"),
          count(col("o_custkey")).as("n_with_orders"))
    },
    Some("""
      SELECT c_nationkey, count(*) AS n_customers,
             count(o.o_custkey) AS n_with_orders
      FROM customer c
      LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o
        ON o.o_custkey = c.c_custkey
      GROUP BY c_nationkey
    """))

  // §2.3 A4: distinct counts (aggregate_by_store.py:316 nunique).
  private val q10 = Q(
    "q10_distinct_counts",
    (s, d) => {
      Tables.orders(s, d).agg(
        countDistinct(col("o_custkey")).as("n_custs"),
        countDistinct(year(col("o_orderdate"))).as("n_years"),
        countDistinct(col("o_orderpriority")).as("n_priorities"))
    },
    Some("""
      SELECT count(DISTINCT o_custkey) AS n_custs,
             count(DISTINCT year(o_orderdate)) AS n_years,
             count(DISTINCT o_orderpriority) AS n_priorities
      FROM orders
    """))

  // §2.2 P4/P6/P12: the `_to_number` normalization kit
  // (aggregate_by_store.py:112–119) on deterministically fabricated messy
  // strings — whitespace, thousands separators, '%', null tokens.
  private val q11 = Q(
    "q11_normalize_numbers",
    (s, d) => {
      val base = Tables.spread(Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice")))
      val intStr = round(col("o_totalprice"), 0).cast("bigint").cast("string")
      val messy = when(col("o_orderkey") % 6 === 0, concat(lit("  "), intStr, lit("  ")))
        .when(col("o_orderkey") % 6 === 1, lit("nan"))
        .when(col("o_orderkey") % 6 === 2, concat(intStr, lit("%")))
        .when(col("o_orderkey") % 6 === 3, lit("None"))
        .when(col("o_orderkey") % 6 === 4, concat(lit("1,"), intStr))
        .otherwise(lit(""))
      base.select(col("o_orderkey"), messy.as("raw"),
        Normalize.toNumber(messy).as("parsed"))
    },
    Some(s"""
      WITH m AS (
        SELECT o_orderkey,
               CASE o_orderkey % 6
                 WHEN 0 THEN '  ' || CAST(CAST(round(o_totalprice, 0) AS BIGINT) AS VARCHAR) || '  '
                 WHEN 1 THEN 'nan'
                 WHEN 2 THEN CAST(CAST(round(o_totalprice, 0) AS BIGINT) AS VARCHAR) || '%'
                 WHEN 3 THEN 'None'
                 WHEN 4 THEN '1,' || CAST(CAST(round(o_totalprice, 0) AS BIGINT) AS VARCHAR)
                 ELSE ''
               END AS raw
        FROM orders)
      SELECT o_orderkey, raw,
             ${OracleSql.toNumberSql("raw")} AS parsed
      FROM m
    """))

  // §2.2 P7/P8: `_parse_month` (aggregate_by_store.py:436–446) over
  // heterogeneous month formats fabricated from the events table.
  private val q12 = Q(
    "q12_parse_month",
    (s, d) => {
      val e = Tables.spread(Tables.events(s, d).select(col("event_id"), col("ts")))
      val raw = when(col("event_id") % 5 === 0, date_format(col("ts"), "yyyyMM"))
        .when(col("event_id") % 5 === 1, date_format(col("ts"), "yyyy-MM"))
        .when(col("event_id") % 5 === 2, month(col("ts")).cast("string"))
        .when(col("event_id") % 5 === 3,
          concat(lit("2024/"), lpad(month(col("ts")).cast("string"), 2, "0")))
        .otherwise(lit("n/a"))
      e.select(col("event_id"), raw.as("raw"),
        Normalize.parseMonth(raw).as("month"))
    },
    Some(s"""
      WITH m AS (
        SELECT event_id,
               CASE event_id % 5
                 WHEN 0 THEN strftime(ts, '%Y%m')
                 WHEN 1 THEN strftime(ts, '%Y-%m')
                 WHEN 2 THEN CAST(month(ts) AS VARCHAR)
                 WHEN 3 THEN '2024/' || lpad(CAST(month(ts) AS VARCHAR), 2, '0')
                 ELSE 'n/a'
               END AS raw
        FROM events)
      SELECT event_id, raw,
             ${OracleSql.parseMonthSql("raw")} AS month
      FROM m
    """))

  // §2.7 U1: vertical union of two tagged subsets.
  private val q13 = Q(
    "q13_union_segments",
    (s, d) => {
      val o = Tables.orders(s, d)
      val a = o.filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("total"), lit("finished").as("tag"))
      val b = o.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("total"), lit("urgent").as("tag"))
      a.unionAll(b)
    },
    Some("""
      SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total,
             'finished' AS tag
      FROM orders WHERE o_orderstatus = 'F'
      UNION ALL
      SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total,
             'urgent' AS tag
      FROM orders WHERE o_orderpriority = '1-URGENT'
    """))

  // §2.2 P16 applied at month grain + yyyymm string bucketing (the
  // reference's (year, month)/yyyymm column convention, SURVEY §1.1):
  // events bucketed to yyyymm with per-type value shares.
  private val q14 = Q(
    "q14_event_yyyymm_share",
    (s, d) => {
      val e = Tables.events(s, d)
        .select(date_format(col("ts"), "yyyyMM").as("yyyymm"),
          col("event_type"), col("value"))
      val g = e.groupBy(col("yyyymm"), col("event_type"))
        .agg(sum(col("value")).as("v"), count(lit(1)).as("n"))
      val t = e.groupBy(col("yyyymm")).agg(sum(col("value")).as("tv"))
      g.join(t, Seq("yyyymm"), "left")
        .select(col("yyyymm"), col("event_type"), col("n"),
          round(col("v"), 4).as("value_sum"),
          Normalize.fmtPct(Normalize.safeDiv(col("v"), col("tv")))
            .as("share_pct"))
    },
    Some("""
      WITH e AS (SELECT strftime(ts, '%Y%m') AS yyyymm, event_type, value
                 FROM events),
           g AS (SELECT yyyymm, event_type, sum(value) v, count(*) n
                 FROM e GROUP BY 1, 2),
           t AS (SELECT yyyymm, sum(value) tv FROM e GROUP BY 1)
      SELECT g.yyyymm, g.event_type, g.n,
             round(g.v, 4) AS value_sum,
             CASE WHEN t.tv IS NULL OR t.tv = 0 THEN ''
                  ELSE printf('%.2f%%', round(g.v / t.tv * 100, 2) + 0.0) END AS share_pct
      FROM g LEFT JOIN t ON t.yyyymm = g.yyyymm
    """))

  // Skew-salted fact⋈dim join, oracle-checked: Skew.saltedJoin must be
  // row-identical to the plain join (the salt only routes rows across
  // shuffle partitions), so the oracle is the PLAIN SQL join — the
  // correctness contract that makes salting safe to deploy on a hot key.
  // Projections are applied before the salt (the salted projection is an
  // optimizer barrier — see Skew's scaladoc), mirroring production use.
  private val q38 = Q(
    "q38_salted_join",
    (s, d) => {
      val fact = Tables.lineitem(s, d)
        .select(col("l_orderkey"),
          (round(col("l_extendedprice") * 100).cast("long")
            * (lit(100L) - round(col("l_discount") * 100).cast("long")))
            .as("rev_e4"))
      val dim = Tables.orders(s, d)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      graft.etl.Skew.saltedJoin(fact, dim, Seq("l_orderkey"), salts = 8)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"), sum(col("rev_e4")).as("rev_e4"))
        .select(col("o_orderpriority"), col("n_items"),
          (expr("(rev_e4 + 50) div 100").cast("double") / 100.0).as("revenue"))
    },
    Some("""
      WITH g AS (
        SELECT o_orderpriority, count(*) AS n_items,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev_e4
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1)
      SELECT o_orderpriority, n_items,
             CAST((rev_e4 + 50) // 100 AS DOUBLE) / 100.0 AS revenue
      FROM g
    """))

  // Bloom-prefiltered semi-join, oracle-checked: BloomJoin.semiJoin must
  // be row-identical to the plain IN-subquery (the bloom only prunes
  // before the shuffle; the final semi-join removes false positives), so
  // the oracle is the PLAIN SQL semi-join — the contract that makes the
  // sketch safe to deploy as a shuffle-volume reducer on a 100 TB fact.
  private val q40 = Q(
    "q40_bloom_semi_join",
    (s, d) => {
      val urgent = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      graft.etl.BloomJoin
        .semiJoin(Tables.lineitem(s, d), "l_orderkey", urgent, "o_orderkey",
          expectedItems = 100000L)
        .groupBy(col("l_linestatus"))
        .agg(count(lit(1)).as("n_items"),
          sum(round(col("l_extendedprice") * 100).cast("long")
            * (lit(100L) - round(col("l_discount") * 100).cast("long")))
            .as("rev_e4"))
        .select(col("l_linestatus"), col("n_items"),
          (expr("(rev_e4 + 50) div 100").cast("double") / 100.0).as("revenue"))
    },
    Some("""
      WITH g AS (
        SELECT l_linestatus, count(*) AS n_items,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev_e4
        FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                             WHERE o_orderpriority = '1-URGENT')
        GROUP BY 1)
      SELECT l_linestatus, n_items,
             CAST((rev_e4 + 50) // 100 AS DOUBLE) / 100.0 AS revenue
      FROM g
    """))

  // ---- q53: multi-way star join (fact → fact → dims) ------------------
  //
  // The canonical warehouse query the suite's 2-way joins don't cover:
  // lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region with a selective date
  // filter, revenue by (region, market segment). The plan is the star
  // schema's textbook shape and exercises Catalyst's join composition:
  // the date filter pushes to the orders SCAN (before its join, cutting
  // the fact⋈fact shuffle to the filtered keys), nation/region broadcast
  // explicitly, and customer is left to the planner (broadcast here;
  // shuffle join at 100 TB when it outgrows the threshold — both are
  // correct, which is the point of declaring rather than scheduling).
  // The two fact joins shuffle on their keys — at 100 TB the q50
  // bucketed layout removes the orderkey one for repeated runs.
  //
  // Money follows q01's fixed-point rule: rev_e4 = price_cents ×
  // (100 − disc_cents) summed as BIGINT, rounded ONCE to cents with the
  // (+50) div 100 half-up rule — engine-exact.

  private val q53 = Q(
    "q53_star_join",
    (s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_orderkey"),
        (round(col("l_extendedprice") * 100).cast("long")
          * (lit(100L) - round(col("l_discount") * 100).cast("long")))
          .as("rev_e4"))
      val ord = Tables.orders(s, d)
        .filter(expr("o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND " +
          "o_orderdate < TIMESTAMP '1999-01-01 00:00:00'"))
        .select(col("o_orderkey"), col("o_custkey"))
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"))
      val nat = Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_regionkey"))
      val reg = Tables.region(s, d)
        .select(col("r_regionkey"), col("r_name"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_items"),
          expr("CAST((sum(rev_e4) + 50) div 100 AS BIGINT)").as("revenue_c"))
    },
    Some("""
      WITH li AS (
        SELECT l_orderkey,
               CAST(round(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_e4
        FROM lineitem)
      SELECT r_name, c_mktsegment, count(*) AS n_items,
             CAST((sum(rev_e4) + 50) // 100 AS BIGINT) AS revenue_c
      FROM li
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate < TIMESTAMP '1999-01-01'
      GROUP BY 1, 2
    """))

  // ---- q61: ordered string aggregation (LISTAGG) ---------------------
  //
  // The one relational reducer BI exports lean on that no other query
  // exercises: collapse a group to a single delimited string in a
  // DECLARED order (SQL:2016 LISTAGG ... WITHIN GROUP). Spark has no
  // ordered string_agg aggregate, and relying on collect_list's arrival
  // order is a nondeterminism bug at any scale — so the order is made
  // data-borne: collect structs, array_sort by the embedded rank, then
  // project + join. Composed here with a per-group top-k (top-3
  // customers per nation by balance, custkey tie-break) so the row
  // count stays report-sized. One window shuffle on nationkey + one
  // agg; the collected arrays are k-bounded, never group-sized.

  private val q61 = Q(
    "q61_nation_top_listagg",
    (s, d) => {
      val cust = Tables.customer(s, d)
      val top3 = TopK.perGroup(cust, Seq(col("c_nationkey")),
        Seq(col("c_acctbal").desc, col("c_custkey").asc), 3)
      top3
        .join(Tables.nation(s, d),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          array_join(
            transform(
              array_sort(collect_list(struct(col("rnk"), col("c_name")))),
              x => x.getField("c_name")),
            ",").as("top_names"),
          // integer-cents sum (q38/q45 rule): 3-element double sums are
          // engine-order-dependent; cents are exact and order-free
          sum(round(col("c_acctbal") * 100).cast("long")).as("top_cents"))
        .select(col("n_name"), col("top_names"),
          (col("top_cents") / 100.0).as("top_bal"))
    },
    Some("""
      WITH ranked AS (
        SELECT c_nationkey, c_name, c_acctbal,
               row_number() OVER (PARTITION BY c_nationkey
                                  ORDER BY c_acctbal DESC, c_custkey ASC) AS rnk
        FROM customer),
      top3 AS (SELECT * FROM ranked WHERE rnk <= 3)
      SELECT n_name,
             string_agg(c_name, ',' ORDER BY rnk) AS top_names,
             sum(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0 AS top_bal
      FROM top3 JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name
    """))

  // ---- q64: set operators (INTERSECT / EXCEPT) -----------------------
  //
  // The two relational set operators no other query exercises (q13
  // covers UNION): segment overlap via INTERSECT and one-sided
  // remainders via EXCEPT, both with SQL set semantics (implicit
  // distinct — Spark's Dataset.intersect/except match). Catalyst plans
  // both as aggregate-free semi/anti joins after de-dup; at scale each
  // is one shuffle on the compared key, same as the anti-join q08.

  private val q64 = Q(
    "q64_segment_set_ops",
    (s, d) => {
      val cust = Tables.customer(s, d)
      val a = cust.filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val b = cust.filter(col("c_acctbal") > 5000.0).select(col("c_custkey"))
      a.intersect(b).select(lit("both").as("tag"), col("c_custkey"))
        .unionAll(a.except(b)
          .select(lit("building_only").as("tag"), col("c_custkey")))
        .unionAll(b.except(a)
          .select(lit("rich_only").as("tag"), col("c_custkey")))
    },
    Some("""
      WITH a AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
      b AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)
      SELECT 'both' AS tag, c_custkey FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
      UNION ALL
      SELECT 'building_only' AS tag, c_custkey FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
      UNION ALL
      SELECT 'rich_only' AS tag, c_custkey FROM (SELECT * FROM b EXCEPT SELECT * FROM a)
    """))

  // ---- q65: UNPIVOT (wide → long melt) -------------------------------
  //
  // The inverse of A3's pivot, and the missing half of report-shape
  // interop: BI exports arrive wide (one column per metric) and every
  // downstream long-format consumer (metric stores, plotting, generic
  // gates) needs (key, metric, value) rows. Spark's `stack(n, ...)`
  // expression is the codegen'd melt — a partition-local projection
  // that multiplies rows by n_metrics with ZERO shuffle (verify with
  // .explain: no Exchange). Nulls are kept (a missing metric is a fact
  // worth a row in a monitoring sink); money goes through integer
  // cents.

  private val q65 = Q(
    "q65_unpivot_metrics",
    (s, d) => {
      val wide = Tables.customer(s, d)
        .select(col("c_custkey"),
          round(col("c_acctbal") * 100).cast("long").as("acctbal_c"),
          col("c_nationkey").cast("long").as("nation"),
          length(col("c_name")).cast("long").as("name_len"))
      wide.select(col("c_custkey"),
        expr("""stack(3, 'acctbal_c', acctbal_c,
                         'nation', nation,
                         'name_len', name_len) AS (metric, value)"""))
    },
    Some("""
      SELECT c_custkey, metric, value FROM (
        SELECT c_custkey,
               CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_c,
               CAST(c_nationkey AS BIGINT) AS nation,
               CAST(length(c_name) AS BIGINT) AS name_len
        FROM customer)
      UNPIVOT INCLUDE NULLS (value FOR metric IN (acctbal_c, nation, name_len))
    """))

  def all: Seq[Q] =
    Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q11, q12, q13, q14,
      q38, q40, q53, q61, q64, q65, q80)
}
