package graft.queries

import org.apache.spark.sql.functions._

import graft.etl.Tables

/** Distribution statistics over the fact table: exact interpolated
  * percentiles and fixed-width histograms — the reporting ops a
  * training-data pipeline runs to understand value/length distributions
  * before filtering. Percentile is sort-based (deterministic, so the
  * DuckDB `quantile_cont` mirror is bit-exact, verified); the histogram
  * uses integer floor-division bucketing, portable by construction.
  */
object StatsQueries {

  private val q26 = Q(
    "q26_value_percentiles",
    (s, d) => Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))").as("pcts"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"),
        element_at(col("pcts"), 1).as("p50"),
        element_at(col("pcts"), 2).as("p90"),
        element_at(col("pcts"), 3).as("p99"),
        col("n")),
    Some("""
      SELECT l_returnflag,
             quantile_cont(l_extendedprice, 0.5)  AS p50,
             quantile_cont(l_extendedprice, 0.9)  AS p90,
             quantile_cont(l_extendedprice, 0.99) AS p99,
             count(*) AS n
      FROM lineitem
      GROUP BY 1
    """))

  /** The 100 TB default beside q26's exact percentile: `approx_percentile`
    * (t-digest-style sketch, mergeable map-side partials, no per-group
    * sort) — at scale the exact version's per-group sort is the avoidable
    * cost. No DuckDB oracle (sketch algorithms differ across engines →
    * not hash-comparable); the driver records the rows-only check, and
    * StatsSpec asserts the approximation envelope against q26's exact
    * values.
    */
  // q33: the MERGEABLE percentile path (approx_percentile's KLL-style
  // summary — the sketch q26's exact sort swaps to at 100 TB), made
  // fully hash-comparable by the q59 envelope trick: sketch VALUES
  // aren't cross-engine-stable, but their RANKS are checkable — the
  // query re-ranks each sketch output against the data (one broadcast
  // join + conditional sums) and emits booleans asserting the rank
  // lands within the sketch's accuracy guarantee (ε = 1/10000, tested
  // with 10–20× headroom + a small constant for duplicate-value rank
  // inflation); the oracle computes nothing approximate and asserts
  // TRUE. A drifting sketch fails the hash gate instead of silently
  // downgrading this entry to rows-only.

  private val q33 = Q(
    "q33_percentiles_approx",
    (s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_returnflag").as("f"),
        round(col("l_extendedprice") * 100).cast("long").as("c"))
      val ap = li.groupBy(col("f"))
        .agg(expr("approx_percentile(c, array(0.5, 0.9, 0.99), 10000)").as("ps"),
          count(lit(1)).as("n"))
        .select(col("f"), col("n"),
          element_at(col("ps"), 1).as("a50"),
          element_at(col("ps"), 2).as("a90"),
          element_at(col("ps"), 3).as("a99"))
      // multiplicity-robust rank gate: count(c <= a_p) includes EVERY
      // duplicate of the sketch-returned value, so a point test against
      // the target rank can fail spuriously on duplicate-heavy columns
      // (deviation bounded by the value's multiplicity, not the
      // sketch's ε). Gate on the interval instead: pass iff the target
      // rank lies within [count(c < a_p) − tol, count(c <= a_p) + tol]
      // — any rank the sketch value legitimately occupies passes.
      li.join(broadcast(ap), Seq("f"))
        .groupBy(col("f"), col("n"))
        .agg(sum(when(col("c") <= col("a50"), 1L).otherwise(0L)).as("r50"),
          sum(when(col("c") < col("a50"), 1L).otherwise(0L)).as("r50lo"),
          sum(when(col("c") <= col("a90"), 1L).otherwise(0L)).as("r90"),
          sum(when(col("c") < col("a90"), 1L).otherwise(0L)).as("r90lo"),
          sum(when(col("c") <= col("a99"), 1L).otherwise(0L)).as("r99"),
          sum(when(col("c") < col("a99"), 1L).otherwise(0L)).as("r99lo"))
        .select(col("f").as("l_returnflag"), col("n"),
          (expr("(n + 1) div 2")
            .between(col("r50lo") - expr("greatest(n div 500, 3)"),
              col("r50") + expr("greatest(n div 500, 3)"))).as("p50_ok"),
          (expr("(9 * n + 9) div 10")
            .between(col("r90lo") - expr("greatest(n div 500, 3)"),
              col("r90") + expr("greatest(n div 500, 3)"))).as("p90_ok"),
          (expr("(99 * n + 99) div 100")
            .between(col("r99lo") - expr("greatest(n div 500, 3)"),
              col("r99") + expr("greatest(n div 500, 3)"))).as("p99_ok"))
    },
    Some("""
      SELECT l_returnflag, count(*) AS n,
             TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
      FROM lineitem GROUP BY 1
    """))

  private val bucketWidth = 5000

  private val q27 = Q(
    "q27_price_histogram",
    (s, d) => Tables.lineitem(s, d)
      .select((floor(col("l_extendedprice") / bucketWidth)).cast("long").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
      .select(col("bucket"), (col("bucket") * bucketWidth).as("lo"), col("n")),
    Some(s"""
      SELECT bucket, bucket * $bucketWidth AS lo, count(*) AS n
      FROM (SELECT CAST(floor(l_extendedprice / $bucketWidth) AS BIGINT) AS bucket
            FROM lineitem)
      GROUP BY 1
    """))

  // CUBE over (returnflag, linestatus): all four grouping sets in ONE
  // shuffle (Spark expands the cube map-side; partial aggregation still
  // applies) — vs four separate groupBys = four scans + four shuffles.
  // Complements q36's ROLLUP. Null group cells are labeled 'ALL' in both
  // engines (portable across null-ordering/stringification differences),
  // and the grouping id is re-derived from the same flags DuckDB
  // exposes, bit order pinned to (returnflag=2, linestatus=1).
  private val q42 = Q(
    "q42_cube_report",
    (s, d) => Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 2).as("qty"),
        (grouping(col("l_returnflag")) * 2 + grouping(col("l_linestatus")))
          .cast("int").as("gid"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
        col("gid"), col("n"), col("qty")),
    Some("""
      SELECT coalesce(l_returnflag, 'ALL') AS rflag,
             coalesce(l_linestatus, 'ALL') AS lstatus,
             CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INTEGER) AS gid,
             count(*) AS n,
             round(sum(l_quantity), 2) AS qty
      FROM lineitem
      GROUP BY CUBE (l_returnflag, l_linestatus)
    """))

  // Per-source quality quartiles via ntile PARTITIONED BY source — the
  // ranking-family window (ntile) with the scale-correct shape: one
  // source-key shuffle, each source's sort local to its partition (a
  // GLOBAL ntile would be a single-task sort at 100 TB — for global
  // quantiles use the q26/q33 percentile family instead). Tie-break on
  // doc_id pins bucket assignment; quality is the t02 score (bit-exact
  // across engines), so quartile boundaries agree with no tolerance.
  private val q44 = Q(
    "q44_quality_quartiles",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("source"))
        .orderBy(col("quality"), col("doc_id"))
      graft.etl.Tables.spread(graft.etl.Tables.documents(s, d))
        .select(col("doc_id"), col("source"),
          graft.etl.TextAnalysis.qualityScore(col("text")).as("quality"))
        .withColumn("quartile", ntile(4).over(w))
        .groupBy(col("source"), col("quartile"))
        .agg(count(lit(1)).as("n"),
          min(col("quality")).as("q_min"), max(col("quality")).as("q_max"))
    },
    Some(s"""
      WITH t AS (SELECT doc_id, source, text,
                        ${graft.queries.OracleSql.toksSql} AS toks
                 FROM documents),
      m AS (SELECT doc_id, source, ${graft.queries.OracleSql.qualityColsSql}
            FROM t),
      q AS (SELECT doc_id, source,
                   ${graft.queries.OracleSql.qualityExprSql} AS quality
            FROM m),
      b AS (SELECT source, quality,
                   CAST(ntile(4) OVER (PARTITION BY source
                                       ORDER BY quality, doc_id) AS INTEGER)
                     AS quartile
            FROM q)
      SELECT source, quartile, count(*) AS n,
             min(quality) AS q_min, max(quality) AS q_max
      FROM b
      GROUP BY 1, 2
    """))

  // ---- q57: winsorized robust mean -----------------------------------
  //
  // Outlier-robust aggregation: clamp to the per-group [p01, p99] before
  // averaging — the standard guard before feeding metrics into drift
  // monitors or reward models. Two passes: an exact-percentile agg
  // (4 bound rows) broadcast back over the fact scan, then one clamped
  // agg. At 100 TB pass one switches to q33's mergeable
  // approx_percentile sketch and the shape is unchanged — bounds are a
  // tiny broadcast either way.
  //
  // Numeric determinism: values are quantized to integer cents FIRST,
  // and the interpolated percentile bounds are rounded back to integer
  // cents, so the clamp and the sum run entirely in BIGINT (one double
  // division at the end). Winsorizing against cent-quantized bounds is
  // semantically identical at money precision and sidesteps the
  // order-dependent double-sum flake entirely.

  private val q57 = Q(
    "q57_winsorized_stats",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_returnflag").as("flag"),
          round(col("l_extendedprice") * 100).cast("long").as("c"))
      val bounds = li.groupBy(col("flag"))
        .agg(expr("percentile(c, array(0.01, 0.99))").as("p"))
        .select(col("flag"),
          round(element_at(col("p"), 1)).cast("long").as("lo_c"),
          round(element_at(col("p"), 2)).cast("long").as("hi_c"))
      li.join(broadcast(bounds), Seq("flag"))
        .groupBy(col("flag"), col("lo_c"), col("hi_c"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("c") < col("lo_c"), 1L).otherwise(0L)).as("n_lo"),
          sum(when(col("c") > col("hi_c"), 1L).otherwise(0L)).as("n_hi"),
          sum(least(greatest(col("c"), col("lo_c")), col("hi_c"))).as("_sw"))
        .select(col("flag"), col("lo_c"), col("hi_c"), col("n"),
          col("n_lo"), col("n_hi"),
          round(col("_sw").cast("double") / col("n") / 100, 4).as("w_mean"))
    },
    Some("""
      WITH li AS (SELECT l_returnflag AS flag,
                         CAST(round(l_extendedprice * 100) AS BIGINT) AS c
                  FROM lineitem),
      b AS (SELECT flag,
                   CAST(round(quantile_cont(c, 0.01)) AS BIGINT) AS lo_c,
                   CAST(round(quantile_cont(c, 0.99)) AS BIGINT) AS hi_c
            FROM li GROUP BY 1)
      SELECT li.flag, lo_c, hi_c, count(*) AS n,
             CAST(sum(CASE WHEN c < lo_c THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
             CAST(sum(CASE WHEN c > hi_c THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
             round(CAST(sum(least(greatest(c, lo_c), hi_c)) AS DOUBLE)
                   / count(*) / 100, 4) AS w_mean
      FROM li JOIN b ON b.flag = li.flag
      GROUP BY 1, 2, 3
    """))

  // ---- q59: approximate distinct with a checkable envelope ------------
  //
  // countDistinct is the scale trap hiding inside every datacard: exact
  // needs a (group, value) de-dup shuffle; HLL++ sketches merge
  // register-wise (max is associative+commutative → the result is
  // deterministic under ANY partitioning) and cost O(groups × 2^p)
  // state. The q33 lesson applied better: sketch values aren't
  // hash-comparable across engines, but the ENVELOPE is — the query
  // emits the exact count and a boolean |approx−exact| ≤ 5%·exact, and
  // the oracle asserts the boolean TRUE with the exact count it
  // computes itself. A drifting sketch fails the gate instead of
  // silently downgrading to rows-only.

  private val q59 = Q(
    "q59_approx_distinct",
    (s, d) =>
      // pre-distinct the (flag, key) pairs, then count AND sketch the
      // deduped keys: one map-side-combined shuffle of distinct pairs
      // instead of the Expand the exact+approx agg pair would plan
      // (Expand doubles every fact row before the shuffle). HLL is
      // multiplicity-invariant, so sketching the deduped keys yields
      // the IDENTICAL estimate — and at 100 TB the shuffled volume is
      // the distinct-key count either way, but without Expand the map
      // side streams half the rows.
      Tables.lineitem(s, d)
      // NULL keys would form their own group here where countDistinct
      // (and the oracle's COUNT(DISTINCT)) exclude them — filter to keep
      // the rewrite semantics-identical on any input
      .filter(col("l_orderkey").isNotNull)
      .groupBy(col("l_returnflag"), col("l_orderkey")).agg(count(lit(1)))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_exact"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("_approx"))
      .select(col("l_returnflag"), col("n_exact"),
        (abs(col("_approx") - col("n_exact"))
          <= col("n_exact") * 0.05).as("within_5pct")),
    Some("""
      SELECT l_returnflag,
             count(DISTINCT l_orderkey) AS n_exact,
             TRUE AS within_5pct
      FROM lineitem
      GROUP BY 1
    """))

  // ---- q62: robust outlier gate via median absolute deviation ---------
  //
  // The robust-statistics complement to q57's winsorizing: flag rows
  // whose |x − median| exceeds 3σ̂ where σ̂ = 1.4826·MAD — the estimator
  // that doesn't move when the outliers it hunts get bigger (mean/stddev
  // gates famously chase their own tail). Two exact-percentile passes
  // (median, then median of absolute deviations), each producing a
  // per-type bound row broadcast back over the fact scan; at 100 TB both
  // passes switch to q33's mergeable sketch with the same plan shape.
  //
  // Numeric determinism (q57's recipe): cents first, percentile bounds
  // rounded back to integer cents, and the 3·1.4826 factor applied as
  // the integer ratio 44478/10000 — the flag comparison runs entirely
  // in BIGINT.

  private val q62 = Q(
    "q62_mad_outliers",
    (s, d) => {
      val ev = Tables.spread(Tables.events(s, d))
        .select(col("event_type").as("etype"),
          round(col("value") * 100).cast("long").as("c"))
      val med = ev.groupBy(col("etype"))
        .agg(expr("percentile(c, 0.5)").as("m"))
        .select(col("etype"), round(col("m")).cast("long").as("med_c"))
      val dev = ev.join(broadcast(med), Seq("etype"))
        .withColumn("ad", abs(col("c") - col("med_c")))
      val madf = dev.groupBy(col("etype"))
        .agg(expr("percentile(ad, 0.5)").as("mm"))
        .select(col("etype"), round(col("mm")).cast("long").as("mad_c"))
      dev.join(broadcast(madf), Seq("etype"))
        .withColumn("thr_c", expr("(44478 * mad_c) div 10000"))
        .groupBy(col("etype"), col("med_c"), col("mad_c"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("ad") > col("thr_c"), 1L).otherwise(0L)).as("n_out"))
        .withColumn("out_pm", expr("(1000 * n_out) div n"))
    },
    Some("""
      WITH ev AS (SELECT event_type AS etype,
                         CAST(round(value * 100) AS BIGINT) AS c
                  FROM events),
      med AS (SELECT etype,
                     CAST(round(quantile_cont(c, 0.5)) AS BIGINT) AS med_c
              FROM ev GROUP BY 1),
      dev AS (SELECT ev.etype, med_c, abs(c - med_c) AS ad
              FROM ev JOIN med ON med.etype = ev.etype),
      madf AS (SELECT etype,
                      CAST(round(quantile_cont(ad, 0.5)) AS BIGINT) AS mad_c
               FROM dev GROUP BY 1)
      SELECT d.etype, d.med_c, m.mad_c, count(*) AS n,
             CAST(sum(CASE WHEN d.ad > (44478 * m.mad_c) // 10000
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_out,
             (1000 * CAST(sum(CASE WHEN d.ad > (44478 * m.mad_c) // 10000
                      THEN 1 ELSE 0 END) AS BIGINT)) // count(*) AS out_pm
      FROM dev d JOIN madf m ON m.etype = d.etype
      GROUP BY 1, 2, 3
    """))

  // ---- q67: Spearman rank correlation (integer-exact) -----------------
  //
  // Monotone-association monitoring (does value drift with time within
  // each event type?) via Spearman's ρ — computed entirely in integers:
  // ranks are row_numbers over (metric, event_id)-pinned total orders
  // (tie-break ranking is the DECLARED semantics — average-rank ties
  // would reintroduce doubles), d² sums in BIGINT, and
  // ρ_pm = 1000 − (6000·Σd²) div (n(n²−1)) keeps every division on
  // non-negative operands so truncation agrees across engines. Two
  // windows over the same per-type partition = one shuffle; the output
  // is one row per type.

  private val q67 = Q(
    "q67_spearman_drift",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("etype"))
      val ranked = Tables.spread(Tables.events(s, d))
        .select(col("event_type").as("etype"), col("event_id"),
          col("ts"), round(col("value") * 100).cast("long").as("c"))
        .select(col("etype"),
          row_number().over(w.orderBy(col("c"), col("event_id")))
            .cast("long").as("rv"),
          row_number().over(w.orderBy(col("ts"), col("event_id")))
            .cast("long").as("rt"))
      ranked.groupBy(col("etype"))
        .agg(count(lit(1)).as("n"),
          sum((col("rv") - col("rt")) * (col("rv") - col("rt"))).as("sd2"))
        .withColumn("rho_pm",
          lit(1000L) - expr("(6000 * sd2) div (n * (n*n - 1))"))
    },
    Some("""
      WITH ranked AS (
        SELECT event_type AS etype,
               CAST(row_number() OVER (PARTITION BY event_type
                 ORDER BY round(value * 100), event_id) AS BIGINT) AS rv,
               CAST(row_number() OVER (PARTITION BY event_type
                 ORDER BY epoch_us(ts), event_id) AS BIGINT) AS rt
        FROM events)
      SELECT etype, count(*) AS n,
             CAST(sum((rv - rt) * (rv - rt)) AS BIGINT) AS sd2,
             1000 - (6000 * CAST(sum((rv - rt) * (rv - rt)) AS BIGINT))
               // (count(*) * (count(*)*count(*) - 1)) AS rho_pm
      FROM ranked GROUP BY 1
    """))

  // ---- q70: whole-table column profile in one melt ---------------------
  //
  // The ANALYZE-style profile (per column: rows, nulls, exact NDV, top
  // value + its count) that feeds CBO stats, data-quality dashboards,
  // and schema-drift monitors. The naive plan runs one count-distinct
  // scan PER COLUMN (C passes over 100 TB); this plan scans ONCE,
  // melts each row to (col_name, value) via stack (pure projection,
  // C× rows but no extra pass), and aggregates (col_name, value) with
  // map-side partials — low-cardinality columns collapse to their
  // distinct values before the shuffle, so the exchange carries ~Σ NDV
  // rows, not C×N. Every value is rendered to ONE canonical string per
  // type family first (integers as-is, money as integer cents,
  // timestamps as epoch micros) so the two engines group identical
  // keys; top-value ties pin on (count DESC, value ASC).

  private val q70 = Q(
    "q70_column_profile",
    (s, d) => {
      val melted = Tables.orders(s, d).select(expr(
        """stack(6,
          |  'o_orderkey', cast(o_orderkey as string),
          |  'o_custkey', cast(o_custkey as string),
          |  'o_orderstatus', o_orderstatus,
          |  'o_totalprice', cast(cast(round(o_totalprice * 100) as bigint) as string),
          |  'o_orderdate', cast(unix_micros(cast(o_orderdate as timestamp)) as string),
          |  'o_orderpriority', o_orderpriority) as (col_name, v)
          |""".stripMargin))
      val counts = melted.groupBy(col("col_name"), col("v"))
        .agg(count(lit(1)).as("cnt"))
      counts.groupBy(col("col_name"))
        .agg(sum(col("cnt")).as("n_rows"),
          coalesce(sum(when(col("v").isNull, col("cnt"))), lit(0L))
            .as("n_null"),
          count(when(col("v").isNotNull, lit(1))).as("ndv"),
          // arg-min over (−cnt, value): count DESC then value ASC
          min(when(col("v").isNotNull,
            struct((-col("cnt")).as("nc"), col("v").as("tv")))).as("top"))
        .select(col("col_name"), col("n_rows"), col("n_null"), col("ndv"),
          col("top.tv").as("top_value"), (-col("top.nc")).as("top_count"))
    },
    Some("""
      WITH m AS (
        SELECT 'o_orderkey' AS col_name, CAST(o_orderkey AS VARCHAR) AS v FROM orders
        UNION ALL SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
        UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM orders
        UNION ALL SELECT 'o_totalprice',
          CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR) FROM orders
        UNION ALL SELECT 'o_orderdate',
          CAST(epoch_us(o_orderdate) AS VARCHAR) FROM orders
        UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM orders),
      c AS (SELECT col_name, v, count(*) AS cnt FROM m GROUP BY 1, 2),
      s AS (SELECT col_name, CAST(sum(cnt) AS BIGINT) AS n_rows,
                   CAST(coalesce(sum(CASE WHEN v IS NULL THEN cnt END), 0)
                        AS BIGINT) AS n_null,
                   count(CASE WHEN v IS NOT NULL THEN 1 END) AS ndv
            FROM c GROUP BY 1),
      t AS (SELECT col_name, v AS top_value, cnt AS top_count,
                   row_number() OVER (PARTITION BY col_name
                                      ORDER BY cnt DESC, v ASC) AS rn
            FROM c WHERE v IS NOT NULL)
      SELECT s.col_name, n_rows, n_null, ndv, top_value, top_count
      FROM s JOIN t ON s.col_name = t.col_name AND t.rn = 1
    """))

  // ---- q73: join/partition-key skew audit -------------------------------
  //
  // The diagnostic that decides WHEN to reach for the skew tools
  // (salting, AQE skew-join, broadcast): per candidate key, how uneven
  // is the row distribution. One hash agg collapses rows to per-key
  // counts (the only big shuffle — distinct keys, map-side combined);
  // the quantiles of the COUNT distribution then come from a second
  // tiny agg keyed by count VALUE plus a running sum over the distinct
  // count values — a frame bounded by |distinct frequencies| (≪ keys;
  // a Zipf tail collapses to few distinct counts), so the
  // single-partition window is a deliberate small-frame exception to
  // the no-global-window rule, same as the q04 month spine. Quantile
  // rule: smallest count c with cumKeys(c) ≥ ceil(q·K) — pure integer
  // math, engine-exact; top-1 share in per-mille integer units.

  private val q73 = Q(
    "q73_key_skew_audit",
    (s, d) => {
      val counts = Tables.events(s, d)
        .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
      val byCnt = counts.groupBy(col("cnt")).agg(count(lit(1)).as("k"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("cnt")).rowsBetween(Long.MinValue, 0)
      val cum = byCnt.withColumn("cum", sum(col("k")).over(w))
      val stats = counts.agg(sum(col("cnt")).as("n_rows"),
        count(lit(1)).as("n_keys"), max(col("cnt")).as("max_cnt"))
      cum.crossJoin(broadcast(stats))
        .agg(
          min(when(col("cum") >= expr("(n_keys + 1) div 2"), col("cnt")))
            .as("p50_cnt"),
          min(when(col("cum") >= expr("(n_keys * 9 + 9) div 10"), col("cnt")))
            .as("p90_cnt"),
          min(when(col("cum") >= expr("(n_keys * 99 + 99) div 100"), col("cnt")))
            .as("p99_cnt"),
          max(col("n_rows")).as("n_rows"), max(col("n_keys")).as("n_keys"),
          max(col("max_cnt")).as("max_cnt"))
        .select(col("n_rows"), col("n_keys"), col("p50_cnt"), col("p90_cnt"),
          col("p99_cnt"), col("max_cnt"),
          expr("(1000 * max_cnt) div n_rows").as("top1_pm"))
    },
    Some("""
      WITH counts AS (
        SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
      bycnt AS (SELECT cnt, count(*) AS k FROM counts GROUP BY 1),
      cum AS (SELECT cnt, sum(k) OVER (ORDER BY cnt
                ROWS UNBOUNDED PRECEDING) AS cum FROM bycnt),
      st AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
                    count(*) AS n_keys,
                    max(cnt) AS max_cnt FROM counts)
      SELECT n_rows, n_keys,
             min(CASE WHEN cum >= (n_keys + 1) // 2 THEN cnt END) AS p50_cnt,
             min(CASE WHEN cum >= (n_keys * 9 + 9) // 10 THEN cnt END) AS p90_cnt,
             min(CASE WHEN cum >= (n_keys * 99 + 99) // 100 THEN cnt END) AS p99_cnt,
             max_cnt,
             (1000 * max_cnt) // n_rows AS top1_pm
      FROM cum CROSS JOIN st
      GROUP BY n_rows, n_keys, max_cnt
    """))

  // ---- q74: count-min sketch frequency estimation ----------------------
  //
  // The third mergeable sketch in the family (q33 percentiles, q59
  // distinct): bounded-memory frequency estimation. A d×w counter grid
  // (d = 4 hash rows, w = 512 buckets) absorbs the whole stream with
  // map-side partial sums — counters ADD, so shards merge
  // associatively under any partitioning; estimate(key) = min over the
  // d cells the key hashes into, which can only OVER-count (collisions
  // add, never subtract): est ≥ exact always, and est ≤ exact + ⌈2N/w⌉
  // with high probability. Unlike approx_count_distinct's opaque HLL,
  // this sketch is built from the portable hash — the oracle
  // reconstructs the SAME grid bit-exactly in SQL, so the estimates
  // themselves hash-match (not just an envelope). Probes here are the
  // top-10 exact heavy keys (a q73-style audit pairing); the sketch
  // answers any ad-hoc key without rescanning the corpus.

  private val cmD = 4 // hash rows
  private val cmW = 512 // buckets per row

  private def cmKeySql = "'u'||CAST(user_id AS VARCHAR)||':'||CAST(j AS VARCHAR)"

  private val q74 = Q(
    "q74_countmin_freq",
    (s, d) => {
      import graft.functions.Portable
      val ev = Tables.events(s, d).select(col("user_id"))
      val cells = ev
        .select(col("user_id"), explode(expr(s"sequence(0, ${cmD - 1})")).as("j"))
        .select(col("j"),
          pmod(Portable.hash60(
            concat(lit("u"), col("user_id").cast("string"), lit(":"),
              col("j").cast("string")), 31), lit(cmW.toLong)).as("b"))
        .groupBy(col("j"), col("b")).agg(count(lit(1)).as("cell"))
      val top = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("user_id")).limit(10)
      val n = ev.agg(count(lit(1)).as("n_total"))
      top
        .select(col("user_id"), col("n_exact"),
          explode(expr(s"sequence(0, ${cmD - 1})")).as("j"))
        .select(col("user_id"), col("n_exact"), col("j"),
          pmod(Portable.hash60(
            concat(lit("u"), col("user_id").cast("string"), lit(":"),
              col("j").cast("string")), 31), lit(cmW.toLong)).as("b"))
        .join(broadcast(cells), Seq("j", "b"))
        .groupBy(col("user_id"), col("n_exact"))
        .agg(min(col("cell")).as("n_est"))
        .crossJoin(broadcast(n))
        .select(col("user_id"), col("n_exact"), col("n_est"),
          (col("n_est") - col("n_exact")).as("overcount"),
          (col("n_est") - col("n_exact")
            <= expr(s"(2 * n_total + ${cmW - 1}) div $cmW")).as("within_bound"))
    },
    Some(s"""
      WITH ev AS (SELECT user_id FROM events),
      cells AS (
        SELECT j, ${OracleSql.hSql(cmKeySql, 31)} % $cmW AS b,
               count(*) AS cell
        FROM ev, LATERAL unnest(generate_series(0, ${cmD - 1})) g(j)
        GROUP BY 1, 2),
      top AS (
        SELECT user_id, count(*) AS n_exact FROM ev GROUP BY 1
        ORDER BY n_exact DESC, user_id LIMIT 10),
      st AS (SELECT count(*) AS n_total FROM ev),
      probe AS (
        SELECT user_id, n_exact, j,
               ${OracleSql.hSql(cmKeySql, 31)} % $cmW AS b
        FROM top, LATERAL unnest(generate_series(0, ${cmD - 1})) g(j)),
      est AS (
        SELECT p.user_id, p.n_exact, min(c.cell) AS n_est
        FROM probe p JOIN cells c ON c.j = p.j AND c.b = p.b
        GROUP BY 1, 2)
      SELECT user_id, n_exact, n_est, n_est - n_exact AS overcount,
             (n_est - n_exact) <= (2 * n_total + ${cmW - 1}) // $cmW
               AS within_bound
      FROM est CROSS JOIN st
    """))

  // ---- q76: equal-frequency feature binning (quantile discretization) --
  //
  // The feature-prep step before any tree model or calibration table:
  // map a continuous column to 10 equal-frequency bins. A naive
  // `percentile(c, ...)` over one global group funnels the WHOLE
  // column through a single sort task — the q73-documented scale trap.
  // The scalable exact plan: collapse to a value HISTOGRAM (distinct
  // cents, map-side combined — the only corpus shuffle), run the
  // distributed two-level prefix sum over the value order
  // ([[graft.etl.PrefixSum]], never a single-partition window), and
  // probe the 18 needed order statistics (floor/ceil neighbors of the
  // nine q·(n−1) rank positions) with a broadcast 18-row table. The
  // interpolation runs in INTEGER arithmetic on both engines —
  // pos = i·(n−1)/10 is rational with denominator 10, so
  // edge_c = (10·lo + (hi−lo)·rem + 5) div 10 reproduces
  // round(quantile_cont) without any double ever existing (q57/q62's
  // recipe, here applied to the percentile itself). Bin assignment is
  // then a map-side `c > edge_c` count against the broadcast edge row,
  // and the report agg is 10 rows.

  private val q76 = Q(
    "q76_quantile_bins",
    (s, d) => {
      // ONE corpus pass: after the value histogram (the only
      // corpus-sized shuffle), everything — the total count, the order
      // statistics, AND the bin assignment/report — derives from the
      // vocabulary-sized histogram (each distinct value's bin expands
      // by its count), so the fact table is scanned exactly once
      val li = Tables.lineitem(s, d)
        .select(round(col("l_extendedprice") * 100).cast("long").as("c"))
      val hist = li.groupBy(col("c")).agg(count(lit(1)).as("cnt"))
        .withColumn("_qb", expr("c div 100000"))
        .localCheckpoint()
      val cum = graft.etl.PrefixSum.exclusiveBy(
        hist, "_qb", Seq(col("c")), "cnt", "off")
      val probes = hist.agg(sum(col("cnt")).as("n"))
        .select(explode(expr("sequence(1, 9)")).as("i"), col("n"))
        .select(col("i"),
          expr("(i * (n - 1)) div 10").as("k"),
          expr("(i * (n - 1)) % 10").as("rem"))
        .select(col("i"), col("rem"),
          explode(array(col("k"), col("k") + 1)).as("p"))
      val vals = cum.join(broadcast(probes),
          col("off") <= col("p") && col("p") < col("off") + col("cnt"))
        .groupBy(col("i"), col("rem"))
        .agg(min(col("c")).as("lo_c"), max(col("c")).as("hi_c"))
      val es = (1 to 9).map(i =>
        max(when(col("i") === i, col("ec"))).as(s"e$i"))
      val edgeRow = vals
        .select(col("i"),
          expr("(10 * lo_c + (hi_c - lo_c) * rem + 5) div 10").as("ec"))
        .agg(es.head, es.tail: _*)
      hist.crossJoin(broadcast(edgeRow))
        .select(col("c"), col("cnt"),
          (1 to 9).map(i => when(col("c") > col(s"e$i"), 1L).otherwise(0L))
            .reduce(_ + _).as("bin"))
        .groupBy(col("bin"))
        .agg(sum(col("cnt")).as("n"), min(col("c")).as("min_c"),
          max(col("c")).as("max_c"))
        .select(col("bin"), col("n"),
          (col("min_c").cast("double") / 100.0).as("lo"),
          (col("max_c").cast("double") / 100.0).as("hi"))
    },
    Some("""
      WITH v AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c
                 FROM lineitem),
      hist AS (SELECT c, count(*) AS cnt FROM v GROUP BY 1),
      cum AS (SELECT c, cnt,
                     CAST(coalesce(sum(cnt) OVER (ORDER BY c
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS off
              FROM hist),
      st AS (SELECT count(*) AS n FROM v),
      pos AS (SELECT i, (i * (n - 1)) // 10 AS k, (i * (n - 1)) % 10 AS rem
              FROM st, LATERAL unnest(generate_series(1, 9)) g(i)),
      probes AS (SELECT i, rem, k AS p FROM pos
                 UNION ALL SELECT i, rem, k + 1 FROM pos),
      vals AS (SELECT p.i, p.rem, min(c.c) AS lo_c, max(c.c) AS hi_c
               FROM probes p JOIN cum c
                 ON c.off <= p.p AND p.p < c.off + c.cnt
               GROUP BY 1, 2),
      erow AS (SELECT
                 max(CASE WHEN i = 1 THEN (10*lo_c + (hi_c-lo_c)*rem + 5) // 10 END) AS e1,
                 max(CASE WHEN i = 2 THEN (10*lo_c + (hi_c-lo_c)*rem + 5) // 10 END) AS e2,
                 max(CASE WHEN i = 3 THEN (10*lo_c + (hi_c-lo_c)*rem + 5) // 10 END) AS e3,
                 max(CASE WHEN i = 4 THEN (10*lo_c + (hi_c-lo_c)*rem + 5) // 10 END) AS e4,
                 max(CASE WHEN i = 5 THEN (10*lo_c + (hi_c-lo_c)*rem + 5) // 10 END) AS e5,
                 max(CASE WHEN i = 6 THEN (10*lo_c + (hi_c-lo_c)*rem + 5) // 10 END) AS e6,
                 max(CASE WHEN i = 7 THEN (10*lo_c + (hi_c-lo_c)*rem + 5) // 10 END) AS e7,
                 max(CASE WHEN i = 8 THEN (10*lo_c + (hi_c-lo_c)*rem + 5) // 10 END) AS e8,
                 max(CASE WHEN i = 9 THEN (10*lo_c + (hi_c-lo_c)*rem + 5) // 10 END) AS e9
               FROM vals),
      b AS (SELECT c,
              CAST(CASE WHEN c > e1 THEN 1 ELSE 0 END
                 + CASE WHEN c > e2 THEN 1 ELSE 0 END
                 + CASE WHEN c > e3 THEN 1 ELSE 0 END
                 + CASE WHEN c > e4 THEN 1 ELSE 0 END
                 + CASE WHEN c > e5 THEN 1 ELSE 0 END
                 + CASE WHEN c > e6 THEN 1 ELSE 0 END
                 + CASE WHEN c > e7 THEN 1 ELSE 0 END
                 + CASE WHEN c > e8 THEN 1 ELSE 0 END
                 + CASE WHEN c > e9 THEN 1 ELSE 0 END AS BIGINT) AS bin
            FROM v CROSS JOIN erow)
      SELECT bin, count(*) AS n,
             min(c) / 100.0 AS lo, max(c) / 100.0 AS hi
      FROM b GROUP BY 1
    """))

  // ---- q78: windowed analytics suite ----------------------------------
  //
  // The SQL-analytics window family over per-user event streams in ONE
  // window specification: lag/lead (adjacent-event context), row_number
  // (sequence position), ntile (per-user value-time quartile), and a
  // running ROWS-frame sum in integer cents. All five functions share
  // the same (PARTITION BY user_id ORDER BY ts, event_id) spec, so
  // Catalyst plans a SINGLE Window operator — one shuffle on user_id,
  // one per-partition sort, all functions evaluated in the same pass
  // (splitting specs is the classic window anti-pattern: each distinct
  // spec is another sort). The ordering is total (event_id breaks ts
  // ties), so every function is deterministic and the running sum's
  // ROWS frame equals its RANGE frame.
  //
  // Scale: state per group is O(1) for lag/lead/sum/row_number and the
  // window shuffle carries each user's events to one task — the same
  // bound as q23 sessionization; a celebrity user is an AQE skew-split
  // away, same as any hot group.

  private val q78 = Q(
    "q78_window_suite",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
          round(col("value") * 100).cast("long").as("c"))
        .select(col("user_id"), col("event_id"),
          lag(col("event_type"), 1).over(w).as("prev_type"),
          lead(col("event_type"), 1).over(w).as("next_type"),
          row_number().over(w).as("rnk"),
          ntile(4).over(w).as("quartile"),
          sum(col("c")).over(w.rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow))
            .as("run_cents"))
    },
    Some("""
      SELECT user_id, event_id,
             lag(event_type, 1) OVER w AS prev_type,
             lead(event_type, 1) OVER w AS next_type,
             CAST(row_number() OVER w AS INTEGER) AS rnk,
             CAST(ntile(4) OVER w AS INTEGER) AS quartile,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS run_cents
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """))

  def all: Seq[Q] =
    Seq(q26, q27, q33, q42, q44, q57, q59, q62, q67, q70, q73, q74, q76, q78)
}
