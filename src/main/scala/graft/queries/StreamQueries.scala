package graft.queries

import org.apache.spark.sql.functions._

import graft.etl.Tables
import graft.streaming.StreamOps

/** Batch twins of the streaming operators (plus JSON props extraction)
  * over the `events` table. The SAME StreamOps definitions run under
  * Structured Streaming (StreamingSpec proves batch/stream parity with a
  * MemoryStream); these entries pin their semantics to DuckDB oracles.
  */
object StreamQueries {

  // ---- q23: gap sessionization (batch formulation) -------------------

  private val gapMinutes = 30

  private val q23 = Q(
    "q23_event_sessions",
    (s, d) => StreamOps.sessionizeBatch(Tables.events(s, d), gapMinutes),
    Some(s"""
      WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, value FROM events),
      flagged AS (
        SELECT user_id, ts_us, value,
               CASE WHEN ts_us - lag(ts_us) OVER w > ${gapMinutes * 60L * 1000000L}
                    THEN 1 ELSE 0 END AS new_sess
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
      sess AS (
        SELECT user_id, ts_us, value,
               sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us
                                   ROWS UNBOUNDED PRECEDING) AS sess_idx
        FROM flagged)
      SELECT user_id,
             min(ts_us) AS session_start_us,
             max(ts_us) AS session_end_us,
             count(*) AS n_events,
             CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT)
               / 10000.0 AS value_sum
      FROM sess GROUP BY user_id, sess_idx
    """))

  // ---- q24: tumbling event-time window stats -------------------------

  private val q24 = Q(
    "q24_event_windowed",
    (s, d) => StreamOps.windowedTypeStats(Tables.events(s, d), "6 hours")
      .select(date_format(col("w_start"), "yyyy-MM-dd HH:mm").as("w_start"),
        col("event_type"), col("n_events"), col("value_sum")),
    // Spark's window() aligns tumbling windows to the unix epoch; mirror
    // with integer epoch-second bucketing. make_timestamp builds a NAIVE
    // timestamp — to_timestamp would return TIMESTAMPTZ and strftime
    // would render it in DuckDB's machine timezone, false-failing the
    // gate on any non-UTC host (the Spark side is pinned to UTC).
    Some("""
      SELECT strftime(make_timestamp((epoch_us(ts) // 1000000 // 21600) * 21600 * 1000000),
                      '%Y-%m-%d %H:%M') AS w_start,
             event_type, count(*) AS n_events,
             CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT)
               / 10000.0 AS value_sum
      FROM events
      GROUP BY 1, 2
    """))

  // ---- q25: JSON props extraction ------------------------------------

  private val q25 = Q(
    "q25_props_json",
    (s, d) => Tables.spread(Tables.events(s, d)
        .select(col("event_id"), col("event_type"), col("props")))
      .select(col("event_type"),
        // try_cast: a non-integral props.k must coerce to null (the
        // kit-wide contract), not abort the query under ANSI mode
        get_json_object(col("props"), "$.k").try_cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_k"), sum(col("k")).as("k_sum"),
        max(col("k")).as("k_max")),
    Some("""
      SELECT event_type,
             count(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k,
             -- CAST: DuckDB sum(BIGINT) yields HUGEINT (pandas float64);
             -- Spark emits int64 — pin the dtype for the hash compare
             CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
             max(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
      FROM events
      GROUP BY 1
    """))

  // ---- q28: as-of join (purchase ← most recent prior click) ----------
  //
  // Spark has no native as-of operator; graft.etl.AsOf composes it from a
  // tagged union + one running-last window (single shuffle on the key).
  // The oracle is DuckDB's NATIVE ASOF JOIN — two entirely different
  // implementations of the operator hash-matched against each other.

  private val q28 = Q(
    "q28_asof_attribution",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"), col("value"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_us"),
          col("ts_us").as("click_ts_us"), col("value").as("click_value"),
          col("event_id"))
      graft.etl.AsOf.joinBackward(purchases, clicks,
        keyCols = Seq("user_id"), tsCol = "ts_us",
        payloadCols = Seq("click_ts_us", "click_value"),
        tieBreak = col("event_id"))
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("_match.click_ts_us").as("click_ts_us"),
          col("_match.click_value").as("click_value"))
    },
    // The click side is pre-deduped to one row per (user_id, ts) by max
    // event_id — DuckDB's ASOF picks an ARBITRARY row among ties, while
    // the Spark side resolves ties deterministically by max event_id;
    // pinning the same rule here keeps parity deterministic if the data
    // ever contains two clicks at an identical microsecond.
    Some("""
      SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
             epoch_us(c.ts) AS click_ts_us, c.value AS click_value
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (
        SELECT * FROM events WHERE event_type = 'click'
        QUALIFY row_number() OVER (PARTITION BY user_id, ts
                                   ORDER BY event_id DESC) = 1) c
        ON p.user_id = c.user_id AND p.ts >= c.ts
    """))

  // ---- q29: rolling time-range window + inter-event gaps -------------
  //
  // RANGE-framed window (trailing 1 hour of event time, peers included)
  // plus a lag-based inter-event gap — the per-entity time-series ops
  // (rolling rate limits, burst detection) the tumbling-window model
  // can't express. One shuffle on user_id serves both windows.

  private val q29 = Q(
    "q29_rolling_window",
    (s, d) => {
      val hourUs = 3600L * 1000000L
      val byUserRange = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts_us"))
      val trailing = byUserRange.rangeBetween(-hourUs, 0)
      // lag needs a TOTAL order: same-microsecond events would pair
      // (event → gap) nondeterministically (and differently per engine)
      // without the event_id tie-break; the RANGE window is tie-safe
      // (peers are included) so only the lag window pins it
      val byUserTotal = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          // fixed-point money rule (q38/q45): quantize once per row,
          // sum BIGINTs over the window, divide once
          round(col("value") * 10000).cast("long").as("v_e4"))
        .select(col("event_id"), col("user_id"), col("ts_us"),
          count(lit(1)).over(trailing).as("n_1h"),
          (sum(col("v_e4")).over(trailing).cast("double") / 10000.0)
            .as("sum_1h"),
          (col("ts_us") - lag(col("ts_us"), 1).over(byUserTotal)).as("gap_us"))
    },
    Some("""
      SELECT event_id, user_id, epoch_us(ts) AS ts_us,
             count(*) OVER w_range AS n_1h,
             CAST(sum(CAST(round(value * 10000) AS BIGINT)) OVER w_range
                  AS BIGINT) / 10000.0 AS sum_1h,
             epoch_us(ts) - lag(epoch_us(ts), 1) OVER w_order AS gap_us
      FROM events
      WINDOW
        w_range AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW),
        w_order AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    """))

  // ---- q34: stream-static enrichment join ----------------------------
  //
  // Dimension enrichment of an event stream (events ⋈ customer ⋈ nation)
  // aggregated per (nation, event_type). StreamOps.enrichEvents is the
  // shared definition: the batch form here pins semantics to the oracle;
  // StreamingSpec runs the SAME join under Structured Streaming against
  // a MemoryStream and proves row parity. The event side is never
  // shuffled — both dimensions broadcast.

  private val q34 = Q(
    "q34_stream_enrich",
    (s, d) => StreamOps.enrichEvents(Tables.events(s, d),
        Tables.customer(s, d), Tables.nation(s, d))
      .groupBy(col("n_name"), col("event_type"))
      // fixed-point money rule (q38/q45): order-independent BIGINT sum
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 10000).cast("long")).as("v_e4"))
      .select(col("n_name"), col("event_type"), col("n_events"),
        (col("v_e4").cast("double") / 10000.0).as("value_sum")),
    Some("""
      SELECT n_name, event_type, count(*) AS n_events,
             CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT)
               / 10000.0 AS value_sum
      FROM events e
      JOIN customer c ON e.user_id = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    """))

  // ---- q35: sliding event-time window stats --------------------------
  //
  // Overlapping windows (6h window, 3h slide) — every event lands in
  // exactly window/slide = 2 windows. Same watermarked hash-agg shape as
  // q24; the oracle enumerates the 2 covering windows per event with an
  // epoch-aligned unnest (Spark's window() aligns slides to the epoch).

  private val q35 = Q(
    "q35_sliding_window",
    (s, d) => StreamOps.windowedTypeStats(Tables.events(s, d), "6 hours",
        slide = Some("3 hours"))
      .select(date_format(col("w_start"), "yyyy-MM-dd HH:mm").as("w_start"),
        col("event_type"), col("n_events"), col("value_sum")),
    Some("""
      WITH e AS (
        SELECT epoch_us(ts) // 1000000 AS ts_s, event_type, value FROM events),
      w AS (
        SELECT ((ts_s // 10800) - j) * 10800 AS w_start_s, event_type, value
        FROM e CROSS JOIN (SELECT unnest(range(0, 2)) AS j))
      SELECT strftime(make_timestamp(w_start_s * 1000000),
                      '%Y-%m-%d %H:%M') AS w_start,
             event_type, count(*) AS n_events,
             CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT)
               / 10000.0 AS value_sum
      FROM w
      GROUP BY 1, 2
    """))

  // ---- q36: rollup reporting aggregates ------------------------------
  //
  // Hierarchical totals in one pass: (nation, event_type) → (nation) →
  // grand total via ROLLUP — Spark computes all three grouping sets in
  // a single shuffle with partial aggregation (vs three separate
  // aggregations + union). grouping() flags distinguish "NULL because
  // rolled up" from a genuine null key, and give the oracle an exact
  // column to match on.

  private val q36 = Q(
    "q36_rollup_report",
    (s, d) => StreamOps.enrichEvents(Tables.events(s, d),
        Tables.customer(s, d), Tables.nation(s, d))
      .rollup(col("n_name"), col("event_type"))
      // fixed-point money rule (q38/q45): order-independent BIGINT sum
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 10000).cast("long")).as("v_e4"),
        grouping(col("n_name")).cast("int").as("g_nation"),
        grouping(col("event_type")).cast("int").as("g_type"))
      .select(coalesce(col("n_name"), lit("ALL")).as("n_name"),
        coalesce(col("event_type"), lit("ALL")).as("event_type"),
        col("n_events"), (col("v_e4").cast("double") / 10000.0).as("value_sum"),
        col("g_nation"), col("g_type")),
    Some("""
      SELECT coalesce(n_name, 'ALL') AS n_name,
             coalesce(event_type, 'ALL') AS event_type,
             count(*) AS n_events,
             CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT)
               / 10000.0 AS value_sum,
             CAST(grouping(n_name) AS INTEGER) AS g_nation,
             CAST(grouping(event_type) AS INTEGER) AS g_type
      FROM events e
      JOIN customer c ON e.user_id = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY ROLLUP (n_name, event_type)
    """))

  // ---- q37: interval (range) join via bucket-grid equi-join ----------
  //
  // Events joined to overlapping time intervals ("campaigns": 20
  // deterministic intervals of width 2w starting every w across the
  // event span). Spark executes a raw `ts BETWEEN s AND e` join as a
  // broadcast-nested-loop — O(|events|·|intervals|) compares. The
  // scalable formulation is [[graft.etl.IntervalJoin.byGrid]]: intervals
  // of ARBITRARY width explode to their covered width-w grid cells
  // (`floor(s/w) .. floor((e-1)/w)`), turning the join into an EQUI-join
  // on cell id + an exact residual filter — hash join,
  // partial-agg-friendly, no quadratic compare. The oracle is DuckDB's
  // native inequality join: two different algorithms, hash-matched (the
  // q28 as-of pattern). IntervalJoinSpec proves grid-vs-BNL parity on
  // irregular widths.
  //
  // All grid math is integer micros derived from min/max(ts) — exact in
  // both engines.

  private val nCampaigns = 20

  private val q37 = Q(
    "q37_interval_join",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"), col("value"))
      val stats = ev.agg(min(col("ts_us")).as("mn"), max(col("ts_us")).as("mx"))
        .select(col("mn"), floor((col("mx") - col("mn")) / nCampaigns)
          .cast("long").as("w"))
      val campaigns = s.range(nCampaigns).toDF("campaign_id")
        .crossJoin(broadcast(stats))
        .select(col("campaign_id"),
          (col("mn") + col("campaign_id") * col("w")).as("c_start"),
          (col("mn") + (col("campaign_id") + 2) * col("w")).as("c_end"),
          col("w"))
      graft.etl.IntervalJoin.byGrid(
          ev.crossJoin(broadcast(stats.select(col("w")))), campaigns,
          "ts_us", "c_start", "c_end", "w")
        .groupBy(col("campaign_id"))
        // fixed-point value sum (q45/q38 rule): quantize once to 1e-4
        // units, sum BIGINTs, divide once — round(sum(double), 4) is
        // engine-order-dependent at half-boundaries
        .agg(count(lit(1)).as("n_events"),
          sum(round(col("value") * 10000).cast("long")).as("v_e4"))
        .select(col("campaign_id"), col("n_events"),
          (col("v_e4").cast("double") / 10000.0).as("value_sum"))
    },
    Some(s"""
      WITH ev AS (SELECT event_id, epoch_us(ts) AS ts_us, value FROM events),
      st AS (SELECT min(ts_us) AS mn,
                    (max(ts_us) - min(ts_us)) // $nCampaigns AS w
             FROM ev),
      campaigns AS (
        SELECT c AS campaign_id, mn + c * w AS c_start, mn + (c + 2) * w AS c_end
        FROM st CROSS JOIN (SELECT unnest(range(0, $nCampaigns)) AS c))
      SELECT campaign_id, count(*) AS n_events,
             CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT)
               / 10000.0 AS value_sum
      FROM ev JOIN campaigns
        ON ev.ts_us >= c_start AND ev.ts_us < c_end
      GROUP BY 1
    """))

  // ---- q39: sequential funnel (view → click → purchase) ---------------
  //
  // The event-analytics conversion funnel: per user, the earliest view,
  // the earliest click strictly AFTER that view, and the earliest
  // purchase strictly after that click. Each stage is one equi-join on
  // user_id plus a residual time predicate feeding a min-aggregate with
  // map-side partials — three user_id shuffles, each carrying only one
  // event type's rows (the type filter pushes to the scan). No windows
  // over the full event table, no per-user driver loops.

  private val q39 = Q(
    "q39_funnel_steps",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"))
      def firstAfter(etype: String, prev: org.apache.spark.sql.DataFrame,
                     prevCol: String, outCol: String) =
        ev.filter(col("event_type") === etype)
          .join(prev, Seq("user_id"))
          .filter(col("ts_us") > col(prevCol))
          .groupBy(col("user_id")).agg(min(col("ts_us")).as(outCol))
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("view_ts_us"))
      val c = firstAfter("click", v, "view_ts_us", "click_ts_us")
      val p = firstAfter("purchase", c, "click_ts_us", "purchase_ts_us")
      v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
        .select(col("user_id"), col("view_ts_us"), col("click_ts_us"),
          col("purchase_ts_us"),
          (lit(1) + when(col("click_ts_us").isNotNull, 1).otherwise(0)
            + when(col("purchase_ts_us").isNotNull, 1).otherwise(0))
            .cast("int").as("depth"))
    },
    Some("""
      WITH ev AS (
        SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
      v AS (SELECT user_id, min(ts_us) AS view_ts_us
            FROM ev WHERE event_type = 'view' GROUP BY 1),
      c AS (SELECT ev.user_id, min(ts_us) AS click_ts_us
            FROM ev JOIN v USING (user_id)
            WHERE event_type = 'click' AND ts_us > view_ts_us GROUP BY 1),
      p AS (SELECT ev.user_id, min(ts_us) AS purchase_ts_us
            FROM ev JOIN c USING (user_id)
            WHERE event_type = 'purchase' AND ts_us > click_ts_us GROUP BY 1)
      SELECT v.user_id, view_ts_us, click_ts_us, purchase_ts_us,
             CAST(1 + CASE WHEN click_ts_us IS NOT NULL THEN 1 ELSE 0 END
                    + CASE WHEN purchase_ts_us IS NOT NULL THEN 1 ELSE 0 END
                  AS INTEGER) AS depth
      FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
    """))

  // ---- q41: stream-stream interval join (batch twin) -------------------
  //
  // View→purchase attribution via StreamOps.attributePurchases — the
  // same definition StreamingSpec runs as a watermarked stream-stream
  // join. Per attributed purchase: how many qualifying views preceded it
  // and the earliest one. Batch plan: one user_id equi-join with a
  // residual time-range predicate, then a purchase_id hash agg.

  private val q41 = Q(
    "q41_stream_stream_join",
    (s, d) => {
      val ev = Tables.events(s, d)
      val pairs = StreamOps.attributePurchases(
        ev.filter(col("event_type") === "view"),
        ev.filter(col("event_type") === "purchase"))
      pairs.groupBy(col("purchase_id"))
        .agg(count(lit(1)).as("n_views"),
          min(col("view_id")).as("first_view_id"),
          round(min(col("value")), 4).as("value"))
    },
    Some("""
      WITH v AS (SELECT user_id, event_id AS view_id, ts AS view_ts
                 FROM events WHERE event_type = 'view'),
      p AS (SELECT user_id, event_id AS purchase_id, ts AS purchase_ts, value
            FROM events WHERE event_type = 'purchase')
      SELECT purchase_id, count(*) AS n_views,
             min(view_id) AS first_view_id,
             round(min(value), 4) AS value
      FROM v JOIN p ON v.user_id = p.user_id
        AND p.purchase_ts >= v.view_ts
        AND p.purchase_ts < v.view_ts + INTERVAL 6 HOUR
      GROUP BY 1
    """))

  // ---- q45: native session windows ------------------------------------
  //
  // Spark's built-in `session_window(ts, gap)` — the dynamic-gap window
  // the engine merges at aggregation time (works identically on a
  // watermarked stream, where it is THE bounded-state sessionization).
  // Boundary convention: a new session starts when diff >= gap (windows
  // [ts, ts+gap) merge only when they overlap) — q23's custom
  // sessionizer keeps a diff > gap rule instead; both are valid
  // contracts, pinned by their respective oracles. The window end is the
  // last event + gap by definition, mirrored exactly in SQL.

  private val sessGapUs = 30L * 60 * 1000000

  private val q45 = Q(
    "q45_session_window_native",
    // value_sum follows the fixed-point money rule (q38/q40 pattern):
    // quantize each value ONCE to integer 1e-4 units, sum BIGINTs
    // (order-independent), divide once at the end — round(sum(double))
    // is engine-order-dependent and flaked exactly this way on the money
    // queries before they were converted.
    (s, d) => StreamOps.sessionWindowNative(Tables.events(s, d)),
    Some(s"""
      WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, value FROM events),
      x AS (SELECT *,
              CASE WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us)
                        >= $sessGapUs
                   THEN 1 ELSE 0 END AS nw
            FROM e),
      g AS (SELECT *,
              sum(nw) OVER (PARTITION BY user_id ORDER BY ts_us
                            ROWS UNBOUNDED PRECEDING) AS sess
            FROM x)
      SELECT user_id,
             min(ts_us) AS session_start_us,
             max(ts_us) + $sessGapUs AS session_end_us,
             count(*) AS n_events,
             CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT)
               / 10000.0 AS value_sum
      FROM g
      GROUP BY user_id, sess
    """))

  // ---- q46: outer stream-stream attribution ---------------------------
  //
  // q41's inner join reports attributed pairs; q46 preserves EVERY
  // purchase (right-outer) so unattributed conversions surface with
  // n_views = 0 — the audit the marketing pipeline reconciles spend
  // against. Streaming semantics: outer rows emit once the watermark
  // passes purchase_ts + horizon (state already bounded by q41's time
  // condition; the outer emission adds no state).

  private val q46 = Q(
    "q46_unattributed_purchases",
    (s, d) => {
      val ev = Tables.events(s, d)
      val pairs = StreamOps.attributePurchases(
        ev.filter(col("event_type") === "view"),
        ev.filter(col("event_type") === "purchase"),
        joinType = "right_outer")
      pairs.groupBy(col("purchase_id"))
        .agg(sum(when(col("view_id").isNotNull, 1L).otherwise(0L)).as("n_views"),
          round(min(col("value")), 4).as("value"))
        .withColumn("attributed", (col("n_views") > 0).cast("boolean"))
    },
    Some("""
      WITH v AS (SELECT user_id, event_id AS view_id, ts AS view_ts
                 FROM events WHERE event_type = 'view'),
      p AS (SELECT user_id, event_id AS purchase_id, ts AS purchase_ts, value
            FROM events WHERE event_type = 'purchase')
      SELECT purchase_id,
             CAST(sum(CASE WHEN view_id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
               AS n_views,
             round(min(value), 4) AS value,
             sum(CASE WHEN view_id IS NULL THEN 0 ELSE 1 END) > 0 AS attributed
      FROM p LEFT JOIN v ON v.user_id = p.user_id
        AND p.purchase_ts >= v.view_ts
        AND p.purchase_ts < v.view_ts + INTERVAL 6 HOUR
      GROUP BY 1
    """))

  // ---- q54: ordered funnel (view → click → purchase) -----------------
  //
  // First-touch funnel: a user's earliest view anchors the funnel; the
  // earliest click AFTER that view (within the horizon) advances it; the
  // earliest purchase after that click completes it. Order matters — a
  // purchase before the click does NOT count, which is what separates a
  // funnel from three independent existence checks.
  //
  // Scale shape: each step is a groupBy(user) min-agg (map-side partial)
  // over a type-filtered slice, joined back on user_id — the step frames
  // are USER-dimension-sized, orders of magnitude smaller than the event
  // log, and every join is an equi-join on user_id. No windows over the
  // full log, no per-user sort.

  private val funnelHorizonUs = 72L * 3600L * 1000000L

  private val q54 = Q(
    "q54_funnel",
    (s, d) => {
      val ev = Tables.spread(Tables.events(s, d))
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("view_ts_us"))
      val c = ev.filter(col("event_type") === "click").join(v, Seq("user_id"))
        .filter(col("ts_us") > col("view_ts_us") &&
          col("ts_us") <= col("view_ts_us") + funnelHorizonUs)
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("click_ts_us"))
      val p = ev.filter(col("event_type") === "purchase").join(c, Seq("user_id"))
        .filter(col("ts_us") > col("click_ts_us") &&
          col("ts_us") <= col("click_ts_us") + funnelHorizonUs)
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("purchase_ts_us"))
      v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
        .select(col("user_id"), col("view_ts_us"), col("click_ts_us"),
          col("purchase_ts_us"),
          (lit(1) + when(col("click_ts_us").isNotNull, 1).otherwise(0)
            + when(col("purchase_ts_us").isNotNull, 1).otherwise(0))
            .as("funnel_step"))
    },
    Some(s"""
      WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
      v AS (SELECT user_id, min(ts_us) AS view_ts_us
            FROM ev WHERE event_type = 'view' GROUP BY 1),
      c AS (SELECT e.user_id, min(ts_us) AS click_ts_us
            FROM ev e JOIN v ON v.user_id = e.user_id
            WHERE e.event_type = 'click'
              AND ts_us > view_ts_us AND ts_us <= view_ts_us + $funnelHorizonUs
            GROUP BY 1),
      p AS (SELECT e.user_id, min(ts_us) AS purchase_ts_us
            FROM ev e JOIN c ON c.user_id = e.user_id
            WHERE e.event_type = 'purchase'
              AND ts_us > click_ts_us AND ts_us <= click_ts_us + $funnelHorizonUs
            GROUP BY 1)
      SELECT v.user_id, view_ts_us, click_ts_us, purchase_ts_us,
             CAST(1 + (click_ts_us IS NOT NULL)::INT
                    + (purchase_ts_us IS NOT NULL)::INT AS INTEGER) AS funnel_step
      FROM v LEFT JOIN c ON c.user_id = v.user_id
             LEFT JOIN p ON p.user_id = v.user_id
    """))

  // ---- q55: retention cohorts (signup day × activity offset) ---------
  //
  // The classic cohort triangle: users grouped by signup day, counted on
  // each subsequent day they were active. ONE distinct-activity agg over
  // the log + a user-sized cohort join; output is cohorts × offsets —
  // report-sized regardless of corpus scale. countDistinct shuffles
  // (cohort_day, offset, user) once; no windows, no self-joins.

  private val q55 = Q(
    "q55_retention_cohorts",
    (s, d) => {
      val ev = Tables.spread(Tables.events(s, d))
        .select(col("user_id"), to_date(col("ts")).as("day"), col("event_type"))
      val cohort = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      val act = ev.select(col("user_id"), col("day")).distinct()
      act.join(cohort, Seq("user_id"))
        .filter(col("day") >= col("cohort_day"))
        .groupBy(col("cohort_day"), datediff(col("day"), col("cohort_day")).as("offset_days"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .select(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
          col("offset_days"), col("n_users"))
    },
    Some("""
      WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day, event_type FROM events),
      cohort AS (SELECT user_id, min(day) AS cohort_day
                 FROM ev WHERE event_type = 'signup' GROUP BY 1),
      act AS (SELECT DISTINCT user_id, day FROM ev)
      SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
             CAST(day - cohort_day AS INTEGER) AS offset_days,
             count(DISTINCT a.user_id) AS n_users
      FROM act a JOIN cohort c ON c.user_id = a.user_id
      WHERE day >= cohort_day
      GROUP BY cohort_day, day - cohort_day
    """))

  // ---- q56: event-type transition matrix -----------------------------
  //
  // First-order Markov transitions per user (what follows what): one
  // lead() window partitioned by user — per-task state is one user's
  // events, the sort is within-partition — then a 5×5-output hash agg
  // with map-side partials. Ties at identical microseconds are pinned by
  // event_id so both engines see the same sequence.

  private val q56 = Q(
    "q56_event_transitions",
    (s, d) =>
      StreamOps.transitionsBatch(Tables.spread(Tables.events(s, d)))
        .groupBy(col("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n")),
    Some("""
      WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY epoch_us(ts), event_id) AS next_type
        FROM events)
      SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    """))

  // ---- q60: sliding-window distinct users (exact 7-day actives) ------
  //
  // Exact rolling distinct counts — the one windowed metric that does
  // NOT decompose into mergeable per-day partials (distinct isn't a
  // sum), so the plan states the honest cost: pre-dedup the log to
  // (day, user) pairs ONCE (the only corpus-sized shuffle), replicate
  // each pair into the <=7 windows it can close (explode of a 7-element
  // sequence — map-side, no join), and count distinct per window end.
  // Data volume after pre-dedup is active-pairs x 7, independent of raw
  // event count. At 1000x, the approximate alternative is per-day HLL
  // sketches merged across the window (q59's machinery) — this operator
  // is the exact baseline those sketches are audited against. u1 (same-
  // day actives) rides along via a conditional distinct in the same agg.

  private val q60 = Q(
    "q60_sliding_distinct_users",
    (s, d) => {
      val du = Tables.spread(Tables.events(s, d))
        .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      val spine = du.select(col("day").as("win_end")).distinct()
      val contrib = du
        .select(col("day"), col("user_id"),
          explode(expr("sequence(day, date_add(day, 6))")).as("win_end"))
        .join(spine, Seq("win_end"))
      contrib.groupBy(col("win_end"))
        .agg(
          countDistinct(when(col("day") === col("win_end"), col("user_id")))
            .as("u1"),
          countDistinct(col("user_id")).as("u7"))
        .select(date_format(col("win_end"), "yyyy-MM-dd").as("win_end"),
          col("u1"), col("u7"))
    },
    Some("""
      WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      spine AS (SELECT DISTINCT day AS win_end FROM du),
      contrib AS (SELECT du.day, s.win_end, du.user_id
                  FROM du JOIN spine s ON s.win_end BETWEEN du.day AND du.day + 6)
      SELECT strftime(win_end, '%Y-%m-%d') AS win_end,
             count(DISTINCT CASE WHEN day = win_end THEN user_id END) AS u1,
             count(DISTINCT user_id) AS u7
      FROM contrib GROUP BY win_end
    """))

  // ---- q63: distinct users per tumbling window (streaming-twin form) --
  //
  // q60's exact sliding distinct phrased as the operator pair that runs
  // unchanged on a stream: dedup keyed on (window, user) feeding a
  // windowed count — StreamingSpec proves the CHAINED-stateful streaming
  // twin (dropDuplicates → windowed agg in append mode) emits the same
  // rows per closed window. Epoch-aligned 6h tumbling windows (q24's
  // alignment rule).

  private val q63 = Q(
    "q63_window_distinct_users",
    (s, d) => StreamOps.distinctUsersBatch(
        Tables.spread(Tables.events(s, d)), "6 hours")
      .select(date_format(col("w_start"), "yyyy-MM-dd HH:mm").as("w_start"),
        col("n_users")),
    Some("""
      SELECT strftime(make_timestamp((epoch_us(ts) // 1000000 // 21600) * 21600 * 1000000),
                      '%Y-%m-%d %H:%M') AS w_start,
             count(DISTINCT user_id) AS n_users
      FROM events
      GROUP BY 1
    """))

  // ---- q66: forward fill (last observation carried forward) ----------
  //
  // The sparse-metric window op every sessionized feature pipeline
  // needs: carry each user's latest purchase amount onto every
  // subsequent event (null until the first purchase). One window
  // partitioned by user over the (ts, event_id)-pinned total order —
  // a single shuffle on user_id, per-task state is one user's events;
  // the ignore-nulls running `last` is the codegen'd LOCF. Money rides
  // in integer cents (the fill copies values verbatim, so cents keep
  // the copy bit-exact).

  private val q66 = Q(
    "q66_forward_fill",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      Tables.spread(Tables.events(s, d))
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
          when(col("event_type") === "purchase",
            round(col("value") * 100).cast("long")).as("obs_c"))
        .select(col("event_id"), col("user_id"), col("event_type"),
          last(col("obs_c"), ignoreNulls = true).over(w).as("last_purchase_c"))
    },
    Some("""
      SELECT event_id, user_id, event_type,
             last_value(CASE WHEN event_type = 'purchase'
                             THEN CAST(round(value * 100) AS BIGINT) END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS last_purchase_c
      FROM events
    """))

  // ---- q68: clickstream path mining (top trigram paths) --------------
  //
  // q56's transition matrix generalized to length-3 paths: which
  // three-step sequences dominate user journeys. Two lead() offsets
  // over the same per-user window (ONE shuffle on user_id — both leads
  // share the partition), then a hash agg over the ≤125 distinct paths
  // and a global top-k via TakeOrderedAndProject (no full sort). Ties
  // at identical microseconds pin on event_id (q56's rule), and the
  // top-k ties pin on the path string.

  private val q68 = Q(
    "q68_top_paths",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val paths = Tables.spread(Tables.events(s, d))
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .select(col("event_type").as("e1"),
          lead(col("event_type"), 1).over(w).as("e2"),
          lead(col("event_type"), 2).over(w).as("e3"))
        .filter(col("e2").isNotNull && col("e3").isNotNull)
        .select(concat_ws(">", col("e1"), col("e2"), col("e3")).as("path"))
      paths.groupBy(col("path")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path").asc)
        .limit(10)
    },
    Some("""
      WITH seq AS (
        SELECT event_type AS e1,
               lead(event_type, 1) OVER w AS e2,
               lead(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
      paths AS (
        SELECT e1 || '>' || e2 || '>' || e3 AS path
        FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL)
      SELECT path, count(*) AS n
      FROM paths GROUP BY 1
      ORDER BY n DESC, path ASC
      LIMIT 10
    """))

  def all: Seq[Q] =
    Seq(q23, q24, q25, q28, q29, q34, q35, q36, q37, q39, q41, q45, q46,
      q54, q55, q56, q60, q63, q66, q68)
}
