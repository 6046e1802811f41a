package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-stream operators over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference has no stream processing (SURVEY.md §2.8) — this module
  * is the 100 TB scale-out extension: the same logical operations phrased
  * so ONE definition runs in both batch and Structured Streaming, plus a
  * stateful sessionizer for semantics the windowed model can't express.
  *
  * Scale design: the windowed aggregation is a standard watermarked
  * shuffle on (window, key) with partial aggregation; sessionization
  * shuffles once on user_id and holds O(1) state per open session (not
  * per event) in the state store — both shapes survive arbitrary
  * horizontal scaling.
  */
object StreamOps {

  /** Tumbling event-time window × event_type counts/sums. Works on batch
    * and streaming frames alike; streaming frames get a watermark (late
    * rows beyond `watermark` are dropped, state is bounded).
    */
  def windowedTypeStats(
      events: DataFrame,
      windowDur: String,
      watermark: String = "1 hour"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("value_sum"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n_events"), col("value_sum"))
  }

  /** One event for sessionization (micros epoch keeps arithmetic exact). */
  final case class Ev(user_id: Long, ts_us: Long, value: Double)

  /** One closed session. */
  final case class Session(
      user_id: Long,
      session_start_us: Long,
      session_end_us: Long,
      n_events: Long,
      value_sum: Double)

  /** Open-session state held in the state store (public: Spark's codegen
    * instantiates encoder projections for it).
    */
  final case class OpenSession(start: Long, end: Long, n: Long, sum: Double)

  /** [[Ev]] plus the timestamp column the watermark rides on. */
  final case class EvT(user_id: Long, ts_us: Long, value: Double, ts: Timestamp)

  /** Batch sessionization: gap > `gapMinutes` starts a new session.
    * Classic two-window formulation — lag per user to flag session
    * starts, running sum of flags as the session index, then one
    * aggregate per (user, session). Two shuffles total (both on
    * user_id — the second reuses the first's partitioning).
    */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val byUser = Window.partitionBy("user_id").orderBy("ts_us")
    events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("value"))
      .withColumn("_new",
        when(col("ts_us") - lag(col("ts_us"), 1).over(byUser) > gapUs, 1)
          .otherwise(0))
      .withColumn("_sess", sum(col("_new")).over(byUser))
      .groupBy(col("user_id"), col("_sess"))
      .agg(
        min(col("ts_us")).as("session_start_us"),
        max(col("ts_us")).as("session_end_us"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("value_sum"))
      .drop("_sess")
  }

  /** Exact-dedup on a content fingerprint, batch form: keep the first
    * (lowest doc_id) row per fingerprint — one shuffle with map-side
    * partial min.
    */
  def dedupExactBatch(docs: DataFrame): DataFrame =
    docs.groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))

  /** Exact-dedup on a content fingerprint, streaming form: emit the
    * first arrival of each fingerprint, drop later duplicates.
    * `dropDuplicatesWithinWatermark` bounds the fingerprint state by the
    * event-time watermark — O(distinct fps within the watermark window),
    * not O(stream) — which is the only dedup state contract that
    * survives an unbounded 100 TB/day stream; duplicates farther apart
    * than the delay belong to the batch LSH/exact pipeline, not the
    * stream.
    */
  def dedupExactStream(docs: DataFrame, watermarkDelay: String = "10 minutes"): DataFrame =
    docs.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming sessionization via flatMapGroupsWithState with event-time
    * timeout: one open session per user in the state store; a session is
    * emitted when a later event arrives past the gap or when the
    * watermark passes session_end + gap. Same rows as
    * [[sessionizeBatch]] for every session the watermark has closed.
    */
  def sessionizeStream(
      spark: SparkSession,
      events: Dataset[Ev],
      gapMinutes: Int,
      watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    def close(uid: Long, s: OpenSession): Session =
      Session(uid, s.start, s.end, s.n,
        // same HALF_UP rule as Spark's round(col, 4) in the batch twin
        BigDecimal(s.sum).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)

    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", watermarkDelay)
      .as[EvT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, rows, state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(close(uid, _)).toSeq
            state.remove()
            out.iterator
          } else {
            // micro-batch rows are unordered, and a late-but-within-
            // watermark row may precede the open session's start — gap-
            // merge the open-session atom together with the sorted batch
            // rows, exactly as the batch twin's global sort would: a late
            // row within the gap extends the session backward; one more
            // than the gap earlier becomes its own (emitted) session
            // rather than being wrongly merged
            val items =
              (state.getOption.toSeq ++
                rows.map(r => OpenSession(r.ts_us, r.ts_us, 1, r.value)).toSeq)
                .sortBy(s => (s.start, s.end))
            var open: Option[OpenSession] = None
            val closed = Seq.newBuilder[Session]
            items.foreach { it =>
              open match {
                case Some(s) if it.start - s.end > gapUs =>
                  closed += close(uid, s)
                  open = Some(it)
                case Some(s) =>
                  open = Some(OpenSession(s.start,
                    math.max(s.end, it.end), s.n + it.n, s.sum + it.sum))
                case None =>
                  open = Some(it)
              }
            }
            open.foreach { s =>
              state.update(s)
              // a late-but-within-watermark event can put end+gap behind
              // the current watermark (when gap < watermark delay);
              // setTimeoutTimestamp rejects past timestamps, so clamp —
              // the session then times out on the next trigger, which is
              // exactly when it should
              state.setTimeoutTimestamp(
                math.max((s.end + gapUs) / 1000L + 1,
                  state.getCurrentWatermarkMs() + 1))
            }
            closed.result().iterator
          }
      }
  }
}
