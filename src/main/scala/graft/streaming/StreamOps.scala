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

  /** Default per-build-task candidate-row bound for the streaming
    * bounded-probe guard (see [[verifyAgainstCorpus]]'s ENFORCEMENT
    * note) — the same constant as the batch tripwire's
    * [[graft.etl.Dedup.probeBoundedMaxRows]]: ~1 GB of serialized
    * shingle-carrying rows per build task, the last size where the
    * broadcast build is unconditionally safe without a memory conf.
    */
  val defaultMaxBuildRowsPerTask: Long =
    graft.etl.Dedup.probeBoundedMaxRows.toLong

  /** Tumbling event-time window × event_type counts/sums. Works on batch
    * and streaming frames alike; streaming frames get a watermark (late
    * rows beyond `watermark` are dropped, state is bounded).
    */
  /** `windowedTypeStats` with `slide == windowDur` (tumbling); pass a
    * smaller `slide` for overlapping (sliding) windows — each event then
    * lands in `windowDur / slide` windows. State and shuffle grow by the
    * same factor; the plan shape (watermarked (window, key) hash agg
    * with partial aggregation) is identical.
    */
  def windowedTypeStats(
      events: DataFrame,
      windowDur: String,
      watermark: String = "1 hour",
      slide: Option[String] = None): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src
      .groupBy(window(col("ts"), windowDur, slide.getOrElse(windowDur)),
        col("event_type"))
      // fixed-point money rule (q38/q45): quantize each value ONCE to
      // integer 1e-4 units, sum BIGINTs (order-independent), divide once
      // — round(sum(double), 4) is engine-order-dependent at half
      // boundaries and flaked that way on the money queries
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 10000).cast("long")).as("v_e4"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n_events"), (col("v_e4").cast("double") / 10000.0).as("value_sum"))
  }

  /** Streaming near-dup probe against a PERSISTED LSH index (the t34
    * band table read from storage) — the streaming half of the managed
    * index lifecycle: docs arrive as a stream, their minhash signatures
    * are computed PER ROW (array fold, [[graft.etl.Dedup.rowSignatures]]
    * — no aggregation, so the stream holds zero shuffle state), bands
    * equi-join the static index (stream-static inner join: stateless),
    * and exact Jaccard verifies against the static corpus shingles.
    * The only state is the pair dedup (a pair can match via several
    * bands), bounded by `dropDuplicatesWithinWatermark` — the same
    * contract as [[dedupExactStream]].
    *
    * ONE definition for batch and stream: on a batch frame the watermark
    * and watermark-dedup degrade to plain `dropDuplicates`, giving the
    * oracle-checkable twin (the drop-cap probe computation,
    * [[graft.etl.Dedup.probeBandTable]] — t72's audited baseline). This
    * variant accepts hot-bucket recall loss in exchange for never
    * fanning a hot bucket out; [[nearDupSplitProbeStream]] is the
    * recall-preserving default since round 11.
    *
    * `docs` needs (doc_id, ts, sh); `indexBands` (doc_id, bidx, bh);
    * `corpusSh` (doc_id, sh). Output: (a, ts, b, jaccard).
    *
    * `probeFanoutBounded` (r16 ADVICE #1 — caller-visible since r17):
    * `true` (default) broadcasts the micro-batch candidate side of the
    * verify join — ONE hash-probe scan of the pinned corpus per
    * trigger. "Bounded" is PER BAND ROW (≤ maxBucket candidates each):
    * the total broadcast build scales with micro-batch rows × numBands
    * × maxBucket at ~1 KB/row (the shingle array rides along), and the
    * explicit hint bypasses every planner threshold — so the default
    * REQUIRES a trigger-size bound on the source
    * (`maxOffsetsPerTrigger` / `maxFilesPerTrigger`; ≲10⁵ docs/trigger
    * at the default geometry keeps the build under ~1 GB). An
    * unthrottled deployment (catch-up/backfill micro-batches of
    * arbitrary size) must pass `false` to fall back to the guarded
    * shuffle over the pinned corpus — slower per trigger, safe at any
    * batch size.
    */
  def nearDupProbeStream(
      docs: DataFrame,
      indexBands: DataFrame,
      corpusSh: DataFrame,
      k: Int = 15,
      numBands: Int = 3,
      rowsPerBand: Int = 5,
      maxBucket: Int = 20,
      threshold: Double = 0.8,
      watermarkDelay: String = "10 minutes",
      probeFanoutBounded: Boolean = true,
      maxBuildRowsPerTask: Long = defaultMaxBuildRowsPerTask): DataFrame = {
    import graft.etl.Dedup
    val src =
      if (docs.isStreaming) docs.withWatermark("ts", watermarkDelay) else docs
    val sig = Dedup.rowSignatures(src.filter(size(col("sh")) > 0), "sh", k)
    val bands = Dedup.rowBands(sig, "doc_id", numBands, rowsPerBand,
      keep = Seq("ts", "sh"))
    // hot-bucket cap on the STATIC index side only (same contract as
    // Dedup.probeBandTable). For a STREAM the capped table is pinned
    // with an eager localCheckpoint: stream-static joins re-evaluate the
    // static subtree EVERY trigger, so an un-pinned cap would re-shuffle
    // and re-window the entire index per micro-batch — per-trigger
    // static-side cost must be a plain scan of pinned data, never a
    // recomputation. (At cluster scale: persist the capped band table
    // to storage once and read that.)
    val capped = Dedup.capBands(indexBands, maxBucket)
      .select(col("doc_id").as("b"), col("bidx"), col("bh"))
    val ix = if (docs.isStreaming) capped.localCheckpoint(true) else capped
    val cands = bands.join(ix, Seq("bidx", "bh"))
      .filter(col("doc_id") =!= col("b"))
    val verified = verifyAgainstCorpus(cands, corpusSh, threshold,
      streaming = docs.isStreaming, probeFanoutBounded = probeFanoutBounded,
      maxBuildRowsPerTask = maxBuildRowsPerTask)
      .select(col("doc_id").as("a"), col("ts"), col("b"),
        col("jaccard"))
    if (docs.isStreaming) verified.dropDuplicatesWithinWatermark("a", "b")
    else verified.dropDuplicates("a", "b")
  }

  /** The corpus-shingle verify join shared by every streaming probe:
    * candidates (carrying the probe's `sh` array and the matched index
    * id `b`) pick up the corpus shingles `_shb` and an exact-Jaccard
    * score.
    *
    * Scale shape, stream mode: the corpus side is PINNED with the same
    * eager-localCheckpoint discipline as the index (a stream-static
    * join re-evaluates the static subtree EVERY trigger — un-pinned,
    * the corpus would re-shuffle and re-sort per micro-batch) and
    * carries the twilight-zone guard (shingle arrays serialize ~15-20x
    * their stats — never a stats-chosen broadcast build). When the
    * variant's per-batch fan-out is BOUNDED (capped probe: ≤ maxBucket
    * candidates per band row; split probe: ~2·maxBucket expected), the
    * micro-batch side carries an explicit broadcast hint — the
    * streaming analog of [[graft.etl.Dedup.verifyJaccard]]'s
    * `probeBounded` seam — so the verify join plans as ONE hash-probe
    * scan of the pinned corpus: no per-trigger corpus shuffle or sort,
    * per-trigger cost = corpus scan + batch-sized build. The EXACT
    * variant's fan-out is the bucket's true heat (unbounded by
    * declaration), so its candidate side must never be a broadcast
    * build either — it keeps the guarded shuffle over the pinned
    * corpus, the honest price of exactness. In batch mode the "probe"
    * IS corpus-sized, so both sides stay guarded (the t72/t32/t76
    * audited plans).
    *
    * The bounded declaration is per BAND ROW, so the broadcast build
    * still scales with trigger size (micro-batch rows × numBands ×
    * maxBucket-ish candidates, ~1 KB each) and the explicit hint
    * bypasses every planner threshold — which is why
    * `probeFanoutBounded` is a caller-visible knob on the public
    * variants (r16 ADVICE #1) with a documented trigger-size-bound
    * requirement, not a buried constant.
    *
    * ENFORCEMENT (r17 VERDICT #1 — the streaming twin of
    * [[graft.etl.Dedup.verifyJaccard]]'s `probeBounded` capped count):
    * the batch tripwire is an eager `limit(bound+1).count()` at call
    * time, which a streaming plan cannot re-run per trigger — so the
    * stream guard is IN the plan: every candidate row carries a
    * per-build-task row index ([[graft.functions.PerTaskRowIndex]] —
    * mono_id's partition-local counter without the streaming-
    * blocklisted unique-ID contract; codegen'd, zero state) and an
    * `assert_true` trips the FIRST row past `maxBuildRowsPerTask` in
    * any single build task, failing the trigger with an actionable
    * error WHILE the broadcast build is still streaming rows in —
    * before the oversized relation finishes materializing on the
    * driver. The bound is per TASK (a distributed plan has no global
    * row counter that can stop a stage mid-flight), so the admissible
    * total is `buildTasks × bound` — with the default 1M rows/task
    * (= [[graft.etl.Dedup.probeBoundedMaxRows]], ~1 GB at the ~1 KB
    * serialized row) and 32 shuffle partitions that is a hard ~32 GB
    * worst case instead of unbounded; an unthrottled catch-up trigger
    * (the real hazard: 10–1000× the contract size) concentrates
    * linearly into every task and trips immediately. The EXACT
    * per-trigger bound remains the source throttle
    * (`maxOffsetsPerTrigger` / `maxFilesPerTrigger`) — the guard
    * converts a violated throttle contract into a clean error instead
    * of an executor/driver OOM (the r17 4M-row decade needed
    * `maxResultSize=8g`, proving the build really grows with the
    * trigger). Deployments that certify a larger trigger alongside
    * their memory conf raise the bound explicitly; batch mode never
    * guards (the probe side there is corpus-sized by construction and
    * stays on the guarded-shuffle plan).
    */
  private def verifyAgainstCorpus(
      cands: DataFrame,
      corpusSh: DataFrame,
      threshold: Double,
      streaming: Boolean,
      probeFanoutBounded: Boolean,
      maxBuildRowsPerTask: Long = defaultMaxBuildRowsPerTask): DataFrame = {
    import graft.etl.Dedup.noBroadcastPairs
    require(maxBuildRowsPerTask >= 1,
      s"maxBuildRowsPerTask must be >= 1, got $maxBuildRowsPerTask")
    val corpus0 = corpusSh.select(col("doc_id").as("b"), col("sh").as("_shb"))
    val corpus = noBroadcastPairs(
      if (streaming) corpus0.localCheckpoint(true) else corpus0)
    val probeSide =
      if (streaming && probeFanoutBounded) {
        // per-task row ordinal — mono_id's counting half; the built-in
        // itself is blocklisted in streaming plans for its unique-ID
        // contract, which a threshold guard doesn't need
        val rowIdxInTask = {
          import org.apache.spark.sql.graftbridge.ColumnBridge
          ColumnBridge.column(graft.functions.PerTaskRowIndex())
        }
        val guarded = cands.filter(assert_true(
          rowIdxInTask < lit(maxBuildRowsPerTask),
          lit(s"streaming probe fan-out guard: a single micro-batch build " +
            s"task exceeded $maxBuildRowsPerTask candidate rows — the " +
            "trigger-size bound behind probeFanoutBounded=true is violated " +
            "(candidate rows serialize ~1 KB each; an unbounded build is " +
            "the broadcast twilight-zone death, " +
            "dev/scale_experiment_r15/t76_100x_skew_noconf_preguard.log). " +
            "Throttle the source (maxOffsetsPerTrigger / " +
            "maxFilesPerTrigger), raise maxBuildRowsPerTask alongside the " +
            "memory conf that certifies it, or pass " +
            "probeFanoutBounded=false for the guarded-shuffle plan.")).isNull)
        broadcast(guarded)
      } else noBroadcastPairs(cands)
    probeSide.join(corpus, Seq("b"))
      .withColumn("jaccard",
        round(graft.functions.Portable.jaccard(col("sh"), col("_shb")), 6))
      .filter(col("jaccard") >= threshold)
  }

  /** Recall-preserving streaming near-dup probe — the round-11 close of
    * the LAST drop-cap default: [[nearDupProbeStream]] caps the static
    * index at plan time (every band row of a hot bucket deleted, the
    * documented trade), but the split-probe geometry
    * ([[graft.etl.Dedup.splitProbeBandTable]], t32/t34's production
    * path) is COMPUTABLE AT PLAN TIME here too, because the index side
    * is static: hot-bucket counts and per-row index labels are derived
    * once from the full persisted band table and pinned (stream-static
    * joins re-evaluate the static subtree every trigger — the same
    * eager-checkpoint discipline as the capped variant; at cluster
    * scale, persist the labeled table to storage once and read that).
    * The STREAM side stays stateless: each probe band row joins the
    * hot table — broadcast: it holds only over-cap buckets — to pick
    * up `_n`, labels itself with the salted modulus map-side, and
    * explodes to its own + wraparound-adjacent sub-bucket key. Per
    * probe row the hot-bucket join work is bounded at ~2·maxBucket
    * expected, ZERO index rows dropped, cold buckets identical to the
    * capped probe; recall follows the [[graft.etl.Dedup]] 2/nsub-per-
    * band graceful-degradation model. Pair-dedup state is bounded by
    * the watermark, same contract as [[nearDupProbeStream]].
    *
    * ONE definition for batch and stream: on a batch frame this is
    * exactly the t32/t34 pair set (StreamingSpec pins batch ≡
    * `Dedup.splitProbeBandTable` ≡ the streamed result).
    */
  def nearDupSplitProbeStream(
      docs: DataFrame,
      indexBands: DataFrame,
      corpusSh: DataFrame,
      k: Int = 15,
      numBands: Int = 3,
      rowsPerBand: Int = 5,
      maxBucket: Int = 20,
      threshold: Double = 0.8,
      watermarkDelay: String = "10 minutes",
      // split fan-out is ~2·maxBucket expected per band row — bounded,
      // so the micro-batch side may carry the broadcast hint BY
      // DEFAULT. "Bounded" is per band row, so the total build still
      // scales with micro-batch rows × numBands × ~2·maxBucket (~1 KB
      // each): the default requires a trigger-size bound on the source
      // (maxOffsetsPerTrigger / maxFilesPerTrigger); unthrottled
      // deployments pass false for the guarded shuffle — see
      // [[nearDupProbeStream]]'s knob scaladoc (r16 ADVICE #1); the
      // bound is ENFORCED per build task at runtime, see
      // [[verifyAgainstCorpus]]'s ENFORCEMENT note
      probeFanoutBounded: Boolean = true,
      maxBuildRowsPerTask: Long = defaultMaxBuildRowsPerTask): DataFrame =
    labeledProbeStream(docs, indexBands, corpusSh, k, numBands,
      rowsPerBand, maxBucket, threshold, watermarkDelay,
      graft.etl.Dedup.splitProbeKeys(_, _, "doc_id", maxBucket,
        keep = Seq("ts", "sh")),
      probeFanoutBounded = probeFanoutBounded,
      maxBuildRowsPerTask = maxBuildRowsPerTask)

  /** Shared core of the labeled streaming probes: signatures → band
    * rows → plan-time static index labels (pinned; hot table broadcast)
    * → the variant's probe-key explosion → equi-join → two-sided
    * verify → watermark-bounded pair dedup. The probe-keys function is
    * the ONLY difference between the split and exact variants, so the
    * geometry cannot desync between them.
    */
  private def labeledProbeStream(
      docs: DataFrame,
      indexBands: DataFrame,
      corpusSh: DataFrame,
      k: Int, numBands: Int, rowsPerBand: Int, maxBucket: Int,
      threshold: Double, watermarkDelay: String,
      probeKeys: (DataFrame, DataFrame) => DataFrame,
      probeFanoutBounded: Boolean,
      maxBuildRowsPerTask: Long = defaultMaxBuildRowsPerTask): DataFrame = {
    import graft.etl.Dedup
    val src =
      if (docs.isStreaming) docs.withWatermark("ts", watermarkDelay) else docs
    val sig = Dedup.rowSignatures(src.filter(size(col("sh")) > 0), "sh", k)
    val bands = Dedup.rowBands(sig, "doc_id", numBands, rowsPerBand,
      keep = Seq("ts", "sh"))
    val hot0 = Dedup.splitHot(indexBands, maxBucket)
    val ix0 = Dedup.splitIndexLabels(indexBands, hot0, "doc_id", maxBucket)
    val (hot, ix) =
      if (docs.isStreaming) (hot0.localCheckpoint(true), ix0.localCheckpoint(true))
      else (hot0, ix0)
    val pbk = probeKeys(bands, broadcast(hot))
    val cands = pbk.join(ix, Seq("bidx", "bh", "_k"))
      .filter(col("a") =!= col("b"))
    val verified = verifyAgainstCorpus(cands, corpusSh, threshold,
      streaming = docs.isStreaming, probeFanoutBounded = probeFanoutBounded,
      maxBuildRowsPerTask = maxBuildRowsPerTask)
      .select(col("a"), col("ts"), col("b"), col("jaccard"))
    if (docs.isStreaming) verified.dropDuplicatesWithinWatermark("a", "b")
    else verified.dropDuplicates("a", "b")
  }

  /** EXACT streaming near-dup probe — the total-recall point of the
    * streaming curve, completing the batch family's three trades
    * (drop cap [[nearDupProbeStream]] / bounded split
    * [[nearDupSplitProbeStream]] / exact THIS) for the arrival shape
    * that needs it most: small compliance-critical batches
    * (dedup-before-release, takedown checks) landing as a stream.
    * Identical plan-time geometry to the split variant — static index
    * labels pin once, the hot table broadcasts — but each probe band
    * row explodes to ALL nsub sub-bucket keys
    * ([[graft.etl.Dedup.exactProbeKeys]]), so the candidate set EQUALS
    * the uncapped probe join — zero loss vs the banded join; LSH band
    * recall itself stays probabilistic as everywhere — while a hot
    * bucket still arrives as nsub distinct join keys instead of one
    * straggler. Cost per probe row is the bucket's TRUE heat (~n index
    * comparisons) — the honest price of exactness, bounded by the
    * batch being small; the stream side stays stateless and
    * watermark-bounded exactly as the split variant.
    *
    * ONE definition for batch and stream: on a batch frame this is
    * exactly the t76 pair set (StreamingSpec pins batch ≡
    * `Dedup.exactProbeBandTable` ≡ the streamed result, split ⊆ exact).
    */
  def nearDupExactProbeStream(
      docs: DataFrame,
      indexBands: DataFrame,
      corpusSh: DataFrame,
      k: Int = 15,
      numBands: Int = 3,
      rowsPerBand: Int = 5,
      maxBucket: Int = 20,
      threshold: Double = 0.8,
      watermarkDelay: String = "10 minutes"): DataFrame =
    labeledProbeStream(docs, indexBands, corpusSh, k, numBands,
      rowsPerBand, maxBucket, threshold, watermarkDelay,
      graft.etl.Dedup.exactProbeKeys(_, _, "doc_id", maxBucket,
        keep = Seq("ts", "sh")),
      // exact fan-out is the bucket's TRUE heat — unbounded by
      // declaration, so its candidate side must never be a broadcast
      // build; it keeps the guarded shuffle over the pinned corpus
      probeFanoutBounded = false)

  /** Native engine-merged session windows (`session_window(ts, gap)`) —
    * ONE definition for batch (q45's oracle-checked form) and streaming
    * input, where the watermark makes it THE bounded-state
    * sessionization (state = open sessions inside the watermark window).
    * Boundary rule: new session at diff >= gap. value_sum follows the
    * fixed-point money rule — quantize once to 1e-4 units, sum BIGINTs,
    * divide once (order-independent, engine-exact).
    */
  def sessionWindowNative(
      events: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame = {
    val src =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 10000).cast("long")).as("v_e4"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("n_events"),
        (col("v_e4").cast("double") / 10000.0).as("value_sum"))
  }

  /** Stream-static enrichment join: attach each event's customer nation.
    * The dimension sides are broadcast — the event side (batch or
    * unbounded stream) is never shuffled, which is the only join shape
    * that survives a 100 TB/day stream (a stream-stream join here would
    * hold unbounded state for no reason: the dimensions are bounded).
    * Works identically on a batch or streaming `events` frame;
    * stream-static broadcast joins need no watermark or state store.
    */
  def enrichEvents(
      events: DataFrame,
      customers: DataFrame,
      nations: DataFrame): DataFrame =
    events
      .join(broadcast(customers.select(col("c_custkey"), col("c_nationkey"))),
        col("user_id") === col("c_custkey"))
      .join(broadcast(nations.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .drop("c_custkey", "c_nationkey", "n_nationkey")

  /** Stream-stream interval join: attribute each purchase to the same
    * user's preceding views within `horizon` (view ≤ purchase < view +
    * horizon). ONE definition serves batch and streaming frames: batch
    * sides join directly; streaming sides get watermarks, and the
    * event-time range condition is what lets Spark bound the join state
    * — each side's buffered rows expire `watermark + horizon` behind the
    * clock, so state is O(rate × horizon), independent of stream length.
    * This is the join shape (equi-key + time bound) that survives an
    * unbounded stream; an unconstrained stream-stream join would buffer
    * forever.
    */
  /** `joinType`: "inner" (attributed pairs only) or "right_outer"
    * (EVERY purchase preserved — unmatched ones carry null view columns;
    * on a stream the outer rows emit once the watermark proves no
    * in-horizon view can still arrive, which is exactly the
    * "conversion without impression" audit feed).
    */
  def attributePurchases(
      views: DataFrame,
      purchases: DataFrame,
      horizon: String = "6 hours",
      watermark: String = "1 hour",
      joinType: String = "inner"): DataFrame = {
    val v0 = views.select(col("user_id"), col("event_id").as("view_id"),
      col("ts").as("view_ts"))
    val p0 = purchases.select(col("user_id").as("p_uid"),
      col("event_id").as("purchase_id"), col("ts").as("purchase_ts"),
      col("value"))
    val v = if (v0.isStreaming) v0.withWatermark("view_ts", watermark) else v0
    val p = if (p0.isStreaming) p0.withWatermark("purchase_ts", watermark) else p0
    v.join(p,
      col("user_id") === col("p_uid") &&
        col("purchase_ts") >= col("view_ts") &&
        col("purchase_ts") < col("view_ts") + expr(s"INTERVAL $horizon"),
      joinType)
      .select(coalesce(col("user_id"), col("p_uid")).as("user_id"),
        col("purchase_id"), col("purchase_ts"),
        col("view_id"), col("view_ts"), col("value"))
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
  final case class OpenSession(start: Long, end: Long, n: Long, sumE4: Long)

  /** [[Ev]] plus the timestamp column the watermark rides on. */
  final case class EvT(user_id: Long, ts_us: Long, value: Double, ts: Timestamp)

  /** One event in a user's transition chain (public: Spark's codegen
    * instantiates encoder projections for it).
    */
  final case class PendEv(ts_us: Long, event_id: Long, event_type: String)

  /** Transition state: the last watermark-closed event (the boundary a
    * future event will pair with) + the not-yet-closed buffer.
    */
  final case class TransState(last: Option[PendEv], buf: List[PendEv])

  /** Input row for [[transitionsStream]]. */
  final case class TransEv(user_id: Long, ts_us: Long, event_id: Long,
                           event_type: String, ts: Timestamp)

  final case class Transition(user_id: Long, from_ts_us: Long,
                              from_type: String, to_type: String)

  /** Per-user consecutive-event transitions, batch form: one lead()
    * window partitioned by user (ties pinned by event_id). The q56
    * transition matrix is this frame grouped by (from, to).
    */
  def transitionsBatch(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    events
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .select(col("user_id"), col("ts_us").as("from_ts_us"),
        col("event_type").as("from_type"), col("next_type").as("to_type"))
  }

  /** Streaming twin of [[transitionsBatch]]: a transition can only be
    * emitted once no future arrival can land BETWEEN its endpoints, so
    * events buffer per user until the watermark passes them; each
    * trigger sorts the closed prefix into the chain and emits its
    * pairs. The last closed event stays in state as the boundary — its
    * outgoing transition is emitted when its successor closes. State is
    * O(events inside the watermark window) per user + one boundary row;
    * emission is append-only and row-identical to the batch twin once
    * the watermark passes the data (StreamingSpec proves it).
    */
  def transitionsStream(
      spark: SparkSession,
      events: Dataset[TransEv],
      watermarkDelay: String = "10 minutes"): Dataset[Transition] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TransState, Transition](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, rows, state: GroupState[TransState]) =>
          val st = state.getOption.getOrElse(TransState(None, Nil))
          val buf = st.buf ++
            rows.map(r => PendEv(r.ts_us, r.event_id, r.event_type))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // an event strictly before the watermark can never gain a new
          // predecessor or in-between arrival — its chain position is
          // final (micro-batch rows are unordered: sort before closing)
          val (ripe, open) = buf.sortBy(e => (e.ts_us, e.event_id))
            .partition(_.ts_us < wmUs)
          val chain = st.last.toList ++ ripe
          val out = chain.zip(chain.drop(1)).map { case (a, b) =>
            Transition(uid, a.ts_us, a.event_type, b.event_type)
          }
          state.update(TransState(chain.lastOption.orElse(st.last), open))
          if (open.nonEmpty)
            // flush the buffer on the next watermark advance (a past
            // timestamp is rejected, so clamp just above the watermark)
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
          out.iterator
      }
  }

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
        // fixed-point money rule (q38/q45): per-row 1e-4-unit BIGINTs,
        // order-independent sum, one divide at the end
        sum(round(col("value") * 10000).cast("long")).as("_v_e4"))
      .select(col("user_id"), col("session_start_us"),
        col("session_end_us"), col("n_events"),
        (col("_v_e4").cast("double") / 10000.0).as("value_sum"))
  }

  /** Exact-dedup on a content fingerprint, batch form: keep the whole
    * lowest-doc_id row per fingerprint — one shuffle with map-side
    * partial min (`min(struct(doc_id, rest*))` compares doc_id first, so
    * the struct-min IS the min-doc_id row).
    *
    * Schema-compatible with [[dedupExactStream]] (same columns out as
    * in); the two are row-identical when arrival order in the stream
    * matches doc_id order — the batch form pins "first" to min(doc_id)
    * because a batch has no arrival order.
    */
  def dedupExactBatch(docs: DataFrame): DataFrame = {
    val rest = docs.columns.filter(_ != "doc_id").filter(_ != "fp")
    val packed = struct((col("doc_id") +: rest.map(col)): _*)
    docs.groupBy(col("fp")).agg(min(packed).as("_first"))
      .select(col("_first.doc_id") +: rest.map(c => col(s"_first.$c")) :+ col("fp"): _*)
      .select(docs.columns.map(col): _*) // original column order
  }

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

  /** Distinct users per tumbling event-time window, batch form: window
    * the events, de-dup (window, user), count per window — countDistinct
    * expressed as dedup + count so the STREAMING twin below is the same
    * two operators chained.
    */
  def distinctUsersBatch(events: DataFrame, windowDur: String): DataFrame =
    events.select(window(col("ts"), windowDur).as("w"), col("user_id"))
      .distinct()
      .groupBy(col("w")).agg(count(lit(1)).as("n_users"))
      .select(col("w.start").as("w_start"), col("n_users"))

  /** Streaming twin: CHAINED stateful operators — dropDuplicates keyed
    * on (window, user) feeding a windowed count in append mode. The
    * dedup key embeds the event-time window, so its state expires with
    * the watermark (O(active users per open window), not O(stream)),
    * and the downstream count emits once per window when the watermark
    * closes it — the exact-distinct streaming shape; at higher
    * cardinalities the mergeable-HLL panel (q59) replaces the dedup.
    */
  def distinctUsersStream(
      events: DataFrame,
      windowDur: String,
      watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .select(window(col("ts"), windowDur).as("w"), col("user_id"))
      .dropDuplicates("w", "user_id")
      .groupBy(col("w")).agg(count(lit(1)).as("n_users"))
      .select(col("w.start").as("w_start"), col("n_users"))

  /** All of one user's not-yet-watermark-closed sessions (public: Spark's
    * codegen instantiates encoder projections for it).
    */
  final case class SessionBuf(items: List[OpenSession])

  /** Streaming sessionization via flatMapGroupsWithState with event-time
    * timeout. Row-identical to [[sessionizeBatch]] for every session the
    * watermark has closed — which requires emitting ONLY on the
    * watermark, never on a later-event gap: a session gap-closed by a
    * later event in the same batch may still be extended or split by a
    * late-but-within-watermark event in a LATER batch (when the gap is
    * shorter than the watermark delay), so gap-closed sessions stay in
    * state until `end + gap` falls behind the watermark. Emission rule ⇒
    * parity: an emitted session has `end + gap < watermark ≤ any future
    * event's ts`, so no admissible event can ever merge into it.
    *
    * State is O(sessions inside the watermark window) per user — bounded
    * by `watermarkDelay / gap` sessions, each O(1).
    */
  def sessionizeStream(
      spark: SparkSession,
      events: Dataset[Ev],
      gapMinutes: Int,
      watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    def close(uid: Long, s: OpenSession): Session =
      // state holds 1e-4-unit BIGINTs (the q38/q45 fixed-point money
      // rule) — integer addition is associative, so the stream's
      // session-merge order and the batch twin's shuffle order produce
      // the SAME value_sum bit-for-bit, with one divide at emission
      Session(uid, s.start, s.end, s.n, s.sumE4.toDouble / 10000.0)

    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", watermarkDelay)
      .as[EvT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionBuf, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, rows, state: GroupState[SessionBuf]) =>
          // one code path for data and timeout triggers: gap-merge the
          // held sessions with any new rows (micro-batch rows are
          // unordered and may precede held sessions — the sort makes the
          // merge identical to the batch twin's global order), then emit
          // exactly the sessions the watermark has closed
          val held = state.getOption.map(_.items).getOrElse(Nil)
          val atoms = (held ++
            // same per-row quantization as the batch twin's
            // round(value * 10000): HALF_UP on the double's canonical
            // decimal rendering (Spark Round = BigDecimal.valueOf)
            rows.map(r => OpenSession(r.ts_us, r.ts_us, 1,
              BigDecimal(r.value * 10000)
                .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)))
            .sortBy(s => (s.start, s.end))
          val merged = atoms.foldLeft(List.empty[OpenSession]) {
            case (h :: t, it) if it.start - h.end <= gapUs =>
              OpenSession(h.start, math.max(h.end, it.end),
                h.n + it.n, h.sumE4 + it.sumE4) :: t
            case (acc, it) => it :: acc
          }.reverse
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (ripe, open) = merged.partition(s => s.end + gapUs < wmUs)
          if (open.nonEmpty) {
            state.update(SessionBuf(open))
            // setTimeoutTimestamp rejects past timestamps, so clamp to
            // just above the watermark; the group then times out on the
            // next watermark advance, which is exactly when it should
            state.setTimeoutTimestamp(
              math.max(open.map(s => (s.end + gapUs) / 1000L).min + 1,
                state.getCurrentWatermarkMs() + 1))
          } else state.remove()
          ripe.map(close(uid, _)).iterator
      }
  }
}
