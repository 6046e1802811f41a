package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamOps
import graft.streaming.StreamOps.{Ev, Session}

/** Structured-Streaming ↔ batch parity for the StreamOps operators, via
  * MemoryStream micro-batches.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val US = 1000000L
  private val MIN = 60L * US

  /** Deterministic little event log: 3 users, gaps around the 30-min
    * session threshold, values with 2 decimals.
    */
  private def events: Seq[Ev] = {
    val base = 1700000000L * US
    Seq(
      // user 1: two sessions (40-min gap between event 2 and 3)
      Ev(1, base, 1.25), Ev(1, base + 10 * MIN, 2.5), Ev(1, base + 50 * MIN, 4.0),
      Ev(1, base + 55 * MIN, 0.75),
      // user 2: one session, events fed out of order across batches
      Ev(2, base + 5 * MIN, 10.0), Ev(2, base + 25 * MIN, 20.0),
      // user 3: single-event session
      Ev(3, base + 3 * MIN, 7.77))
  }

  test("sessionizeStream emits exactly the batch sessions once closed") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val sessions = StreamOps.sessionizeStream(spark, input.toDS(), gapMinutes = 30)
    val ckpt = Files.createTempDirectory("ckpt").toString
    val q = sessions.writeStream
      .format("memory").queryName("sess_out")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      val evs = events
      // batch 1: the early events, deliberately out of order inside the
      // batch (order within a micro-batch must not matter); batch 2: the
      // later events — all newer than batch 1's watermark, so nothing is
      // dropped as late
      input.addData(evs(4), evs(6), evs(0), evs(1))
      q.processAllAvailable()
      input.addData(evs(5), evs(2), evs(3))
      q.processAllAvailable()
      // sentinel far in the future pushes the watermark past every
      // session's end + gap → all real sessions time out and emit
      input.addData(Ev(99, evs.map(_.ts_us).max + 1000 * MIN, 0.0))
      q.processAllAvailable()

      val streamed = spark.table("sess_out").as[Session].collect()
        .filter(_.user_id != 99).sortBy(s => (s.user_id, s.session_start_us))
      val batch = StreamOps.sessionizeBatch(
        events.toDF("user_id", "ts_us", "value")
          .select(col("user_id"), timestamp_micros(col("ts_us")).as("ts"), col("value")),
        gapMinutes = 30)
        .as[Session].collect().sortBy(s => (s.user_id, s.session_start_us))

      assert(batch.length == 4) // u1 × 2, u2 × 1, u3 × 1
      assert(streamed.map(s => (s.user_id, s.session_start_us, s.session_end_us, s.n_events)).toSeq ==
        batch.map(s => (s.user_id, s.session_start_us, s.session_end_us, s.n_events)).toSeq)
      // sums: same values, tolerance for addition-order difference
      streamed.zip(batch).foreach { case (a, b) =>
        assert(math.abs(a.value_sum - b.value_sum) < 1e-9, s"$a vs $b")
      }
    } finally q.stop()
  }

  test("late-but-within-watermark event extends the open session backward") {
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000L * US
    val input = MemoryStream[Ev]
    val sessions = StreamOps.sessionizeStream(spark, input.toDS(),
      gapMinutes = 30, watermarkDelay = "10 minutes")
    val ckpt = Files.createTempDirectory("ckpt3").toString
    val q = sessions.writeStream
      .format("memory").queryName("sess_back")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      input.addData(Ev(7, base + 20 * MIN, 1.0)) // opens session at +20
      q.processAllAvailable() // watermark → +10min
      input.addData(Ev(7, base + 15 * MIN, 2.0)) // late (≥ wm), before start
      q.processAllAvailable()
      input.addData(Ev(99, base + 1000 * MIN, 0.0)) // flush
      q.processAllAvailable()
      val s = spark.table("sess_back").as[Session].collect()
        .filter(_.user_id == 7)
      assert(s.length == 1)
      assert(s(0).session_start_us == base + 15 * MIN) // extended backward
      assert(s(0).session_end_us == base + 20 * MIN && s(0).n_events == 2)
    } finally q.stop()
  }

  test("late event more than the gap BEFORE the open session splits off") {
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000L * US
    val input = MemoryStream[Ev]
    // gap (5 min) < watermark delay (60 min): a late row can precede the
    // open session's start by more than the gap — batch would emit it as
    // its own session, so the stream must too (not merge it backward)
    val sessions = StreamOps.sessionizeStream(spark, input.toDS(),
      gapMinutes = 5, watermarkDelay = "60 minutes")
    val ckpt = Files.createTempDirectory("ckpt4").toString
    val q = sessions.writeStream
      .format("memory").queryName("sess_split")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      input.addData(Ev(8, base + 40 * MIN, 1.0)) // opens session at +40
      q.processAllAvailable()
      // late but within watermark; 30 min before the open start ≫ gap
      input.addData(Ev(8, base + 10 * MIN, 2.0))
      q.processAllAvailable()
      input.addData(Ev(99, base + 1000 * MIN, 0.0)) // flush
      q.processAllAvailable()
      val s = spark.table("sess_split").as[Session].collect()
        .filter(_.user_id == 8).sortBy(_.session_start_us)
      assert(s.length == 2, s"expected a split, got ${s.toSeq}")
      assert(s(0).session_start_us == base + 10 * MIN && s(0).n_events == 1)
      assert(s(1).session_start_us == base + 40 * MIN && s(1).n_events == 1)
      // identical to the batch twin on the same rows
      val batch = StreamOps.sessionizeBatch(
        Seq((8L, base + 40 * MIN, 1.0), (8L, base + 10 * MIN, 2.0))
          .toDF("user_id", "ts_us", "value")
          .select(col("user_id"), timestamp_micros(col("ts_us")).as("ts"), col("value")),
        gapMinutes = 5).as[Session].collect().sortBy(_.session_start_us)
      assert(s.map(x => (x.session_start_us, x.session_end_us, x.n_events)).toSeq ==
        batch.map(x => (x.session_start_us, x.session_end_us, x.n_events)).toSeq)
    } finally q.stop()
  }

  test("late event merges into a session another event had already gap-closed") {
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000L * US
    val input = MemoryStream[Ev]
    // gap (5 min) ≪ watermark delay (60 min): batch 1's +10 event
    // gap-closes [+0]; the late +4 event must STILL merge into it —
    // emitting on the gap instead of the watermark would split it
    val sessions = StreamOps.sessionizeStream(spark, input.toDS(),
      gapMinutes = 5, watermarkDelay = "60 minutes")
    val ckpt = Files.createTempDirectory("ckpt6").toString
    val q = sessions.writeStream
      .format("memory").queryName("sess_lateMerge")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      input.addData(Ev(9, base, 1.0), Ev(9, base + 10 * MIN, 2.0))
      q.processAllAvailable()
      input.addData(Ev(9, base + 4 * MIN, 4.0)) // late, within watermark
      q.processAllAvailable()
      input.addData(Ev(99, base + 1000 * MIN, 0.0)) // flush
      q.processAllAvailable()
      val s = spark.table("sess_lateMerge").as[Session].collect()
        .filter(_.user_id == 9).sortBy(_.session_start_us)
      val batch = StreamOps.sessionizeBatch(
        Seq((9L, base, 1.0), (9L, base + 10 * MIN, 2.0), (9L, base + 4 * MIN, 4.0))
          .toDF("user_id", "ts_us", "value")
          .select(col("user_id"), timestamp_micros(col("ts_us")).as("ts"), col("value")),
        gapMinutes = 5).as[Session].collect().sortBy(_.session_start_us)
      assert(batch.map(b => (b.session_start_us, b.session_end_us, b.n_events)).toSeq ==
        Seq((base, base + 4 * MIN, 2L), (base + 10 * MIN, base + 10 * MIN, 1L)))
      assert(s.map(x => (x.session_start_us, x.session_end_us, x.n_events, x.value_sum)).toSeq ==
        batch.map(x => (x.session_start_us, x.session_end_us, x.n_events, x.value_sum)).toSeq)
    } finally q.stop()
  }

  test("sessionWindowNative: q45's native session_window streams ≡ batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    def asTs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("user_id"), timestamp_micros(col("ts_us")).as("ts"),
        col("value"))
    val sessions = StreamOps.sessionWindowNative(asTs(input.toDF()))
    val ckpt = Files.createTempDirectory("ckpt8").toString
    val q = sessions.writeStream
      .format("memory").queryName("sessnat_out")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      val evs = events
      // two micro-batches, out of order within each; then a watermark
      // sentinel so every session closes and emits (append mode)
      input.addData(evs(4), evs(6), evs(0), evs(1))
      q.processAllAvailable()
      input.addData(evs(5), evs(2), evs(3))
      q.processAllAvailable()
      input.addData(Ev(99, evs.map(_.ts_us).max + 1000 * MIN, 0.0))
      q.processAllAvailable()

      def canon(df: org.apache.spark.sql.DataFrame) = df
        .filter(col("user_id") =!= 99)
        .select(col("user_id"), col("session_start_us"),
          col("session_end_us"), col("n_events"), col("value_sum"))
        .as[(Long, Long, Long, Long, Double)].collect().sorted.toSeq

      val streamed = canon(spark.table("sessnat_out"))
      val batch = canon(StreamOps.sessionWindowNative(
        asTs(events.toDF("user_id", "ts_us", "value"))))
      // same session structure as the custom sessionizer fixture: u1 × 2
      // (40-min gap ≥ 30-min gap splits), u2 × 1, u3 × 1
      assert(batch.length == 4)
      assert(streamed == batch)
    } finally q.stop()
  }

  test("dedupExactStream keeps the first arrival per fingerprint (≡ batch)") {
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000L * US
    // (doc_id, fp, ts): fp A duplicated across batches within the
    // watermark, fp B duplicated inside one batch, fp C unique
    val input = MemoryStream[(Long, String, Long)]
    val docs = input.toDS().toDF("doc_id", "fp", "us")
      .select(col("doc_id"), col("fp"), timestamp_micros(col("us")).as("ts"))
    val ckpt = Files.createTempDirectory("ckpt5").toString
    val q = StreamOps.dedupExactStream(docs, watermarkDelay = "10 minutes")
      .writeStream
      .format("memory").queryName("dedup_out")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      input.addData((1L, "A", base), (2L, "B", base + MIN), (3L, "B", base + 2 * MIN))
      q.processAllAvailable()
      input.addData((4L, "A", base + 3 * MIN), (5L, "C", base + 4 * MIN))
      q.processAllAvailable()
      val streamed = spark.table("dedup_out")
        .select("doc_id", "fp").collect()
        .map(r => (r.getLong(0), r.getString(1))).sortBy(_._2)
      // first arrival per fp = lowest doc_id here (fed in id order) —
      // exactly the batch twin's min-doc_id row per fp
      val batchIn = Seq(
        (1L, "A", "k1"), (2L, "B", "k2"), (3L, "B", "k3"),
        (4L, "A", "k4"), (5L, "C", "k5"))
        .toDF("doc_id", "fp", "payload")
      val batchFull = StreamOps.dedupExactBatch(batchIn)
      // schema parity with the stream form: same columns out as in
      assert(batchFull.columns.toSeq == batchIn.columns.toSeq)
      // the WHOLE winning row survives, not just (fp, doc_id)
      assert(batchFull.orderBy("fp").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2))).toSeq ==
        Seq((1L, "A", "k1"), (2L, "B", "k2"), (5L, "C", "k5")))
      val batch = batchFull
        .select("doc_id", "fp").collect()
        .map(r => (r.getLong(0), r.getString(1))).sortBy(_._2)
      assert(streamed.toSeq == Seq((1L, "A"), (2L, "B"), (5L, "C")))
      assert(streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("windowedTypeStats: streaming result equals the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000L * US
    val rows = Seq(
      (0L, "a", 1.0), (10L, "a", 2.0), (20L, "b", 3.0), // window 0
      (70L, "a", 5.0), (80L, "b", 6.0)) // window 1 (1-min windows)
      .map { case (m, t, v) => (base + m * MIN / 60, t, v) }
    def asDf(s: Seq[(Long, String, Double)]) =
      s.toDF("us", "event_type", "value")
        .select(timestamp_micros(col("us")).as("ts"), col("event_type"), col("value"))

    val input = MemoryStream[(Long, String, Double)]
    val streamDf = StreamOps.windowedTypeStats(
      input.toDS().toDF("us", "event_type", "value")
        .select(timestamp_micros(col("us")).as("ts"), col("event_type"), col("value")),
      "1 minute", watermark = "1 minute")
    val ckpt = Files.createTempDirectory("ckpt2").toString
    val q = streamDf.writeStream
      .format("memory").queryName("win_out")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      // watermark mover: closes both windows
      input.addData((base + 1000 * MIN, "z", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("win_out")
        .filter(col("event_type") =!= "z")
        .orderBy("w_start", "event_type")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      val batch = StreamOps.windowedTypeStats(asDf(rows), "1 minute")
        .orderBy("w_start", "event_type")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(batch.nonEmpty && streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("windowedTypeStats with slide: sliding windows match batch, 2 per event") {
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000L * US
    val rows = Seq(
      (0L, "a", 1.0), (30L, "a", 2.0), (70L, "b", 3.0), (100L, "a", 4.0))
      .map { case (sec, t, v) => (base + sec * US, t, v) }
    def asDf(s: Seq[(Long, String, Double)]) =
      s.toDF("us", "event_type", "value")
        .select(timestamp_micros(col("us")).as("ts"), col("event_type"), col("value"))

    val input = MemoryStream[(Long, String, Double)]
    val streamDf = StreamOps.windowedTypeStats(
      input.toDS().toDF("us", "event_type", "value")
        .select(timestamp_micros(col("us")).as("ts"), col("event_type"), col("value")),
      "2 minutes", watermark = "1 minute", slide = Some("1 minute"))
    val ckpt = Files.createTempDirectory("ckpt4").toString
    val q = streamDf.writeStream
      .format("memory").queryName("slide_out")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      input.addData((base + 1000 * MIN, "z", 0.0))
      q.processAllAvailable()
      def canon(df: org.apache.spark.sql.DataFrame) = df
        .filter(col("event_type") =!= "z")
        .orderBy("w_start", "event_type")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      val streamed = canon(spark.table("slide_out"))
      val batch = canon(StreamOps.windowedTypeStats(asDf(rows), "2 minutes",
        slide = Some("1 minute")))
      assert(streamed.toSeq == batch.toSeq)
      // every event is counted in exactly window/slide = 2 windows
      assert(batch.map(_._3).sum == 2L * rows.length)
    } finally q.stop()
  }

  test("attributePurchases: stream-stream interval join matches batch") {
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000L * US
    // (event_id, user_id, minutes-offset, value); horizon is 6h = 360 min
    val views = Seq(
      (100L, 1L, 0L, 0.0), (101L, 1L, 60L, 0.0), // both attribute p200
      (102L, 2L, 10L, 0.0),                      // p201 at +500 > horizon
      (103L, 3L, 0L, 0.0))                       // attributes p202
    val purchases = Seq(
      (200L, 1L, 90L, 5.5), (201L, 2L, 500L, 9.99), (202L, 3L, 30L, 1.0))
    def mk(s: Seq[(Long, Long, Long, Double)]) =
      s.toDF("event_id", "user_id", "m", "value")
        .select(col("event_id"), col("user_id"),
          timestamp_micros(lit(base) + col("m") * MIN).as("ts"), col("value"))

    val vIn = MemoryStream[(Long, Long, Long, Double)]
    val pIn = MemoryStream[(Long, Long, Long, Double)]
    def asStream(in: MemoryStream[(Long, Long, Long, Double)]) =
      mk0(in.toDS().toDF("event_id", "user_id", "m", "value"))
    def mk0(df: org.apache.spark.sql.DataFrame) =
      df.select(col("event_id"), col("user_id"),
        timestamp_micros(lit(base) + col("m") * MIN).as("ts"), col("value"))

    val joined = StreamOps.attributePurchases(asStream(vIn), asStream(pIn))
    val ckpt = Files.createTempDirectory("ckpt5").toString
    val q = joined.writeStream
      .format("memory").queryName("attr_out")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      // out-of-order across micro-batches, inside the 1h watermark slack:
      // view 101 (+60min) arrives AFTER purchase 200 (+90min) was already
      // processed — the join must buffer the purchase and match the
      // late-but-admissible view. (A view older than the watermark would
      // be dropped: that's the state bound, tested by construction here
      // since batch 1's view max is +0 ⇒ watermark stays behind +60.)
      vIn.addData(views(0), views(3))
      pIn.addData(purchases(0))
      q.processAllAvailable()
      vIn.addData(views(1), views(2))
      pIn.addData(purchases(1), purchases(2))
      q.processAllAvailable()

      def canon(df: org.apache.spark.sql.DataFrame) =
        df.select(col("purchase_id"), col("view_id"), col("value"))
          .as[(Long, Long, Double)].collect().sorted.toSeq

      val streamed = canon(spark.table("attr_out"))
      val batch = canon(StreamOps.attributePurchases(mk(views), mk(purchases)))
      assert(batch == Seq((200L, 100L, 5.5), (200L, 101L, 5.5), (202L, 103L, 1.0)))
      assert(streamed == batch)
    } finally q.stop()
  }

  test("attributePurchases right_outer: unmatched purchases emit after the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000L * US
    val views = Seq((100L, 1L, 0L, 0.0), (103L, 3L, 0L, 0.0))
    // user 2's purchase has no view at all; user 1's and 3's match
    val purchases = Seq(
      (200L, 1L, 90L, 5.5), (201L, 2L, 100L, 9.99), (202L, 3L, 30L, 1.0))
    def mk0(df: org.apache.spark.sql.DataFrame) =
      df.select(col("event_id"), col("user_id"),
        timestamp_micros(lit(base) + col("m") * MIN).as("ts"), col("value"))
    def mk(s: Seq[(Long, Long, Long, Double)]) =
      mk0(s.toDF("event_id", "user_id", "m", "value"))

    val vIn = MemoryStream[(Long, Long, Long, Double)]
    val pIn = MemoryStream[(Long, Long, Long, Double)]
    def asStream(in: MemoryStream[(Long, Long, Long, Double)]) =
      mk0(in.toDS().toDF("event_id", "user_id", "m", "value"))

    val joined = StreamOps.attributePurchases(
      asStream(vIn), asStream(pIn), joinType = "right_outer")
    val ckpt = Files.createTempDirectory("ckpt7").toString
    val q = joined.writeStream
      .format("memory").queryName("attr_outer_out")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      vIn.addData(views: _*)
      pIn.addData(purchases: _*)
      q.processAllAvailable()
      // outer rows need the watermark to prove no view can still match:
      // push both streams' event time far past purchase+horizon
      vIn.addData((999L, 99L, 100000L, 0.0))
      pIn.addData((998L, 99L, 100000L, 0.0))
      q.processAllAvailable()

      def canon(df: org.apache.spark.sql.DataFrame) =
        df.filter(col("user_id") =!= 99)
          .select(col("purchase_id"),
            coalesce(col("view_id"), lit(-1L)).as("vid"), col("value"))
          .as[(Long, Long, Double)].collect().sorted.toSeq

      val streamed = canon(spark.table("attr_outer_out"))
      val batch = canon(StreamOps.attributePurchases(
        mk(views), mk(purchases), joinType = "right_outer"))
      assert(batch == Seq((200L, 100L, 5.5), (201L, -1L, 9.99), (202L, 103L, 1.0)))
      assert(streamed == batch)
    } finally q.stop()
  }

  test("nearDupProbeStream: streaming probe of a persisted-style LSH index ≡ batch") {
    implicit val sqlCtx = spark.sqlContext
    import graft.etl.{Dedup, TextAnalysis => TA}
    import graft.functions.Portable
    val base = 1700000000L * US

    // corpus: 6 docs, two of which (20, 21) are exact texts of (10, 11)
    val corpusRows = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again"),
      (11L, "pack my box with five dozen liquor jugs every single day"),
      (12L, "how vexingly quick daft zebras jump around the tall fence"),
      (13L, "sphinx of black quartz judge my vow before the night ends"),
      (20L, "the quick brown fox jumps over the lazy dog again and again"),
      (21L, "pack my box with five dozen liquor jugs every single day"))
    def shingled(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("_toks", TA.tokens(col("text")))
      .select(col("doc_id"), Portable.tokenShingles(col("_toks"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val corpusSh = shingled(corpusRows.toDF("doc_id", "text"))
    val indexBands = Dedup.bandTable(
      Dedup.minhashSignatures(corpusSh, "doc_id", "sh", 15),
      "doc_id", numBands = 3, rowsPerBand = 5)

    // probe batch: replay docs 10 and 12 under shifted ids
    val probeRows = Seq(
      (910L, base, "the quick brown fox jumps over the lazy dog again and again"),
      (912L, base + MIN, "how vexingly quick daft zebras jump around the tall fence"))
    def probeSh(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("_toks", TA.tokens(col("text")))
      .select(col("doc_id"), col("ts"),
        Portable.tokenShingles(col("_toks"), 3).as("sh"))
      .filter(size(col("sh")) > 0)

    val input = MemoryStream[(Long, Long, String)]
    val streamDocs = probeSh(input.toDS().toDF("doc_id", "us", "text")
      .select(col("doc_id"), timestamp_micros(col("us")).as("ts"), col("text")))
    val out = StreamOps.nearDupProbeStream(streamDocs, indexBands, corpusSh)
    val ckpt = Files.createTempDirectory("ckpt9").toString
    val q = out.writeStream
      .format("memory").queryName("neardup_probe_out")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      input.addData(probeRows: _*)
      q.processAllAvailable()

      def canon(df: org.apache.spark.sql.DataFrame) =
        df.select(col("a"), col("b"), col("jaccard"))
          .as[(Long, Long, Double)].collect().sorted.toSeq

      val streamed = canon(spark.table("neardup_probe_out"))
      val batchDocs = probeSh(probeRows.toDF("doc_id", "us", "text")
        .select(col("doc_id"), timestamp_micros(col("us")).as("ts"), col("text")))
      val batch = canon(StreamOps.nearDupProbeStream(batchDocs, indexBands, corpusSh))
      // each probe finds its original AND the original's exact dup
      assert(batch.toSet == Set(
        (910L, 10L, 1.0), (910L, 20L, 1.0), (912L, 12L, 1.0)))
      assert(streamed == batch)

      // and the batch twin matches the t34-style probeBandTable path
      val sigPb = Dedup.minhashSignatures(
        batchDocs.select(col("doc_id"), col("sh")), "doc_id", "sh", 15)
      val cand = Dedup.probeBandTable(sigPb, indexBands, "doc_id",
        numBands = 3, rowsPerBand = 5, maxBucket = 20)
      val viaBatchApi = Dedup.verifyJaccard(
        batchDocs.select(col("doc_id"), col("sh")), corpusSh,
        "doc_id", "sh", cand, 0.8)
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
        .as[(Long, Long, Double)].collect().sorted.toSeq
      assert(viaBatchApi == batch)
    } finally q.stop()
  }

  test("nearDupSplitProbeStream: hot index bucket — capped stream misses, " +
    "split stream hits; streamed ≡ batch ≡ splitProbeBandTable") {
    implicit val sqlCtx = spark.sqlContext
    import graft.etl.Dedup
    val base = 1700000000L * US
    val mb = 5

    // corpus: 8 identical boilerplate docs (one hot bucket per band,
    // over the cap of 5) + 3 distinct docs
    val hotSh = Seq("b_a", "b_b", "b_c", "b_d")
    val corpusSh = ((1L to 8L).map(id => (id, hotSh)) ++ Seq(
      (20L, Seq("u20_a", "u20_b", "u20_c", "u20_d")),
      (21L, Seq("u21_a", "u21_b", "u21_c", "u21_d")),
      (22L, Seq("u22_a", "u22_b", "u22_c", "u22_d"))))
      .toDF("doc_id", "sh")
    val indexBands = Dedup.bandTable(
      Dedup.minhashSignatures(corpusSh, "doc_id", "sh", 15),
      "doc_id", numBands = 3, rowsPerBand = 5)

    // probes: a replay of a hot doc (its only matches live in the hot
    // bucket) and a replay of a cold doc
    val probeRows = Seq((901L, base, hotSh),
      (920L, base + MIN, Seq("u20_a", "u20_b", "u20_c", "u20_d")))
    def probeDf(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), timestamp_micros(col("us")).as("ts"), col("sh"))

    val input = MemoryStream[(Long, Long, Seq[String])]
    val streamDocs = probeDf(input.toDS().toDF("doc_id", "us", "sh"))
    val out = StreamOps.nearDupSplitProbeStream(streamDocs, indexBands,
      corpusSh, maxBucket = mb)
    val ckpt = Files.createTempDirectory("ckpt10").toString
    val q = out.writeStream
      .format("memory").queryName("neardup_split_probe_out")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      input.addData(probeRows: _*)
      q.processAllAvailable()

      def canon(df: org.apache.spark.sql.DataFrame) =
        df.select(col("a"), col("b"), col("jaccard"))
          .as[(Long, Long, Double)].collect().sorted.toSeq

      val streamed = canon(spark.table("neardup_split_probe_out"))
      val batchDocs = probeDf(probeRows.toDF("doc_id", "us", "sh"))
      val batch = canon(StreamOps.nearDupSplitProbeStream(batchDocs,
        indexBands, corpusSh, maxBucket = mb))
      assert(streamed == batch)

      // the hot probe reaches the hot bucket (nsub=2 here, so the
      // wraparound makes it pairwise complete: all 8 index members);
      // the capped stream variant loses exactly these
      assert(batch.filter(_._1 == 901L).map(_._2).toSet == (1L to 8L).toSet)
      assert(batch.filter(_._1 == 920L).map(_._2) == Seq(20L))
      val capped = canon(StreamOps.nearDupProbeStream(batchDocs, indexBands,
        corpusSh, maxBucket = mb))
      assert(capped.filter(_._1 == 901L).isEmpty && capped.nonEmpty)

      // batch twin ≡ the t32/t34 production path (splitProbeBandTable)
      val sigPb = Dedup.minhashSignatures(
        batchDocs.select(col("doc_id"), col("sh")), "doc_id", "sh", 15)
      val cand = Dedup.splitProbeBandTable(sigPb, indexBands, "doc_id",
        numBands = 3, rowsPerBand = 5, maxBucket = mb)
      val viaBatchApi = Dedup.verifyJaccard(
        batchDocs.select(col("doc_id"), col("sh")), corpusSh,
        "doc_id", "sh", cand, 0.8)
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
        .as[(Long, Long, Double)].collect().sorted.toSeq
      assert(viaBatchApi == batch)
    } finally q.stop()
  }

  test("streaming probe fan-out guard: an over-bound trigger trips while the " +
    "broadcast build collects; a bound-respecting trigger passes untouched") {
    implicit val sqlCtx = spark.sqlContext
    import graft.etl.Dedup
    val base = 1700000000L * US
    val mb = 5

    // same hot-bucket fixture as the split test: 8 identical docs make
    // every candidate key carry ≥4 rows, so a per-task bound of 1 MUST
    // trip in whichever task any key lands in — deterministically, at
    // any shuffle-partition count
    val hotSh = Seq("b_a", "b_b", "b_c", "b_d")
    val corpusSh = ((1L to 8L).map(id => (id, hotSh)) ++ Seq(
      (20L, Seq("u20_a", "u20_b", "u20_c", "u20_d"))))
      .toDF("doc_id", "sh")
    val indexBands = Dedup.bandTable(
      Dedup.minhashSignatures(corpusSh, "doc_id", "sh", 15),
      "doc_id", numBands = 3, rowsPerBand = 5)
    val probeRows = Seq((901L, base, hotSh))
    def probeDf(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), timestamp_micros(col("us")).as("ts"), col("sh"))

    def run(bound: Long, name: String): Either[Throwable, Seq[(Long, Long)]] = {
      val input = MemoryStream[(Long, Long, Seq[String])]
      val out = StreamOps.nearDupSplitProbeStream(
        probeDf(input.toDS().toDF("doc_id", "us", "sh")), indexBands,
        corpusSh, maxBucket = mb, maxBuildRowsPerTask = bound)
      val ckpt = Files.createTempDirectory("ckpt_guard").toString
      val q = out.writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      try {
        input.addData(probeRows: _*)
        q.processAllAvailable()
        Right(spark.table(name).select(col("a"), col("b"))
          .as[(Long, Long)].collect().sorted.toSeq)
      } catch { case t: Throwable => Left(t) }
      finally q.stop()
    }

    // over-bound: the trigger fails DURING the micro-batch (the guard
    // sits under the broadcast hint, so rows trip as the build
    // collects), with the actionable message — never an OOM
    run(bound = 1, "guard_trip_out") match {
      case Left(t) =>
        val msgs = Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
          .map(e => Option(e.getMessage).getOrElse("")).mkString("\n")
        assert(msgs.contains("streaming probe fan-out guard"),
          s"expected the guard message in the failure chain, got:\n$msgs")
        assert(msgs.contains("probeFanoutBounded=false"))
      case Right(rows) =>
        fail(s"over-bound trigger was NOT tripped; emitted $rows")
    }

    // bound-respecting: identical trigger under a generous bound emits
    // exactly the unguarded batch-twin pairs (the guard drops nothing)
    val batch = StreamOps.nearDupSplitProbeStream(
      probeDf(probeRows.toDF("doc_id", "us", "sh")), indexBands,
      corpusSh, maxBucket = mb)
      .select(col("a"), col("b")).as[(Long, Long)].collect().sorted.toSeq
    run(bound = StreamOps.defaultMaxBuildRowsPerTask, "guard_pass_out") match {
      case Right(rows) => assert(rows == batch && rows.nonEmpty)
      case Left(t) => fail(s"bound-respecting trigger tripped: ${t.getMessage}")
    }
  }

  test("nearDupExactProbeStream: total recall on a hot bucket at nsub=4; " +
    "streamed ≡ batch ≡ exactProbeBandTable; split ⊆ exact") {
    implicit val sqlCtx = spark.sqlContext
    import graft.etl.Dedup
    val base = 1700000000L * US
    val mb = 2 // 8-doc hot bucket → nsub = 4: the split probe visits
               // only its own + adjacent label, the exact probe all 4

    val hotSh = Seq("b_a", "b_b", "b_c", "b_d")
    val corpusSh = ((1L to 8L).map(id => (id, hotSh)) ++ Seq(
      (20L, Seq("u20_a", "u20_b", "u20_c", "u20_d")),
      (21L, Seq("u21_a", "u21_b", "u21_c", "u21_d"))))
      .toDF("doc_id", "sh")
    val indexBands = Dedup.bandTable(
      Dedup.minhashSignatures(corpusSh, "doc_id", "sh", 15),
      "doc_id", numBands = 3, rowsPerBand = 5)

    val probeRows = Seq((901L, base, hotSh),
      (920L, base + MIN, Seq("u20_a", "u20_b", "u20_c", "u20_d")))
    def probeDf(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), timestamp_micros(col("us")).as("ts"), col("sh"))

    val input = MemoryStream[(Long, Long, Seq[String])]
    val streamDocs = probeDf(input.toDS().toDF("doc_id", "us", "sh"))
    val out = StreamOps.nearDupExactProbeStream(streamDocs, indexBands,
      corpusSh, maxBucket = mb)
    val ckpt = Files.createTempDirectory("ckpt11").toString
    val q = out.writeStream
      .format("memory").queryName("neardup_exact_probe_out")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      input.addData(probeRows: _*)
      q.processAllAvailable()

      def canon(df: org.apache.spark.sql.DataFrame) =
        df.select(col("a"), col("b"), col("jaccard"))
          .as[(Long, Long, Double)].collect().sorted.toSeq

      val streamed = canon(spark.table("neardup_exact_probe_out"))
      val batchDocs = probeDf(probeRows.toDF("doc_id", "us", "sh"))
      val batch = canon(StreamOps.nearDupExactProbeStream(batchDocs,
        indexBands, corpusSh, maxBucket = mb))
      assert(streamed == batch)

      // TOTAL recall on the hot bucket — guaranteed, not band-lucky
      assert(batch.filter(_._1 == 901L).map(_._2).toSet == (1L to 8L).toSet)
      assert(batch.filter(_._1 == 920L).map(_._2) == Seq(20L))

      // split ⊆ exact at the same geometry
      val split = canon(StreamOps.nearDupSplitProbeStream(batchDocs,
        indexBands, corpusSh, maxBucket = mb))
      assert(split.toSet.subsetOf(batch.toSet))

      // batch twin ≡ the t76 production path (exactProbeBandTable)
      val sigPb = Dedup.minhashSignatures(
        batchDocs.select(col("doc_id"), col("sh")), "doc_id", "sh", 15)
      val cand = Dedup.exactProbeBandTable(sigPb, indexBands, "doc_id",
        numBands = 3, rowsPerBand = 5, maxBucket = mb)
      val viaBatchApi = Dedup.verifyJaccard(
        batchDocs.select(col("doc_id"), col("sh")), corpusSh,
        "doc_id", "sh", cand, 0.8)
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
        .as[(Long, Long, Double)].collect().sorted.toSeq
      assert(viaBatchApi == batch)
    } finally q.stop()
  }

  test("checkpointed aggregation restarts exactly-once: state kept, files not replayed") {
    val srcDir = Files.createTempDirectory("stream_src").toString
    val ckpt = Files.createTempDirectory("ckpt6").toString
    val base = 1700000000L * US
    def writeBatch(rows: Seq[(Long, Long, Double)]): Unit =
      rows.toDF("user_id", "us", "value")
        .select(col("user_id"), timestamp_micros(col("us")).as("ts"), col("value"))
        .coalesce(1).write.mode("append").parquet(srcDir)
    def start() = spark.readStream
      .schema("user_id LONG, ts TIMESTAMP, value DOUBLE")
      .parquet(srcDir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("v"))
      .writeStream.format("memory").queryName("restart_out")
      .option("checkpointLocation", ckpt)
      .outputMode("complete").start()

    val fileA = Seq((1L, base, 1.5), (1L, base + MIN, 2.5), (2L, base, 10.0))
    val fileB = Seq((1L, base + 2 * MIN, 4.0), (3L, base, 7.0))

    writeBatch(fileA)
    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()

    writeBatch(fileB)
    val q2 = start()
    try {
      q2.processAllAvailable()
      val got = spark.table("restart_out")
        .as[(Long, Long, Double)].collect().sorted.toSeq
      // state survived the restart (user 1 = 3 events across the stop) and
      // file A was not replayed (counts would double)
      assert(got == Seq((1L, 3L, 8.0), (2L, 1L, 10.0), (3L, 1L, 7.0)))
    } finally q2.stop()
  }

  test("sessionization on a durable file source+sink: stop-restart is exactly-once") {
    // The production durability story end-to-end: parquet file SOURCE
    // (offset log tracks consumed files), parquet file SINK (manifest
    // commits make emission exactly-once), checkpointed session state,
    // and a stop + cold restart between batches. Three things must hold
    // after the restart: sessions emitted BEFORE the stop are not
    // re-emitted (sink manifest), source files consumed before the stop
    // are not replayed (offset log), and a session OPEN across the stop
    // closes with events from both sides (state store). Honest scope:
    // processAllAvailable + stop is a GRACEFUL shutdown at a committed
    // batch boundary — the restart recovery path (offset log, manifest,
    // state reload) is fully exercised, but a crash INSIDE the
    // write-then-commit window (where the manifest protocol's atomicity
    // does the work) is not deterministically arrangeable from the
    // public API and is not what this test covers.
    val srcDir = Files.createTempDirectory("sess_src").toString
    val outDir = Files.createTempDirectory("sess_out").toString
    val ckpt = Files.createTempDirectory("sess_ck").toString
    val base = 1700000000L * US
    def writeBatch(rows: Seq[Ev]): Unit =
      rows.toDF("user_id", "ts_us", "value").coalesce(1)
        .write.mode("append").parquet(srcDir)
    def start() = {
      val src = spark.readStream
        .schema("user_id LONG, ts_us LONG, value DOUBLE")
        .parquet(srcDir).as[Ev]
      StreamOps.sessionizeStream(spark, src, gapMinutes = 30)
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }
    // file A: u1's whole first session; u2's session left OPEN across
    // the kill; sentinel 98 pushes the watermark to ~+90min so u1
    // closes (+10 end + 30 gap < +90) and EMITS before the kill, while
    // u2 (+80 end) stays open
    writeBatch(Seq(
      Ev(1, base, 1.5), Ev(1, base + 10 * MIN, 2.5),
      Ev(2, base + 80 * MIN, 10.0),
      Ev(98, base + 100 * MIN, 0.0)))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop() // kill
    val emittedBeforeKill = spark.read.parquet(outDir)
      .as[Session].collect().filter(_.user_id < 98)
    assert(emittedBeforeKill.map(_.user_id).toSeq == Seq(1L),
      s"u1's closed session should have emitted pre-kill: ${emittedBeforeKill.toSeq}")
    // file B (post-watermark events only): u2 extends its open session,
    // u1 opens a second one; sentinel 99 flushes everything
    writeBatch(Seq(
      Ev(2, base + 95 * MIN, 20.0),
      Ev(1, base + 120 * MIN, 4.0)))
    writeBatch(Seq(Ev(99, base + 2000 * MIN, 0.0)))
    val q2 = start()
    try {
      q2.processAllAvailable()
      val got = spark.read.parquet(outDir).as[Session].collect()
        .filter(_.user_id < 98)
        .map(s => (s.user_id, s.session_start_us, s.session_end_us, s.n_events))
        .sortBy(identity).toSeq
      val batch = StreamOps.sessionizeBatch(
        Seq((1L, base, 1.5), (1L, base + 10 * MIN, 2.5),
          (2L, base + 80 * MIN, 10.0), (2L, base + 95 * MIN, 20.0),
          (1L, base + 120 * MIN, 4.0))
          .toDF("user_id", "ts_us", "value")
          .select(col("user_id"), timestamp_micros(col("ts_us")).as("ts"),
            col("value")),
        gapMinutes = 30)
        .as[Session].collect()
        .map(s => (s.user_id, s.session_start_us, s.session_end_us, s.n_events))
        .sortBy(identity).toSeq
      // u1 × 2 sessions, u2 × 1 spanning the restart; no duplicates of
      // the pre-kill emission, no holes from replayed/lost files
      assert(batch.length == 3)
      assert(got == batch, s"stream-across-restart $got != batch $batch")
    } finally q2.stop()
  }

  test("stream-stream interval join: kill-restart recovers buffered join state") {
    // The q41/q46 operator under the same durability discipline as the
    // sessionization restart test: parquet sources (offset log), parquet
    // sink (manifest commits), checkpointed JOIN state, stop + cold
    // restart. The load-bearing row is V2: a view consumed BEFORE the
    // kill whose matching purchase arrives only AFTER the restart — the
    // pair can only emit if the view buffer was recovered from the
    // checkpoint, not recomputed (file A is not replayed; the offset log
    // proves it because a replay would double-emit P1×V1 through the
    // manifest-committed sink).
    val vDir = Files.createTempDirectory("ssj_v").toString
    val pDir = Files.createTempDirectory("ssj_p").toString
    val outDir = Files.createTempDirectory("ssj_out").toString
    val ckpt = Files.createTempDirectory("ssj_ck").toString
    val base = 1700000000L * US
    def writeViews(rows: Seq[(Long, Long, Long)]): Unit =
      rows.toDF("user_id", "event_id", "us")
        .select(col("user_id"), col("event_id"),
          timestamp_micros(col("us")).as("ts"))
        .coalesce(1).write.mode("append").parquet(vDir)
    def writePurchases(rows: Seq[(Long, Long, Long, Double)]): Unit =
      rows.toDF("user_id", "event_id", "us", "value")
        .select(col("user_id"), col("event_id"),
          timestamp_micros(col("us")).as("ts"), col("value"))
        .coalesce(1).write.mode("append").parquet(pDir)
    def start() = {
      val v = spark.readStream
        .schema("user_id LONG, event_id LONG, ts TIMESTAMP").parquet(vDir)
      val p = spark.readStream
        .schema("user_id LONG, event_id LONG, ts TIMESTAMP, value DOUBLE")
        .parquet(pDir)
      StreamOps.attributePurchases(v, p, horizon = "6 hours", watermark = "1 hour")
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }
    // file A: views V1 (u1) and V2 (u2); purchase P1 (u1) matches V1
    // in-batch and emits pre-kill; V2's purchase does not exist yet
    writeViews(Seq((1L, 101L, base), (2L, 102L, base + 10 * MIN)))
    writePurchases(Seq((1L, 201L, base + 30 * MIN, 5.0)))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop() // kill
    val preKill = spark.read.parquet(outDir)
      .select(col("purchase_id"), col("view_id"))
      .as[(Long, Long)].collect().toSeq
    assert(preKill == Seq((201L, 101L)),
      s"P1xV1 should have emitted pre-kill: $preKill")
    // file B (post-restart): P2 (u2) — its only admissible view is V2,
    // which lives in the restored state store
    writePurchases(Seq((2L, 202L, base + 40 * MIN, 7.0)))
    val q2 = start()
    try {
      q2.processAllAvailable()
      val got = spark.read.parquet(outDir)
        .select(col("user_id"), col("purchase_id"), col("view_id"), col("value"))
        .as[(Long, Long, Long, Double)].collect().sorted.toSeq
      val batch = StreamOps.attributePurchases(
        Seq((1L, 101L, base), (2L, 102L, base + 10 * MIN))
          .toDF("user_id", "event_id", "us")
          .select(col("user_id"), col("event_id"),
            timestamp_micros(col("us")).as("ts")),
        Seq((1L, 201L, base + 30 * MIN, 5.0), (2L, 202L, base + 40 * MIN, 7.0))
          .toDF("user_id", "event_id", "us", "value")
          .select(col("user_id"), col("event_id"),
            timestamp_micros(col("us")).as("ts"), col("value")),
        horizon = "6 hours", watermark = "1 hour")
        .select(col("user_id"), col("purchase_id"), col("view_id"), col("value"))
        .as[(Long, Long, Long, Double)].collect().sorted.toSeq
      assert(batch.length == 2)
      assert(got == batch, s"stream-across-restart $got != batch $batch")
    } finally q2.stop()
  }

  test("outer interval join: unmatched purchase emits exactly once across restart") {
    // q46's right_outer leg under the restart protocol: an unmatched
    // purchase consumed BEFORE the kill may only emit its null-view row
    // once the watermark proves no in-horizon view can still arrive —
    // which happens AFTER the restart here. The recovered state must
    // (a) still hold the purchase, (b) still hold the pre-kill
    // watermark (emitting early would be wrong; losing the row, worse),
    // and (c) emit it exactly once when the post-restart sentinel
    // advances the watermark past purchase_ts + horizon.
    val vDir = Files.createTempDirectory("osj_v").toString
    val pDir = Files.createTempDirectory("osj_p").toString
    val outDir = Files.createTempDirectory("osj_out").toString
    val ckpt = Files.createTempDirectory("osj_ck").toString
    val base = 1700000000L * US
    def writeViews(rows: Seq[(Long, Long, Long)]): Unit =
      rows.toDF("user_id", "event_id", "us")
        .select(col("user_id"), col("event_id"),
          timestamp_micros(col("us")).as("ts"))
        .coalesce(1).write.mode("append").parquet(vDir)
    def writePurchases(rows: Seq[(Long, Long, Long, Double)]): Unit =
      rows.toDF("user_id", "event_id", "us", "value")
        .select(col("user_id"), col("event_id"),
          timestamp_micros(col("us")).as("ts"), col("value"))
        .coalesce(1).write.mode("append").parquet(pDir)
    def start() = {
      val v = spark.readStream
        .schema("user_id LONG, event_id LONG, ts TIMESTAMP").parquet(vDir)
      val p = spark.readStream
        .schema("user_id LONG, event_id LONG, ts TIMESTAMP, value DOUBLE")
        .parquet(pDir)
      StreamOps.attributePurchases(v, p,
        horizon = "1 hour", watermark = "30 minutes", joinType = "right_outer")
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }
    // pre-kill: matched pair (V1, P1) for u1; UNMATCHED purchase P2 for
    // u2; view sentinel nudges the view-side watermark forward but not
    // past P2's horizon, so P2 must stay pending across the kill
    writeViews(Seq((1L, 101L, base), (97L, 900L, base + 30 * MIN)))
    writePurchases(Seq((1L, 201L, base + 10 * MIN, 5.0),
      (2L, 202L, base + 20 * MIN, 7.0)))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop() // kill
    val preKill = spark.read.parquet(outDir)
      .filter(col("user_id") < 90)
      .select(col("purchase_id"), col("view_id"))
      .as[(Long, java.lang.Long)].collect().toSeq
    assert(preKill == Seq((201L, java.lang.Long.valueOf(101L))),
      s"only the matched pair may emit pre-kill: $preKill")
    // post-restart: sentinels on BOTH sides push the joint watermark
    // past P2's ts + horizon -> the outer row must emit, exactly once
    writeViews(Seq((98L, 901L, base + 500 * MIN)))
    writePurchases(Seq((99L, 299L, base + 500 * MIN, 0.0)))
    val q2 = start()
    try {
      q2.processAllAvailable()
      val got = spark.read.parquet(outDir)
        .filter(col("user_id") < 90)
        .select(col("user_id"), col("purchase_id"), col("view_id"))
        .as[(Long, Long, java.lang.Long)].collect().sortBy(_._2).toSeq
      assert(got == Seq(
        (1L, 201L, java.lang.Long.valueOf(101L)),
        (2L, 202L, null: java.lang.Long)),
        s"outer row must emit exactly once with null view: $got")
    } finally q2.stop()
  }

  test("chained stateful distinct-count: kill-restart keeps dedup AND window state") {
    // q63's chained shape (dropDuplicates feeding a windowed count, two
    // stateful operators) across a stop + cold restart. Load-bearing
    // rows: u2 appears BEFORE the kill and again (duplicate) AFTER the
    // restart — if the dedup state store were lost, the window would
    // count u2 twice; u3 arrives only after the restart — if the window
    // aggregation state were lost, the count would miss the pre-kill
    // users. The window emits once (append mode) when the post-restart
    // sentinel's watermark closes it.
    val srcDir = Files.createTempDirectory("dc_src").toString
    val outDir = Files.createTempDirectory("dc_out").toString
    val ckpt = Files.createTempDirectory("dc_ck").toString
    val base = 1700000000L * US
    def writeBatch(rows: Seq[(Long, Long)]): Unit =
      rows.toDF("user_id", "us")
        .select(col("user_id"), timestamp_micros(col("us")).as("ts"))
        .coalesce(1).write.mode("append").parquet(srcDir)
    def start() =
      StreamOps.distinctUsersStream(
        spark.readStream.schema("user_id LONG, ts TIMESTAMP").parquet(srcDir),
        windowDur = "1 hour")
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
    // file A — all inside one event-hour: u1 twice (in-batch dup), u2
    writeBatch(Seq((1L, base + 5 * MIN), (1L, base + 10 * MIN),
      (2L, base + 20 * MIN)))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop() // kill: window still open
    assert(spark.read.parquet(outDir).isEmpty,
      "window must not emit before the watermark closes it")
    // file B: u2 AGAIN (cross-restart dup), u3 (new); sentinel closes
    // the window (its own window stays open and never emits)
    writeBatch(Seq((2L, base + 25 * MIN), (3L, base + 40 * MIN)))
    writeBatch(Seq((99L, base + 5000 * MIN)))
    val q2 = start()
    try {
      q2.processAllAvailable()
      val got = spark.read.parquet(outDir)
        .as[(java.sql.Timestamp, Long)].collect().map(r => (r._1.getTime, r._2)).sorted.toSeq
      val batch = StreamOps.distinctUsersBatch(
        Seq((1L, base + 5 * MIN), (1L, base + 10 * MIN), (2L, base + 20 * MIN),
          (2L, base + 25 * MIN), (3L, base + 40 * MIN))
          .toDF("user_id", "us")
          .select(col("user_id"), timestamp_micros(col("us")).as("ts")),
        windowDur = "1 hour")
        .as[(java.sql.Timestamp, Long)].collect().map(r => (r._1.getTime, r._2)).sorted.toSeq
      assert(batch.map(_._2) == Seq(3L)) // u1, u2, u3 — dups collapsed
      assert(got == batch, s"stream-across-restart $got != batch $batch")
    } finally q2.stop()
  }

  test("enrichEvents: stream-static join matches batch row-for-row") {
    implicit val sqlCtx = spark.sqlContext
    val customers = Seq((1L, 10L), (2L, 20L), (3L, 10L))
      .toDF("c_custkey", "c_nationkey")
    val nations = Seq((10L, "ALPHA"), (20L, "BETA")).toDF("n_nationkey", "n_name")

    val input = MemoryStream[Ev]
    val enriched = StreamOps.enrichEvents(input.toDF(), customers, nations)
    val ckpt = Files.createTempDirectory("ckpt3").toString
    val q = enriched.writeStream
      .format("memory").queryName("enrich_out")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      val evs = events
      // two micro-batches, arbitrary order — a stateless stream-static
      // join must be arrival-order-insensitive
      input.addData(evs(4), evs(0), evs(6))
      q.processAllAvailable()
      input.addData(evs(1), evs(5), evs(2), evs(3))
      q.processAllAvailable()

      def canon(df: org.apache.spark.sql.DataFrame) =
        df.select(col("user_id"), col("ts_us"), col("value"), col("n_name"))
          .as[(Long, Long, Double, String)].collect().sorted.toSeq

      val streamed = canon(spark.table("enrich_out"))
      val batch = canon(StreamOps.enrichEvents(events.toDF(), customers, nations))
      assert(batch.length == events.length, "a dimension row went missing")
      assert(streamed == batch)
    } finally q.stop()
  }

  test("transitionsStream emits the batch transition chain, late events included") {
    implicit val sqlCtx = spark.sqlContext
    import StreamOps.{TransEv, Transition}
    val base = 1700000000L * US
    def ev(uid: Long, m: Long, id: Long, t: String): TransEv =
      TransEv(uid, base + m * MIN, id, t,
        new java.sql.Timestamp((base + m * MIN) / 1000L))
    // user 1: view → click → purchase with the click arriving LATE (a
    // correct stream must pair view→click→purchase, not view→purchase);
    // user 2: two events in one batch, unordered
    val e10 = ev(1, 0, 10, "view"); val e11 = ev(1, 5, 11, "click")
    val e12 = ev(1, 9, 12, "purchase")
    val e20 = ev(2, 1, 20, "signup"); val e21 = ev(2, 2, 21, "error")

    val input = MemoryStream[TransEv]
    val out = StreamOps.transitionsStream(spark, input.toDS(),
      watermarkDelay = "30 minutes")
    val ckpt = Files.createTempDirectory("ckpt").toString
    val q = out.writeStream.format("memory").queryName("trans_out")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      input.addData(e10, e12, e21, e20) // click missing, batch unordered
      q.processAllAvailable()
      input.addData(e11) // late by event time, within the watermark
      q.processAllAvailable()
      input.addData(ev(9, 2000, 99, "view")) // push watermark past all
      q.processAllAvailable()

      val streamed = spark.table("trans_out").as[Transition].collect()
        .filter(_.user_id != 9)
        .sortBy(t => (t.user_id, t.from_ts_us)).toSeq
      val batch = StreamOps.transitionsBatch(
          Seq(e10, e11, e12, e20, e21)
            .toDF("user_id", "ts_us", "event_id", "event_type", "ts")
            .select(col("user_id"), col("event_type"), col("event_id"),
              col("ts")))
        .select(col("user_id"), col("from_ts_us"), col("from_type"),
          col("to_type"))
        .as[Transition].collect()
        .sortBy(t => (t.user_id, t.from_ts_us)).toSeq

      assert(batch.map(t => (t.from_type, t.to_type)) ==
        Seq(("view", "click"), ("click", "purchase"), ("signup", "error")))
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
    } finally q.stop()
  }

  test("distinctUsersStream (chained dedup→count) matches batch per closed window") {
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000L * US
    // window = 1 hour; user 1 appears 3× in hour 0 (counts once), user 2
    // twice across hours 0 and 1 (counts in both), user 3 once in hour 1
    val evs = Seq(
      Ev(1, base, 1.0), Ev(1, base + 10 * MIN, 1.0), Ev(1, base + 50 * MIN, 1.0),
      Ev(2, base + 20 * MIN, 1.0), Ev(2, base + 70 * MIN, 1.0),
      Ev(3, base + 80 * MIN, 1.0))
    def withTs(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("ts", timestamp_micros(col("ts_us")))

    val input = MemoryStream[Ev]
    val out = StreamOps.distinctUsersStream(withTs(input.toDF()), "1 hour",
      watermark = "30 minutes")
    val ckpt = Files.createTempDirectory("ckpt").toString
    val q = out.writeStream.format("memory").queryName("du_out")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      // duplicates split across micro-batches: the dedup state must
      // carry over, and the count must emit only on watermark close
      input.addData(evs(0), evs(3), evs(1))
      q.processAllAvailable()
      input.addData(evs(2), evs(4), evs(5))
      q.processAllAvailable()
      input.addData(Ev(99, base + 1000 * MIN, 0.0)) // close all windows
      q.processAllAvailable()

      val streamed = spark.table("du_out")
        .as[(java.sql.Timestamp, Long)].collect().sortBy(_._1.getTime).toSeq
      val batch = StreamOps.distinctUsersBatch(
          withTs(evs.toDF("user_id", "ts_us", "value")), "1 hour")
        .as[(java.sql.Timestamp, Long)].collect().sortBy(_._1.getTime).toSeq
      // sentinel's window is still open in the stream → compare only the
      // batch windows that the stream closed. Windows are EPOCH-aligned
      // (base sits 800s into its hour), so the +50min event rolls into
      // the second window: w0 = {u1, u2}, w1 = {u1, u2, u3}
      assert(batch.map(_._2) == Seq(2L, 3L))
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
    } finally q.stop()
  }

  test("streaming verify-join MICRO-BATCH plan shapes: split broadcasts the " +
    "bounded batch side; exact never broadcasts a pair or corpus side") {
    // the per-trigger scale contracts, pinned on the EXECUTED micro-batch
    // plan (StreamPlanBridge — semantics pins above can't see whether the
    // corpus re-sorts per trigger): bounded-fan-out variants must build
    // the verify-join broadcast from the micro-batch candidate side (one
    // hash-probe scan of the pinned corpus per trigger), and the exact
    // variant — unbounded fan-out by declaration — must never plan its
    // candidate pairs or the guarded corpus side as a broadcast build,
    // even though a micro-batch's honest runtime stats sit far under
    // every threshold (the streaming twilight zone: small-batch stats
    // say broadcast, the contract says the fan-out is unbounded).
    implicit val sqlCtx = spark.sqlContext
    import graft.etl.Dedup
    val base = 1700000000L * US
    val hotSh = Seq("b_a", "b_b", "b_c", "b_d")
    val corpusSh = ((1L to 8L).map(id => (id, hotSh)) ++ Seq(
      (20L, Seq("u20_a", "u20_b", "u20_c", "u20_d"))))
      .toDF("doc_id", "sh")
    val indexBands = Dedup.bandTable(
      Dedup.minhashSignatures(corpusSh, "doc_id", "sh", 15),
      "doc_id", numBands = 3, rowsPerBand = 5)
    val probeRows = Seq((901L, base, hotSh))

    def broadcastBuilds(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[Set[String]] =
      p.collect {
        case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec =>
          b.child.output.map(_.name).toSet
      }

    def lastPlan(
        name: String,
        fn: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
             org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.execution.SparkPlan = {
      val input = MemoryStream[(Long, Long, Seq[String])]
      val docs = input.toDS().toDF("doc_id", "us", "sh")
        .select(col("doc_id"), timestamp_micros(col("us")).as("ts"), col("sh"))
      val out = fn(docs, indexBands, corpusSh)
      val ckpt = Files.createTempDirectory(s"ckpt_plan_$name").toString
      val q = out.writeStream.format("memory").queryName(s"plan_pin_$name")
        .option("checkpointLocation", ckpt).outputMode("append").start()
      try {
        input.addData(probeRows: _*)
        q.processAllAvailable()
        org.apache.spark.sql.graftbridge.StreamPlanBridge.lastExecutedPlan(q)
      } finally q.stop()
    }

    val splitPlan = lastPlan("split", (d, ix, c) =>
      StreamOps.nearDupSplitProbeStream(d, ix, c, maxBucket = 2))
    assert(broadcastBuilds(splitPlan)
        .exists(cols => cols.contains("sh") && cols.contains("b")),
      s"split verify join lost the bounded micro-batch-side broadcast " +
        s"(per-trigger corpus shuffle is back):\n$splitPlan")

    val exactPlan = lastPlan("exact", (d, ix, c) =>
      StreamOps.nearDupExactProbeStream(d, ix, c, maxBucket = 2))
    val exactBuilds = broadcastBuilds(exactPlan)
    assert(!exactBuilds.exists(cols => Set("a", "b").subsetOf(cols)),
      s"exact variant broadcast its candidate-pair side: $exactBuilds\n$exactPlan")
    assert(!exactBuilds.exists(_.contains("_shb")),
      s"exact variant broadcast the guarded corpus side: $exactBuilds\n$exactPlan")
  }
}
