package graft

import org.apache.spark.sql.functions._

import graft.etl.AsOf

/** Backward as-of join semantics on literal frames: `<=` matching,
  * per-key isolation, unmatched-left null, same-ts inclusion, and the
  * deterministic tie-break.
  */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("joinBackward: latest right at-or-before each left row, per key") {
    val left = Seq((1L, 10L), (1L, 25L), (1L, 7L), (2L, 5L), (3L, 100L))
      .toDF("k", "ts")
    val right = Seq(
      (1L, 8L, "a", 100L), (1L, 20L, "b", 101L), (1L, 30L, "c", 102L),
      (2L, 5L, "z", 103L)) // same-ts as left row → must match (<=)
      .toDF("k", "ts", "v", "rid")
      .select(col("k"), col("ts"), col("v").as("pv"), col("rid"))
    val out = AsOf.joinBackward(left, right,
      keyCols = Seq("k"), tsCol = "ts",
      payloadCols = Seq("pv"), tieBreak = col("rid"))
      .select(col("k"), col("ts"), col("_match.pv").as("pv"))
      .orderBy("k", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) null else r.getString(2)))
    assert(out.toSeq == Seq(
      (1L, 7L, null), // before any right row
      (1L, 10L, "a"), (1L, 25L, "b"),
      (2L, 5L, "z"), // equal ts matches
      (3L, 100L, null))) // key with no right rows
  }

  test("duplicate right (key, ts) resolves by the greatest tie-break") {
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val right = Seq((1L, 10L, "first", 1L), (1L, 10L, "second", 2L))
      .toDF("k", "ts", "pv", "rid")
    val got = AsOf.joinBackward(left, right, Seq("k"), "ts", Seq("pv"), col("rid"))
      .select(col("_match.pv")).collect()(0).getString(0)
    assert(got == "second")
  }

  test("randomized: joinBackward equals the brute-force per-row argmax") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // random (key, ts) sets with deliberate ts collisions (small ranges)
    val rowsGen = for {
      nl <- Gen.choose(1, 40)
      nr <- Gen.choose(0, 40)
      l <- Gen.listOfN(nl, Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 30L)))
      r <- Gen.listOfN(nr, Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 30L)))
    } yield (l.distinct, r.zipWithIndex.map { case ((k, ts), i) =>
      (k, ts, s"v$i", i.toLong) })
    val cases = Gen.listOfN(10, rowsGen)
      .apply(Gen.Parameters.default, Seed(23L)).get
    cases.foreach { case (lrows, rrows) =>
      val left = lrows.toDF("k", "ts")
      val right = rrows.toDF("k", "ts", "pv", "rid")
      val got = AsOf.joinBackward(left, right, Seq("k"), "ts",
          Seq("pv"), tieBreak = col("rid"))
        .select(col("k"), col("ts"), col("_match.pv").as("pv")).collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) null else r.getString(2)))
        .sortBy(t => (t._1, t._2)).toSeq
      // reference: per left row, the right row maximizing (ts, rid)
      // among right.ts <= left.ts within the key
      val exp = lrows.map { case (k, ts) =>
        val cand = rrows.filter(r => r._1 == k && r._2 <= ts)
        val pv = if (cand.isEmpty) null
          else cand.maxBy(r => (r._2, r._4))._3
        (k, ts, pv)
      }.sortBy(t => (t._1, t._2))
      assert(got == exp, s"left=$lrows right=$rrows")
    }
  }
}
