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
}
