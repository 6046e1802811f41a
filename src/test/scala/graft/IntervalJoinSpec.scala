package graft

import org.apache.spark.sql.functions._

import graft.etl.IntervalJoin

/** Grid-vs-BNL parity for the generalized interval join: irregular
  * interval widths (sub-cell, multi-cell, empty, touching) must produce
  * exactly the rows of the naive `pt BETWEEN s AND e` formulation for
  * any grid width.
  */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val points =
    (0L until 200L).map(p => (p, p * 13L % 997L)).toDF("pid", "pt")

  // widths 0 (empty), 1, and pseudo-random up to ~60 — overlapping and
  // disjoint, aligned and unaligned starts
  private lazy val intervals =
    (0L until 40L).map { i =>
      val s = (i * 37L) % 900L
      (i, s, s + (i * i * 7L) % 61L)
    }.toDF("iid", "s", "e")

  private def naive = points
    .join(intervals, col("pt") >= col("s") && col("pt") < col("e"))
    .select(col("pid"), col("iid"))

  test("grid join equals BNL join for several grid widths") {
    val expected = naive.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty)
    for (w <- Seq(1L, 7L, 50L, 1000L)) {
      val got = IntervalJoin.byGrid(
          points.withColumn("w", lit(w)),
          intervals.withColumn("w", lit(w)),
          "pt", "s", "e", "w")
        .select(col("pid"), col("iid"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"grid width $w diverges from BNL")
    }
  }

  test("empty intervals match nothing and grid join stays an equi-join") {
    val w = 10L
    val df = IntervalJoin.byGrid(
      points.withColumn("w", lit(w)),
      Seq((99L, 50L, 50L)).toDF("iid", "s", "e").withColumn("w", lit(w)),
      "pt", "s", "e", "w")
    assert(df.count() == 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"grid join fell back to a quadratic join:\n$plan")
  }
}
