package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the latest right row with
  * `right.ts <= left.ts` within the same key. Spark has no native as-of
  * operator; this is the union-tag + running-last-value formulation:
  *
  *   1. union left and right rows, tagged; right rows carry their
  *      payload as a struct, left rows carry null;
  *   2. one window over (key) ordered by (ts, tag) — right sorts before
  *      left at equal ts, so a same-timestamp right row IS matched
  *      (the `<=` contract, matching DuckDB/pandas asof);
  *   3. `last(payload, ignoreNulls)` over rows-unbounded-preceding fills
  *      each left row with the most recent right payload;
  *   4. keep the left rows.
  *
  * Cost: ONE shuffle on the key + a per-partition sort — same complexity
  * class as a sort-merge join, no range explosion, no driver loops. Skewed
  * keys behave like any window (AQE cannot split a single window
  * partition; a pathologically hot key would need a coarse time-bucket in
  * the key, the standard refinement).
  *
  * Right rows with identical (key, ts) resolve by the LAST in `tieBreak`
  * order — pass a unique column to make the join deterministic.
  */
object AsOf {

  def joinBackward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      payloadCols: Seq[String],
      tieBreak: Column): DataFrame = {
    val leftCols = left.columns.toSeq
    val reserved = Seq("_tag", "_p", "_tb", "_match")
    require(!leftCols.exists(reserved.contains),
      s"joinBackward reserves columns ${reserved.mkString(", ")}; " +
        s"rename the conflicting input column first")
    val payload = struct(payloadCols.map(col): _*)
    // tie-break keeps its own type (casting to long would crash on string
    // ids under ANSI mode and collapse fractional tiebreaks)
    val tbType = right.select(tieBreak).schema.head.dataType
    val l = left
      .withColumn("_tag", lit(1))
      .withColumn("_p", lit(null).cast(
        right.select(payload).schema.head.dataType.catalogString))
      .withColumn("_tb", lit(null).cast(tbType))
    val r = right
      // a NULL-timestamp right row would sort FIRST under asc (nulls
      // first) and become the running match for every left row that
      // precedes all real right rows; DuckDB/pandas asof ignore null
      // keys, so drop them here too
      .filter(col(tsCol).isNotNull)
      .withColumn("_p", payload)
      .withColumn("_tb", tieBreak)
      .select((keyCols :+ tsCol).map(col) ++ Seq(col("_p"), col("_tb")): _*)
      .withColumn("_tag", lit(0))
    // align columns: left-only columns null on right rows
    val rAligned = leftCols.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select((leftCols ++ Seq("_tag", "_p", "_tb")).map(col): _*)
    val unioned = l.select((leftCols ++ Seq("_tag", "_p", "_tb")).map(col): _*)
      .unionByName(rAligned)
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("_tag").asc, col("_tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_match", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .drop("_tag", "_p", "_tb")
  }
}
