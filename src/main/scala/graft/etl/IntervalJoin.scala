package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join as a bucket-grid EQUI-join — the scalable
  * formulation of `pt BETWEEN s AND e`, which Spark would otherwise
  * execute as a broadcast-nested-loop (O(|points|·|intervals|) compares).
  *
  * Time (or any ordered domain) is gridded into width-`w` cells; an
  * interval `[s, e)` of ARBITRARY width explodes to its covered cells
  * `floor(s/w) .. floor((e-1)/w)` and a point maps to `floor(p/w)`, so
  * the join becomes a hash equi-join on the cell id plus an exact
  * residual filter. Pick `w` near the typical interval width: each
  * interval then explodes to O(1) cells, and a cell only receives the
  * points that can possibly match its intervals.
  *
  * Scale shape: the exploded interval side is |intervals|·avg(width/w)
  * rows — broadcast when small (the common "campaigns/windows" case),
  * shuffled hash join on the cell otherwise. No quadratic compare
  * anywhere; the residual filter runs post-join on candidate rows only.
  */
object IntervalJoin {

  /** Join `points` to every interval of `intervals` containing them
    * (half-open `[startCol, endCol)`; empty intervals match nothing).
    *
    * `wCol` names the grid-width column and MUST be present with the
    * same scalar value in BOTH frames (a literal the caller attached, or
    * broadcast stats joined onto each side — grid math needs the width
    * on the side it grids). Domain values must be non-negative AND
    * INTEGER-GRANULAR (ids, epoch micros): the top cell is
    * `floor((end−1)/w)`, which relies on "no point in (end−1, end)" —
    * true only on an integer domain. A fractional point like 2.3
    * against interval [0, 2.5) at w=1 would land in a cell the interval
    * never exploded to and silently miss. (Also floor by double
    * division: exact for integer magnitudes below 2^53.) The
    * intervals frame's `wCol` is consumed by the cell explode and
    * dropped; the points frame's copy passes through.
    */
  def byGrid(
      points: DataFrame,
      intervals: DataFrame,
      ptCol: String,
      startCol: String,
      endCol: String,
      wCol: String,
      broadcastIntervals: Boolean = true): DataFrame = {
    val cells = intervals
      .filter(col(startCol) < col(endCol))
      .withColumn("_cell", explode(sequence(
        floor(col(startCol) / col(wCol)).cast("long"),
        floor((col(endCol) - 1) / col(wCol)).cast("long"))))
      .drop(wCol)
    val right = if (broadcastIntervals) broadcast(cells) else cells
    points
      .withColumn("_cell", floor(col(ptCol) / col(wCol)).cast("long"))
      .join(right, Seq("_cell"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("_cell")
  }
}
