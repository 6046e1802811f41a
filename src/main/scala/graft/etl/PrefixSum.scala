package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exclusive prefix sum — the primitive behind global
  * sequence packing (t17), deterministic corpus shuffle (t22), and shard
  * manifests (m11).
  *
  * A naive `sum() OVER (ORDER BY id)` is a SINGLE-partition window — the
  * classic scale killer. This is the two-level decomposition instead:
  *   1. bucket = id / bucketW (fixed-width ranges, deterministic — no
  *      sampled range partitioner);
  *   2. within-bucket exclusive cumsum: window PARTITIONED by bucket
  *      (parallel across buckets, each bucket bounded);
  *   3. bucket totals (one tiny groupBy) get their own exclusive cumsum
  *      — |buckets| = N/bucketW rows, bucketW× smaller; at 100 TB a
  *      third level (bucket-of-buckets) repeats the same step — that is
  *      literally the `levels = 3` RECURSION below (each extra level
  *      shrinks the single-task window by another bucketW×;
  *      PrefixSumPropertySpec drives depth 3 at a forced tiny width);
  *   4. broadcast-join the bucket offsets back: off = boff + pre.
  * Net: one bounded window + one broadcast join instead of a global
  * sort through one task.
  */
object PrefixSum {

  /** Adds `offCol` = exclusive prefix sum of `valueCol` in ascending
    * `orderCol` order. `orderCol` must be unique per row and roughly
    * dense (it defines the fixed-width buckets). Reserves `_psb`/`_psp`.
    *
    * `levels` is the decomposition depth: 2 (default) runs the bucket
    * totals through one global-window cumsum (fine while N/bucketW fits
    * one task); each extra level re-applies the SAME decomposition to
    * the bucket-total table, shrinking the final single-task window to
    * N/bucketW^(levels−1) rows — pick levels so that quantity is
    * task-sized at your N.
    */
  def exclusive(df: DataFrame, orderCol: String, valueCol: String,
                offCol: String, bucketW: Long, levels: Int = 2): DataFrame = {
    require(levels >= 2, s"levels must be >= 2, got $levels")
    require(bucketW >= 2 || levels == 2,
      s"bucketW=$bucketW cannot shrink the bucket table — recursion would not terminate")
    val b = df.withColumn("_psb", floor(col(orderCol) / bucketW).cast("long"))
    val wIn = Window.partitionBy(col("_psb")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val inBucket = b.withColumn("_psp",
      coalesce(sum(col(valueCol)).over(wIn), lit(0L)))
    val totals = b.groupBy(col("_psb")).agg(sum(col(valueCol)).as("_btot"))
    val offsets =
      if (levels == 2) {
        val wB = Window.orderBy(col("_psb"))
          .rowsBetween(Window.unboundedPreceding, -1)
        totals
          .withColumn("_boff", coalesce(sum(col("_btot")).over(wB), lit(0L)))
          .select(col("_psb"), col("_boff"))
      } else {
        // bucket-of-buckets: the bucket-total table IS a (sparse, unique
        // ordered id, value) input — recurse with one level fewer.
        // Rename around the reserved _psb/_psp so the inner call's
        // bucketing doesn't collide with this level's columns.
        // offCol must not be one of the inner call's reserved/dropped
        // names (_psb/_psp/_boff) — "_psoff" survives its final drop
        exclusive(totals.select(col("_psb").as("_psid"), col("_btot")),
          "_psid", "_btot", "_psoff", bucketW, levels - 1)
          .select(col("_psid").as("_psb"), col("_psoff").as("_boff"))
      }
    inBucket.join(broadcast(offsets), Seq("_psb"))
      .withColumn(offCol, col("_boff") + col("_psp"))
      .drop("_psb", "_psp", "_boff")
  }

  /** Exclusive prefix sum over an ARBITRARY total order: `bucketCol` must
    * be an ascending coarsening of `orderCols` (every row in bucket b
    * sorts before every row in bucket b+1 — the caller's contract; e.g.
    * bucket = −floor(quality·20) for a quality-descending order). Same
    * two-level shape as [[exclusive]], which is the special case
    * bucket = id / bucketW.
    */
  def exclusiveBy(df: DataFrame, bucketCol: String,
                  orderCols: Seq[org.apache.spark.sql.Column],
                  valueCol: String, offCol: String): DataFrame = {
    val wIn = Window.partitionBy(col(bucketCol)).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val inBucket = df.withColumn("_psp",
      coalesce(sum(col(valueCol)).over(wIn), lit(0L)))
    val wB = Window.orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = df.groupBy(col(bucketCol))
      .agg(sum(col(valueCol)).as("_btot"))
      .withColumn("_boff", coalesce(sum(col("_btot")).over(wB), lit(0L)))
      .select(col(bucketCol), col("_boff"))
    inBucket.join(broadcast(offsets), Seq(bucketCol))
      .withColumn(offCol, col("_boff") + col("_psp"))
      .drop("_psp", "_boff")
  }
}
