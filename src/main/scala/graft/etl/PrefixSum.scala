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
  *      third level (bucket-of-buckets) repeats the same step;
  *   4. broadcast-join the bucket offsets back: off = boff + pre.
  * Net: one bounded window + one broadcast join instead of a global
  * sort through one task.
  */
object PrefixSum {

  /** Adds `offCol` = exclusive prefix sum of `valueCol` in ascending
    * `orderCol` order. `orderCol` must be unique per row and roughly
    * dense (it defines the fixed-width buckets). Reserves `_psb`/`_psp`.
    */
  def exclusive(df: DataFrame, orderCol: String, valueCol: String,
                offCol: String, bucketW: Long): DataFrame = {
    val b = df.withColumn("_psb", floor(col(orderCol) / bucketW).cast("long"))
    val wIn = Window.partitionBy(col("_psb")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val inBucket = b.withColumn("_psp",
      coalesce(sum(col(valueCol)).over(wIn), lit(0L)))
    val wB = Window.orderBy(col("_psb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = b.groupBy(col("_psb"))
      .agg(sum(col(valueCol)).as("_btot"))
      .withColumn("_boff", coalesce(sum(col("_btot")).over(wB), lit(0L)))
      .select(col("_psb"), col("_boff"))
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
