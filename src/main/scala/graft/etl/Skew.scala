package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys.
  *
  * First line of defense at scale is AQE (`spark.sql.adaptive.enabled` +
  * `skewJoin.enabled`), which splits oversized shuffle partitions at run
  * time. Salting is the explicit fallback for the cases AQE can't fix —
  * a broadcast-too-big build side, or aggregation skew upstream of the
  * join: replicate the small side `salts` times and scatter the big
  * side's hot keys across the replicas, so one hot key occupies `salts`
  * shuffle partitions instead of one.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `keys`, with the big side salted into
    * `salts` buckets. Row-identical to the plain join for "inner" and
    * "left" join types (each big row meets exactly one replica of each
    * matching small row).
    *
    * The salt mixes `xxhash64` of the big side's full row with the
    * source partition id: the row hash alone spreads distinct rows
    * deterministically, and the partition id spreads BYTE-IDENTICAL
    * duplicate rows (a classic hot-key shape — duplicated log/export
    * lines would otherwise all hash to one salt and re-concentrate).
    * Both inputs are deterministic for a given task's input split, so
    * retries/speculative attempts stay consistent (no `rand()`), and the
    * salt only routes rows — the join RESULT is partition-agnostic.
    *
    * Tradeoff: `spark_partition_id()` is flagged nondeterministic in
    * Catalyst, so the salted projection is an OPTIMIZER BARRIER — filters
    * and column pruning don't push through it to the scan. Apply all
    * predicates/projections to `big` BEFORE calling this (salting is the
    * last step before the join), and the barrier costs nothing. If a
    * pushdown-transparent salt ever matters more than duplicate-row
    * spreading, a `row_number` over a keyed window is deterministic but
    * adds a shuffle+sort — usually a worse trade than the barrier.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(Set("inner", "left", "left_outer").contains(joinType),
      s"salted join replicates the small side — only inner/left are row-identical (got $joinType)")
    // reserved working column (the AsOf/PrefixSum convention): a caller
    // data column named _salt would be silently overwritten and dropped
    require(!big.columns.contains("_salt") && !small.columns.contains("_salt"),
      "saltedJoin reserves column _salt; rename the conflicting input column")
    val spark = big.sparkSession
    import spark.implicits._
    val salted = big.withColumn("_salt",
      pmod(xxhash64(big.columns.toIndexedSeq.map(col) :+ spark_partition_id(): _*),
        lit(salts)).cast("int"))
    val replicated = small.crossJoin(
      broadcast((0 until salts).toDF("_salt")))
    salted.join(replicated, keys :+ "_salt", joinType).drop("_salt")
  }
}
