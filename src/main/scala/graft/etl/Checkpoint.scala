package graft.etl

import org.apache.spark.sql.DataFrame

/** Lineage-truncation policy for the iterative operator family
  * ([[Graph.pageRankMicro]]/[[Graph.pageRankDanglingMicro]],
  * [[Dedup.resolveClusters]], [[Graph.connectedComponentsLSS]],
  * [[Bpe.train]], [[Dedup.ppJoinPairs]]).
  *
  * Every iterative operator needs an eager per-round barrier — without
  * one, self-joining plans nest the whole round history and the driver
  * dies on plan growth long before data size matters. WHERE the barrier
  * materializes is a fault-tolerance choice the caller owns:
  *
  *   - [[CheckpointPolicy.Local]] (default): executor-local checkpoint
  *     blocks. Cheapest barrier, preserves the physical partitioning and
  *     ordering the round plans are pinned on, and the right choice for
  *     local mode / bench runs. NON-REPLAYABLE: truncated lineage means
  *     a lost executor's blocks cannot be recomputed — on a real cluster
  *     an executor loss mid-iteration kills the job.
  *   - [[CheckpointPolicy.Reliable]]: a reliable checkpoint to the
  *     SparkContext checkpoint directory (HDFS / object store at cluster
  *     scale). Each round's state is replayable from storage, so an
  *     executor loss costs one round's re-read instead of the job. Pay
  *     one storage round-trip per round; partitioning/ordering metadata
  *     is preserved the same way (both variants capture the physical
  *     plan's outputPartitioning into the LogicalRDD), so the pinned
  *     exchange-free round plans hold under either policy —
  *     CheckpointPolicySpec proves rank/label hash-identity across
  *     policies.
  */
sealed trait CheckpointPolicy {
  /** Eagerly materialize `df` and truncate its lineage. */
  def barrier(df: DataFrame): DataFrame
}

object CheckpointPolicy {

  case object Local extends CheckpointPolicy {
    def barrier(df: DataFrame): DataFrame = df.localCheckpoint()
  }

  case object Reliable extends CheckpointPolicy {
    def barrier(df: DataFrame): DataFrame = {
      require(df.sparkSession.sparkContext.getCheckpointDir.isDefined,
        "CheckpointPolicy.Reliable requires " +
          "spark.sparkContext.setCheckpointDir(<cluster-visible path>) — " +
          "set it before running the iterative operator")
      df.checkpoint()
    }
  }
}
