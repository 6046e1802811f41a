package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper
import org.apache.spark.sql.streaming.StreamingQuery

/** Doorway to a running streaming query's LAST EXECUTED physical plan
  * (the micro-batch `IncrementalExecution`'s executed plan). The public
  * `StreamingQuery` API exposes progress metrics but not the plan, and
  * the wrapper/execution classes are `private[sql]` — yet the
  * per-trigger plan is exactly where the streaming scale contracts
  * live: whether the static sides ride pinned scans, whether the
  * bounded micro-batch side is the broadcast build, whether a guarded
  * corpus side stayed out of broadcast. StreamingSpec pins those
  * shapes through this accessor; it is equally the tool for diagnosing
  * a production stream whose trigger wall grew with the corpus.
  */
object StreamPlanBridge {

  /** The executed physical plan of `q`'s most recent micro-batch.
    * Throws if no batch has executed yet (call after
    * `processAllAvailable()`).
    */
  def lastExecutedPlan(q: StreamingQuery): SparkPlan = q match {
    case w: StreamingQueryWrapper => w.streamingQuery.lastExecution.executedPlan
    case other => throw new IllegalArgumentException(
      s"not a wrapped streaming query: ${other.getClass.getName}")
  }
}
