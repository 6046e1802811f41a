package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.Registry

/** AQE-on correctness gate (round-6 verdict item #5): adaptive query
  * execution is the PRODUCTION configuration — Spark's default since
  * 3.2, and what the `graft.Verify` correctness main runs under; only
  * `graft.Bench` pins it off (bench-scale latency, documented there).
  * Nothing previously ASSERTED that every registry entry is
  * AQE-insensitive, so a query whose result depended on partitioning
  * (a spark_partition_id leak, an order-sensitive fold over coalesced
  * partitions) could go green in one configuration and drift in the
  * other.
  *
  * This suite runs EVERY registry entry twice on the same context —
  * once with AQE forced on (`forceApply` wraps even exchange-free
  * plans in AdaptiveSparkPlan, the strictest setting) and once with
  * AQE off — and asserts canonicalized row equality (sorted columns,
  * sorted row strings: the driver's hash-compare contract). The two
  * AQE-sensitive lake ops additionally pin their plan SHAPE under AQE:
  * the co-bucketed SMB join (q69) must stay exchange-free when the
  * adaptive planner re-examines it, and the salted join (q38) must
  * keep its salt scatter.
  */
class AqeParitySpec extends SparkSpec {

  private def sess(aqe: Boolean): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", aqe.toString)
    if (aqe) s.conf.set("spark.sql.adaptive.forceApply", "true")
    s
  }

  /** The driver-gate canonical form: columns sorted by name, rows
    * stringified and sorted.
    */
  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toIndexedSeq
    df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect().map(_.toString).sorted.toSeq
  }

  test("every registry entry is row-identical with AQE forced on") {
    val on = sess(aqe = true)
    val off = sess(aqe = false)
    // Salt the Artifacts cache per leg: without it the leg that runs
    // first MATERIALIZES every Artifacts.shared parquet and the other
    // leg merely reads it back — the artifact-building subtrees (the
    // bulk of the e-family pipelines) would execute under only one AQE
    // mode and the parity assertion would be vacuous for them. (The
    // pid-scoped filesystem LAYOUT fixtures — fan-out dirs, bucketed
    // tables, ORC copies — still build once; they are input fabrication,
    // and the query logic over them runs under both modes.)
    def withSalt[T](salt: String)(body: => T): T =
      graft.etl.Artifacts.withSalt(salt)(body)
    val failures = Registry.all.map(_.name).sorted.flatMap { name =>
      val fn = Registry.queries(name)
      val r =
        try {
          val a = withSalt("aqeon") { canon(fn(on, sf0001)) }
          val b = withSalt("aqeoff") { canon(fn(off, sf0001)) }
          if (a == b) None
          else Some(s"$name: AQE-on diverged (${a.size} vs ${b.size} rows)")
        } catch {
          case e: Throwable => Some(s"$name: threw ${e.getMessage}")
        }
      // same cache hygiene as Verify between queries
      on.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      r
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("q69's co-bucketed SMB join stays exchange-free under AQE") {
    val on = sess(aqe = true)
    val df = graft.queries.PipelineQueries.bucketedJoinForAudit(on, sf0001)
    df.collect()
    // final adaptive plan only (the Initial Plan section repeats nodes)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("AdaptiveSparkPlan"),
      s"forceApply did not take effect:\n$plan")
    assert(plan.contains("SortMergeJoin"),
      s"co-bucketed join lost its SortMergeJoin under AQE:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucketed join shuffles under AQE (bucket metadata ignored):\n$plan")
  }

  test("q38's salted join keeps its salt scatter under AQE") {
    val on = sess(aqe = true)
    val df = Registry.queries("q38_salted_join")(on, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("AdaptiveSparkPlan"),
      s"forceApply did not take effect:\n$plan")
    assert(plan.contains("_salt"),
      s"salt column vanished from the executed plan under AQE:\n$plan")
  }
}
