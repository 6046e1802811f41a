package graft

import org.apache.spark.sql.functions._

import graft.etl.Tables

/** The spread guard: on an already-parallel source `Tables.spread` is a
  * no-op, so the optimizer barrier disappears and filters push all the
  * way into the parquet scan; on an under-split source the barrier still
  * engages (the original single-row-group fix).
  */
class SpreadSpec extends SparkSpec {

  test("multi-split source: spread is a no-op and filters push to the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-spread").toString
    spark.range(0, 10000).selectExpr("id", "id % 7 AS k")
      .repartition(8).write.mode("overwrite").parquet(dir)
    val src = spark.read.parquet(dir)
    assert(src.rdd.getNumPartitions >= spark.sparkContext.defaultParallelism)

    val plan = Tables.spread(src).filter(col("id") === 5L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(id,5"),
      s"filter did not push into the scan:\n$plan")
    assert(!plan.contains("Exchange") && !plan.contains("Checkpoint") &&
      !plan.contains("ExistingRDD"),
      s"spread barrier engaged on an already-parallel source:\n$plan")
  }

  test("under-split source: the barrier still engages") {
    // the RAW driver testdata table = single row group → 1-partition
    // scan (Tables.documents itself routes through the round-11 split
    // artifact, which is exactly the already-parallel case the other
    // test covers — spread's barrier is the fallback for any residual
    // compact source)
    val src = Tables.load(spark, sf0001, "documents")
    assert(src.rdd.getNumPartitions < spark.sparkContext.defaultParallelism)
    val spreadDf = Tables.spread(src)
    assert(spreadDf.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    // the barrier means downstream filters do NOT reach the file scan
    val plan = spreadDf.filter(col("doc_id") === 1L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ExistingRDD") || plan.contains("Scan ExistingRDD"),
      s"expected checkpointed-RDD scan below the filter:\n$plan")
  }
}
