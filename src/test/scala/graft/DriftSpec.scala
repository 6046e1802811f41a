package graft

import org.apache.spark.sql.functions._

import graft.queries.CorpusQueries

/** Properties of the t44 drift metric and the t43 stratified sampler
  * that the fixed-fixture oracles can't express:
  *
  *   - drift identity: a snapshot compared against itself must report
  *     exactly zero L1 drift for every source (any nonzero would mean
  *     the share computation itself is version-asymmetric);
  *   - sample stability: t43's k-smallest-draw rule means removing
  *     NON-sampled docs from the corpus must reproduce the identical
  *     sample (the eval-set must not churn as the corpus is re-filtered
  *     or partially reprocessed).
  */
class DriftSpec extends SparkSpec {

  test("t44 drift of a snapshot against itself is exactly 0") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("source"), col("text"))
    val drift = CorpusQueries.lengthDriftForAudit(docs, docs).collect()
    assert(drift.nonEmpty)
    drift.foreach { r =>
      assert(r.getAs[Long]("l1_drift_pm") == 0L, s"source ${r.getString(0)}")
      assert(r.getAs[Long]("n_v1") == r.getAs[Long]("n_v2"))
    }
  }

  test("t43 sample is stable when non-sampled docs leave the corpus") {
    val q = graft.queries.Registry.queries("t43_stratified_sample")
    val full = q(spark, sf0001).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("lang"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("draw"), r.getAs[Int]("rnk")))
      .toSet
    val sampledIds = full.map(_._3)

    // shrink the corpus: keep every sampled doc and only HALF of the
    // rest — the k smallest draws per stratum are unchanged, so the
    // sample must be identical
    val tmp = java.nio.file.Files.createTempDirectory("t43_stability").toString
    spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id").isin(sampledIds.toSeq: _*) ||
        pmod(col("doc_id"), lit(2)) === 0)
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val shrunk = q(spark, tmp).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("lang"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("draw"), r.getAs[Int]("rnk")))
      .toSet
    assert(shrunk == full)
  }
}
