package graft

import org.apache.spark.sql.functions._

import graft.etl.{Dedup, Tables, TextAnalysis => TA}
import graft.functions.Portable
import graft.queries.TextQueries

/** Lifecycle contract of the t34 managed LSH index: the band table is a
  * named parquet artifact, build+append happen exactly once per dataset,
  * probes read the PERSISTED table, and appending per ingest is exactly
  * equivalent to banding the whole corpus at once.
  */
class PersistedLshIndexSpec extends SparkSpec {

  private def shingled(df: org.apache.spark.sql.DataFrame) = df
    .withColumn("_toks", TA.tokens(col("text")))
    .select(col("doc_id"), Portable.tokenShingles(col("_toks"), 3).as("sh"))
    .filter(size(col("sh")) > 0)

  test("build+append artifact equals whole-corpus band table; rebuild skipped") {
    val path = TextQueries.t34IndexPath(spark, sf0001)
    val marker = new java.io.File(path + "_READY")
    assert(marker.exists(), "index marker missing after build")

    // append equivalence: persisted rows == banding the full corpus once
    val docs = Tables.documents(spark, sf0001).select(col("doc_id"), col("text"))
    val whole = Dedup.bandTable(
      Dedup.minhashSignatures(shingled(docs), "doc_id", "sh", 15),
      "doc_id", numBands = 3, rowsPerBand = 5)
    val persisted = spark.read.parquet(path)
    assert(persisted.count() == whole.count())
    assert(persisted.except(whole).isEmpty && whole.except(persisted).isEmpty,
      "persisted band table diverges from whole-corpus banding")

    // second call must NOT rebuild (same artifact, untouched)
    val mtime = marker.lastModified()
    val path2 = TextQueries.t34IndexPath(spark, sf0001)
    assert(path2 == path && marker.lastModified() == mtime,
      "second build call rebuilt the persisted index")
  }

  test("probe finds every planted replay via the persisted index") {
    val out = graft.queries.Registry.queries("t34_persisted_lsh_index")(spark, sf0001)
    val docs = Tables.documents(spark, sf0001).select(col("doc_id"), col("text"))
    val expected = shingled(docs.filter(pmod(col("doc_id"), lit(7)) === 0))
      .count()
    // every replayed probe doc must rediscover its original at jaccard 1.0
    val selfHits = out
      .filter(col("doc_a") === col("doc_b") + 4000000L && col("jaccard") === 1.0)
      .count()
    assert(selfHits == expected, s"planted recall $selfHits of $expected")
  }
}
