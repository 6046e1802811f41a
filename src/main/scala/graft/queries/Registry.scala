package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query: a Spark DataFrame program plus (where SQL-expressible)
  * an equivalent ANSI SQL oracle the driver runs in DuckDB over the same
  * parquet tables. Column names/aliases MUST match between the two — the
  * driver sorts columns by name before hashing values.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Central registry of every implemented operator's query entry
  * (SURVEY.md §2 inventory + the LLM-pipeline extension operators).
  */
object Registry {
  def all: Seq[Q] =
    ParityQueries.all ++ PipelineQueries.all ++ KpiQueries.all ++
      TextQueries.all ++ CorpusQueries.all ++ SimilarityQueries.all ++
      MultimodalQueries.all ++ StreamQueries.all ++ StatsQueries.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Entries whose cost is the DEPRECATED legacy hyperplane family
    * (correlated 8-plane geometry, ~93 effective buckets → the bucket
    * self-join is ≈ N²/93 at corpus scale; superseded by the banded
    * e29/e30 production entries, as e13's own audit demonstrates).
    * Kept as frozen hash pins — Verify still dumps and oracle-checks
    * them every round — but EXCLUDED from the default bench run so the
    * benchmark measures the production path, not a family the repo
    * deprecates. Opt back in with SPARK_GRAFT_BENCH_LEGACY=true or by
    * naming them explicitly as Bench args.
    */
  val legacyBenchOptOut: Set[String] =
    Set("e03_embed_neardup", "e07_semantic_neardup", "e13_lsh_geometry_audit")
}
