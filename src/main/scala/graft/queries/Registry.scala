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
}
