package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the LLM-pipeline
  * extension operators) registers one named query in `queries` and, where
  * SQL-expressible, a DuckDB oracle in `oracleSql`. The maps are assembled
  * in [[graft.queries.Registry]].
  */
object SparkEntry {
  /** Flagship query (reference config 23-1/24-1 semantics: YoY + rate KPI,
    * aggregate_by_store.py:109–236) on sf0.001; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_store_yoy")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Registry.oracleSql
}
