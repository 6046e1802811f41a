package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group top-k / bottom-k (reference aggregate_by_store.py:593–594 top-5
  * branches per store by ratio DESC, :705–706 bottom-5 ASC; SURVEY.md §2.5
  * O2/O3).
  *
  * The reference's pandas `sort_values` is an unstable sort with no tie-break
  * column, so its top/bottom-5 are nondeterministic under ties (SURVEY.md
  * §2.5 note). The rebuild imposes a total order: callers MUST pass a
  * tie-break ordering suffix (typically the group-member id ascending) so
  * results are reproducible and oracle-comparable.
  *
  * Scale: `row_number` over `Window.partitionBy(group)` is a single shuffle
  * on the group key with no driver-side loops — the per-store Python loop in
  * the reference (aggregate_by_store.py:593) becomes one distributed window.
  * Skewed groups only carry k rows past the rank filter.
  */
object TopK {

  /** Rank rows within each group by `ordering` and keep the first k.
    * `ordering` must be a total order for deterministic output.
    */
  def perGroup(
      df: DataFrame,
      groupCols: Seq[Column],
      ordering: Seq[Column],
      k: Int,
      rankCol: String = "rnk"): DataFrame = {
    val w = Window.partitionBy(groupCols: _*).orderBy(ordering: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }

  /** Top-k per group by `metric` descending, id ascending as tie-break. */
  def topK(df: DataFrame, groupCols: Seq[Column], metric: Column,
           tieBreak: Column, k: Int): DataFrame =
    perGroup(df, groupCols, Seq(metric.desc, tieBreak.asc), k)

  /** Bottom-k per group by `metric` ascending, id ascending as tie-break.
    * `asc_nulls_last`: Spark's plain asc puts NULLs FIRST, but the
    * pandas reference (NaN last in sort_values) and DuckDB's default
    * null order (NULLS LAST) both sort them last — a null-ratio branch
    * must not displace real low ratios from the bottom-5.
    */
  def bottomK(df: DataFrame, groupCols: Seq[Column], metric: Column,
              tieBreak: Column, k: Int): DataFrame =
    perGroup(df, groupCols, Seq(metric.asc_nulls_last, tieBreak.asc), k)
}
