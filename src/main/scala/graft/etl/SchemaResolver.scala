package graft.etl

import org.apache.spark.sql.DataFrame

/** Column-name alias resolution over dynamic, BI-export-shaped schemas.
  *
  * The reference accepts many spellings for the month and store-name
  * columns and renames the first match to a canonical name, raising a
  * KeyError that lists the available columns when none match
  * (`_ensure_month_col` reference aggregate_by_store.py:452–464,
  * `_ensure_store_name_col` :530–550, 631–646). Resolution is plain Scala
  * over `df.columns` — no Catalyst machinery needed; the rename is a
  * zero-cost projection.
  */
object SchemaResolver {

  /** Aliases for the month column (aggregate_by_store.py:452–456). */
  val monthAliases: Seq[String] =
    Seq("月份", "月", "month", "Month", "MONTH", "Established At Month")

  /** Aliases for the store/branch name column
    * (aggregate_by_store.py:530–537).
    */
  val storeNameAliases: Seq[String] =
    Seq("門市名稱", "門市", "Store Name", "store_name", "Name", "name", "STORE_NAME")

  /** The partition key column of the whole pipeline
    * (fan_out_by_storeid.py:22: `商店序號` = store serial number).
    */
  val storeIdCol = "商店序號"

  /** Rename the first matching alias (exact first, then case-insensitive,
    * both on trimmed headers) to `canonical`. Throws listing available
    * columns when nothing matches — mirroring the reference's KeyError.
    */
  def resolve(df: DataFrame, canonical: String, aliases: Seq[String]): DataFrame = {
    val cols = df.columns
    val trimmedToActual = cols.map(c => c.trim -> c).toMap
    val exact = aliases.collectFirst {
      case a if trimmedToActual.contains(a) => trimmedToActual(a)
    }
    val found = exact.orElse {
      val lowerToActual = cols.map(c => c.trim.toLowerCase -> c).toMap
      aliases.collectFirst {
        case a if lowerToActual.contains(a.toLowerCase) => lowerToActual(a.toLowerCase)
      }
    }
    found match {
      case Some(actual) if actual == canonical => df
      case Some(actual) => df.withColumnRenamed(actual, canonical)
      case None => throw new IllegalArgumentException(
        s"no column matching '$canonical' (aliases: ${aliases.mkString(", ")}); " +
          s"available: ${cols.mkString(", ")}")
    }
  }

  def ensureMonthCol(df: DataFrame, canonical: String = "月份"): DataFrame =
    resolve(df, canonical, monthAliases)

  def ensureStoreNameCol(df: DataFrame, canonical: String = "門市名稱"): DataFrame =
    resolve(df, canonical, storeNameAliases)
}
