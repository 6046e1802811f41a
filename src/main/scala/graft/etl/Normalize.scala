package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level normalization kit.
  *
  * Re-expresses the reference's lazy string→typed coercions as pure,
  * codegen-friendly Spark column expressions — no UDFs anywhere:
  *
  *   - `_to_number` (reference aggregate_by_store.py:112–119 and the five
  *     variants at 242–246, 323–328, 425–429, 516–520, 617–621): strip
  *     whitespace, drop `","` thousands separators and `"%"`, treat
  *     empty/"nan"/"None" as missing, coerce to double with
  *     unparseable → null (pandas `errors="coerce"`).
  *   - `_parse_month` (aggregate_by_store.py:436–446): digits-only clean,
  *     yyyymm-style strings take the last two digits, keep 1..12 else null.
  *   - `_fmt_pct` (aggregate_by_store.py:209–215): null → "", else
  *     `"%.2f%%"` of value*100.
  *   - null-token normalization (aggregate_by_store.py:653–661):
  *     ""/"nan"/"NaN"/"NULL"/"None" → null.
  *   - the fill-0 / null-on-zero-division duality (aggregate_by_store.py:
  *     135, 201–202 `fillna(0)` vs 168–170, 204–206 `.where(den != 0)`).
  *
  * All casts are regex-guarded so the expressions are safe under Spark 4's
  * default ANSI mode while keeping the reference's coerce-to-null behavior.
  */
object Normalize {

  /** Tokens the reference treats as missing (aggregate_by_store.py:653–661). */
  val nullTokens: Seq[String] = Seq("", "nan", "NaN", "NULL", "None")

  private val numberRe = "^[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?$"

  /** pandas' parser accepts infinity tokens (`precise_xstrtod`:
    * "inf"/"Infinity", optional sign, case-insensitive) — `to_numeric`
    * yields float ±inf, which `fillna(0)` does NOT fill (inf is not NA),
    * so an 'inf' cell sums to infinity in the reference. 'nan' is
    * different: it parses to NaN, which fillna(0) DOES fill — identical
    * to our null→0, so only inf needs the explicit branch.
    */
  private val infRe = "^(?i)[+-]?inf(inity)?$"

  private def infValue(t: Column): Column =
    when(t.startsWith("-"), lit(Double.NegativeInfinity))
      .otherwise(lit(Double.PositiveInfinity))

  /** Human-formatted number string → double; unparseable → null.
    * `translate` deletes every ','/'%' in one non-regex pass (same
    * semantics as pandas str.replace chains); the numeric-shape guard
    * keeps 'nan' null (≡ NaN→fillna(0)) where a bare cast would accept
    * it, and the inf branch reproduces pandas' float-infinity parse.
    */
  def toNumber(c: Column): Column = {
    val cleaned = translate(trim(c), ",%", "")
    when(cleaned.rlike(numberRe), cleaned.cast("double"))
      .when(cleaned.rlike(infRe), infValue(cleaned))
  }

  /** Bare numeric coercion (aggregate_by_store.py:736–739): plain
    * `pd.to_numeric(errors="coerce")` with NO thousands-separator/percent
    * cleanup — the generic config path's weaker contract. Whitespace is
    * trimmed (pandas' parser accepts padded numbers); 'nan' stays null
    * (≡ NaN→fillna(0)); infinity tokens parse to ±inf as pandas does.
    */
  def bareNumber(c: Column): Column = {
    val t = trim(c)
    when(t.rlike(numberRe), t.cast("double"))
      .when(t.rlike(infRe), infValue(t))
  }

  /** Digits-only cleanup (aggregate_by_store.py:126–131, 440). */
  def digitsOnly(c: Column): Column = regexp_replace(trim(c), "[^0-9]", "")

  /** Messy month string ("1", "01", "202501", "2025-01", "2025/01") → int
    * 1..12, else null (aggregate_by_store.py:436–446).
    */
  def parseMonth(c: Column): Column = {
    val digits = digitsOnly(c)
    val mm = when(length(digits) >= 6, substring(digits, -2, 2)).otherwise(digits)
    // any all-digit string under 6 chars is numeric-coerced whole (the
    // reference's pd.to_numeric accepts leading zeros: "012" → 12,
    // "0005" → 5), then the 1..12 guard drops out-of-range months
    val n = when(mm.rlike("^\\d{1,5}$"), mm.cast("int"))
    when(n.between(1, 12), n)
  }

  /** Ratio → "12.34%" string; null → "" (aggregate_by_store.py:209–215).
    * The value is rounded to 2 decimals *before* formatting so the tie
    * behavior is the engine's round (half away from zero in both Spark
    * and DuckDB) rather than printf's platform-dependent tie rule
    * (Java %.2f is half-up, C printf is half-even — they disagree on
    * exact .xx5 doubles).
    */
  def fmtPct(c: Column): Column =
    when(c.isNull, lit(""))
      .otherwise(format_string("%.2f%%", round(c * lit(100), 2)))

  /** Division that yields null (not error, not 0) on a zero or null
    * denominator (aggregate_by_store.py:168–170 etc.). ANSI-safe: the
    * divide is never evaluated when the guard fails.
    */
  def safeDiv(num: Column, den: Column): Column =
    when(den.isNotNull && den =!= 0, num / den)

  /** Missing measure → 0 (aggregate_by_store.py:135, 201–202, ...). */
  def zeroFill(c: Column): Column = coalesce(c, lit(0.0))

  /** Null-token normalization on name-like columns
    * (aggregate_by_store.py:653–661, 670–678).
    */
  def nullifyTokens(c: Column): Column = {
    val t = trim(c)
    when(t.isin(nullTokens: _*), lit(null.asInstanceOf[String])).otherwise(t)
  }

  /** Year-over-year delta: (cur − prev) / prev, null when prev = 0
    * (aggregate_by_store.py:168–172).
    */
  def yoy(cur: Column, prev: Column): Column = safeDiv(cur - prev, prev)

  /** Strip whitespace from all column names
    * (aggregate_by_store.py:468, 477, 554, 563, 650, 667).
    */
  def trimHeaders(df: DataFrame): DataFrame =
    df.toDF(df.columns.toIndexedSeq.map(_.trim): _*)
}
