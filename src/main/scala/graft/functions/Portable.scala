package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable primitives: every function here is a pure Spark column
  * expression with a documented bit-exact ANSI-SQL equivalent (used by the
  * DuckDB oracles), so dedup/similarity results can be hash-compared across
  * engines.
  *
  *   - `hash60`: 60-bit integer hash from an md5 prefix. Spark
  *     `conv(substr(md5(x),1,15),16,10)` ≡ DuckDB
  *     `CAST('0x'||substr(md5(x),1,15) AS BIGINT)` (verified bit-equal).
  *     60 bits keeps the value comfortably inside a signed 64-bit long, so
  *     Spark 4's ANSI mode can never overflow.
  *   - `dot`/`norm`/`cosine`: sequential double-precision folds.
  *     Spark `aggregate(zip_with(a,b,*),0d,+)` ≡ DuckDB
  *     `list_dot_product(a::DOUBLE[],b::DOUBLE[])` — both sum left-to-right
  *     in double, which makes them bit-identical on the same input.
  *
  * Everything is codegen-friendly (no UDFs), so these stay inside
  * WholeStageCodegen at 100 TB scale.
  */
object Portable {

  /** Deterministic 60-bit hash of a string column, seed-salted. */
  def hash60(c: Column, seed: Int): Column =
    conv(substring(md5(concat(c, lit(s"#$seed"))), 1, 15), 16, 10).cast("long")

  def hash60(c: Column): Column = hash60(c, 0)

  /** Sequential-fold dot product of two numeric arrays (double). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"), (x, y) => x * y),
      lit(0.0),
      (acc, v) => acc + v)

  /** Euclidean norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null when either vector has zero norm
    * (the same null-on-zero-denominator contract as
    * [[graft.etl.Normalize.safeDiv]]).
    */
  def cosine(a: Column, b: Column): Column = {
    val den = norm(a) * norm(b)
    when(den =!= 0.0, dot(a, b) / den)
  }

  /** Distinct character n-gram shingles of a string column.
    * Empty/short strings yield an empty array.
    */
  def charShingles(c: Column, n: Int): Column = {
    val s = trim(lower(c))
    array_distinct(
      when(length(s) >= n,
        transform(sequence(lit(1), length(s) - lit(n - 1)),
          i => s.substr(i, lit(n))))
        .otherwise(array().cast("array<string>")))
  }

  /** Distinct n-token shingles (consecutive-token n-grams joined by "_"). */
  def tokenShingles(tokens: Column, n: Int): Column =
    array_distinct(
      when(size(tokens) >= n,
        transform(sequence(lit(0), size(tokens) - lit(n)),
          i => concat_ws("_", (0 until n).map(j => element_at(tokens, i + lit(j + 1))): _*)))
        .otherwise(array().cast("array<string>")))

  /** Jaccard similarity of two distinct-element arrays: |∩| / |∪|.
    * Integer set sizes divided in double — exact in both engines.
    * Null when the union is empty.
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni =!= 0.0, inter / uni)
  }
}
