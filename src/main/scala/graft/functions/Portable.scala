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

  /** Deterministic 60-bit hash of a string column, seed-salted — the
    * native [[Md5Prefix60]] expression (bit-identical to
    * `conv(substr(md5(x||'#seed'),1,15),16,10)`, which stays the DuckDB
    * oracle formulation; [[hash60Decl]] keeps the declarative version as
    * the executable spec).
    */
  def hash60(c: Column, seed: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(Md5Prefix60(
      ColumnBridge.expression(concat(c, lit(s"#$seed")))))
  }

  def hash60(c: Column): Column = hash60(c, 0)

  /** Declarative formulation of [[hash60]] (tested bit-equal). */
  def hash60Decl(c: Column, seed: Int): Column =
    conv(substring(md5(concat(c, lit(s"#$seed"))), 1, 15), 16, 10).cast("long")

  // ---- minhash hash family --------------------------------------------
  //
  // k independent-ish hashes from ONE md5: split the 60-bit base hash into
  // two 30-bit halves and apply per-i affine transforms mod 2^40. All
  // products stay < 2^62, so the arithmetic is overflow-free under ANSI
  // mode and bit-identical in any engine with 64-bit integer math —
  // the DuckDB oracle mirrors `(a*(h&M30) + b*(h>>30) + c) % 2^40`
  // verbatim. One md5 per shingle instead of k is the difference between
  // the hash family costing O(k·bytes) and O(bytes) per shingle.

  val minhashMod: Long = 1L << 40

  private val mask30 = (1L << 30) - 1

  private def splitmix(i: Long): Long = {
    var z = i * 0x9E3779B97F4A7C15L + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** (a_i, b_i, c_i) affine constants: a,b odd 31-bit, c 36-bit. */
  def minhashConsts(k: Int): Seq[(Long, Long, Long)] =
    (0 until k).map { i =>
      ((splitmix(2L * i) & 0x7FFFFFFFL) | 1L,
        (splitmix(2L * i + 1) & 0x7FFFFFFFL) | 1L,
        splitmix(1000L + i) & 0xFFFFFFFFFL)
    }

  /** The i-th minhash transform of a 60-bit base hash column. */
  def minhashTransform(h: Column, consts: (Long, Long, Long)): Column = {
    val (a, b, c) = consts
    pmod(lit(a) * h.bitwiseAND(lit(mask30)) + lit(b) * shiftright(h, 30) + lit(c),
      lit(minhashMod))
  }

  /** DuckDB-side mirror of [[minhashTransform]] over hash column `h`. */
  def minhashTransformSql(h: String, consts: (Long, Long, Long)): String = {
    val (a, b, c) = consts
    s"($a * ($h & $mask30) + $b * ($h >> 30) + $c) % $minhashMod"
  }

  /** Sequential-fold dot product of two numeric arrays (double) — the
    * codegen'd [[DotProduct]] Catalyst expression. Same accumulation
    * order (and thus bit pattern) as the declarative
    * `aggregate(zip_with(a,b,*),0d,+)` fold and DuckDB's
    * `list_dot_product`, but a primitive loop instead of an interpreted
    * higher-order function.
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a.cast("array<double>")),
      ColumnBridge.expression(b.cast("array<double>"))))
  }

  /** The declarative-fold formulation of [[dot]] (kept as the executable
    * spec the custom expression is tested against).
    */
  def dotFold(a: Column, b: Column): Column =
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

  /** Evaluate column `c` once and feed the materialized value to `f`.
    *
    * Spark's higher-order array functions are interpreted
    * (CodegenFallback): a lambda body that references a compound argument
    * expression re-evaluates it once PER ELEMENT — e.g. shingling a
    * `trim(lower(text))` argument re-lowercases the whole document for
    * every shingle, turning O(len) work into O(len²). Binding the value as
    * a single-element `transform` lambda variable evaluates it exactly
    * once; the variable reference inside `f` is a plain slot read.
    */
  def once(c: Column)(f: Column => Column): Column =
    element_at(transform(array(c), f), 1)

  /** Distinct character n-gram shingles of a string column (normalized
    * via trim+lower). Empty/short strings yield an empty array. Native
    * [[CharShingles]] expression; [[charShinglesDecl]] is the
    * tested-equal declarative spec.
    */
  def charShingles(c: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(CharShingles(ColumnBridge.expression(c.cast("string")), n))
  }

  /** Declarative formulation of [[charShingles]]. Null-propagates on null
    * input (the CaseWhen otherwise-branch would silently return an empty
    * array instead), keeping it bit-compatible with the native expression
    * on nullable columns.
    */
  def charShinglesDecl(c: Column, n: Int): Column =
    when(c.isNotNull,
      once(trim(lower(c))) { s =>
        array_distinct(
          when(length(s) >= n,
            transform(sequence(lit(1), length(s) - lit(n - 1)),
              i => s.substr(i, lit(n))))
            .otherwise(array().cast("array<string>")))
      })

  /** Distinct n-token shingles (consecutive-token n-grams joined by "_").
    * Native [[TokenShingles]] expression; [[tokenShinglesDecl]] is the
    * tested-equal declarative spec.
    */
  def tokenShingles(tokens: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(TokenShingles(ColumnBridge.expression(tokens), n))
  }

  /** Declarative formulation of [[tokenShingles]]. Null-propagates on
    * null input, matching the native expression (see [[charShinglesDecl]]).
    */
  def tokenShinglesDecl(tokens: Column, n: Int): Column =
    when(tokens.isNotNull,
      once(tokens) { ts =>
        array_distinct(
          when(size(ts) >= n,
            transform(sequence(lit(0), size(ts) - lit(n)),
              i => concat_ws("_", (0 until n).map(j => element_at(ts, i + lit(j + 1))): _*)))
            .otherwise(array().cast("array<string>")))
      })

  /** Pack an EXACTLY-3-codepoint string into a long:
    * `cp0 + cp1·2²¹ + cp2·2⁴²`. Injective for every Unicode input —
    * Spark's `substring` is codepoint-based and `ascii` returns the
    * full first codepoint (verified: 'é'→233, '中'→20013, '😀'→128512),
    * and codepoints are < 0x110000 < 2²¹, so the three fields never
    * overlap and two distinct shingles can never collide. Injectivity
    * (not hashing) is the point: set-intersection counts over packed
    * longs are IDENTICAL to counts over the strings, so a Jaccard
    * verify may run on primitive long arrays — ~2× faster per candidate
    * pair than UTF8String set probes (measured on t08) — without
    * touching the declared exact semantics or any oracle hash.
    */
  def packChar3(s: Column): Column =
    ascii(substring(s, 1, 1)).cast("long") +
      shiftleft(ascii(substring(s, 2, 1)).cast("long"), 21) +
      shiftleft(ascii(substring(s, 3, 1)).cast("long"), 42)

  /** Jaccard similarity of two distinct-element arrays: |∩| / |∪|.
    * Integer set sizes divided in double — exact in both engines.
    * Null when the union is empty.
    *
    * One set build, not two: the inputs are DISTINCT arrays by contract
    * (every shingle builder emits array_distinct; the packChar3 map is
    * injective so packed arrays stay distinct), so
    * |∪| = |a| + |b| − |∩| — skipping `array_union` halves the per-pair
    * hash-set work on the dedup verify path, where this function runs
    * once per candidate pair over few-hundred-element arrays. Values
    * are bit-identical to the two-set formulation on distinct inputs
    * (integer identity, pinned property-style by TextDedupSpec), so
    * every oracle hash is unchanged. On arrays WITH duplicates the
    * size identity does not hold — |a|+|b| over-counts the union and
    * the similarity is silently UNDER-reported ([a,a] vs [a] scores
    * 0.5, not 1.0) — so callers outside the shingle-builder family use
    * [[jaccardGeneral]].
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = (size(a) + size(b)).cast("double") - inter
    when(uni =!= 0.0, inter / uni)
  }

  /** [[jaccard]] over SORTED distinct arrays — same values bit-exactly
    * (an intersection COUNT is element-order-insensitive, and on
    * distinct inputs |∪| = |a| + |b| − |∩| as in [[jaccard]]), but the
    * per-pair intersection runs as the zero-allocation merge scan of
    * [[IntersectCountSorted]] instead of `array_intersect`'s hash-set
    * build + result-array materialization. The caller hoists one
    * `sort_array` per DOCUMENT row before the candidate join fans the
    * array out per PAIR — the dedup verify path evaluates this once per
    * candidate pair, so moving work from per-pair to per-doc is the
    * guide §1.2 "per-task work" lever (measured on t08/t06, see
    * OPTIMIZATION_r18.md). PRECONDITION as [[IntersectCountSorted]]:
    * both arrays sorted ascending (sort_array default), distinct
    * elements; TextDedupSpec pins equality with [[jaccard]].
    */
  def jaccardSorted(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val inter = ColumnBridge.column(IntersectCountSorted(
      ColumnBridge.expression(a), ColumnBridge.expression(b))).cast("double")
    val uni = (size(a) + size(b)).cast("double") - inter
    when(uni =!= 0.0, inter / uni)
  }

  /** General-contract Jaccard: builds the union set explicitly
    * (`array_union`), so duplicate elements in either input are
    * collapsed instead of over-counting |∪|. Identical to [[jaccard]]
    * on distinct inputs (TextDedupSpec pins the equality); use this
    * when the inputs are not guaranteed distinct — the hot dedup
    * verify path keeps the one-set-build variant.
    */
  def jaccardGeneral(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni =!= 0.0, inter / uni)
  }
}
