package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Greedy longest-match subword piece count over a token array — the real
  * (WordPiece-style) tokenizer economics behind token budgets and
  * sequence packing, as ONE native codegen'd expression (same seam as
  * [[CharShingles]]): per word, repeatedly consume the longest vocabulary
  * piece (up to [[SubwordCount.maxLen]] code points); any character not
  * starting a vocab piece is its own single-char token, so every word
  * tokenizes totally and deterministically.
  *
  * The vocabulary is compiled into the expression (at 100 TB it would be
  * a broadcast variable feeding the same expression — plan shape
  * identical, and the greedy loop is O(len · maxLen) per word with zero
  * allocation). Code-point arithmetic matches DuckDB's `substr`
  * semantics, so the oracle's recursive-CTE mirror is bit-exact.
  */
case class SubwordCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<string> input, got ${t.sql}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_subword_count"

  override def nullSafeEval(input: Any): Any =
    SubwordCount.compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SubwordCount.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SubwordCount =
    copy(child = newChild)
}

object SubwordCount {

  /** Multi-character merge pieces (lowercase ASCII), the "trained" part
    * of the vocabulary; single code points are the implicit fallback.
    * Deterministic and shared verbatim with the oracle SQL literals —
    * change it in one place only.
    */
  val vocab: Seq[String] = Seq(
    // 4-code-point merges
    "tion", "ment", "able", "ness", "that", "this", "with", "from",
    "have", "ight",
    // 3-code-point merges
    "ing", "ion", "ent", "and", "the", "for", "ter", "est", "ers",
    "ate", "ive", "ous", "ies", "pre", "con", "com", "per", "sub",
    "ver", "der",
    // 2-code-point merges
    "th", "er", "in", "on", "an", "re", "ed", "es", "at", "en", "or",
    "ar", "al", "it", "is", "le", "st", "to", "of", "ch", "sh", "qu",
    "un", "de", "co", "ra", "li", "ne", "ma", "se")

  val maxLen = 4

  private val byLen: Array[java.util.HashSet[String]] = {
    val a = Array.fill(maxLen + 1)(new java.util.HashSet[String]())
    vocab.foreach { p =>
      val l = p.codePointCount(0, p.length)
      require(l >= 2 && l <= maxLen, s"vocab piece '$p' outside 2..$maxLen")
      a(l).add(p)
    }
    a
  }

  /** Total greedy-longest-match piece count across all tokens. */
  def compute(toks: ArrayData): Long = {
    var total = 0L
    var i = 0
    val n = toks.numElements()
    while (i < n) {
      // the type check admits ArrayType(String, containsNull = true):
      // a null element contributes 0 pieces (TokenShingles' convention)
      // rather than NPE-ing the task
      if (toks.isNullAt(i)) { i += 1 }
      else {
      val w = toks.getUTF8String(i).toString
      val len = w.length
      var pos = 0
      while (pos < len) {
        var nextPos = -1
        var l = maxLen
        while (nextPos < 0 && l >= 2) {
          // end of l code points from pos, if the word has that many left
          var end = pos
          var c = 0
          while (c < l && end < len) {
            end = w.offsetByCodePoints(end, 1); c += 1
          }
          if (c == l && byLen(l).contains(w.substring(pos, end))) nextPos = end
          l -= 1
        }
        pos = if (nextPos >= 0) nextPos else w.offsetByCodePoints(pos, 1)
        total += 1L
      }
      i += 1
      }
    }
    total
  }
}
