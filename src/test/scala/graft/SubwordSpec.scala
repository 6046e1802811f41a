package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

import graft.etl.{TextAnalysis => TA}
import graft.functions.SubwordCount

/** Pins the greedy longest-match contract of [[SubwordCount]]: longest
  * piece wins, unknown code points are single-char tokens, and the
  * column expression agrees with the direct compute.
  */
class SubwordSpec extends SparkSpec {

  private def count(words: String*): Long =
    SubwordCount.compute(new GenericArrayData(
      words.map(w => UTF8String.fromString(w)).toArray[Any]))

  test("greedy longest-match picks the longest piece at each position") {
    // "that" is a 4-piece, so it must NOT decompose as th+at
    assert(count("that") == 1L)
    // theater = the + ate + r (fallback single char)
    assert(count("theater") == 3L)
    // ingestion = "ing" + "est" + "ion"
    assert(count("ingestion") == 3L)
    // pure-unknown word: every char its own token
    assert(count("xxxx") == 4L)
    // digits have no merges
    assert(count("2024") == 4L)
    assert(count() == 0L)
    // multiple words sum
    assert(count("that", "xxxx") == 5L)
  }

  test("unknown multi-byte code points count one token each") {
    // CJK chars are not in the vocab: one token per code point,
    // including astral-plane chars (surrogate pairs = ONE code point)
    assert(count("你好") == 2L)
    assert(count(new String(Character.toChars(0x1F600)) + "an") == 2L) // emoji + "an" merge
  }

  test("column expression matches direct compute on real docs") {
    import spark.implicits._
    val df = Seq("That theater", "", "  spaced   out  ").toDF("text")
      .select(TA.subwordCount(TA.tokens(col("text"))).as("n"))
    assert(df.as[Long].collect().toSeq == Seq(1L + 3L, 0L, count("spaced", "out")))
  }
}
