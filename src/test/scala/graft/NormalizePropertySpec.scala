package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.etl.Normalize

/** Property tests: the Spark normalization kit against independent plain-
  * Scala models of the reference's `_to_number` / `_parse_month`
  * semantics (aggregate_by_store.py:112–119, 436–446), over generated
  * messy inputs — csv_gen's generate-random-inputs-check-invariants idea
  * applied at the operator level.
  */
class NormalizePropertySpec extends SparkSpec {

  // deterministic sampling (no scalatest-scalacheck bridge in the
  // offline cache): materialize the generator at fixed seeds
  private def samplesOf(g: Gen[String], seed: Long, n: Int): List[String] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(seed)).get
  import spark.implicits._

  // plain-Scala model of toNumber (trim → drop ','/'%' → regex-guarded
  // double parse; null tokens & garbage → None)
  private def modelToNumber(raw: String): Option[Double] = {
    val cleaned = raw.trim.replace(",", "").replace("%", "")
    val re = "^[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?$".r
    if (re.findFirstIn(cleaned).isDefined) Some(cleaned.toDouble) else None
  }

  // plain-Scala model of parseMonth: under-6-digit strings numeric-coerce
  // whole (pd.to_numeric accepts leading zeros: "012" → 12), then 1..12
  private def modelParseMonth(raw: String): Option[Int] = {
    val digits = raw.trim.replaceAll("[^0-9]", "")
    val mm = if (digits.length >= 6) digits.takeRight(2) else digits
    if (mm.nonEmpty && mm.length <= 5) {
      val n = mm.toInt
      if (n >= 1 && n <= 12) Some(n) else None
    } else None
  }

  private val messyNumber: Gen[String] = Gen.oneOf(
    Gen.chooseNum(-1e6, 1e6).map(d => f"$d%.2f"),
    Gen.chooseNum(0L, 9999999L).map { n =>
      val s = n.toString
      if (s.length > 3) s.dropRight(3) + "," + s.takeRight(3) else s
    },
    Gen.chooseNum(0.0, 100.0).map(d => f"$d%.1f%%"),
    Gen.oneOf("", " ", "nan", "NaN", "None", "abc", "1-2", "--3", "+ 5"),
    Gen.chooseNum(-999, 999).map(n => s"  $n  "),
    Gen.chooseNum(0.0, 1.0).map(d => s"${d}e2"))

  private val messyMonth: Gen[String] = Gen.oneOf(
    Gen.chooseNum(1, 12).map(_.toString),
    Gen.chooseNum(1, 12).map(m => f"$m%02d"),
    Gen.chooseNum(1, 12).map(m => f"2025$m%02d"),
    Gen.chooseNum(1, 12).map(m => f"2024-$m%02d"),
    Gen.chooseNum(1, 12).map(m => f"2024/$m%02d"),
    Gen.chooseNum(0, 99).map(_.toString),
    Gen.chooseNum(1, 12).map(m => f"0$m%02d"),   // leading-zero 3-digit: "012"
    Gen.oneOf("", "n/a", "month", "202500", "202513", " 7 ",
      "0005", "00012", "12345", "013"))

  test("toNumber matches the reference model on generated messy numbers") {
    for (seed <- 1L to 5L) {
      val samples = samplesOf(messyNumber, seed, 300)
      val got = samples.toDF("raw")
        .select(Normalize.toNumber(col("raw"))).collect()
        .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toList
      assert(got == samples.map(modelToNumber), s"seed=$seed")
    }
  }

  test("parseMonth matches the reference model on generated messy months") {
    for (seed <- 1L to 5L) {
      val samples = samplesOf(messyMonth, seed, 300)
      val got = samples.toDF("raw")
        .select(Normalize.parseMonth(col("raw"))).collect()
        .map(r => if (r.isNullAt(0)) None else Some(r.getInt(0))).toList
      assert(got == samples.map(modelParseMonth), s"seed=$seed")
    }
  }
}
