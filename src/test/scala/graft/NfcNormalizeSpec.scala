package graft

import org.apache.spark.sql.functions._

import graft.etl.{TextAnalysis => TA}

/** Unit pins for the native NFC expression ([[graft.functions
  * .NfcNormalize]]) — the cross-engine oracle (t40) proves parity with
  * DuckDB's nfc_normalize; these pin the Java-side semantics directly.
  */
class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def nfcOf(ss: String*): Seq[String] =
    ss.toDF("s").select(TA.nfc(col("s")).as("n")).collect().map(_.getString(0)).toSeq

  test("decomposed sequences compose: e + U+0301 becomes U+00E9") {
    val Seq(composed, decomposed) = nfcOf("café", "café")
    assert(composed == decomposed)
    assert(composed == "café")
    assert(decomposed.length == 4) // 5 code points collapsed to 'caf' + é
  }

  test("ASCII and already-NFC input pass through unchanged") {
    val in = Seq("plain ascii text", "", "café déjà")
    assert(nfcOf(in: _*) == in)
  }

  test("null propagates, codegen and interpreted paths agree") {
    val df = Seq(Some("ä"), None).toDF("s")
    val out = df.select(TA.nfc(col("s")).as("n")).collect()
    assert(out(0).getString(0) == "ä") // a + diaeresis → ä
    assert(out(1).isNullAt(0))
    // force the interpreted path too (collect on a literal eval)
    val lit0 = graft.functions.NfcNormalize(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        org.apache.spark.unsafe.types.UTF8String.fromString("ö"),
        org.apache.spark.sql.types.StringType))
    assert(lit0.eval(null).toString == "ö")
  }

  test("non-BMP text (surrogate pairs) survives normalization") {
    val emoji = "😀 café"
    assert(nfcOf(emoji) == Seq(emoji))
  }
}
