package graft

import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Native expressions against their declarative executable specs. */
class Md5Prefix60Spec extends SparkSpec {

  test("char/token shingles: native == declarative, incl. unicode & edges") {
    val df = spark.range(300).select(
      concat(lit("  Mixed CASE text 商店 "), col("id"),
        when(col("id") % 5 === 0, lit(" repeated repeated repeated"))
          .otherwise(lit(" unique words here also commas,"))).as("text"))
      .withColumn("toks", graft.etl.TextAnalysis.tokens(col("text")))
    val bad = df.select(
      Portable.charShingles(col("text"), 3).as("a"),
      Portable.charShinglesDecl(col("text"), 3).as("b"),
      Portable.tokenShingles(col("toks"), 3).as("c"),
      Portable.tokenShinglesDecl(col("toks"), 3).as("d"))
      .filter(col("a") =!= col("b") || col("c") =!= col("d"))
    assert(bad.count() == 0)
    // edges: short/empty inputs
    val edge = df.sparkSession.sql("SELECT 1")
      .select(Portable.charShingles(lit("ab"), 3).as("a"),
        Portable.charShingles(lit("  "), 3).as("b"),
        Portable.tokenShingles(array(lit("x")), 3).as("c"))
      .collect()(0)
    assert(edge.getSeq[String](0) == Seq() && edge.getSeq[String](1) == Seq() &&
      edge.getSeq[String](2) == Seq())
    // null input: native and declarative must BOTH null-propagate
    val nulls = df.sparkSession.sql("SELECT 1")
      .select(
        Portable.charShingles(lit(null).cast("string"), 3).as("a"),
        Portable.charShinglesDecl(lit(null).cast("string"), 3).as("b"),
        Portable.tokenShingles(lit(null).cast("array<string>"), 3).as("c"),
        Portable.tokenShinglesDecl(lit(null).cast("array<string>"), 3).as("d"))
      .collect()(0)
    assert((0 until 4).forall(nulls.isNullAt), s"expected all null, got $nulls")
  }

  test("hash60 == hash60Decl bit-exactly, incl. unicode and empty strings") {
    val df = spark.range(500).select(
      concat(lit("s"), col("id"),
        when(col("id") % 3 === 0, lit("商店序號-αβγ")).otherwise(lit(""))).as("s"))
    val bad = df.select(
      Portable.hash60(col("s"), 7).as("a"),
      Portable.hash60Decl(col("s"), 7).as("b"))
      .filter(col("a") =!= col("b") || col("a") < 0 || col("a") >= lit(1L << 60))
    assert(bad.count() == 0)
    val empty = df.sparkSession.sql("SELECT 1")
      .select(Portable.hash60(lit(""), 0).as("a"), Portable.hash60Decl(lit(""), 0).as("b"))
      .collect()(0)
    assert(empty.getLong(0) == empty.getLong(1))
  }
}
