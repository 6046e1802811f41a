package graft

import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Native Md5Prefix60 against the declarative conv(substr(md5)) spec. */
class Md5Prefix60Spec extends SparkSpec {

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
