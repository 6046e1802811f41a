package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.etl.FixedPoint

/** The DECIMAL(38,0) accumulator seam (q80's operator): the width policy
  * picks the accumulator at plan time from declared magnitude bounds, the
  * long path fails LOUDLY (ANSI) instead of wrapping when its bound was a
  * lie, and the decimal path sums exactly past 2^63.
  */
class FixedPointSpec extends SparkSpec {
  import spark.implicits._

  test("policy: long under small bounds, decimal at 100 TB bounds") {
    assert(FixedPoint.longIsSafe(1000000L, 1000000000L)) // 1e6 rows @ 1e9
    assert(!FixedPoint.longIsSafe(100000000000L, 1000000000L)) // 1e11 @ 1e9
    val df = Seq(1L, 2L).toDF("v")
    val narrow = df.agg(FixedPoint.sumExact(col("v"), 1000000L, 1000000000L))
    assert(narrow.schema.head.dataType == LongType)
    val wide = df.agg(FixedPoint.sumExact(col("v"), 100000000000L, 1000000000L))
    assert(wide.schema.head.dataType == DecimalType(38, 0))
    assert(wide.as[java.math.BigDecimal].head().longValueExact() == 3L)
  }

  test("past 2^63: long path fails loudly under ANSI, decimal path is exact") {
    // three terms summing to Long.MaxValue + 99 — any long accumulation
    // order overflows on the final add
    val vals = Seq(Long.MaxValue / 2 + 1, Long.MaxValue / 2 + 1, 98L)
    val df = vals.toDF("v").coalesce(1)
    // declared bounds that LIE (2 rows @ maxValue/4 → policy says long is
    // safe) — the actual 3-row overflow must then fail loudly, not wrap
    assert(FixedPoint.longIsSafe(2L, Long.MaxValue / 4))
    val caught = intercept[Throwable] {
      df.agg(FixedPoint.sumExact(col("v"), 2L, Long.MaxValue / 4)).collect()
    }
    assert(caught.getMessage.toLowerCase.contains("overflow"),
      s"expected an ANSI overflow error, got: ${caught.getMessage}")
    val exact = df.agg(FixedPoint.sumExact(col("v"), 10L, Long.MaxValue / 2))
      .as[java.math.BigDecimal].head()
    val expect = vals.map(BigInt(_)).sum
    assert(BigInt(exact.toBigInteger) == expect)
  }

  test("ANSI-off: the long path refuses at plan time (no silent wrap)") {
    // with ANSI off the long path's fail-loudly guarantee evaporates —
    // sumExact must refuse to hand back a silently-wrapping accumulator
    val key = "spark.sql.ansi.enabled"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      val e = intercept[IllegalArgumentException] {
        Seq(1L).toDF("v").agg(FixedPoint.sumExact(col("v"), 2L, 2L))
      }
      assert(e.getMessage.contains("ansi"))
      // the decimal path stays available under either mode (can't wrap)
      val d = Seq(1L, 2L).toDF("v")
        .agg(FixedPoint.sumExact(col("v"), 100000000000L, 1000000000L))
        .as[java.math.BigDecimal].head()
      assert(d.longValueExact() == 3L)
    } finally spark.conf.set(key, old)
  }

  test("decimal accumulator equals long accumulator where long is valid") {
    val df = (1L to 1000L).toDF("v")
    val r = df.agg(
      sum(col("v")).as("l"),
      FixedPoint.sumExact(col("v"), 100000000000L, 1000000000L)
        .cast("long").as("d"))
      .as[(Long, Long)].head()
    assert(r._1 == r._2 && r._1 == 500500L)
  }
}
