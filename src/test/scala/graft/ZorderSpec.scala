package graft

import graft.queries.PipelineQueries

/** Known-value checks for q51's Morton (Z-order) bit dilation — the
  * interleave must place x-bits at even and y-bits at odd positions or
  * the layout's two-dimensional locality claim is silently wrong.
  */
class ZorderSpec extends SparkSpec {

  private def z(x: Long, y: Long): Long =
    spark.sql(s"SELECT ${PipelineQueries.mortonZSqlForAudit(
        s"CAST($x AS BIGINT)", s"CAST($y AS BIGINT)")} AS z")
      .collect()(0).getLong(0)

  test("morton interleave matches hand-computed values") {
    // x=10 (1010b) → bits at even positions 6,2 = 68; y=6 (0110b) → odd
    // positions 5,3 = 40; interleaved 1101100b = 108
    assert(z(0, 0) == 0L)
    assert(z(1, 0) == 1L)
    assert(z(0, 1) == 2L)
    assert(z(10, 6) == 108L)
    assert(z(65535, 0) == 0x55555555L)
    assert(z(0, 65535) == 0xAAAAAAAAL)
    assert(z(65535, 65535) == 0xFFFFFFFFL)
  }

  test("morton z preserves box locality: quadrant prefix = top bit pair") {
    // points in the lower-left quadrant (x,y < 2^15) must sort before any
    // point in the upper-right quadrant (x,y >= 2^15) — the property zone
    // maps rely on
    val lo = z(32767, 32767)
    val hi = z(32768, 32768)
    assert(lo < hi)
    assert(hi == (3L << 30))
  }
}
