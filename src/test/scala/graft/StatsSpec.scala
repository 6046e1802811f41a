package graft

import org.apache.spark.sql.functions._

/** q33's approximation envelope: `approx_percentile` at accuracy 10000
  * must land within the value range spanned by nearby exact percentiles
  * (it has no DuckDB oracle — sketches aren't hash-comparable across
  * engines — so this spec is its correctness check).
  */
class StatsSpec extends SparkSpec {

  private lazy val sfDir = sf0001

  test("approx_percentile within envelope of exact percentile") {
    val exact = SparkEntry.queries("q26_value_percentiles")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val approx = SparkEntry.queries("q33_percentiles_approx")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (flag, (p50, p90, p99)) =>
      val (a50, a90, a99) = approx(flag)
      // 2% relative tolerance: generous for accuracy=10000 on sf0.001
      // group sizes, tight enough to catch a wrong percentile entirely
      def ok(e: Double, a: Double) = math.abs(a - e) <= 0.02 * math.abs(e)
      assert(ok(p50, a50) && ok(p90, a90) && ok(p99, a99),
        s"$flag: exact=($p50,$p90,$p99) approx=($a50,$a90,$a99)")
    }
  }
}
