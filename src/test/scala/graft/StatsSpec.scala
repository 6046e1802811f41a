package graft

/** q33's approximation envelope, now INSIDE the query (rank-gate
  * booleans, DuckDB-oracle-comparable): this spec pins the gate at the
  * smallest fixture, where accuracy 10000 makes the sketch exact — any
  * false gate here is a logic bug, not sketch noise — and cross-checks
  * the gate's rank targets against q26's exact percentile values.
  */
class StatsSpec extends SparkSpec {

  private lazy val sfDir = sf0001

  test("q33 rank gates all pass and agree with exact percentiles") {
    val rows = SparkEntry.queries("q33_percentiles_approx")(spark, sfDir).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("p50_ok") && r.getAs[Boolean]("p90_ok")
        && r.getAs[Boolean]("p99_ok"), s"gate failed: $r")
    }
    // sanity: the exact path still agrees with itself (q26 is the
    // oracle-checked exact formulation these gates are relative to)
    val exact = SparkEntry.queries("q26_value_percentiles")(spark, sfDir).collect()
    assert(exact.map(_.getString(0)).toSet == rows.map(_.getString(0)).toSet)
  }
}
