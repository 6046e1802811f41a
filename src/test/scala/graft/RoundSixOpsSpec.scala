package graft

import org.apache.spark.sql.functions._

import graft.queries.Registry

/** Properties of the round-6 operators that the SQL oracles can't state
  * directly:
  *
  *   - q74 count-min: estimates can only over-count (est ≥ exact), and
  *     the ⌈2N/w⌉ envelope holds on the probed keys.
  *   - t66 negative sampling: exactly k negatives per anchor, never the
  *     anchor itself, all drawn from the corpus, and bit-identical
  *     across re-runs (the determinism that makes backfills safe).
  */
class RoundSixOpsSpec extends SparkSpec {

  private def run(name: String) =
    Registry.queries(name)(spark, sf0001)

  test("q74: count-min only over-counts and stays inside the envelope") {
    val rows = run("q74_countmin_freq").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val exact = r.getAs[Long]("n_exact")
      val est = r.getAs[Long]("n_est")
      assert(est >= exact, s"under-count: $r")
      assert(r.getAs[Boolean]("within_bound"), s"envelope violated: $r")
    }
  }

  test("t66: k negatives per anchor, no self-pairs, deterministic") {
    val a = run("t66_negative_sampling").collect()
    val b = run("t66_negative_sampling").collect()
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted),
      "re-run must be bit-identical")
    val ids = graft.etl.Tables.documents(spark, sf0001)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val perAnchor = a.groupBy(_.getAs[Long]("anchor_id"))
    assert(perAnchor.size == ids.size, "every doc anchors")
    perAnchor.foreach { case (anchor, rs) =>
      // k = 3 is an UPPER bound in general (a probe whose bucket holds
      // only the anchor yields no candidate — see the t66 doc comment);
      // on THIS corpus (500 docs over 64 buckets, ≥ 2 docs per bucket
      // w.h.p.) every probe fills, so the exact count is asserted. If
      // this ever flaps on regenerated testdata, weaken to 1 <= n <= 3.
      assert(rs.length == 3, s"anchor $anchor has ${rs.length} negatives")
      rs.foreach { r =>
        val neg = r.getAs[Long]("neg_id")
        assert(neg != anchor, s"self-pair at $anchor")
        assert(ids.contains(neg), s"negative $neg not in corpus")
      }
    }
  }
}
