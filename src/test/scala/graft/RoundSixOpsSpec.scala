package graft

import org.apache.spark.sql.functions._

import graft.queries.Registry

/** Properties of the round-6 operators that the SQL oracles can't state
  * directly:
  *
  *   - t64 span dedup: the hash-fingerprint + island-merge plan must
  *     equal a direct driver-side recompute (substring sets + position
  *     interval union — no hashing, no windows), i.e. duplicated-char
  *     coverage is EXACT, each character counted once.
  *   - q74 count-min: estimates can only over-count (est ≥ exact), and
  *     the ⌈2N/w⌉ envelope holds on the probed keys.
  *   - t66 negative sampling: exactly k negatives per anchor, never the
  *     anchor itself, all drawn from the corpus, and bit-identical
  *     across re-runs (the determinism that makes backfills safe).
  */
class RoundSixOpsSpec extends SparkSpec {

  private def run(name: String) =
    Registry.queries(name)(spark, sf0001)

  test("t64: island coverage equals direct substring-set recompute") {
    val k = 24
    val docs = graft.etl.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // direct recompute: gram -> distinct docs; covered = union of
    // [p, p+k-1] over grams seen in >= 2 docs
    val gramDocs = scala.collection.mutable.Map.empty[String, Set[Long]]
    for ((id, text) <- docs; p <- 0 to text.length - k) {
      val g = text.substring(p, p + k)
      gramDocs(g) = gramDocs.getOrElse(g, Set.empty) + id
    }
    val expected = docs.flatMap { case (id, text) =>
      val covered = new Array[Boolean](text.length)
      var spans = 0
      var inSpan = false
      for (p <- 0 to text.length - k
           if gramDocs(text.substring(p, p + k)).size >= 2;
           q <- p until p + k) covered(q) = true
      covered.foreach { c =>
        if (c && !inSpan) spans += 1
        inSpan = c
      }
      val dup = covered.count(identity)
      if (dup > 0) Some(id -> ((spans.toLong, dup.toLong,
        1000L * dup / text.length))) else None
    }
    val got = run("t64_span_dedup")
      .select(col("doc_id"), col("n_spans"), col("dup_chars"), col("dup_pm"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected,
      s"span coverage mismatch: ${got.toSeq.diff(expected.toSeq).take(3)} vs " +
        s"${expected.toSeq.diff(got.toSeq).take(3)}")
    assert(expected.nonEmpty, "fixture must contain shared spans")
  }

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
      assert(rs.length == 3, s"anchor $anchor has ${rs.length} negatives")
      rs.foreach { r =>
        val neg = r.getAs[Long]("neg_id")
        assert(neg != anchor, s"self-pair at $anchor")
        assert(ids.contains(neg), s"negative $neg not in corpus")
      }
    }
  }
}
