package graft

import org.apache.spark.sql.functions._

import graft.queries.Registry

/** Semantics pins for the round-7 entries:
  *   - e29 banded near-dup: on the doubled corpus the mix16x4 geometry
  *     must find EVERY planted duplicate pair (recall 1.0 — exact dups
  *     collide in all bands) while generating essentially nothing else
  *     (the candidate-volume claim e13 measures, asserted here on the
  *     production entry's output);
  *   - e30 banded SemDeDup: planted pairs verify lexically (identical
  *     text → jaccard 1, is_dup 1);
  *   - t67 BPE trainer: three DISTINCT merges with non-increasing
  *     frequency (merging the top pair can only shrink or split other
  *     pair counts, never beat the round's max).
  */
class RoundSevenOpsSpec extends SparkSpec {

  private def run(name: String) = Registry.queries(name)(spark, sf0001)

  private val dupShift = 1000000L

  test("e29: banded near-dup finds every planted pair and ~nothing else") {
    val nVecs = graft.etl.Tables.embeddings(spark, sf0001).count()
    val rows = run("e29_embed_neardup_banded").collect()
    val pairs = rows.map(r =>
      (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    // every planted (v, v + dupShift) pair is found: recall 1.0
    val planted = (0L until nVecs).map(v => (v, v + dupShift)).toSet
    assert(planted.subsetOf(pairs),
      s"missing planted pairs: ${(planted -- pairs).take(5)}")
    // and the survivor set is essentially planted-only (the geometry
    // claim: non-planted survivors would be genuine cos ≥ 0.95 pairs,
    // of which this uniform-random corpus has none)
    assert(pairs == planted, s"unexpected extra pairs: ${(pairs -- planted).take(5)}")
    rows.foreach(r => assert(r.getAs[Double]("sim") >= 0.95))
  }

  test("e13: production geometry's candidate volume is planted-pairs + ε") {
    val rows = run("e13_lsh_geometry_audit").collect()
      .map(r => r.getAs[String]("geometry") ->
        ((r.getAs[Long]("n_cand"), r.getAs[Long]("n_planted")))).toMap
    val (mixCand, mixPlanted) = rows("mix16x4")
    // the e29/e30 production geometry: candidate volume within ~25% of
    // the planted-pair floor (ε covers genuine near-angle band
    // collisions on the random corpus — measured 15% at sf0.001)
    assert(mixCand <= mixPlanted + math.max(10L, mixPlanted / 4),
      s"mix16x4 candidate volume $mixCand vs planted $mixPlanted")
    assert(mixPlanted > 0)
    // and the deprecated legacy family is measurably worse — the reason
    // e03/e07 carry deprecation pins
    val (legCand, _) = rows("hp8x1")
    assert(legCand > 3 * mixCand,
      s"legacy candidate volume $legCand should dwarf banded $mixCand")
  }

  test("e30: planted pairs verify lexically (jaccard 1, is_dup 1)") {
    val rows = run("e30_semantic_neardup_banded").collect()
    assert(rows.nonEmpty)
    rows.filter(r => r.getAs[Long]("vec_b") == r.getAs[Long]("vec_a") + dupShift)
      .foreach { r =>
        assert(r.getAs[Double]("jaccard") == 1.0, s"planted pair not identical: $r")
        assert(r.getAs[Int]("is_dup") == 1)
      }
  }

  test("t67: three distinct merges, non-increasing frequency") {
    val rows = run("t67_bpe_train").collect()
      .sortBy(_.getAs[Int]("round"))
    assert(rows.map(_.getAs[Int]("round")).toSeq == Seq(1, 2, 3))
    val merges = rows.map(r => (r.getAs[String]("s1"), r.getAs[String]("s2")))
    assert(merges.distinct.length == 3, s"repeated merge: ${merges.toSeq}")
    val freqs = rows.map(_.getAs[Long]("freq"))
    assert(freqs.zip(freqs.tail).forall { case (a, b) => a >= b },
      s"round frequencies must be non-increasing: ${freqs.toSeq}")
    merges.foreach { case (s1, s2) =>
      assert(s1.nonEmpty && s2.nonEmpty && !s1.contains(" ") && !s2.contains(" "))
    }
  }
}
