package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.etl.Bpe

/** Property test for the multi-round BPE trainer: the distributed
  * pipeline (string-encoded segmentations, replace-based merge, top-1
  * argmax) must agree round-for-round with a direct in-memory reference
  * implementation of Sennrich-style BPE (symbol vectors, explicit
  * left-to-right non-overlapping merge) on arbitrary word histograms —
  * including corpora that dry up (no adjacent pair left) before the
  * round budget.
  */
class BpePropertySpec extends SparkSpec {

  /** In-memory reference BPE over a word histogram. */
  private def refBpe(
      hist: Map[String, Long], rounds: Int): Seq[(Int, String, String, Long)] = {
    def mergeSeq(s: Vector[String], p: (String, String)): Vector[String] = {
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == p._1 && s(i + 1) == p._2) {
          b += s(i) + s(i + 1); i += 2
        } else { b += s(i); i += 1 }
      }
      b.result()
    }
    // segmentation vectors concatenate back to their word, so distinct
    // words keep distinct keys through any merge sequence
    var segs: Map[Vector[String], Long] = hist
      .filter(_._1.length >= 2)
      .map { case (w, c) => (w.map(_.toString).toVector, c) }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val pc = collection.mutable.Map[(String, String), Long]()
      for ((s, c) <- segs if s.length >= 2; i <- 0 until s.length - 1)
        pc((s(i), s(i + 1))) = pc.getOrElse((s(i), s(i + 1)), 0L) + c
      if (pc.isEmpty) done = true
      else {
        val ((s1, s2), f) = pc.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((r, s1, s2, f))
        segs = segs.map { case (s, c) => (mergeSeq(s, (s1, s2)), c) }
        r += 1
      }
    }
    out.result()
  }

  private val word: Gen[String] =
    Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
      .map(_.mkString))

  private val corpus: Gen[Map[String, Long]] =
    Gen.choose(1, 25)
      .flatMap(n => Gen.listOfN(n, Gen.zip(word, Gen.choose(1L, 9L))))
      .map(_.groupBy(_._1).map { case (w, xs) => (w, xs.map(_._2).sum) })

  test("distributed trainer ≡ in-memory reference BPE on random histograms") {
    import spark.implicits._
    // deterministic sampling (no scalatest-scalacheck bridge in the
    // offline cache): materialize the generator at fixed seeds
    val hists = Gen.listOfN(25, corpus)
      .apply(Gen.Parameters.default, Seed(7L)).get
    hists.foreach { hist =>
      val df = hist.toSeq.toDF("w", "cnt")
      val got = Bpe.train(df, rounds = 3).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      val exp = refBpe(hist, rounds = 3)
      assert(got == exp, s"hist=$hist")
    }
  }

  test("aaa-style overlap merges left-to-right, not greedily re-paired") {
    import spark.implicits._
    // "aaa"×2: round 1 pair (a,a) freq 4 (two positions × cnt 2); merge
    // gives [aa, a] — round 2 pair (aa, a) freq 2
    val df = Seq(("aaa", 2L)).toDF("w", "cnt")
    val got = Bpe.train(df, rounds = 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got == Seq((1, "a", "a", 4L), (2, "aa", "a", 2L)))
  }
}
