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

  test("e29: production geometry's survivor volume is planted-pairs only") {
    // the retired e13 audit's surviving claim, pinned on the production
    // entry directly: on the doubled random corpus the mix16x4 banding's
    // cos >= 0.95 survivors are exactly the planted pairs (the first
    // test asserts set equality; this one pins the count is the corpus
    // size, i.e. zero false survivors and recall 1.0 by cardinality)
    val nVecs = graft.etl.Tables.embeddings(spark, sf0001).count()
    assert(run("e29_embed_neardup_banded").count() == nVecs)
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

  test("t67: ten distinct merges, non-increasing frequency") {
    val rows = run("t67_bpe_train").collect()
      .sortBy(_.getAs[Int]("round"))
    assert(rows.map(_.getAs[Int]("round")).toSeq == (1 to 10))
    val merges = rows.map(r => (r.getAs[String]("s1"), r.getAs[String]("s2")))
    assert(merges.distinct.length == 10, s"repeated merge: ${merges.toSeq}")
    val freqs = rows.map(_.getAs[Long]("freq"))
    assert(freqs.zip(freqs.tail).forall { case (a, b) => a >= b },
      s"round frequencies must be non-increasing: ${freqs.toSeq}")
    merges.foreach { case (s1, s2) =>
      assert(s1.nonEmpty && s2.nonEmpty && !s1.contains(" ") && !s2.contains(" "))
    }
  }

  test("t68: spectrum masses reconcile with the raw token counts") {
    import spark.implicits._
    val rows = run("t68_token_zipf").collect()
    // freq_class is a valid floor(log2): every class ≥ 0, and within a
    // class the type count can't exceed the token mass
    rows.foreach { r =>
      assert(r.getAs[Long]("freq_class") >= 0)
      assert(r.getAs[Long]("n_types") <= r.getAs[Long]("n_tokens"))
    }
    // total token mass across the spectrum == corpus token count, and
    // total type mass == vocabulary size (the spectrum is a partition)
    val docs = graft.etl.Tables.documents(spark, sf0001)
      .select(explode(graft.etl.TextAnalysis.tokens(col("text"))).as("t"))
    val nTokens = docs.count()
    val nTypes = docs.distinct().count()
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == nTokens)
    assert(rows.map(_.getAs[Long]("n_types")).sum >= nTypes)
    // hapax mass lives exactly in class 0 — PER LANGUAGE, matching the
    // query's (lang, token) grain (a token hapax in two languages is
    // two class-0 types but would not be a global hapax); the corpus
    // may legitimately have none — assert equality, not presence
    val langDocs = graft.etl.Tables.documents(spark, sf0001)
      .select(col("lang"),
        explode(graft.etl.TextAnalysis.tokens(col("text"))).as("t"))
    val nHapax = langDocs.groupBy(col("lang"), col("t")).count()
      .filter(col("count") === 1).count()
    assert(rows.filter(_.getAs[Long]("freq_class") == 0L)
      .map(_.getAs[Long]("n_types")).sum == nHapax)
  }

  test("t69: planted duplicates are caught by all three methods") {
    val nDocs = graft.etl.Tables.documents(spark, sf0001).count()
    val r = run("t69_dedup_agreement").collect().head
    def g(c: String) = r.getAs[Long](c)
    // every planted (doc, doc + shift) pair is an exact dup, a verified
    // minhash pair (jaccard 1), and simhash-equal — so the triple
    // intersection is at least the planted count
    assert(g("n_all_three") >= nDocs,
      s"planted pairs missing from the triple intersection: $r")
    // intersections are bounded by their members (basic set algebra the
    // merge must preserve)
    assert(g("n_exact_minhash") <= math.min(g("n_exact"), g("n_minhash")))
    assert(g("n_exact_simhash") <= math.min(g("n_exact"), g("n_simhash")))
    assert(g("n_minhash_simhash") <= math.min(g("n_minhash"), g("n_simhash")))
    assert(g("n_all_three") <= g("n_exact_minhash"))
    // identical text → identical signatures → jaccard 1, so exact pairs
    // are minhash pairs UNLESS the doc has < 3 tokens (no shingles) or
    // its band bucket trips the maxBucket hot cap — both corpus-shape-
    // dependent, so pin containment on the PLANTED pairs only (each doc
    // and its shifted twin, well-formed by fixture construction)
    assert(g("n_exact_minhash") >= nDocs)
  }

  test("e31: hard negatives are label-mismatched, sub-gate, true top-k") {
    import spark.implicits._
    val emb = graft.etl.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("e"))
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getAs[scala.collection.Seq[Double]]("e").toArray))
    def norm(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) null else v.map(_ / n)
    }
    val normed = emb.map { case (id, lab, v) => (id, lab, norm(v)) }
    val byQ = run("e31_hard_negatives").collect()
      .groupBy(_.getAs[Long]("qid"))
    val labels = normed.map { case (id, lab, _) => id -> lab }.toMap
    byQ.foreach { case (qid, rows) =>
      // contract gates: different label, below the near-dup gate
      rows.foreach { r =>
        assert(labels(r.getAs[Long]("cid")) != labels(qid))
        assert(r.getAs[Double]("sim") < 0.95)
      }
      // and they are the TRUE top-k under those gates (brute reference,
      // sized by the reference — not by the query's own row count, which
      // would let an under-filled top-k truncate its own expectation)
      val (_, qlab, qe) = normed.find(_._1 == qid).get
      val eligible = normed
        .filter { case (cid, clab, ce) => clab != qlab && ce != null && cid != qid }
        .map { case (cid, _, ce) =>
          (cid, qe.zip(ce).map { case (a, b) => a * b }.sum) }
        .filter(_._2 < 0.95)
        .sortBy { case (cid, cos) => (-cos, cid) }
      val expectN = math.min(5, eligible.length)
      assert(rows.length == expectN,
        s"qid $qid: expected $expectN hard negatives, got ${rows.length}")
      val expect = eligible.take(expectN).map(_._1).toSet
      assert(rows.map(_.getAs[Long]("cid")).toSet == expect,
        s"qid $qid: not the brute-force top-k under the gates")
    }
    assert(byQ.nonEmpty)
  }

  test("q79: merge actions reconcile with the base table and the key rules") {
    val r = run("q79_merge_upsert").collect()
      .map(x => x.getAs[String]("action") -> x.getAs[Long]("n")).toMap
    val orders = graft.etl.Tables.orders(spark, sf0001)
      .select(col("o_orderkey")).collect().map(_.getLong(0))
    def n(p: Long => Boolean) = orders.count(k => p(k)).toLong
    // delete wins over update when both rules match (13 before 7)
    assert(r("deleted") == n(_ % 13 == 0))
    assert(r("updated") == n(k => k % 7 == 0 && k % 13 != 0))
    assert(r("inserted") == n(_ % 11 == 0))
    assert(r("unchanged") == orders.length - r("deleted") - r("updated"))
    // every base row is accounted for exactly once (+ the inserts)
    assert(r.values.sum == orders.length + r("inserted"))
  }

  test("e32: nDCG grades are bounded, and perfect exactly on perfectly-ordered queries") {
    val ndcg = run("e32_ndcg_eval").collect()
      .map(x => x.getAs[Long]("qid") -> x.getAs[Long]("ndcg_pm")).toMap
    assert(ndcg.nonEmpty)
    ndcg.values.foreach(v => assert(v >= 0 && v <= 1000, s"ndcg_pm $v out of range"))
    // a query whose LSH top-k IS the exact top-k in the same order must
    // score exactly 1000 per-mille; one with fewer hits scores below it
    val exact = run("e01_knn_brute").collect()
      .map(x => (x.getAs[Long]("qid"), x.getAs[Int]("rnk"), x.getAs[Long]("cid")))
    val approx = run("e02_knn_lsh").collect()
      .map(x => (x.getAs[Long]("qid"), x.getAs[Int]("rnk"), x.getAs[Long]("cid")))
    val exByQ = exact.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq)
    val apByQ = approx.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq)
    apByQ.foreach { case (q, ap) =>
      if (exByQ.get(q).contains(ap)) assert(ndcg(q) == 1000L,
        s"qid $q: identical ordered top-k must grade 1000, got ${ndcg(q)}")
    }
  }

  test("q78: window functions agree with a per-user brute reference") {
    val rows = run("q78_window_suite").collect()
    val ev = graft.etl.Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        round(col("value") * 100).cast("long").as("c"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[java.sql.Timestamp]("ts"), r.getAs[String]("event_type"),
        r.getAs[Long]("c")))
    // order by FULL timestamp precision: getTime alone truncates to
    // milliseconds while the query's window orders by the microsecond
    // timestamp (getNanos carries the complete sub-second component)
    val byUser = ev.groupBy(_._1).map { case (u, es) =>
      u -> es.sortBy { case (_, id, ts, _, _) => (ts.getTime, ts.getNanos, id) }
    }
    val got = rows.map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id")) -> r).toMap
    assert(got.size == ev.length)
    byUser.foreach { case (u, es) =>
      val n = es.length
      var running = 0L
      es.zipWithIndex.foreach { case ((_, id, _, et, c), i) =>
        running += c
        val r = got((u, id))
        assert(r.getAs[Int]("rnk") == i + 1)
        assert(r.getAs[Long]("run_cents") == running)
        // standard ntile: first (n mod 4) buckets get the extra row
        val base = n / 4; val rem = n % 4
        val expTile =
          if (i < (base + 1) * rem) i / (base + 1) + 1
          else if (base > 0) rem + (i - (base + 1) * rem) / base + 1
          else i + 1
        assert(r.getAs[Int]("quartile") == expTile,
          s"user $u row $i of $n: ntile ${r.getAs[Int]("quartile")} != $expTile")
        assert(Option(r.getAs[String]("prev_type")) ==
          (if (i == 0) None else Some(es(i - 1)._4)))
        assert(Option(r.getAs[String]("next_type")) ==
          (if (i == n - 1) None else Some(es(i + 1)._4)))
      }
    }
  }
}
