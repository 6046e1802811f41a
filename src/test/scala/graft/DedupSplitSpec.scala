package graft

import org.apache.spark.sql.functions._

import graft.etl.Dedup

/** Pins the recall-preserving hot-bucket split (t70's operator,
  * `Dedup.splitCandidates`) against the drop cap (`bandCandidates`):
  *
  *  - planted hot cluster: identical docs land every band in ONE bucket
  *    hotter than maxBucket — the drop cap finds NOTHING, the split
  *    finds every member in at least one pair;
  *  - cold corpus: with no bucket over the cap the split produces
  *    exactly the same candidate set as the capped join (the adjacent
  *    key is only emitted for hot buckets);
  *  - boundedness: per-bucket candidate count stays O(n·maxBucket),
  *    never the O(n²) of an uncapped self-join.
  */
class DedupSplitSpec extends SparkSpec {
  import spark.implicits._

  private val k = 15
  private val bands = 3
  private val rows = 5

  /** n docs with IDENTICAL shingle sets → identical signatures → every
    * band puts all n into the same bucket.
    */
  private def hotCluster(n: Int) =
    (1L to n.toLong).map(id => (id, Seq("aa_bb_cc", "bb_cc_dd", "cc_dd_ee")))
      .toDF("doc_id", "sh")

  test("minhashSignatures (array fold) ≡ minhashSignaturesAgg (explode+groupBy)") {
    // the shipped form skips the corpus-sized shuffle; the agg form is
    // the literal mirror of the oracle's unnest+GROUP BY — they must be
    // bit-equal (same hash60, same affine family, min ≡ array_min), and
    // empty/null shingle sets must VANISH from both (the agg form drops
    // them by construction; the array form filters explicitly)
    val docs = (hotCluster(5).as[(Long, Seq[String])].collect().toSeq ++
      (10L to 24L).map(id => (id, Seq(s"w${id}_a", s"w${id}_b", s"q_${id % 3}"))) ++
      Seq((90L, Seq.empty[String]), (91L, null.asInstanceOf[Seq[String]])))
      .toDF("doc_id", "sh")
    val fast = Dedup.minhashSignatures(docs, "doc_id", "sh", k)
    val agg = Dedup.minhashSignaturesAgg(docs, "doc_id", "sh", k)
    assert(fast.columns.toSeq == agg.columns.toSeq)
    assert(fast.exceptAll(agg).count() == 0 && agg.exceptAll(fast).count() == 0,
      "signature formulations diverged")
    assert(fast.filter(col("doc_id") >= 90).count() == 0,
      "empty/null shingle sets must be dropped, not null-signed")
  }

  test("drop cap finds NOTHING in a hot cluster; split finds every member") {
    val maxBucket = 5
    val sig = Dedup.minhashSignatures(hotCluster(30), "doc_id", "sh", k)
    val capped = Dedup.bandCandidates(sig, "doc_id", bands, rows, maxBucket)
    assert(capped.count() == 0, "cap should drop the single 30-row bucket")

    val split = Dedup.splitCandidates(sig, "doc_id", bands, rows, maxBucket)
      .as[(Long, Long)].collect()
    assert(split.nonEmpty)
    split.foreach { case (a, b) => assert(a < b) }
    // zero dropped rows: every doc participates in at least one pair
    val touched = split.flatMap(p => Seq(p._1, p._2)).toSet
    assert(touched == (1L to 30L).toSet,
      s"docs escaped the split: ${(1L to 30L).toSet -- touched}")
    // bounded: per band a row meets ≤ 2·maxBucket neighbors; across 3
    // bands the distinct pair count stays far below the n² of an
    // uncapped join (30 docs → 435 all-pairs)
    assert(split.length < 435, s"split produced all-pairs (${split.length})")
  }

  test("cold corpus: split == capped == uncapped candidate set") {
    // distinct shingle sets with one planted near-dup pair; buckets stay
    // far below the cap, so the adjacent-sub key must never fire
    val docs = ((1L to 20L).map(id =>
      (id, Seq(s"u${id}_a", s"u${id}_b", s"u${id}_c", s"u${id}_d"))) ++
      Seq((100L, Seq("x_a", "x_b", "x_c", "x_d")),
        (101L, Seq("x_a", "x_b", "x_c", "x_d")))).toDF("doc_id", "sh")
    val sig = Dedup.minhashSignatures(docs, "doc_id", "sh", k)
    val cap = Dedup.bandCandidates(sig, "doc_id", bands, rows, 50)
      .as[(Long, Long)].collect().toSet
    val split = Dedup.splitCandidates(sig, "doc_id", bands, rows, 50)
      .as[(Long, Long)].collect().toSet
    assert(split == cap)
    assert(split.contains((100L, 101L)))
  }

  test("capped candidates are ALWAYS a subset of split candidates (t72's invariant)") {
    // random shingle sets with forced collisions + a planted hot cluster,
    // across cap widths: cold buckets produce identical pairs in both
    // strategies, hot buckets produce nothing under the cap — so
    // capped ⊆ split must hold everywhere, which is what t72 hashes
    val rnd = new scala.util.Random(7)
    val docs = ((1L to 40L).map { id =>
      val n = 3 + rnd.nextInt(4)
      (id, Seq.fill(n)(s"w${rnd.nextInt(12)}").distinct)
    } ++ (100L to 109L).map(id => (id, Seq("h_a", "h_b", "h_c"))))
      .filter(_._2.nonEmpty).toDF("doc_id", "sh")
    val sig = Dedup.minhashSignatures(docs, "doc_id", "sh", k)
    Seq(2, 4, 8).foreach { mb =>
      val cap = Dedup.bandCandidates(sig, "doc_id", bands, rows, mb)
        .as[(Long, Long)].collect().toSet
      val split = Dedup.splitCandidates(sig, "doc_id", bands, rows, mb)
        .as[(Long, Long)].collect().toSet
      assert(cap.subsetOf(split),
        s"maxBucket=$mb: capped pairs escaped the split: ${cap -- split}")
    }
  }

  test("mega-bucket: split is sort-free — no Window, bounded key groups") {
    // one planted mega-bucket (identical docs ⇒ every band ONE bucket):
    // the round-9 revision must never rank/sort the whole bucket on one
    // task — assignment is agg + equi-join + map, and the candidate
    // self-join keys on (bidx, bh, _k) so the bucket's shuffle work
    // spreads over its nsub+1 labels
    val maxBucket = 10
    val n = 400
    val sig = Dedup.minhashSignatures(hotCluster(n), "doc_id", "sh", k)
    val split = Dedup.splitCandidates(sig, "doc_id", bands, rows, maxBucket)
    val plan = split.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"split subtree contains a window/sort-rank:\n$plan")
    // hash-modulus labels concentrate around maxBucket rows per group —
    // no single (bidx, bh, _k) group may approach the whole bucket
    val maxGroup = Dedup.splitKeyed(sig, "doc_id", bands, rows, maxBucket)
      .groupBy("bidx", "bh", "_k").count()
      .agg(max("count")).as[Long].collect().head
    assert(maxGroup <= 4L * maxBucket,
      s"one key group holds $maxGroup of the $n-row bucket (cap=$maxBucket)")
    // zero dropped rows: every member of the mega-bucket still pairs up
    val touched = split.as[(Long, Long)].collect()
      .flatMap(p => Seq(p._1, p._2)).toSet
    assert(touched == (1L to n.toLong).toSet,
      s"docs escaped the split: ${(1L to n.toLong).toSet -- touched}")
  }

  test("split probe: capped probe finds NOTHING in a hot index bucket; split probe hits") {
    // 40 identical index docs → one mega index bucket per band; probes
    // are copies (ids 100+) whose only matches live in that hot bucket
    val maxBucket = 5
    val ixSig = Dedup.minhashSignatures(hotCluster(40), "doc_id", "sh", k)
    val ixBands = Dedup.bandTable(ixSig, "doc_id", bands, rows)
    val probes = (101L to 110L)
      .map(id => (id, Seq("aa_bb_cc", "bb_cc_dd", "cc_dd_ee")))
      .toDF("doc_id", "sh")
    val pbSig = Dedup.minhashSignatures(probes, "doc_id", "sh", k)
    val capped = Dedup.probeBandTable(pbSig, ixBands, "doc_id",
      bands, rows, maxBucket)
    assert(capped.count() == 0, "cap should drop the hot index bucket")
    val split = Dedup.splitProbeBandTable(pbSig, ixBands, "doc_id",
      bands, rows, maxBucket).as[(Long, Long)].collect()
    assert(split.nonEmpty)
    // every probe finds at least one index match (3 independent band
    // draws at 2/nsub each — deterministic for this fixture's hashes)
    val probed = split.map(_._1).toSet
    assert(probed == (101L to 110L).toSet,
      s"probes escaped the split probe: ${(101L to 110L).toSet -- probed}")
    // bounded: never the full probe×index fan-out
    assert(split.length < 10 * 40, s"split probe went quadratic (${split.length})")
    // sort-free plan, same as the self-join split
    val plan = Dedup.splitProbeBandTable(pbSig, ixBands, "doc_id",
      bands, rows, maxBucket).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"split probe contains a window:\n$plan")
  }

  test("split probe: cold index ≡ capped probe; capped ⊆ split everywhere") {
    val rnd = new scala.util.Random(23)
    val ixDocs = ((1L to 30L).map { id =>
      val n = 3 + rnd.nextInt(4)
      (id, Seq.fill(n)(s"w${rnd.nextInt(12)}").distinct)
    } ++ (50L to 57L).map(id => (id, Seq("h_a", "h_b", "h_c"))))
      .filter(_._2.nonEmpty).toDF("doc_id", "sh")
    val pbDocs = ((200L to 215L).map { id =>
      val n = 3 + rnd.nextInt(4)
      (id, Seq.fill(n)(s"w${rnd.nextInt(12)}").distinct)
    } :+ ((250L, Seq("h_a", "h_b", "h_c"))))
      .filter(_._2.nonEmpty).toDF("doc_id", "sh")
    val ixSig = Dedup.minhashSignatures(ixDocs, "doc_id", "sh", k)
    val ixBands = Dedup.bandTable(ixSig, "doc_id", bands, rows)
    val pbSig = Dedup.minhashSignatures(pbDocs, "doc_id", "sh", k)
    Seq(2, 4, 50).foreach { mb =>
      val cap = Dedup.probeBandTable(pbSig, ixBands, "doc_id", bands, rows, mb)
        .as[(Long, Long)].collect().toSet
      val split = Dedup.splitProbeBandTable(pbSig, ixBands, "doc_id",
        bands, rows, mb).as[(Long, Long)].collect().toSet
      assert(cap.subsetOf(split),
        s"maxBucket=$mb: capped-probe pairs escaped the split: ${cap -- split}")
      if (mb == 50) assert(cap == split, "cold index must behave identically")
    }
  }

  test("exact probe ≡ uncapped probe join; split ⊆ exact (t76's contract)") {
    // index mixes one 40-row hot cluster with a distinct cold tail, so
    // both branches of the probe's label explode run; probes hit both
    val ixDocs = ((1L to 40L).map(id =>
      (id, Seq("aa_bb_cc", "bb_cc_dd", "cc_dd_ee"))) ++
      (60L to 75L).map(id =>
        (id, Seq(s"u${id}_a", s"u${id}_b", s"u${id}_c", s"u${id}_d"))))
      .toDF("doc_id", "sh")
    val pbDocs = ((101L to 108L).map(id =>
      (id, Seq("aa_bb_cc", "bb_cc_dd", "cc_dd_ee"))) :+
      ((150L, Seq("u60_a", "u60_b", "u60_c", "u60_d"))))
      .toDF("doc_id", "sh")
    val ixSig = Dedup.minhashSignatures(ixDocs, "doc_id", "sh", k)
    val ixBands = Dedup.bandTable(ixSig, "doc_id", bands, rows)
    val pbSig = Dedup.minhashSignatures(pbDocs, "doc_id", "sh", k)
    val uncapped = Dedup.probeBandTable(pbSig, ixBands, "doc_id",
      bands, rows, Int.MaxValue).as[(Long, Long)].collect().toSet
    // ground truth sanity: every hot probe reaches all 40 hot index
    // rows, and the cold probe finds its cold source
    assert((101L to 108L).forall(a => uncapped.contains((a, 1L))))
    assert(uncapped.contains((150L, 60L)))
    Seq(2, 3, 5, 50).foreach { mb =>
      val exact = Dedup.exactProbeBandTable(pbSig, ixBands, "doc_id",
        bands, rows, mb).as[(Long, Long)].collect().toSet
      assert(exact == uncapped,
        s"maxBucket=$mb: exact probe diverged from the uncapped join " +
          s"(missing ${uncapped -- exact}, extra ${exact -- uncapped})")
      val split = Dedup.splitProbeBandTable(pbSig, ixBands, "doc_id",
        bands, rows, mb).as[(Long, Long)].collect().toSet
      assert(split.subsetOf(exact),
        s"maxBucket=$mb: split-probe pairs escaped exact: ${split -- exact}")
    }
    // and the skew-spread shape holds: sort-free, no Window
    val plan = Dedup.exactProbeBandTable(pbSig, ixBands, "doc_id",
      bands, rows, 3).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"exact probe contains a window:\n$plan")
  }

  test("seeded random corpora: exact ≡ uncapped and capped ⊆ split ⊆ exact " +
    "at every cap width") {
    // the fixed fixtures above pin the geometry on planted shapes; this
    // property re-derives the same containment chain on SEEDED random
    // corpora (random cluster count/size/shingle sets, random probe
    // subsets) so a future change to the label formula cannot pass by
    // fitting the planted shapes
    val rnd = new scala.util.Random(0xD5EED)
    (1 to 4).foreach { trial =>
      var id = 0L
      val nClusters = 2 + rnd.nextInt(3)
      val ixRows = Seq.newBuilder[(Long, Seq[String])]
      (0 until nClusters).foreach { c =>
        val sh = (0 until 3 + rnd.nextInt(3)).map(i => s"t${trial}_c${c}_$i")
        (0 until 1 + rnd.nextInt(12)).foreach { _ =>
          id += 1; ixRows += ((id, sh))
        }
      }
      (0 until 4 + rnd.nextInt(8)).foreach { _ =>
        id += 1
        ixRows += ((id, (0 until 3 + rnd.nextInt(4)).map(i => s"t${trial}_u${id}_$i")))
      }
      val ix = ixRows.result()
      val pb = ix.filter(_ => rnd.nextDouble() < 0.4)
        .map { case (i, sh) => (i + 1000L, sh) } ++
        Seq((2001L, Seq(s"t${trial}_novel_a", s"t${trial}_novel_b", s"t${trial}_novel_c")))
      val ixBands = Dedup.bandTable(
        Dedup.minhashSignatures(ix.toDF("doc_id", "sh"), "doc_id", "sh", k),
        "doc_id", bands, rows)
      val pbSig = Dedup.minhashSignatures(pb.toDF("doc_id", "sh"),
        "doc_id", "sh", k)
      val uncapped = Dedup.probeBandTable(pbSig, ixBands, "doc_id",
        bands, rows, Int.MaxValue).as[(Long, Long)].collect().toSet
      Seq(1, 2, 3, 8).foreach { mb =>
        val exact = Dedup.exactProbeBandTable(pbSig, ixBands, "doc_id",
          bands, rows, mb).as[(Long, Long)].collect().toSet
        assert(exact == uncapped,
          s"trial $trial mb=$mb: exact != uncapped " +
            s"(missing ${uncapped -- exact}, extra ${exact -- uncapped})")
        val split = Dedup.splitProbeBandTable(pbSig, ixBands, "doc_id",
          bands, rows, mb).as[(Long, Long)].collect().toSet
        assert(split.subsetOf(exact),
          s"trial $trial mb=$mb: split pairs escaped exact: ${split -- exact}")
        val capped = Dedup.probeBandTable(pbSig, ixBands, "doc_id",
          bands, rows, mb).as[(Long, Long)].collect().toSet
        assert(capped.subsetOf(split),
          s"trial $trial mb=$mb: capped pairs escaped split: ${capped -- split}")
      }
    }
  }

  test("re-pinned incremental geometry (t32/t34): capped ⊆ split at the " +
    "production cap, and every replayed probe finds its source") {
    // the exact geometry the round-10 re-pinned entries run: k=15, 3×5
    // bands, maxBucket=20, probe batch = modulo-selected corpus docs
    // replayed under shifted ids (guaranteed jaccard-1.0 hits). The
    // corpus plants one boilerplate-hot cluster (25 identical docs >
    // the cap) whose replayed probe the DROP cap would lose — the split
    // probe must keep it while still containing everything the cap finds.
    val mb = 20
    val rnd = new scala.util.Random(41)
    val corpus = ((1L to 60L).map { id =>
      val n = 3 + rnd.nextInt(5)
      (id, Seq.fill(n)(s"w${rnd.nextInt(15)}_x").distinct)
    } ++ (70L to 94L).map(id => (id, Seq("b_a", "b_b", "b_c"))))
      .filter(_._2.nonEmpty).toDF("doc_id", "sh")
    val batch = corpus.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select((col("doc_id") + 3000000L).as("doc_id"), col("sh"))
    val ixSig = Dedup.minhashSignatures(corpus, "doc_id", "sh", k)
    val ixBands = Dedup.bandTable(ixSig, "doc_id", bands, rows)
    val pbSig = Dedup.minhashSignatures(batch, "doc_id", "sh", k)
    val cap = Dedup.probeBandTable(pbSig, ixBands, "doc_id", bands, rows, mb)
      .as[(Long, Long)].collect().toSet
    val split = Dedup.splitProbeBandTable(pbSig, ixBands, "doc_id",
      bands, rows, mb).as[(Long, Long)].collect().toSet
    assert(cap.subsetOf(split),
      s"capped-probe pairs escaped the split: ${cap -- split}")
    // the hot cluster's replayed members (70,80,90 → +3M) must find
    // their identical sources under the split; the 25-row bucket is
    // over the cap, so the drop-cap probe loses exactly these
    val hotProbes = Set(3000070L, 3000080L, 3000090L)
    hotProbes.foreach { p =>
      assert(split.exists(_._1 == p), s"hot probe $p escaped the split probe")
      assert(!cap.exists(_._1 == p),
        s"fixture broken: cap unexpectedly kept hot probe $p")
    }
    // every probe doc pairs with its source id under the split
    val srcPairs = split.collect { case (a, b) if a - 3000000L == b => a }
    assert(srcPairs.toSet == batch.select("doc_id").as[Long].collect().toSet,
      "a replayed probe failed to find its identical source")
  }

  test("nsub=2 wraparound is lossless: a 2-way split bucket yields ALL pairs") {
    // maxBucket < n <= 2*maxBucket → nsub = 2. With the wraparound
    // neighbor ((k+1) mod nsub) every row emits BOTH labels {0, 1}, so
    // no pair of the hot bucket can be separated — the round-11 fix:
    // the old `k + 1` probed a phantom label nsub and the top label had
    // no real neighbor, losing cross-label pairs even at nsub = 2.
    val maxBucket = 5
    val n = 8 // one hot bucket per band, nsub = ceil(8/5) = 2
    val sig = Dedup.minhashSignatures(hotCluster(n), "doc_id", "sh", k)
    val split = Dedup.splitCandidates(sig, "doc_id", bands, rows, maxBucket)
      .as[(Long, Long)].collect().toSet
    val allPairs = (for {
      a <- 1L to n.toLong; b <- (a + 1) to n.toLong
    } yield (a, b)).toSet
    assert(split == allPairs,
      s"nsub=2 split lost pairs: ${allPairs -- split}")
    // same losslessness at the probe seam: every (probe, index) pair of
    // the hot bucket survives
    val ixBands = Dedup.bandTable(sig, "doc_id", bands, rows)
    val probes = (101L to 103L)
      .map(id => (id, Seq("aa_bb_cc", "bb_cc_dd", "cc_dd_ee")))
      .toDF("doc_id", "sh")
    val pbSig = Dedup.minhashSignatures(probes, "doc_id", "sh", k)
    val probeSplit = Dedup.splitProbeBandTable(pbSig, ixBands, "doc_id",
      bands, rows, maxBucket).as[(Long, Long)].collect().toSet
    val allProbePairs = (for {
      a <- 101L to 103L; b <- 1L to n.toLong
    } yield (a, b)).toSet
    assert(probeSplit == allProbePairs,
      s"nsub=2 split probe lost pairs: ${allProbePairs -- probeSplit}")
  }

  test("split is deterministic across runs (hash order, no RNG)") {
    val sig = Dedup.minhashSignatures(hotCluster(25), "doc_id", "sh", k)
    val a = Dedup.splitCandidates(sig, "doc_id", bands, rows, 4)
      .as[(Long, Long)].collect().toSet
    val b = Dedup.splitCandidates(sig, "doc_id", bands, rows, 4)
      .as[(Long, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
  }
}
