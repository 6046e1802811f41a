package graft

import org.apache.spark.sql.Row

/** Invariant tests for the corpus-construction and embedding-compression
  * operators (t17/t20/e05/e06) — unit-level complements to the
  * DuckDB-oracle gate, run on the sf0.001 fixture via the registry.
  */
class CorpusOpsSpec extends SparkSpec {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf0001).collect()

  test("t17: packing offsets are a gapless prefix sum in doc_id order") {
    val rows = run("t17_sequence_pack")
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("start_off"), r.getAs[Long]("seq_id"),
        r.getAs[Long]("seq_pos")))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    var expect = 0L
    rows.foreach { case (id, n, off, seqId, seqPos) =>
      assert(off == expect, s"doc $id: start_off $off != cumsum $expect")
      assert(seqId == off / 2048 && seqPos == off % 2048)
      expect += n
    }
  }

  test("t20: hot chunks are removed everywhere, cold docs pass through") {
    val rows = run("t20_chunk_dedup")
    assert(rows.length > 0)
    // conservation: kept + removed = total, and clean_text word count
    // equals the chunk-token total minus what the removed chunks held
    rows.foreach { r =>
      val nChunks = r.getAs[Long]("n_chunks")
      val nRemoved = r.getAs[Long]("n_removed")
      assert(nRemoved >= 0 && nRemoved <= nChunks)
      val clean = r.getAs[String]("clean_text")
      if (nRemoved == 0 && nChunks > 0) assert(clean.nonEmpty)
    }
    // at least one doc survives untouched at this scale
    assert(rows.exists(r => r.getAs[Long]("n_removed") == 0))
  }

  test("t21: mix rates are sqrt-scaled probabilities and the draw is honest") {
    val rows = run("t21_source_mix")
    rows.foreach { r =>
      val p = r.getAs[Double]("p_keep")
      val u = r.getAs[Double]("u")
      assert(p > 0.0 && p <= 1.0)
      assert(u >= 0.0 && u < p, "a row with u >= p_keep survived the filter")
    }
  }

  test("t22: shuffle_pos is a permutation of 0..N-1") {
    val pos = run("t22_shuffle_order").map(_.getAs[Long]("shuffle_pos")).sorted
    assert(pos.nonEmpty)
    assert(pos.toSeq == (0L until pos.length).toSeq,
      "shuffle positions are not a gapless permutation")
  }

  test("t25: no source exceeds its quota and ranks are gapless from 1") {
    val rows = run("t25_source_quota")
      .map(r => (r.getAs[String]("source"), r.getAs[Int]("rnk")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val ranks = rs.map(_._2).sorted
      assert(ranks.last <= 20, s"$src exceeded quota")
      assert(ranks.toSeq == (1 to ranks.length).toSeq, s"$src ranks not gapless")
    }
  }

  test("q39: funnel stage times are strictly increasing where present") {
    val rows = run("q39_funnel_steps")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getAs[Long]("view_ts_us")
      val c = Option(r.getAs[Any]("click_ts_us")).map(_.asInstanceOf[Long])
      val p = Option(r.getAs[Any]("purchase_ts_us")).map(_.asInstanceOf[Long])
      val depth = r.getAs[Int]("depth")
      c.foreach(cv => assert(cv > v, "click not after first view"))
      p.foreach { pv =>
        assert(c.isDefined, "purchase stage without click stage")
        assert(pv > c.get, "purchase not after first qualifying click")
      }
      assert(depth == 1 + c.size + p.size)
    }
  }

  test("t24: diff statuses are consistent with the version overlays") {
    val rows = run("t24_snapshot_diff")
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("status")))
    assert(rows.nonEmpty)
    rows.foreach { case (id, status) =>
      val inV1 = id % 7 != 0
      val inV2 = id % 5 != 0
      val edited = id % 3 == 0
      val expect =
        if (!inV1 && inV2) "added"
        else if (inV1 && !inV2) "removed"
        else if (edited) "changed"
        else "unchanged"
      assert(status == expect, s"doc $id: $status != $expect")
    }
  }

  test("e05: quantization reconstruction error is bounded by half a step") {
    val rows = run("e05_embed_quantize")
    assert(rows.length > 0)
    rows.foreach { r =>
      val sc = r.getAs[Double]("qscale")
      val err = r.getAs[Double]("max_err")
      val qsum = r.getAs[Long]("qsum")
      // codes are 0..255 over 64 dims
      assert(qsum >= 0 && qsum <= 255L * 64)
      // rounding to the nearest code can miss by at most scale/2 (plus
      // the 1e-6 the output rounding may add)
      assert(err <= sc / 2 + 1e-6, s"vec ${r.getAs[Long]("vec_id")}: err $err > ${sc / 2}")
    }
  }

  test("e08: PQ codes fit 32 bits and codebook vectors encode losslessly") {
    val rows = run("e08_pq_encode")
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("pq_code"),
        r.getAs[Long]("pq_err")))
    assert(rows.nonEmpty)
    rows.foreach { case (id, code, err) =>
      assert(code >= 0 && code < (1L << 32), s"vec $id: code $code outside 32 bits")
      assert(err >= 0)
    }
    // a codebook vector's own subvectors are in the codebook → exact
    rows.filter(_._1 < 16).foreach { case (id, _, err) =>
      assert(err == 0, s"codebook vec $id reconstructs with error $err")
    }
  }

  test("e06: assignment is a partition into at most k clusters with sane distances") {
    val rows = run("e06_kmeans_fixpoint")
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cluster"),
        r.getAs[Long]("dist")))
    assert(rows.length > 0)
    assert(rows.map(_._1).distinct.length == rows.length, "a vector assigned twice")
    val clusters = rows.map(_._2).distinct
    assert(clusters.length <= 8 && clusters.forall(c => c >= 0 && c < 8))
    assert(rows.forall(_._3 >= 0), "negative squared distance")
    // the update step can only tighten (or keep) each vector's own-cluster
    // distance vs its iteration-1 assignment cost in aggregate: the mean
    // assignment cost after the Lloyd step must not exceed the initial
    // centroids' mean cost (standard k-means monotonicity, exact here
    // because all math is integer)
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions._
    val fx = graft.etl.Tables.spread(graft.etl.Tables.embeddings(spark, sf0001))
      .select(col("vec_id"),
        transform(col("embedding").cast("array<double>"), x => round(x * 1000.0)).as("q"))
    // iteration-1 cost: nearest initial centroid per vector
    val aff = fx.crossJoin(broadcast(fx.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cent_id"), col("q").as("c"))))
      .select(col("vec_id"),
        (graft.functions.Portable.dot(col("q"), col("q"))
          + graft.functions.Portable.dot(col("c"), col("c"))
          - lit(2.0) * graft.functions.Portable.dot(col("q"), col("c")))
          .cast("long").as("dist"))
    val iter1Cost = aff.groupBy(col("vec_id")).agg(min(col("dist")).as("d"))
      .agg(sum(col("d"))).collect()(0).getLong(0)
    val iter2Cost = rows.map(_._3).sum
    assert(iter2Cost <= iter1Cost,
      s"Lloyd step increased total cost: $iter2Cost > $iter1Cost")
  }

  test("t41: PageRank conserves rank mass and concentrates it on hub suppliers") {
    val rows = run("t41_graph_pagerank")
      .map(r => (r.getAs[String]("node_type"), r.getAs[Long]("rank_micro")))
    assert(rows.nonEmpty)
    val n = rows.length.toLong
    val total = rows.map(_._2).sum
    // damping conserves mass up to per-step floor losses (each node
    // floors once per in-edge + once for the damping multiply); every
    // node also keeps at least the teleport floor
    assert(total <= n * 1000000L, s"mass grew: $total > ${n * 1000000L}")
    assert(total >= (n * 1000000L * 9) / 10, s"mass leaked >10%: $total")
    assert(rows.forall(_._2 >= 150000L), "a node fell below the teleport floor")
    val (supp, cust) = rows.partition(_._1 == "s")
    assert(supp.nonEmpty && cust.nonEmpty)
    val avgS = supp.map(_._2).sum / supp.length
    val avgC = cust.map(_._2).sum / cust.length
    assert(avgS > avgC * 5,
      s"supplier hubs should dominate: avg(s)=$avgS vs avg(c)=$avgC")
  }

  test("q48: SCD-2 intervals — delete closes, edit supersedes, one exchange") {
    val df = SparkEntry.queries("q48_scd2_history")(spark, sf0001)
    // both window passes share the doc_id partitioning → exactly one
    // shuffle exchange in the whole plan (spread's checkpoint is an RDD
    // scan, the changelog union is exchange-free). The plan is wrapped
    // in AdaptiveSparkPlanExec (collect() won't descend), so count
    // exchanges in the initial-plan text.
    val plan = df.queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1,
      s"expected ONE exchange (shared doc_id partitioning), got $shuffles:\n$plan")
    val rows = df.collect()
      .groupBy(_.getAs[Long]("doc_id")).view.mapValues(
        _.map(r => (r.getAs[Long]("valid_from"),
          Option(r.getAs[java.lang.Long]("valid_to")).map(_.toLong),
          r.getAs[Long]("is_current"))).sortBy(_._1).toSeq).toMap
    // doc 1: v1 upsert only → one open current interval
    assert(rows(1L) == Seq((1L, None, 1L)))
    // doc 3: edit at v2 → v1 closed at 1, v2 open+current
    assert(rows(3L) == Seq((1L, Some(1L), 0L), (2L, None, 1L)))
    // doc 4: delete at v2 → v1 closed, no current row
    assert(rows(4L) == Seq((1L, Some(1L), 0L)))
    // doc 12: same-version delete-after-write → v2 upsert never visible
    assert(rows(12L) == Seq((1L, Some(1L), 0L)))
    // every doc has at most one current version, and intervals never overlap
    rows.values.foreach { ivs =>
      assert(ivs.count(_._3 == 1L) <= 1)
      ivs.sliding(2).foreach {
        case Seq((_, Some(hi), _), (lo2, _, _)) => assert(hi < lo2)
        case _ => ()
      }
    }
  }
}
