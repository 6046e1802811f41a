package graft

import org.apache.spark.sql.functions._

import graft.etl.{Bpe, CheckpointPolicy, Dedup, Graph}

/** The fault-tolerance seam of the iterative family: every iterative
  * operator takes a [[CheckpointPolicy]] choosing WHERE its per-round
  * lineage barrier materializes — executor-local blocks (default;
  * non-replayable, so a lost executor mid-iteration kills a cluster
  * job) or a reliable checkpoint to the SparkContext checkpoint dir
  * (replayable from storage). Semantics must be bit-identical under
  * either policy: the barrier is plan mechanics, not math.
  */
class CheckpointPolicySpec extends SparkSpec {
  import spark.implicits._

  private def deleteTree(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteTree))
    f.delete(); ()
  }

  private def withCheckpointDir[T](f: => T): T = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    try f
    finally deleteTree(new java.io.File(dir))
  }

  // t41/t71's round-loop shape on a fixture graph: a cycle with a chord
  // plus a dangling sink for the dangling variant
  private val edges = Seq(
    (1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L), (2L, 4L))
  private val withSink = edges ++ Seq((3L, 9L)) // 9 has no out-edge

  // FIRST in the suite: once any withCheckpointDir test runs, the
  // session has a dir set for good (SparkContext can't unset it)
  test("Reliable without a checkpoint dir fails loudly at the operator") {
    val sc = spark.sparkContext
    assume(sc.getCheckpointDir.isEmpty,
      "another suite already set a checkpoint dir on the shared session")
    val e = intercept[IllegalArgumentException] {
      Graph.pageRankMicro(
        (edges ++ edges.map(_.swap)).toDF("src", "dst"), 2,
        CheckpointPolicy.Reliable)
    }
    assert(e.getMessage.contains("setCheckpointDir"))
  }

  test("pageRankMicro: reliable checkpoint ranks are hash-identical to local") {
    withCheckpointDir {
      val bidi = (edges ++ edges.map(_.swap)).toDF("src", "dst")
      val local = Graph.pageRankMicro(bidi, 5)
        .as[(Long, Long)].collect().toSet
      val reliable = Graph.pageRankMicro(bidi, 5, CheckpointPolicy.Reliable)
        .as[(Long, Long)].collect().toSet
      assert(local == reliable && local.nonEmpty)
    }
  }

  test("pageRankDanglingMicro: policies agree with a sink in the graph") {
    withCheckpointDir {
      val e = withSink.toDF("src", "dst")
      val local = Graph.pageRankDanglingMicro(e, 5)
        .as[(Long, Long)].collect().toSet
      val reliable =
        Graph.pageRankDanglingMicro(e, 5, CheckpointPolicy.Reliable)
          .as[(Long, Long)].collect().toSet
      assert(local == reliable && local.nonEmpty)
    }
  }

  test("resolveClusters + connectedComponentsLSS: policies agree") {
    withCheckpointDir {
      val pairs = (Seq((10L, 11L), (11L, 12L), (20L, 21L)) ++
        (30L until 40L).map(i => (i, i + 1))).toDF("a", "b")
      val propL = Dedup.resolveClusters(pairs)
        .as[(Long, Long)].collect().toSet
      val propR = Dedup.resolveClusters(pairs,
        maxIter = 20, policy = CheckpointPolicy.Reliable)
        .as[(Long, Long)].collect().toSet
      assert(propL == propR && propL.nonEmpty)
      val lssL = Graph.connectedComponentsLSS(pairs)
        .as[(Long, Long)].collect().toSet
      val lssR = Graph.connectedComponentsLSS(pairs,
        policy = CheckpointPolicy.Reliable)
        .as[(Long, Long)].collect().toSet
      assert(lssL == lssR && lssL == propL)
    }
  }

  test("Bpe.train: merge schedule identical under the reliable policy") {
    withCheckpointDir {
      val hist = Seq(("lower", 3L), ("lowest", 2L), ("newer", 4L), ("low", 5L))
        .toDF("w", "cnt")
      val local = Bpe.train(hist, 4)
        .as[(Int, String, String, Long)].collect().toSeq
      val reliable = Bpe.train(hist, 4, CheckpointPolicy.Reliable)
        .as[(Int, String, String, Long)].collect().toSeq
      assert(local == reliable && local.nonEmpty)
    }
  }

  test("fromEnv seam: 'reliable' selects Reliable and pins a checkpoint dir") {
    // the env-flagged mode Verify/Bench use (SPARK_GRAFT_CHECKPOINT):
    // anything but 'reliable' is the Local default; 'reliable' (any
    // case) returns Reliable and ensures the SparkContext has a
    // checkpoint dir so the operator's require() holds
    assert(CheckpointPolicy.select(None, spark) == CheckpointPolicy.Local)
    assert(CheckpointPolicy.select(Some("local"), spark) == CheckpointPolicy.Local)
    val p = CheckpointPolicy.select(Some("RELIABLE"), spark)
    assert(p == CheckpointPolicy.Reliable)
    assert(spark.sparkContext.getCheckpointDir.isDefined,
      "reliable selection must leave a checkpoint dir set")
  }
}
