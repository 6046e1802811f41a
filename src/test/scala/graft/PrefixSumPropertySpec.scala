package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.etl.PrefixSum

/** Property tests for the two-level distributed prefix sum — the shared
  * primitive under sequence packing (t17), deterministic shuffle order
  * (t22), passage chunks (t50), budget selection (t48), shard manifests
  * (m11) and quantile binning (q76): its offsets must equal a plain
  * sorted-scan running sum for arbitrary sparse id sets, values, and
  * bucket widths (including bucket boundaries, empty buckets, width 1 =
  * one row per bucket, and widths larger than the id range = one global
  * bucket).
  */
class PrefixSumPropertySpec extends SparkSpec {
  import spark.implicits._

  private def refOffsets(rows: Seq[(Long, Long)]): Map[Long, Long] = {
    var acc = 0L
    rows.sortBy(_._1).map { case (id, v) =>
      val off = acc; acc += v; (id, off)
    }.toMap
  }

  private val rowsGen: Gen[List[(Long, Long)]] =
    Gen.choose(1, 60).flatMap { n =>
      Gen.listOfN(n, Gen.zip(Gen.choose(0L, 500L), Gen.choose(0L, 99L)))
    }.map(_.groupBy(_._1).map { case (id, xs) => (id, xs.head._2) }.toList)

  test("exclusive() equals the sorted-scan running sum") {
    val cases = Gen.listOfN(12, Gen.zip(rowsGen, Gen.oneOf(1L, 7L, 64L, 1000L)))
      .apply(Gen.Parameters.default, Seed(11L)).get
    cases.foreach { case (rows, bucketW) =>
      val got = PrefixSum.exclusive(
          rows.toDF("id", "v"), "id", "v", "off", bucketW)
        .select(col("id"), col("off")).as[(Long, Long)].collect().toMap
      assert(got == refOffsets(rows), s"bucketW=$bucketW rows=$rows")
    }
  }

  test("three-level recursion equals the sorted-scan running sum") {
    // forced tiny width (4): ids up to 500 → ~125 buckets → ~32
    // super-buckets, so the depth-3 path genuinely recurses instead of
    // degenerating to one bucket per level
    val cases = Gen.listOfN(10, rowsGen)
      .apply(Gen.Parameters.default, Seed(13L)).get
    cases.foreach { rows =>
      val df = rows.toDF("id", "v")
      (2 to 4).foreach { levels =>
        val got = PrefixSum.exclusive(df, "id", "v", "off", 4L, levels)
          .select(col("id"), col("off")).as[(Long, Long)].collect().toMap
        assert(got == refOffsets(rows), s"levels=$levels rows=$rows")
      }
      // width 1 with levels > 2 must refuse (the bucket table never
      // shrinks — the recursion would never terminate)
      assertThrows[IllegalArgumentException] {
        PrefixSum.exclusive(df, "id", "v", "off", 1L, 3)
      }
    }
  }

  test("exclusiveBy() equals the sorted-scan running sum under a coarsened order") {
    val cases = Gen.listOfN(8, rowsGen)
      .apply(Gen.Parameters.default, Seed(12L)).get
    cases.foreach { rows =>
      // bucket = id div 25 is an ascending coarsening of the id order
      val df = rows.toDF("id", "v").withColumn("bkt", expr("id div 25"))
      val got = PrefixSum.exclusiveBy(df, "bkt", Seq(col("id")), "v", "off")
        .select(col("id"), col("off")).as[(Long, Long)].collect().toMap
      assert(got == refOffsets(rows), s"rows=$rows")
    }
  }
}
