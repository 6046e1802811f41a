package graft

import org.apache.spark.sql.functions._

import graft.etl.BloomJoin

/** BloomJoin contract: the bloom is a pre-shuffle pruner only — the final
  * semi-join makes the result EXACTLY the plain semi-join, and the probe
  * predicate must sit in the fact-side plan (pruning before the shuffle).
  */
class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = {
    val big = spark.range(0, 10000)
      .select(col("id").as("k"), (col("id") % 97).as("v"))
    val keys = spark.range(0, 10000)
      .filter(col("id") % 13 === 0).select(col("id").as("kk"))
    (big, keys)
  }

  test("bloom semi-join is row-identical to the plain semi-join") {
    val (big, keys) = fixture
    val viaBloom = BloomJoin.semiJoin(big, "k", keys, "kk", 1000L)
    val plain = big.join(keys.select(col("kk").as("k")), Seq("k"), "left_semi")
    assert(viaBloom.count() == plain.count())
    assert(viaBloom.exceptAll(plain).isEmpty && plain.exceptAll(viaBloom).isEmpty)
  }

  test("probe predicate lands in the fact-side plan before the join") {
    val (big, keys) = fixture
    val plan = BloomJoin.semiJoin(big, "k", keys, "kk", 1000L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"expected a might_contain filter in the plan:\n$plan")
  }

  test("bloom probe admits every true key (no false negatives)") {
    val (_, keys) = fixture
    val bloom = BloomJoin.build(keys, col("kk"), 1000L).get
    val missed = keys.filter(!BloomJoin.mightContain(bloom, col("kk"))).count()
    assert(missed == 0, s"bloom dropped $missed true keys")
  }

  test("property: bloom semi-join ≡ plain semi-join across key densities and sizes") {
    // densities from near-empty to full-overlap, expectedItems both
    // under- and over-sized vs the true key count (undersizing only
    // raises fpp — the verify join must still make the result exact)
    for {
      (mod, items) <- Seq((2L, 10L), (7L, 5000L), (97L, 100L), (9999L, 1L))
    } {
      val big = spark.range(0, 5000)
        .select(col("id").as("k"), (col("id") * 3 % 101).as("v"))
      val keys = spark.range(0, 5000)
        .filter(col("id") % mod === 0).select(col("id").as("kk"))
      val viaBloom = BloomJoin.semiJoin(big, "k", keys, "kk", items)
      val plain = big.join(keys.select(col("kk").as("k")), Seq("k"), "left_semi")
      assert(viaBloom.exceptAll(plain).isEmpty && plain.exceptAll(viaBloom).isEmpty,
        s"mismatch at mod=$mod items=$items")
    }
  }

  test("mixed int/long key types canonicalize: no silently dropped matches") {
    // xxhash64 is type-sensitive (INT 5 and BIGINT 5 hash differently) —
    // without canonicalization a type-skewed pair loses every match
    val big = spark.range(0, 1000)
      .select(col("id").cast("int").as("k"), col("id").as("v"))
    val keys = spark.range(0, 1000)
      .filter(col("id") % 10 === 0).select(col("id").as("kk")) // long
    val viaBloom = BloomJoin.semiJoin(big, "k", keys, "kk", 200L)
    assert(viaBloom.count() == 100)
  }

  test("empty key set yields an empty result") {
    val (big, keys) = fixture
    val r = BloomJoin.semiJoin(big, "k", keys.filter(lit(false)), "kk", 10L)
    assert(r.count() == 0)
  }
}
