package graft

import graft.etl.HeavyHitters

/** Pins the Misra-Gries candidate guarantee t63 rests on: the
  * per-partition survivors are a SUPERSET of every item with global
  * count ≥ N/(k+1), for any partitioning — adversarial long tails
  * included. (The query's exactness then follows from the exact verify
  * phase; the DuckDB oracle covers that end to end.)
  */
class HeavyHittersSpec extends SparkSpec {

  private def check(items: Seq[String], k: Int, parts: Int): Unit = {
    import spark.implicits._
    val ds = spark.createDataset(items).repartition(parts)
    val cands = HeavyHitters.mgCandidates(ds, k).collect().toSet
    val n = items.size.toLong
    val counts = items.groupBy(identity).view.mapValues(_.size.toLong)
    val mustSurvive = counts.collect {
      case (w, c) if c * (k + 1) >= n => w
    }.toSet
    val missed = mustSurvive -- cands
    assert(missed.isEmpty,
      s"MG(k=$k, parts=$parts) lost guaranteed heavy hitters: $missed")
    assert(cands.size <= k.toLong * parts,
      s"candidate volume ${cands.size} exceeds k*parts = ${k * parts}")
  }

  test("heavy items survive MG across partitionings, long tail included") {
    // 2 heavy items + a 1000-key tail of singletons: N = 3000,
    // heavy counts 800/1200 clear N/(k+1) for k = 10
    val items = Seq.fill(800)("alpha") ++ Seq.fill(1200)("beta") ++
      (1 to 1000).map(i => s"tail_$i")
    for (parts <- Seq(1, 3, 8)) check(items, k = 10, parts = parts)
  }

  test("adversarial order: heavy item arrives after the tail floods state") {
    // tail first, then the heavy run — the MG decrement step must make
    // room; a naive top-k-by-first-seen would miss it
    val items = (1 to 500).map(i => s"t_$i") ++ Seq.fill(300)("late_heavy")
    check(items, k = 4, parts = 2)
    check(items, k = 4, parts = 1)
  }

  test("boundary: k alone bounds state even with more distinct heavies") {
    // 6 equally-heavy items at k = 3: none reaches N/(k+1)? each has
    // c = 100, N = 600, N/(k+1) = 150 — no guarantee applies, but the
    // call must still bound candidates and not throw
    val items = (1 to 6).flatMap(i => Seq.fill(100)(s"h_$i"))
    check(items, k = 3, parts = 2)
  }
}
