package graft

import graft.queries.Registry

/** Semantics pins for the round-12 entries:
  *   - t79 vocab-size stop condition: the "budget" half must emit
  *     exactly vocabSize − |base alphabet| merges (the budget
  *     arithmetic), the "dried" half must stop at the corpus's merge
  *     capacity well short of its target (the early stop), and the
  *     budget schedule must be a strict prefix of the dried schedule
  *     (both regimes run the SAME trainer — only the stop differs).
  */
class RoundTwelveOpsSpec extends SparkSpec {

  private def run(name: String) = Registry.queries(name)(spark, sf0001)

  test("t79: budget arithmetic, dried early stop, prefix property") {
    val rows = run("t79_bpe_vocab_target").collect()
    val byMode = rows.groupBy(_.getAs[String]("mode"))
    val budget = byMode("budget").sortBy(_.getAs[Int]("round"))
    val dried = byMode("dried").sortBy(_.getAs[Int]("round"))
    // budget = vocabSize (36) − base alphabet (24 on this corpus) = 12
    assert(budget.map(_.getAs[Int]("round")).toSeq == (1 to 12))
    // dried: stops at the corpus's merge capacity (89), far short of
    // the 200-merge budget its vocab target implies
    assert(dried.map(_.getAs[Int]("round")).toSeq == (1 to 89))
    // one trainer, two stop conditions: budget is a prefix of dried
    def sched(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => (r.getAs[String]("s1"), r.getAs[String]("s2"),
        r.getAs[Long]("freq"))).toSeq
    assert(sched(budget) == sched(dried).take(12))
    // every merge is a real pair (non-empty, space-free symbols)
    sched(dried).foreach { case (s1, s2, f) =>
      assert(s1.nonEmpty && s2.nonEmpty && !s1.contains(" ") && !s2.contains(" "))
      assert(f > 0)
    }
  }

  test("t80: fertility curve is monotone down, capacity point is exact") {
    val rows = run("t80_bpe_vocab_curve").collect()
      .sortBy(_.getAs[Int]("vocab_target"))
    assert(rows.length == 3)
    // every curve point trained its full budget (no early dry before 89)
    assert(rows.map(_.getAs[Long]("n_merges")).toSeq == Seq(12L, 36L, 89L))
    // vocab_target = base alphabet (24 on this corpus) + budget
    assert(rows.map(_.getAs[Int]("vocab_target")).toSeq == Seq(36, 60, 113))
    // the corpus doesn't change with the tokenizer
    assert(rows.map(_.getAs[Long]("n_tokens")).distinct.length == 1)
    // more merges can only coarsen segmentations: fertility strictly
    // falls along this curve, and at full merge capacity every word is
    // a single token — fertility exactly 1000 per-mille
    val fert = rows.map(_.getAs[Long]("fertility_pm")).toSeq
    assert(fert.zip(fert.tail).forall { case (a, b) => a > b }, fert)
    assert(fert.last == 1000L)
  }
}
