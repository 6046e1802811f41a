package graft

import graft.queries.Registry

/** Registry contract: the driver's assumptions about `SparkEntry`.
  * Catches a renamed/duplicated query or an oracle keyed to nothing
  * before the round's verify run does.
  */
class RegistrySpec extends SparkSpec {

  private lazy val sfDir = sf0001

  test("names are unique, well-formed, and oracles reference real queries") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.length == names.length, "duplicate query names")
    names.foreach(n => assert(n.matches("[a-z][a-z0-9_]*"), s"bad name: $n"))
    val qKeys = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qKeys))
    assert(qKeys.size >= 111)
  }

  test("every query plan resolves at sf0.001 with sane output columns") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val schema = fn(spark, sfDir).schema // analysis only — no execution
      assert(schema.nonEmpty, s"$name: empty schema")
      val cols = schema.map(_.name)
      assert(cols.distinct.length == cols.length, s"$name: duplicate columns $cols")
      cols.foreach(c => assert(c.nonEmpty && !c.startsWith("_"),
        s"$name: internal column '$c' leaked into output"))
    }
  }

  test("the flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
