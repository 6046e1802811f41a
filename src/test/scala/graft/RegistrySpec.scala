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
      // mostly analysis-only; entries built on eager artifacts
      // (Artifacts.shared) or eagerly-materialized operators
      // (Dedup.ppJoinPairs — see its EXECUTION CONTRACT) do execute
      // here, which sf0.001 keeps cheap
      val schema = fn(spark, sfDir).schema
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

  test("COVERAGE.md's documented entry count matches the registry") {
    // the traceability doc drifted from the registry twice in past
    // rounds; pin the bolded "**N oracle-checked entries**" header
    // figure to the actual registry size so it cannot drift silently
    val doc = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("COVERAGE.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val m = """\*\*(\d+) oracle-checked entries\*\*""".r.findFirstMatchIn(doc)
    assert(m.isDefined, "COVERAGE.md lost its '**N oracle-checked entries**' marker")
    assert(m.get.group(1).toInt == Registry.queries.size,
      s"COVERAGE.md documents ${m.get.group(1)} entries but the registry has " +
        s"${Registry.queries.size} — update COVERAGE.md")
    // and every entry has an oracle: the driver's hash gate covers 100%
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet,
      "every registry entry must carry a DuckDB oracle")
  }

  test("the retired hyperplane trio stays retired (bench set == registry)") {
    // round 12 removed e03/e07/e13 (deprecated correlated-plane family)
    // entirely; the default bench path is the full registry again
    val retired = Set("e03_embed_neardup", "e07_semantic_neardup",
      "e13_lsh_geometry_audit")
    assert(retired.intersect(SparkEntry.queries.keySet).isEmpty,
      "a retired entry resurfaced in the registry")
  }
}
