package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SPARK_GRAFT_EXTRA_CONF parser shared by every main: blank
  * segments skip, missing '=' fails loudly (the r13 advice item — the
  * old inline `val Array(k, v) = ...` threw an opaque MatchError), and
  * the state-store seam resolves provider names.
  */
class ExtraConfSpec extends AnyFunSuite {

  // the builder's options map is private; the contracts worth pinning
  // are parse-tolerance (no-throw) and the loud failure message
  private def parsed(v: String): Unit =
    ExtraConf(org.apache.spark.sql.SparkSession.builder(),
      Map("SPARK_GRAFT_EXTRA_CONF" -> v))

  test("blank segments from doubled/trailing semicolons are skipped") {
    // must not throw (the old parser MatchError'd on the empty segment)
    parsed("a=1;;b=2;")
    parsed(";")
    parsed("")
  }

  test("a segment without '=' fails with an explicit message") {
    val e = intercept[RuntimeException](parsed("a=1;oops;b=2"))
    assert(e.getMessage.contains("oops"))
    assert(e.getMessage.contains("SPARK_GRAFT_EXTRA_CONF"))
  }

  test("values may themselves contain '=' (split at the first only)") {
    parsed("spark.x.y=k=v") // k=v value — must parse, not error
  }

  test("empty key ('=v') and empty value ('a=') fail loudly") {
    val ek = intercept[RuntimeException](parsed("=v"))
    assert(ek.getMessage.contains("SPARK_GRAFT_EXTRA_CONF"))
    val ev = intercept[RuntimeException](parsed("a=1;b="))
    assert(ev.getMessage.contains("b="))
  }

  test("state-store seam: rocksdb selects the RocksDB provider, default is hdfs") {
    val b = org.apache.spark.sql.SparkSession.builder()
    assert(ExtraConf.stateStore(b, Map.empty) == "hdfs")
    assert(ExtraConf.stateStore(b,
      Map("SPARK_GRAFT_STATE_STORE" -> "rocksdb")) == "rocksdb")
    assert(ExtraConf.stateStore(b,
      Map("SPARK_GRAFT_STATE_STORE" -> "ROCKSDB")) == "rocksdb")
  }

  test("state-store seam: a typo fails loudly instead of mislabeling") {
    val b = org.apache.spark.sql.SparkSession.builder()
    val e = intercept[RuntimeException](ExtraConf.stateStore(b,
      Map("SPARK_GRAFT_STATE_STORE" -> "rocksbd")))
    assert(e.getMessage.contains("rocksbd"))
  }
}
