package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for test suites. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  lazy val sqlc = spark.sqlContext

  /** Smallest driver-generated fixture dir; overridable via env/prop so
    * the suite isn't pinned to this machine's layout.
    */
  protected lazy val sf0001: String =
    sys.env.get("SPARK_GRAFT_TESTDATA")
      .orElse(sys.props.get("graft.testdata"))
      .getOrElse("/root/testdata") + "/sf0.001"
}

object SparkSpec {
  // One session for the whole forked test JVM — Spark startup is ~5s.
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
