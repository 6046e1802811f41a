package graft

import graft.etl.Artifacts
import org.apache.spark.sql.functions._

/** Pins the shared-artifact build accounting (Artifacts.buildStack):
  * a build whose body calls `shared` again must not double-count the
  * inner build's wall in its own entry — the defect surfaced when a
  * solo run reported more `build_sec` than the consumer query's entire
  * measured wall — and a THROWING build must still pop its stack
  * frame, or every later build on the process misattributes child
  * time.
  */
class ArtifactsSpec extends SparkSpec {

  // tags are the accounting keys and the cache keys — unique per run so
  // repeated test invocations in one JVM never read a stale artifact or
  // a previous run's accumulated seconds
  private def freshTag(stem: String) = s"${stem}_${System.nanoTime()}"

  test("nested build: parent's seconds exclude the child's; child appears once") {
    val tagP = freshTag("artspec_parent")
    val tagC = freshTag("artspec_child")
    val childSleep = 0.4
    val parentSleep = 0.2
    val t0 = System.nanoTime()
    val df = Artifacts.shared(spark, "/tmp/artspec_ds", tagP) {
      val child = Artifacts.shared(spark, "/tmp/artspec_ds", tagC) {
        Thread.sleep((childSleep * 1000).toLong)
        spark.range(5).toDF("id")
      }
      Thread.sleep((parentSleep * 1000).toLong)
      child.withColumn("x", col("id") * 2)
    }
    val wall = (System.nanoTime() - t0) / 1e9
    assert(df.count() == 5)
    val b = Artifacts.buildSeconds
    assert(b.contains(tagP) && b.contains(tagC))
    // the child's full wall is its own entry (exactly once)
    assert(b(tagC) >= childSleep,
      s"child build under its sleep floor: ${b(tagC)}")
    // the parent's entry is its OWN work only: at least its sleep, and
    // the child's wall subtracted — so parent + child fits inside the
    // one measured outer wall (the r14 defect made the sum exceed it)
    assert(b(tagP) >= parentSleep,
      s"parent build under its sleep floor: ${b(tagP)}")
    assert(b(tagP) <= wall - b(tagC) + 0.05,
      s"parent did not subtract child time: parent=${b(tagP)} " +
        s"child=${b(tagC)} wall=$wall")
    assert(b(tagP) + b(tagC) <= wall + 0.05,
      s"build_sec sum exceeds the wall it sits inside: " +
        s"${b(tagP)} + ${b(tagC)} > $wall")
  }

  test("throwing child pops its frame; later accounting stays correct") {
    val tagBad = freshTag("artspec_boom")
    val tagP = freshTag("artspec_parent2")
    val tagC = freshTag("artspec_child2")
    // a parent build whose CHILD build throws (and the parent recovers)
    // — the child must record nothing and must leave the frame stack
    // balanced for the rest of the build
    val t0 = System.nanoTime()
    Artifacts.shared(spark, "/tmp/artspec_ds", tagP) {
      intercept[RuntimeException] {
        Artifacts.shared(spark, "/tmp/artspec_ds", tagBad) {
          sys.error("boom")
        }
      }
      val child = Artifacts.shared(spark, "/tmp/artspec_ds", tagC) {
        Thread.sleep(300)
        spark.range(3).toDF("id")
      }
      child
    }
    val wall = (System.nanoTime() - t0) / 1e9
    val b = Artifacts.buildSeconds
    assert(!b.contains(tagBad), "a throwing build must record no seconds")
    // with a leaked/unbalanced frame the surviving child's time would be
    // mis-parented; both entries must still fit inside the outer wall
    assert(b(tagC) >= 0.3)
    assert(b(tagP) + b(tagC) <= wall + 0.05,
      s"accounting broken after a throwing child: " +
        s"${b(tagP)} + ${b(tagC)} > $wall")
  }
}
