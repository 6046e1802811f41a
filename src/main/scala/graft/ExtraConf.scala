package graft
import org.apache.spark.sql.SparkSession

/** SPARK_GRAFT_EXTRA_CONF: semicolon-separated k=v Spark confs — the
  * generic experiment seam (event logs for the failure-injection run,
  * RocksDB state store for the streaming drills, etc.) so one-off runs
  * never need a code edit. One parser shared by every main (Bench,
  * Verify, StreamBench, StreamResume): blank segments from doubled or
  * trailing semicolons are skipped, and a segment without '=' fails
  * loudly instead of throwing an opaque MatchError at session build.
  */
object ExtraConf {
  def apply(builder: SparkSession.Builder,
            env: Map[String, String] = sys.env): SparkSession.Builder = {
    env.get("SPARK_GRAFT_EXTRA_CONF").foreach {
      _.split(';').map(_.trim).filter(_.nonEmpty).foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => builder.config(k.trim, v.trim)
          case _ => sys.error(
            s"bad SPARK_GRAFT_EXTRA_CONF entry (expected k=v): '$kv'")
        }
      }
    }
    builder
  }

  /** SPARK_GRAFT_STATE_STORE=rocksdb: streaming state in the RocksDB
    * provider (native, local-disk-backed, changelog+snapshot files in
    * the checkpoint) instead of the default HDFS-backed provider, which
    * keeps EVERY live state row on-heap per executor. At sf-scale the
    * default is fine; at 100 TB a hot stream's watermark-bounded state
    * exceeds executor memory and RocksDB is the standard production
    * answer. One env seam so every streaming main (StreamBench,
    * StreamResume) runs on either store without a code edit; returns
    * the active store name for the run's JSON/log line.
    */
  def stateStore(builder: SparkSession.Builder,
                 env: Map[String, String] = sys.env): String =
    env.getOrElse("SPARK_GRAFT_STATE_STORE", "hdfs").toLowerCase match {
      case "rocksdb" =>
        builder.config("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state." +
            "RocksDBStateStoreProvider")
        // changelog checkpointing: per-batch deltas instead of full
        // snapshot uploads — the production setting for low-latency
        // commits (snapshots still taken in the background for resume)
        builder.config(
          "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
          "true")
        "rocksdb"
      case other => other
    }
}
