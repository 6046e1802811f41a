package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Raw media payload: an opaque binary column keyed by document. */
final case class MediaRecord(doc_id: Long, media: Array[Byte])

/** Decoded per-media features (from the stub decoder). */
final case class MediaFeatures(
    doc_id: Long, n_bytes: Int,
    f0: Double, f1: Double, f2: Double, f3: Double)

/** Typed-Dataset decode pipeline for multimodal (binary) columns.
  *
  * The decode step is a ==STUB== — this container has no image/audio
  * codecs, so [[decodeStub]] computes deterministic byte statistics in
  * place of a real `decode → resize → embed` kernel. The *plumbing* is the
  * real thing a production pipeline needs and what tests cover:
  * binary-column Dataset with case-class Encoders, `mapPartitions` with
  * explicit batch grouping (a real decoder amortizes model/codec init per
  * batch, exactly this loop shape), and partition-local execution (no
  * shuffle — decode parallelism is pure map parallelism at any scale).
  */
object MediaDecode {

  val batchSize = 32

  /** ==STUB decoder== — stands in for image/audio decoding. Deterministic:
    * mean byte value (unsigned) of each 16-byte quarter, normalized to
    * [0,1]. Integer summation in ascending index order keeps it bit-exact
    * vs the SQL oracle's `list_sum`.
    */
  def decodeStub(bytes: Array[Byte]): Array[Double] = {
    val groups = 4
    val per = bytes.length / groups
    if (per == 0) return Array.fill(groups)(0.0) // <4-byte payload: no NaNs
    Array.tabulate(groups) { g =>
      var s = 0L // Long: an Int sum wraps negative beyond ~8 MB per quarter
      var i = g * per
      while (i < (g + 1) * per) { s += bytes(i) & 0xff; i += 1 }
      s / (per * 255.0)
    }
  }

  /** (doc_id, media: binary) → decoded feature rows. Batched
    * `mapPartitions` so a real decoder could hold codec state per batch.
    * Final rounding happens as a column op so it matches the engine's
    * round semantics (same as every other oracle-checked query).
    */
  def decodePipeline(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    val feats = media.as[MediaRecord].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch decoder init would go here (codec/model handle)
        batch.iterator.map { r =>
          val f = decodeStub(r.media)
          MediaFeatures(r.doc_id, r.media.length, f(0), f(1), f(2), f(3))
        }
      }
    }
    feats.toDF().select(col("doc_id"), col("n_bytes"),
      round(col("f0"), 6).as("f0"), round(col("f1"), 6).as("f1"),
      round(col("f2"), 6).as("f2"), round(col("f3"), 6).as("f3"))
  }
}
