package graft.etl

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decoded PCM features (real `javax.sound.sampled` decode). */
final case class AudioFeatures(
    doc_id: Long, sample_rate: Int, n_samples: Int,
    sum_abs: Long, min_s: Int, max_s: Int, pcm_csv: String)

/** Per-clip frame energies from REAL decoded samples (the VAD input). */
final case class AudioFrameEnergies(doc_id: Long, energies: Array[Long])

/** Real JDK-only audio codec pipeline for multimodal (binary) columns —
  * the m03 playbook applied at the audio seam.
  *
  * The encode/decode kernels are REAL: WAV container write/parse via
  * `javax.sound.sampled.AudioSystem` (the JDK ships a PCM/WAVE codec the
  * way it ships ImageIO for PNG — no external dependency). 16-bit PCM in
  * a WAV container is lossless, so `decode(encodeWav(samples)) ==
  * samples` bit-for-bit; that losslessness is what lets a SQL oracle
  * predict the decoded sample statistics from the (deterministic)
  * sample formula without itself owning a codec — a parser bug (wrong
  * endianness, header offset, sign extension) breaks the hash.
  *
  * Plumbing matches [[MediaDecode]]: binary-column Dataset with
  * case-class Encoders, `mapPartitions` with explicit batch grouping,
  * partition-local execution — decode parallelism is pure map
  * parallelism at any scale, no shuffle in the decode pass.
  */
object AudioDecode {

  val batchSize = 32

  /** Declared clip format: 8 kHz mono 16-bit signed little-endian PCM. */
  val sampleRate = 8000

  /** VAD frame width in samples ([[frameEnergyPipeline]]). */
  val frameSamples = 16

  private def pcmFormat: AudioFormat =
    new AudioFormat(sampleRate.toFloat, 16, 1, true, false)

  /** One-time JDK-behavior sentinel (the [[MediaDecode]] pattern):
    * encode→parse a known 8-sample clip and assert exact samples + the
    * declared header, once per JVM that runs a decode pipeline — a JDK
    * change to the WAV writer/parser fails HERE with a named error, not
    * as a remote oracle hash mismatch.
    */
  private lazy val jdkSentinel: Unit = {
    val s = Array(Short.MinValue.toInt, -1, 0, 1, Short.MaxValue.toInt,
      -2000, 2000, 777)
    val (rate, back) = decodeWavPcm16(encodeWavPcm16(s))
    require(rate == sampleRate && java.util.Arrays.equals(back, s),
      "JDK sentinel: WAV PCM16 encode→parse no longer bit-lossless")
  }

  /** Encode 16-bit signed samples as a WAV file (real `AudioSystem`
    * container writer, little-endian PCM payload).
    */
  def encodeWavPcm16(samples: Array[Int]): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      val s = samples(i)
      require(s >= Short.MinValue && s <= Short.MaxValue, s"sample $s not 16-bit")
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(
      new ByteArrayInputStream(pcm), pcmFormat, samples.length.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decode a WAV payload to (sampleRate, 16-bit signed samples) with the
    * real JDK parser. Only the declared clip format is in contract —
    * anything else fails loudly rather than desyncing the oracle.
    */
  def decodeWavPcm16(wav: Array[Byte]): (Int, Array[Int]) = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(wav))
    val fmt = ais.getFormat
    require(fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
      fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian,
      s"unsupported audio format: $fmt")
    val bytes = ais.readAllBytes()
    ais.close()
    val out = new Array[Int](bytes.length / 2)
    var i = 0
    while (i < out.length) {
      // little-endian: sign-extended high byte, unsigned low byte
      out(i) = (bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xff)
      i += 1
    }
    (fmt.getSampleRate.toInt, out)
  }

  /** Deterministic synthetic clip: sample count and values are pure
    * integer functions of doc_id, so a SQL oracle reproduces the PCM
    * without a codec. Counts are multiples of [[frameSamples]] so the
    * VAD framing is total (no ragged tail frame).
    */
  def syntheticSamples(id: Long): Array[Int] = {
    val seed = (id % 211).toInt
    val n = (64 + 16 * (id % 8)).toInt
    Array.tabulate(n)(i => (seed + 37 * i) % 4001 - 2000)
  }

  /** doc_id column → (doc_id, media: real WAV bytes) via
    * [[syntheticSamples]] + a REAL `AudioSystem` WAV encode.
    * Partition-local map work, no shuffle.
    */
  def syntheticWavs(spark: SparkSession, ids: DataFrame): DataFrame = {
    import spark.implicits._
    ids.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map(id => MediaRecord(id, encodeWavPcm16(syntheticSamples(id))))
      }
    }.toDF()
  }

  /** (doc_id, media: WAV binary) → decoded sample statistics, batched
    * `mapPartitions` with a real `AudioSystem` parse per payload. The
    * reported sample_rate comes from the DECODED header (pinning that
    * the parser actually read it), the checksum from the decoded
    * samples; final md5 happens as a column op (engine semantics).
    */
  def decodePipeline(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      jdkSentinel // once per executor JVM: fail at the decode site
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val (rate, s) = decodeWavPcm16(r.media)
          var sa = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
          s.foreach { v =>
            sa += math.abs(v).toLong
            if (v < mn) mn = v; if (v > mx) mx = v
          }
          AudioFeatures(r.doc_id, rate, s.length, sa, mn, mx, s.mkString(","))
        }
      }
    }.toDF().select(col("doc_id"), col("sample_rate"), col("n_samples"),
      col("sum_abs"), col("min_s"), col("max_s"),
      md5(col("pcm_csv")).as("pcm_md5"))
  }

  /** (doc_id, media: WAV binary) → decode, 2× DECIMATION (keep every
    * 2nd sample — the integer-exact resample kernel, the audio twin of
    * [[MediaDecode.resizePipeline]]'s NN half-scale), re-encode WAV,
    * parse again, features of the result. The re-encode→parse leg
    * proves the writer inside the same distributed loop (WAV/PCM
    * losslessness makes it a no-op on the samples, so the oracle still
    * predicts them: sample i of the output = source sample 2i).
    * Sample counts are multiples of [[frameSamples]] = 16, so halving
    * never leaves a ragged frame.
    */
  def decimatePipeline(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      jdkSentinel
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val (_, s) = decodeWavPcm16(r.media)
          val half = Array.tabulate(s.length / 2)(i => s(2 * i))
          val (rate, back) = decodeWavPcm16(encodeWavPcm16(half))
          var sa = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
          back.foreach { v =>
            sa += math.abs(v).toLong
            if (v < mn) mn = v; if (v > mx) mx = v
          }
          AudioFeatures(r.doc_id, rate, back.length, sa, mn, mx,
            back.mkString(","))
        }
      }
    }.toDF().select(col("doc_id"), col("sample_rate"), col("n_samples"),
      col("sum_abs"), col("min_s"), col("max_s"),
      md5(col("pcm_csv")).as("pcm_md5"))
  }

  /** (doc_id, media: WAV binary) → (doc_id, f, energy): per-frame
    * absolute energy (Σ |sample| over [[frameSamples]]-sample frames)
    * computed from REAL decoded samples in the batch loop, then exploded
    * partition-locally — the input table of an energy-threshold VAD.
    */
  def frameEnergyPipeline(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      jdkSentinel
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val (_, s) = decodeWavPcm16(r.media)
          val n = s.length / frameSamples
          val e = Array.tabulate(n) { f =>
            var acc = 0L
            var i = f * frameSamples
            val end = i + frameSamples
            while (i < end) { acc += math.abs(s(i)).toLong; i += 1 }
            acc
          }
          AudioFrameEnergies(r.doc_id, e)
        }
      }
    }.toDF()
      .select(col("doc_id"),
        posexplode(col("energies")).as(Seq("f", "energy")))
      .select(col("doc_id"), col("f").cast("long").as("f"), col("energy"))
  }
}
