package graft.etl

import java.awt.geom.AffineTransform
import java.awt.image.{AffineTransformOp, BufferedImage}
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Raw media payload: an opaque binary column keyed by document. */
final case class MediaRecord(doc_id: Long, media: Array[Byte])

/** Decoded grayscale-image features (real `javax.imageio` decode). */
final case class ImageFeatures(
    doc_id: Long, width: Int, height: Int, n_pix: Int,
    sum_gray: Long, min_gray: Int, max_gray: Int, px_hex: String)

/** Decoded 3-channel features (BGR raster interleave). */
final case class RgbFeatures(
    doc_id: Long, width: Int, height: Int, n_pix: Int,
    sum_b: Long, sum_g: Long, sum_r: Long, px_hex: String)

/** Real JDK-only image codec pipeline for multimodal (binary) columns.
  *
  * The decode/resize kernels are REAL: PNG encode/decode via
  * `javax.imageio.ImageIO` and nearest-neighbor scaling via
  * `java.awt.image.AffineTransformOp` — no external dependency, the JDK
  * ships both. Grayscale PNG is lossless, so `decode(encodePng(px)) == px`
  * bit-for-bit; that losslessness is what lets a SQL oracle predict the
  * decoded pixel statistics from the (deterministic) pixel formula without
  * itself owning a codec.
  *
  * Plumbing is the production shape: binary-column Dataset with case-class
  * Encoders, `mapPartitions` with explicit batch grouping (a real model
  * kernel amortizes codec/model init per batch, exactly this loop shape),
  * and partition-local execution — decode parallelism is pure map
  * parallelism at any scale, no shuffle anywhere in the pipeline.
  *
  * Scaling-semantics pin: on this JDK, `AffineTransformOp` with
  * TYPE_NEAREST_NEIGHBOR at scale 0.5 maps dst(x,y) ← src(2x+1, 2y+1)
  * (dest pixel center (x+0.5)/0.5 = 2x+1). MediaDecodeSpec asserts that
  * mapping against a planted raster so a JDK behavior change fails loudly
  * at test time instead of silently desyncing the oracle.
  */
object MediaDecode {

  val batchSize = 32

  // ImageIO's default on-disk stream cache costs a temp file per call;
  // these payloads are tiny in-memory arrays.
  ImageIO.setUseCache(false)

  /** One-time JDK-behavior sentinel, forced on every JVM that runs a
    * decode pipeline (lazy val referenced from the batch loops, so each
    * executor JVM pays it once): encode→decode→resize a known 4×4
    * raster and assert the exact bytes. The oracle contract leans on
    * two JDK-specific behaviors pinned otherwise only in tests — PNG
    * gray round-trip losslessness and `AffineTransformOp`'s NN phase
    * dst(x,y) ← src(2x+1, 2y+1) — and a JDK upgrade changing either
    * would otherwise surface as a remote oracle hash mismatch, far from
    * the cause. This fails AT THE DECODE SITE with a named error
    * instead.
    */
  private lazy val jdkSentinel: Unit = {
    val px = Array.tabulate(16)(i => (i * 17).toByte)
    val (w, h, back) = decodePngGray(encodePngGray(4, 4, px))
    require(w == 4 && h == 4 && java.util.Arrays.equals(back, px),
      "JDK sentinel: PNG gray encode→decode no longer bit-lossless")
    val (rw, rh, rpx) = decodePngGray(halfScaleNN(4, 4, encodePngGray(4, 4, px)))
    val expect = Array(px(5), px(7), px(13), px(15)) // src(2x+1, 2y+1)
    require(rw == 2 && rh == 2 && java.util.Arrays.equals(rpx, expect),
      "JDK sentinel: AffineTransformOp NN phase changed (expected " +
        "dst(x,y) <- src(2x+1, 2y+1))")
    val cpx = Array.tabulate(48)(i => (i * 11).toByte)
    val (cw, ch, cback) = decodePngRgb(encodePngRgb(4, 4, cpx))
    require(cw == 4 && ch == 4 && java.util.Arrays.equals(cback, cpx),
      "JDK sentinel: PNG BGR encode→decode no longer bit-lossless")
  }

  /** Encode a grayscale raster (row-major, unsigned bytes) as PNG. */
  def encodePngGray(w: Int, h: Int, px: Array[Byte]): Array[Byte] = {
    require(px.length == w * h, s"raster ${px.length} != ${w}x$h")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, w, h, px)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decode a PNG to (width, height, row-major grayscale raster). */
  def decodePngGray(png: Array[Byte]): (Int, Int, Array[Byte]) = {
    val img = ImageIO.read(new ByteArrayInputStream(png))
    require(img != null, "ImageIO could not decode payload")
    val (w, h) = (img.getWidth, img.getHeight)
    val gray =
      if (img.getType == BufferedImage.TYPE_BYTE_GRAY) img
      else { // normalize exotic color models through a gray draw
        val g = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
        val gr = g.createGraphics(); gr.drawImage(img, 0, 0, null); gr.dispose()
        g
      }
    val px = new Array[Byte](w * h)
    gray.getRaster.getDataElements(0, 0, w, h, px)
    (w, h, px)
  }

  /** Nearest-neighbor half-scale via `AffineTransformOp` (real AWT kernel)
    * on an ALREADY-DECODED image — the hot-loop form ([[resizePipeline]]
    * decodes each payload exactly once). Requires even dims so the
    * oracle-visible mapping src(2x+1, 2y+1) is total (no edge clamping).
    */
  def halfScaleNN(src: BufferedImage): Array[Byte] = {
    val (w, h) = (src.getWidth, src.getHeight)
    require(w % 2 == 0 && h % 2 == 0, s"even dims required, got ${w}x$h")
    val op = new AffineTransformOp(
      AffineTransform.getScaleInstance(0.5, 0.5),
      AffineTransformOp.TYPE_NEAREST_NEIGHBOR)
    val dst = new BufferedImage(w / 2, h / 2, BufferedImage.TYPE_BYTE_GRAY)
    op.filter(src, dst)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(dst, "png", bos)
    bos.toByteArray
  }

  /** PNG-bytes convenience form of [[halfScaleNN]] (one decode). */
  def halfScaleNN(w: Int, h: Int, png: Array[Byte]): Array[Byte] = {
    val img = ImageIO.read(new ByteArrayInputStream(png))
    require(img != null, "ImageIO could not decode payload")
    require(img.getWidth == w && img.getHeight == h,
      s"declared ${w}x$h != decoded ${img.getWidth}x${img.getHeight}")
    halfScaleNN(img)
  }

  /** Deterministic synthetic raster: seed/dims/pixels are pure integer
    * functions of doc_id, so a SQL oracle reproduces the raster without a
    * codec. Dims are even (4..14) to keep the half-scale mapping total.
    */
  def syntheticRaster(id: Long): (Int, Int, Array[Byte]) = {
    val seed = (id % 251).toInt
    val w = (2 * ((id % 6) + 2)).toInt
    val h = (2 * (((id / 7) % 6) + 2)).toInt
    (w, h, Array.tabulate(w * h)(i => ((seed + i * 17) % 256).toByte))
  }

  /** doc_id column → (doc_id, media: real PNG bytes) via [[syntheticRaster]]
    * + a REAL `ImageIO` PNG encode. Partition-local map work, no shuffle.
    */
  def syntheticPngs(spark: SparkSession, ids: DataFrame): DataFrame = {
    import spark.implicits._
    ids.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { id =>
          val (w, h, px) = syntheticRaster(id)
          MediaRecord(id, encodePngGray(w, h, px))
        }
      }
    }.toDF()
  }

  /** Encode a 3-channel raster (row-major, raster-native BGR interleave —
    * `TYPE_3BYTE_BGR`'s data layout) as PNG. The oracle treats the bytes
    * as an opaque interleaved sequence, so the channel ORDER is part of
    * the declared contract, not a hidden codec detail.
    */
  def encodePngRgb(w: Int, h: Int, px: Array[Byte]): Array[Byte] = {
    require(px.length == 3 * w * h, s"raster ${px.length} != 3*${w}x$h")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    img.getRaster.setDataElements(0, 0, w, h, px)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decode a color PNG to (width, height, BGR-interleaved raster). */
  def decodePngRgb(png: Array[Byte]): (Int, Int, Array[Byte]) = {
    val img = ImageIO.read(new ByteArrayInputStream(png))
    require(img != null, "ImageIO could not decode payload")
    val (w, h) = (img.getWidth, img.getHeight)
    val bgr =
      if (img.getType == BufferedImage.TYPE_3BYTE_BGR) img
      else {
        val g = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
        val gr = g.createGraphics(); gr.drawImage(img, 0, 0, null); gr.dispose()
        g
      }
    val px = new Array[Byte](3 * w * h)
    bgr.getRaster.getDataElements(0, 0, w, h, px)
    (w, h, px)
  }

  /** Deterministic synthetic 3-channel raster (BGR interleave), integer
    * formula of doc_id — the RGB twin of [[syntheticRaster]] (different
    * stride constant so the two corpora differ).
    */
  def syntheticRasterRgb(id: Long): (Int, Int, Array[Byte]) = {
    val seed = (id % 239).toInt
    val w = (2 * ((id % 5) + 2)).toInt
    val h = (2 * (((id / 5) % 5) + 2)).toInt
    (w, h, Array.tabulate(3 * w * h)(i => ((seed + i * 23) % 256).toByte))
  }

  /** doc_id column → (doc_id, media: real RGB PNG bytes). */
  def syntheticRgbPngs(spark: SparkSession, ids: DataFrame): DataFrame = {
    import spark.implicits._
    ids.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { id =>
          val (w, h, px) = syntheticRasterRgb(id)
          MediaRecord(id, encodePngRgb(w, h, px))
        }
      }
    }.toDF()
  }

  /** Exact integer ITU-R BT.601 luma of one BGR pixel triple:
    * `(299·R + 587·G + 114·B) div 1000` — floor division, engine-exact.
    */
  def lumaOf(b: Int, g: Int, r: Int): Int = (299 * r + 587 * g + 114 * b) / 1000

  /** BGR raster → gray raster via [[lumaOf]] (OUR kernel, not ImageIO's
    * internal color convert, precisely so a SQL oracle can mirror it).
    */
  def toGray(px: Array[Byte]): Array[Byte] =
    Array.tabulate(px.length / 3) { p =>
      lumaOf(px(3 * p) & 0xff, px(3 * p + 1) & 0xff, px(3 * p + 2) & 0xff).toByte
    }

  private def hexOf(px: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(px.length * 2)
    px.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  private def features(id: Long, png: Array[Byte]): ImageFeatures = {
    val (w, h, px) = decodePngGray(png)
    var s = 0L; var mn = 255; var mx = 0
    px.foreach { b => val v = b & 0xff; s += v; if (v < mn) mn = v; if (v > mx) mx = v }
    ImageFeatures(id, w, h, w * h, s, mn, mx, hexOf(px))
  }

  private def featuresToDf(spark: SparkSession,
      feats: org.apache.spark.sql.Dataset[ImageFeatures]): DataFrame =
    feats.toDF().select(col("doc_id"), col("width"), col("height"),
      col("n_pix"),
      round(col("sum_gray") / (col("n_pix") * 255.0), 6).as("mean_gray"),
      col("min_gray"), col("max_gray"),
      md5(col("px_hex")).as("px_md5"))

  /** (doc_id, media: PNG binary) → decoded feature rows, batched
    * `mapPartitions` with a real `ImageIO` decode per payload. Final
    * rounding/md5 happen as column ops so they match the engine's
    * semantics (same as every other oracle-checked query).
    */
  def decodePipeline(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    featuresToDf(spark, media.as[MediaRecord].mapPartitions { it =>
      jdkSentinel // once per executor JVM: fail at the decode site
      it.grouped(batchSize).flatMap { batch =>
        // per-batch decoder init would go here (codec/model handle)
        batch.iterator.map(r => features(r.doc_id, r.media))
      }
    })
  }

  /** (doc_id, media: color PNG) → per-channel decoded statistics.
    * Channel c of pixel p is raster byte 3p+c (BGR interleave — the
    * declared layout of [[encodePngRgb]]).
    */
  def decodeRgbPipeline(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    val feats = media.as[MediaRecord].mapPartitions { it =>
      jdkSentinel
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val (w, h, px) = decodePngRgb(r.media)
          val sums = new Array[Long](3)
          var i = 0
          while (i < px.length) { sums(i % 3) += px(i) & 0xff; i += 1 }
          RgbFeatures(r.doc_id, w, h, w * h,
            sums(0), sums(1), sums(2), hexOf(px))
        }
      }
    }
    feats.toDF().select(col("doc_id"), col("width"), col("height"),
      col("n_pix"),
      round(col("sum_b") / (col("n_pix") * 255.0), 6).as("mean_b"),
      round(col("sum_g") / (col("n_pix") * 255.0), 6).as("mean_g"),
      round(col("sum_r") / (col("n_pix") * 255.0), 6).as("mean_r"),
      md5(col("px_hex")).as("px_md5"))
  }

  /** (doc_id, media: color PNG) → decode, OUR integer-luma grayscale
    * conversion ([[toGray]]), re-encode as gray PNG, decode again,
    * grayscale feature stats — the color-transform kernel slot of a
    * real preprocessing pipeline, with every step either lossless or
    * integer-exact so the oracle predicts the output bytes.
    */
  def grayscalePipeline(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    featuresToDf(spark, media.as[MediaRecord].mapPartitions { it =>
      jdkSentinel
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val (w, h, px) = decodePngRgb(r.media)
          features(r.doc_id, encodePngGray(w, h, toGray(px)))
        }
      }
    })
  }

  /** (doc_id, media: PNG binary) → decode, NN half-scale, re-encode PNG,
    * decode again, features of the result. The re-encode→decode leg proves
    * the encoder inside the same distributed loop (PNG losslessness makes
    * it a no-op on the pixels, so the oracle still predicts them).
    */
  def resizePipeline(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    featuresToDf(spark, media.as[MediaRecord].mapPartitions { it =>
      jdkSentinel
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          // ONE decode per payload: the decoded image feeds the resize
          // directly (dims come from it, no second ImageIO.read)
          val img = ImageIO.read(new ByteArrayInputStream(r.media))
          require(img != null, "ImageIO could not decode payload")
          features(r.doc_id, halfScaleNN(img))
        }
      }
    })
  }
}
