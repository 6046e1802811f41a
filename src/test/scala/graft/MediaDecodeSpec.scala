package graft

import graft.etl.{AudioDecode, MediaDecode}

/** Pins the REAL JDK codec kernels behind m03/m04 (and the audio twins
  * behind m14/m15):
  *
  *  - PNG grayscale encode→decode is bit-lossless (the property the
  *    DuckDB oracles rely on to predict decoded pixels without a codec);
  *  - `AffineTransformOp` nearest-neighbor half-scale maps
  *    dst(x,y) ← src(2x+1, 2y+1) on this JDK — if a JDK upgrade ever
  *    changes the resample phase, this suite fails loudly instead of the
  *    oracle silently desyncing;
  *  - WAV 16-bit PCM encode→parse via `javax.sound.sampled` is
  *    bit-lossless and round-trips the declared header;
  *  - the distributed pipelines produce exactly the formula-predicted
  *    features over a planted corpus.
  */
class MediaDecodeSpec extends SparkSpec {
  import spark.implicits._

  test("PNG gray encode -> decode is bit-lossless for all byte values") {
    // 16x16 = every unsigned byte value exactly once
    val px = Array.tabulate(256)(i => i.toByte)
    val png = MediaDecode.encodePngGray(16, 16, px)
    // real PNG container, not a passthrough
    assert(png.take(4).map(_ & 0xff).toSeq == Seq(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt))
    val (w, h, back) = MediaDecode.decodePngGray(png)
    assert(w == 16 && h == 16 && back.toSeq == px.toSeq)
  }

  test("halfScaleNN pins the JDK NN mapping dst(x,y) <- src(2x+1, 2y+1)") {
    val (w, h) = (10, 6)
    val px = Array.tabulate(w * h)(i => ((11 + i * 17) % 256).toByte)
    val resized = MediaDecode.halfScaleNN(w, h, MediaDecode.encodePngGray(w, h, px))
    val (rw, rh, rpx) = MediaDecode.decodePngGray(resized)
    assert(rw == w / 2 && rh == h / 2)
    val expect = for (y <- 0 until rh; x <- 0 until rw)
      yield px((2 * y + 1) * w + (2 * x + 1))
    assert(rpx.toSeq == expect)
    // odd dims must refuse rather than silently clamp at the edge
    assertThrows[IllegalArgumentException] {
      MediaDecode.halfScaleNN(5, 6, MediaDecode.encodePngGray(w, h, px))
    }
  }

  test("RGB PNG encode -> decode is bit-lossless on the BGR raster") {
    val (w, h) = (6, 4)
    val px = Array.tabulate(3 * w * h)(i => ((13 + i * 23) % 256).toByte)
    val png = MediaDecode.encodePngRgb(w, h, px)
    assert(png.take(4).map(_ & 0xff).toSeq == Seq(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt))
    val (rw, rh, back) = MediaDecode.decodePngRgb(png)
    assert(rw == w && rh == h && back.toSeq == px.toSeq)
  }

  test("integer luma kernel matches the declared formula, end to end") {
    assert(MediaDecode.lumaOf(0, 0, 0) == 0)
    assert(MediaDecode.lumaOf(255, 255, 255) == 255)
    assert(MediaDecode.lumaOf(100, 50, 200) == // B=100 G=50 R=200
      (299 * 200 + 587 * 50 + 114 * 100) / 1000)
    val ids = Seq(3L, 14L, 159L).toDF("doc_id")
    val gray = MediaDecode.grayscalePipeline(
      spark, MediaDecode.syntheticRgbPngs(spark, ids))
      .orderBy("doc_id").collect()
    gray.foreach { r =>
      val id = r.getLong(0)
      val (w, h, px) = MediaDecode.syntheticRasterRgb(id)
      assert(r.getInt(1) == w && r.getInt(2) == h)
      val g = MediaDecode.toGray(px).map(_ & 0xff)
      assert(r.getInt(5) == g.min && r.getInt(6) == g.max)
      val sum = g.map(_.toLong).sum
      assert(r.getDouble(4) == math.rint(sum / (w * h * 255.0) * 1e6) / 1e6)
    }
  }

  test("WAV PCM16 encode -> parse is bit-lossless, header round-trips") {
    // full 16-bit envelope: extremes, zero, both signs
    val s = Array(Short.MinValue.toInt, -1, 0, 1, Short.MaxValue.toInt,
      -2000, 2000, 1234, -4321) ++ Array.tabulate(55)(i => (i * 997) % 4001 - 2000)
    val wav = AudioDecode.encodeWavPcm16(s)
    // real RIFF/WAVE container, not a passthrough
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val (rate, back) = AudioDecode.decodeWavPcm16(wav)
    assert(rate == AudioDecode.sampleRate && back.toSeq == s.toSeq)
    // out-of-range samples must refuse rather than silently truncate
    assertThrows[IllegalArgumentException] {
      AudioDecode.encodeWavPcm16(Array(40000))
    }
  }

  test("syntheticSamples -> audio pipelines match formula predictions") {
    val ids = Seq(0L, 1L, 7L, 41L, 210L, 211L, 997L).toDF("doc_id")
    val media = AudioDecode.syntheticWavs(spark, ids)

    val decoded = AudioDecode.decodePipeline(spark, media)
      .orderBy("doc_id").collect()
    decoded.foreach { r =>
      val id = r.getLong(0)
      val s = AudioDecode.syntheticSamples(id)
      assert(r.getInt(1) == AudioDecode.sampleRate)
      assert(r.getInt(2) == s.length)
      assert(r.getLong(3) == s.map(v => math.abs(v).toLong).sum)
      assert(r.getInt(4) == s.min && r.getInt(5) == s.max)
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.mkString(",").getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
      assert(r.getString(6) == md)
    }

    val halved = AudioDecode.decimatePipeline(spark, media)
      .orderBy("doc_id").collect()
    halved.foreach { r =>
      val id = r.getLong(0)
      val s = AudioDecode.syntheticSamples(id)
      val half = Array.tabulate(s.length / 2)(i => s(2 * i))
      assert(r.getInt(1) == AudioDecode.sampleRate)
      assert(r.getInt(2) == half.length)
      assert(r.getLong(3) == half.map(v => math.abs(v).toLong).sum)
      assert(r.getInt(4) == half.min && r.getInt(5) == half.max)
    }

    val frames = AudioDecode.frameEnergyPipeline(spark, media)
      .orderBy("doc_id", "f").as[(Long, Long, Long)].collect()
    val expect = Seq(0L, 1L, 7L, 41L, 210L, 211L, 997L).flatMap { id =>
      val s = AudioDecode.syntheticSamples(id)
      s.grouped(AudioDecode.frameSamples).zipWithIndex.map { case (fr, f) =>
        (id, f.toLong, fr.map(v => math.abs(v).toLong).sum)
      }
    }.sorted
    assert(frames.toSeq == expect)
  }

  test("syntheticRaster -> pipelines match formula-predicted features") {
    val ids = Seq(0L, 1L, 7L, 41L, 250L, 251L, 997L).toDF("doc_id")
    val media = MediaDecode.syntheticPngs(spark, ids)

    val decoded = MediaDecode.decodePipeline(spark, media)
      .orderBy("doc_id").collect()
    decoded.foreach { r =>
      val id = r.getLong(0)
      val (w, h, px) = MediaDecode.syntheticRaster(id)
      assert(r.getInt(1) == w && r.getInt(2) == h && r.getInt(3) == w * h)
      val u = px.map(_ & 0xff)
      assert(r.getInt(5) == u.min && r.getInt(6) == u.max)
      val hex = u.map(v => f"$v%02x").mkString
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(hex.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
      assert(r.getString(7) == md)
    }

    val resized = MediaDecode.resizePipeline(spark, media)
      .orderBy("doc_id").collect()
    resized.foreach { r =>
      val id = r.getLong(0)
      val (w, h, px) = MediaDecode.syntheticRaster(id)
      val (rw, rh) = (w / 2, h / 2)
      assert(r.getInt(1) == rw && r.getInt(2) == rh && r.getInt(3) == rw * rh)
      val sub = for (y <- 0 until rh; x <- 0 until rw)
        yield px((2 * y + 1) * w + (2 * x + 1)) & 0xff
      assert(r.getInt(5) == sub.min && r.getInt(6) == sub.max)
    }
  }
}
