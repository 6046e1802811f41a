package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators: image/audio/video payloads modeled as
  * opaque `binary` columns with typed metadata, plus decode /
  * feature-extract / frame-sample plumbing.
  *
  * The image decode/resize kernels (m03/m04) are REAL JDK codecs:
  * `javax.imageio` PNG encode/decode and `java.awt.image.AffineTransformOp`
  * nearest-neighbor scaling — see [[graft.etl.MediaDecode]]. PNG
  * losslessness is what makes them oracle-checkable: the raster is a
  * deterministic integer function of doc_id, so DuckDB predicts the
  * decoded pixels without owning a codec.
  *
  * The audio decode/VAD kernels (m14/m15) are REAL too:
  * `javax.sound.sampled` WAV/PCM parse — see [[graft.etl.AudioDecode]];
  * WAV losslessness plays the role PNG losslessness plays for images.
  *
  * The frame/video payloads (m02, m09; m10's fabricated formulation)
  * are fabricated deterministically from document text (md5 chains →
  * 64-byte blobs) identically in Spark and the DuckDB oracle, so
  * metadata/frame queries hash-match; their byte-extraction seam is
  * where a real video codec would slot in, exactly as ImageIO/
  * AudioSystem do for m03/m14. Video stays fabricated BY DESIGN: the
  * JDK ships no video codec (ImageIO covers images, AudioSystem covers
  * WAV/PCM), and the zero-new-dependency rule is part of the repo's
  * build contract.
  *
  * Scale design: fabrication/decode are per-row map work (no shuffle);
  * frame explode fans out rows but stays partition-local; at 100 TB real
  * decoders slot into the same `mapPartitions` batch loop with binary
  * columns read lazily from parquet (column pruning keeps blobs out of
  * queries that don't touch them).
  */
object MultimodalQueries {

  private val mediaBytes = 64 // 4 chained md5 blocks

  /** Hex fabrication of the media payload (128 hex chars = 64 bytes). */
  private def hexm(text: Column): Column =
    concat(md5(text), md5(concat(text, lit("a"))),
      md5(concat(text, lit("b"))), md5(concat(text, lit("c"))))

  private val hexmSql =
    "md5(text) || md5(text||'a') || md5(text||'b') || md5(text||'c')"

  /** Byte i (0-based, unsigned) of a lowercase hex string. */
  private def hexByte(h: Column, i: Int): Column =
    conv(substring(h, 2 * i + 1, 2), 16, 10).cast("int")

  private def hexByteSql(h: String, i: String): String =
    s"CAST(('0x' || substr($h, 2*($i) + 1, 2)) AS INTEGER)"

  // ---- m01: media metadata -------------------------------------------

  private val m01 = Q(
    "m01_media_metadata",
    (s, d) => {
      val docs = graft.etl.Tables.spread(graft.etl.Tables.documents(s, d))
        .select(col("doc_id"), hexm(col("text")).as("h"))
        // real BinaryType column: the payload a production pipeline would
        // carry; metadata derives from it via hex round-trip
        .withColumn("media", unhex(col("h")))
      docs.select(
        col("doc_id"),
        length(col("media")).as("n_bytes"),
        when(hexByte(col("h"), 0) < 64, "png")
          .when(hexByte(col("h"), 0) < 128, "jpg")
          .when(hexByte(col("h"), 0) < 192, "wav")
          .otherwise("mp4").as("format"),
        (hexByte(col("h"), 1) + 1).as("width"),
        (hexByte(col("h"), 2) + 1).as("height"),
        md5(col("h")).as("checksum"))
    },
    Some(s"""
      WITH m AS (SELECT doc_id, $hexmSql AS h FROM documents)
      SELECT doc_id,
             octet_length(from_hex(h)) AS n_bytes,
             CASE WHEN ${hexByteSql("h", "0")} < 64 THEN 'png'
                  WHEN ${hexByteSql("h", "0")} < 128 THEN 'jpg'
                  WHEN ${hexByteSql("h", "0")} < 192 THEN 'wav'
                  ELSE 'mp4' END AS format,
             ${hexByteSql("h", "1")} + 1 AS width,
             ${hexByteSql("h", "2")} + 1 AS height,
             md5(h) AS checksum
      FROM m
    """))

  // ---- m02: frame sampling -------------------------------------------
  // Treat the payload as 8 frames of 8 bytes; keep every 2nd frame
  // (a video frame-sampler's plan shape: explode stays partition-local).

  private val frameBytes = 8
  private val sampleEvery = 2

  private val m02 = Q(
    "m02_frame_sample",
    (s, d) => {
      val nFrames = mediaBytes / frameBytes
      val docs = graft.etl.Tables.spread(graft.etl.Tables.documents(s, d))
        .select(col("doc_id"), lower(hex(unhex(hexm(col("text"))))).as("h"))
      docs
        .select(col("doc_id"),
          explode(sequence(lit(0), lit(nFrames - 1))).as("frame_idx"),
          col("h"))
        .filter(col("frame_idx") % sampleEvery === 0)
        .select(col("doc_id"), col("frame_idx"),
          col("h").substr(col("frame_idx") * lit(2 * frameBytes) + 1,
            lit(2 * frameBytes)).as("frame_hex"))
        .withColumn("frame_h",
          graft.functions.Portable.hash60(col("frame_hex"), 5))
    },
    Some(s"""
      WITH m AS (SELECT doc_id, lower(hex(from_hex($hexmSql))) AS h FROM documents),
      f AS (SELECT doc_id, unnest(range(0, ${mediaBytes / frameBytes})) AS frame_idx, h FROM m)
      SELECT doc_id, frame_idx,
             substr(h, frame_idx * ${2 * frameBytes} + 1, ${2 * frameBytes}) AS frame_hex,
             CAST(('0x'||substr(md5(substr(h, frame_idx * ${2 * frameBytes} + 1, ${2 * frameBytes})||'#5'),1,15)) AS BIGINT) AS frame_h
      FROM f WHERE frame_idx % $sampleEvery = 0
    """))

  // ---- m03: REAL javax.imageio PNG decode → features -----------------
  //
  // Fabricate a deterministic grayscale raster per doc (pure integer
  // formula of doc_id), REALLY encode it to PNG with ImageIO on the
  // executors, then REALLY decode it back in the batched mapPartitions
  // pipeline and report pixel statistics + a pixel checksum. PNG is
  // lossless, so the DuckDB oracle predicts the decoded raster from the
  // SAME integer formula without owning a codec — any codec bug (wrong
  // stride, color model, byte sign) breaks the hash.
  //
  // Scale shape: encode and decode are partition-local map work over a
  // binary column; ZERO shuffles. A JPEG/WebP decoder or an embedding
  // model slots into the identical batch loop.

  /** Shared oracle CTE: doc_id → (seed, even dims) mirror of
    * [[graft.etl.MediaDecode.syntheticRaster]].
    */
  private val rasterCte = """
      m AS (SELECT doc_id,
                   CAST(doc_id % 251 AS BIGINT) AS seed,
                   CAST(2*((doc_id % 6) + 2) AS BIGINT) AS w,
                   CAST(2*(((doc_id // 7) % 6) + 2) AS BIGINT) AS h
            FROM documents)"""

  /** The gray PNG corpus, fabricated (real ImageIO encode) ONCE per
    * (dataset, process) and stored as a binary-column parquet artifact —
    * m03 and m04 both read it, which is exactly the production shape: a
    * media corpus is a stored table, not something each query
    * re-fabricates. Column pruning keeps the blobs out of any query
    * that doesn't touch them.
    */
  private def pngMedia(s: SparkSession, d: String): DataFrame =
    graft.etl.Artifacts.shared(s, d, "png_gray") {
      graft.etl.MediaDecode.syntheticPngs(s,
        graft.etl.Tables.spread(graft.etl.Tables.documents(s, d))
          .select(col("doc_id")))
    }

  private val m03 = Q(
    "m03_decode_features",
    (s, d) => graft.etl.MediaDecode.decodePipeline(s, pngMedia(s, d)),
    Some(s"""
      WITH $rasterCte,
      p AS (SELECT doc_id, w, h,
                   list_transform(range(0, w*h), i -> (seed + i*17) % 256) AS px
            FROM m)
      SELECT doc_id,
             CAST(w AS INTEGER) AS width,
             CAST(h AS INTEGER) AS height,
             CAST(w*h AS INTEGER) AS n_pix,
             round(list_sum(px) / (w*h*255.0), 6) AS mean_gray,
             CAST(list_min(px) AS INTEGER) AS min_gray,
             CAST(list_max(px) AS INTEGER) AS max_gray,
             md5(array_to_string(list_transform(px, v -> printf('%02x', v)), '')) AS px_md5
      FROM p
    """))

  // ---- m04: REAL java.awt nearest-neighbor half-scale resize ---------
  //
  // decode (ImageIO) → AffineTransformOp NN 0.5× → re-encode PNG →
  // decode again → features. The NN mapping dst(x,y) ← src(2x+1, 2y+1)
  // is pinned by MediaDecodeSpec against a planted raster, so the oracle
  // reproduces the resized pixels from the source formula. Same
  // zero-shuffle partition-local plan shape as m03.

  private val m04 = Q(
    "m04_resize",
    (s, d) => graft.etl.MediaDecode.resizePipeline(s, pngMedia(s, d)),
    Some(s"""
      WITH $rasterCte,
      p AS (SELECT doc_id, seed, w, w // 2 AS rw, h // 2 AS rh FROM m),
      r AS (SELECT doc_id, rw, rh,
                   list_transform(range(0, rw*rh),
                     j -> (seed + ((2*(j // rw) + 1) * w + 2*(j % rw) + 1) * 17) % 256) AS px
            FROM p)
      SELECT doc_id,
             CAST(rw AS INTEGER) AS width,
             CAST(rh AS INTEGER) AS height,
             CAST(rw*rh AS INTEGER) AS n_pix,
             round(list_sum(px) / (rw*rh*255.0), 6) AS mean_gray,
             CAST(list_min(px) AS INTEGER) AS min_gray,
             CAST(list_max(px) AS INTEGER) AS max_gray,
             md5(array_to_string(list_transform(px, v -> printf('%02x', v)), '')) AS px_md5
      FROM r
    """))

  // ---- m12: REAL 3-channel PNG decode → per-channel features ---------
  //
  // The color twin of m03: a deterministic BGR-interleaved raster per
  // doc, REALLY encoded/decoded through ImageIO color PNG
  // (TYPE_3BYTE_BGR — round-trip byte-lossless, MediaDecodeSpec-pinned),
  // reporting per-channel means + the raster checksum. Channel c of
  // pixel p is raster byte 3p+c; that interleave is the declared
  // contract the oracle mirrors. Zero shuffles, same batch loop.

  /** doc_id → (seed, even dims) mirror of
    * [[graft.etl.MediaDecode.syntheticRasterRgb]].
    */
  private val rgbCte = """
      m AS (SELECT doc_id,
                   CAST(doc_id % 239 AS BIGINT) AS seed,
                   CAST(2*((doc_id % 5) + 2) AS BIGINT) AS w,
                   CAST(2*(((doc_id // 5) % 5) + 2) AS BIGINT) AS h
            FROM documents)"""

  /** RGB PNG corpus artifact — same stored-table contract as
    * [[pngMedia]], shared by m12 + m13.
    */
  private def rgbMedia(s: SparkSession, d: String): DataFrame =
    graft.etl.Artifacts.shared(s, d, "png_rgb") {
      graft.etl.MediaDecode.syntheticRgbPngs(s,
        graft.etl.Tables.spread(graft.etl.Tables.documents(s, d))
          .select(col("doc_id")))
    }

  private def chMeanSql(c: Int): String =
    s"round(list_sum(list_transform(range(0, w*h), p -> px[3*p + ${c + 1}])) / (w*h*255.0), 6)"

  private val m12 = Q(
    "m12_decode_rgb",
    (s, d) => graft.etl.MediaDecode.decodeRgbPipeline(s, rgbMedia(s, d)),
    Some(s"""
      WITH $rgbCte,
      p AS (SELECT doc_id, w, h,
                   list_transform(range(0, 3*w*h), i -> (seed + i*23) % 256) AS px
            FROM m)
      SELECT doc_id,
             CAST(w AS INTEGER) AS width,
             CAST(h AS INTEGER) AS height,
             CAST(w*h AS INTEGER) AS n_pix,
             ${chMeanSql(0)} AS mean_b,
             ${chMeanSql(1)} AS mean_g,
             ${chMeanSql(2)} AS mean_r,
             md5(array_to_string(list_transform(px, v -> printf('%02x', v)), '')) AS px_md5
      FROM p
    """))

  // ---- m13: RGB → grayscale conversion kernel (integer BT.601 luma) --
  //
  // The color-transform slot of a real preprocessing pipeline: decode
  // the color PNG, convert with OUR exact integer luma
  // ((299·R + 587·G + 114·B) div 1000 — not ImageIO's internal color
  // convert, precisely so the oracle can mirror it), re-encode as gray
  // PNG, decode again, report gray stats. Every step is lossless or
  // integer-exact, so the oracle predicts the final bytes end-to-end
  // through two real encode/decode passes.

  private val m13 = Q(
    "m13_rgb_to_gray",
    (s, d) => graft.etl.MediaDecode.grayscalePipeline(s, rgbMedia(s, d)),
    Some(s"""
      WITH $rgbCte,
      p AS (SELECT doc_id, w, h,
                   list_transform(range(0, 3*w*h), i -> (seed + i*23) % 256) AS px
            FROM m),
      g AS (SELECT doc_id, w, h,
                   list_transform(range(0, w*h),
                     p2 -> (299*px[3*p2 + 3] + 587*px[3*p2 + 2] + 114*px[3*p2 + 1]) // 1000) AS gpx
            FROM p)
      SELECT doc_id,
             CAST(w AS INTEGER) AS width,
             CAST(h AS INTEGER) AS height,
             CAST(w*h AS INTEGER) AS n_pix,
             round(list_sum(gpx) / (w*h*255.0), 6) AS mean_gray,
             CAST(list_min(gpx) AS INTEGER) AS min_gray,
             CAST(list_max(gpx) AS INTEGER) AS max_gray,
             md5(array_to_string(list_transform(gpx, v -> printf('%02x', v)), '')) AS px_md5
      FROM g
    """))

  // ---- m05: payload block chunking ------------------------------------
  // Split each binary payload into fixed 16-byte blocks with a per-block
  // checksum — the content-addressed chunking an object store / dedup
  // layer runs on blobs. Partition-local explode (no shuffle); block
  // count is bounded by payload size / block size.

  private val blockBytes = 16

  private val m05 = Q(
    "m05_block_split",
    (s, d) => {
      val nBlocks = mediaBytes / blockBytes
      graft.etl.Tables.spread(graft.etl.Tables.documents(s, d))
        .select(col("doc_id"), hexm(col("text")).as("h"))
        .select(col("doc_id"),
          explode(sequence(lit(0), lit(nBlocks - 1))).as("block_idx"),
          col("h"))
        .select(col("doc_id"), col("block_idx"),
          col("h").substr(col("block_idx") * lit(2 * blockBytes) + 1,
            lit(2 * blockBytes)).as("block_hex"))
        .select(col("doc_id"), col("block_idx"),
          lit(blockBytes).cast("int").as("n_bytes"),
          md5(col("block_hex")).as("block_md5"))
    },
    Some(s"""
      WITH m AS (SELECT doc_id, $hexmSql AS h FROM documents),
      b AS (SELECT doc_id, unnest(range(0, ${mediaBytes / blockBytes})) AS block_idx, h
            FROM m)
      SELECT doc_id, block_idx,
             CAST($blockBytes AS INTEGER) AS n_bytes,
             md5(substr(h, CAST(block_idx * ${2 * blockBytes} + 1 AS BIGINT),
                 ${2 * blockBytes})) AS block_md5
      FROM b
    """))

  // ---- m06: perceptual-hash hamming near-dup --------------------------
  //
  // Image/media near-dup by 64-bit perceptual hash: 4×15-bit band hashes
  // over payload quarters (a real pHash/aHash slots into the same 64-bit
  // contract), banded LSH candidate join (pairs sharing ≥1 exact band —
  // never all-pairs), then a hamming verify via bit_count(xor) ≤ 16.
  // Near-duplicate payloads are fabricated for every doc_id % 5 == 0:
  // the twin (id + 2_000_000) shares payload quarters 0–2 and differs in
  // quarter 3, so 3 of 4 bands match and the true hamming distance is
  // the band-3 bit diff (60-bit phash: 4×15-bit bands — packing stays
  // below 2^63 so the shift is overflow-safe in ANSI Spark AND DuckDB). Unrelated chance band collisions are killed by
  // the hamming verify.
  //
  // Scale: one explode (4 rows/payload), one (band_idx, band) shuffle
  // for the equi-join, distinct on pairs — same banded-join shape as the
  // minhash LSH (etl/Dedup.scala), state never quadratic.

  private val phashHamMax = 16
  private val phashTwinShift = 2000000L

  /** 15-bit band hash of payload-hex quarter `i` (hash60-derived; 15
    * bits so four bands pack into 60 bits without overflowing a shifted
    * BIGINT in either engine).
    */
  private def bandCol(h: Column, i: Int): Column =
    pmod(graft.functions.Portable.hash60(
      h.substr(lit(32 * i + 1), lit(32)), 20 + i), lit(32768))

  private def bandSql(h: String, i: Int): String =
    s"${OracleSql.hSql(s"substr($h, ${32 * i + 1}, 32)", 20 + i)} % 32768"

  private val m06 = Q(
    "m06_phash_neardup",
    (s, d) => {
      val base = graft.etl.Tables.spread(graft.etl.Tables.documents(s, d))
        .select(col("doc_id"), hexm(col("text")).as("h"))
      val twins = base.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + phashTwinShift).as("doc_id"),
          concat(col("h").substr(1, 96),
            substring(md5(concat(col("h"), lit("x"))), 1, 32)).as("h"))
      val corpus = base.unionByName(twins)
      val hashed = corpus.select(col("doc_id"),
        (shiftleft(bandCol(col("h"), 0), 45)
          bitwiseOR shiftleft(bandCol(col("h"), 1), 30)
          bitwiseOR shiftleft(bandCol(col("h"), 2), 15)
          bitwiseOR bandCol(col("h"), 3)).as("phash"),
        array((0 to 3).map(i => bandCol(col("h"), i)): _*).as("bands"))
      val exploded = hashed.select(col("doc_id"), col("phash"),
        posexplode(col("bands")).as(Seq("band_idx", "band")))
      val a = exploded.select(col("band_idx"), col("band"),
        col("doc_id").as("a_id"), col("phash").as("a_ph"))
      val b = exploded.select(col("band_idx"), col("band"),
        col("doc_id").as("b_id"), col("phash").as("b_ph"))
      a.join(b, Seq("band_idx", "band"))
        .filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"), col("a_ph"), col("b_ph")).distinct()
        .select(col("a_id"), col("b_id"),
          bit_count(col("a_ph") bitwiseXOR col("b_ph")).as("hamming"))
        .filter(col("hamming") <= phashHamMax)
    },
    Some(s"""
      WITH base AS (SELECT doc_id, $hexmSql AS h FROM documents),
      twins AS (
        SELECT doc_id + $phashTwinShift AS doc_id,
               substr(h, 1, 96) || substr(md5(h||'x'), 1, 32) AS h
        FROM base WHERE doc_id % 5 = 0),
      corpus AS (SELECT * FROM base UNION ALL SELECT * FROM twins),
      hashed AS (
        SELECT doc_id,
               (${bandSql("h", 0)} << 45) | (${bandSql("h", 1)} << 30)
                 | (${bandSql("h", 2)} << 15) | ${bandSql("h", 3)} AS phash,
               [${(0 to 3).map(i => bandSql("h", i)).mkString(", ")}] AS bands
        FROM corpus),
      exploded AS (
        SELECT doc_id, phash, generate_subscripts(bands, 1) - 1 AS band_idx,
               unnest(bands) AS band
        FROM hashed),
      pairs AS (
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
               a.phash AS a_ph, b.phash AS b_ph
        FROM exploded a JOIN exploded b
          ON a.band_idx = b.band_idx AND a.band = b.band
         AND a.doc_id < b.doc_id)
      SELECT a_id, b_id,
             CAST(bit_count(xor(a_ph, b_ph)) AS INTEGER) AS hamming
      FROM pairs
      WHERE bit_count(xor(a_ph, b_ph)) <= $phashHamMax
    """))

  // ---- m07: modality-mix datacard -------------------------------------
  //
  // The multimodal sibling of t31: per (source, format), the volume and
  // dimension envelope of the media corpus — the table a training run's
  // data card reports before any decode happens. Metadata-only: derives
  // from the m01 metadata columns, so at 100 TB the binary payloads are
  // pruned out of the scan entirely (the plan reads doc_id/text-derived
  // metadata, never the blobs).

  private val m07 = Q(
    "m07_modality_mix",
    (s, d) => {
      val docs = graft.etl.Tables.spread(graft.etl.Tables.documents(s, d))
        .select(col("source"), hexm(col("text")).as("h"))
        .select(col("source"),
          when(hexByte(col("h"), 0) < 64, "png")
            .when(hexByte(col("h"), 0) < 128, "jpg")
            .when(hexByte(col("h"), 0) < 192, "wav")
            .otherwise("mp4").as("format"),
          (hexByte(col("h"), 1) + 1).as("width"),
          (hexByte(col("h"), 2) + 1).as("height"))
      docs.groupBy(col("source"), col("format"))
        .agg(count(lit(1)).as("n"),
          sum(lit(mediaBytes).cast("long")).as("total_bytes"),
          max(col("width")).as("max_w"), max(col("height")).as("max_h"))
    },
    Some(s"""
      WITH m AS (SELECT source, $hexmSql AS h FROM documents),
      f AS (SELECT source,
                   CASE WHEN ${hexByteSql("h", "0")} < 64 THEN 'png'
                        WHEN ${hexByteSql("h", "0")} < 128 THEN 'jpg'
                        WHEN ${hexByteSql("h", "0")} < 192 THEN 'wav'
                        ELSE 'mp4' END AS format,
                   ${hexByteSql("h", "1")} + 1 AS width,
                   ${hexByteSql("h", "2")} + 1 AS height
            FROM m)
      SELECT source, format, count(*) AS n,
             CAST(count(*) * $mediaBytes AS BIGINT) AS total_bytes,
             CAST(max(width) AS INTEGER) AS max_w,
             CAST(max(height) AS INTEGER) AS max_h
      FROM f
      GROUP BY 1, 2
    """))

  // ---- m08: block-level dedup ratio (content-addressed store audit) ----
  //
  // What a dedup-capable blob store reports: chunk payloads into
  // fixed blocks (m05's split), count references per block fingerprint,
  // and report the storage saved by keeping each block once. The m06
  // twin corpus supplies real duplication (twins share payload quarters
  // 0–2 → 3 of 4 blocks). Ratio in exact integer per-mille. Plan: one
  // partition-local explode + one fingerprint hash agg + one one-row
  // rollup — the same shape at any corpus size.

  private val m08 = Q(
    "m08_block_dedup_ratio",
    (s, d) => {
      val base = graft.etl.Tables.spread(graft.etl.Tables.documents(s, d))
        .select(col("doc_id"), hexm(col("text")).as("h"))
      val twins = base.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + phashTwinShift).as("doc_id"),
          concat(col("h").substr(1, 96),
            substring(md5(concat(col("h"), lit("x"))), 1, 32)).as("h"))
      val nBlocks = mediaBytes / blockBytes
      val blocks = base.unionByName(twins)
        .select(col("doc_id"),
          explode(sequence(lit(0), lit(nBlocks - 1))).as("block_idx"), col("h"))
        .select(md5(col("h").substr(col("block_idx") * lit(2 * blockBytes) + 1,
          lit(2 * blockBytes))).as("block_md5"))
      val perBlock = blocks.groupBy(col("block_md5"))
        .agg(count(lit(1)).as("refs"))
      perBlock.agg(
        sum(col("refs")).as("n_refs"),
        count(lit(1)).as("n_unique"),
        (sum(col("refs")) * blockBytes).as("logical_bytes"),
        (count(lit(1)) * blockBytes).as("stored_bytes"))
        .select(col("n_refs"), col("n_unique"), col("logical_bytes"),
          col("stored_bytes"),
          expr("((n_refs - n_unique) * 1000) div n_refs").as("saved_pm"))
    },
    Some(s"""
      WITH base AS (SELECT doc_id, $hexmSql AS h FROM documents),
      twins AS (
        SELECT doc_id + $phashTwinShift AS doc_id,
               substr(h, 1, 96) || substr(md5(h||'x'), 1, 32) AS h
        FROM base WHERE doc_id % 5 = 0),
      corpus AS (SELECT * FROM base UNION ALL SELECT * FROM twins),
      b AS (SELECT md5(substr(h, CAST(block_idx * ${2 * blockBytes} + 1 AS BIGINT),
                     ${2 * blockBytes})) AS block_md5
            FROM corpus,
                 (SELECT unnest(range(0, ${mediaBytes / blockBytes})) AS block_idx)),
      pb AS (SELECT block_md5, count(*) AS refs FROM b GROUP BY 1)
      SELECT CAST(sum(refs) AS BIGINT) AS n_refs,
             count(*) AS n_unique,
             CAST(sum(refs) * $blockBytes AS BIGINT) AS logical_bytes,
             CAST(count(*) * $blockBytes AS BIGINT) AS stored_bytes,
             CAST((sum(refs) - count(*)) * 1000 // sum(refs) AS BIGINT) AS saved_pm
      FROM pb
    """))

  // ---- m09: shot-boundary detection over decoded frames ---------------
  //
  // The video-curation primitive beside frame sampling (m02, same
  // 8-byte frame layout): diff CONSECUTIVE frames of the clip payload
  // and open a new shot where the change reaches the threshold. Frame
  // distance = Σ |byte_i(f) − byte_i(f−1)| over the frame's bytes
  // (exact integers, 0..2040 for 8 bytes); a boundary opens a new shot
  // when the distance reaches the threshold. The payloads here are (and
  // stay) FABRICATED md5 chains: the JDK ships no video codec — images
  // got real ImageIO kernels (m03/m04/m12/m13) and audio got real
  // AudioSystem kernels (m14/m15), but video decode would need an
  // external dependency the build contract forbids. A real video
  // decoder drops in at the byte-extraction seam exactly as those do —
  // the shot logic itself is codec-agnostic.
  //
  // Scale shape: ALL of a clip's frames live in its own payload row, so
  // frame diffs, boundary tests, and the shot count are row-local
  // column expressions — the whole pass is scan → project, ZERO
  // shuffles (the m03/t35 filter-pass shape). A multi-row frame table
  // would instead use one lag window partitioned by clip — same math,
  // one bounded shuffle.

  private val shotThr = 700L

  private val m09 = Q(
    "m09_shot_boundaries",
    (s, d) => {
      val nFrames = mediaBytes / frameBytes
      // Σ |byte - prev_byte| for frame f vs f-1
      def frameDiff(f: Int): Column =
        (0 until frameBytes).map { i =>
          abs(hexByte(col("h"), f * frameBytes + i)
            - hexByte(col("h"), (f - 1) * frameBytes + i)).cast("long")
        }.reduce(_ + _)
      val diffs = (1 until nFrames).map(frameDiff)
      graft.etl.Tables.spread(graft.etl.Tables.documents(s, d))
        .select(col("doc_id"), hexm(col("text")).as("h"))
        .select(col("doc_id"),
          lit(nFrames.toLong).as("n_frames"),
          (lit(1L) + diffs.map(dc => when(dc >= shotThr, 1L).otherwise(0L))
            .reduce(_ + _)).as("n_shots"),
          greatest(diffs: _*).as("max_frame_diff"))
    },
    Some {
      val nFrames = mediaBytes / frameBytes
      def diffSql(f: Int): String =
        (0 until frameBytes).map { i =>
          s"abs(${hexByteSql("h", (f * frameBytes + i).toString)} - " +
            s"${hexByteSql("h", ((f - 1) * frameBytes + i).toString)})"
        }.mkString("(", " + ", ")")
      val diffs = (1 until nFrames).map(diffSql)
      val shots = diffs.map(ds => s"CASE WHEN $ds >= $shotThr THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""
      WITH m AS (SELECT doc_id, $hexmSql AS h FROM documents)
      SELECT doc_id,
             CAST($nFrames AS BIGINT) AS n_frames,
             CAST(1 + $shots AS BIGINT) AS n_shots,
             CAST(greatest(${diffs.mkString(", ")}) AS BIGINT) AS max_frame_diff
      FROM m
    """ })

  // ---- m10: energy-threshold voice-activity segmentation --------------
  //
  // The audio-curation twin of m09's shot detection, with the OTHER
  // canonical plan shape: where m09 keeps all frames row-local, VAD's
  // deliverable is variable-length SEGMENTS (speech spans between
  // silences), the classic gaps-and-islands computation — explode
  // frames, keep the active ones, and group consecutive frame indices
  // via the `f − row_number()` island key (consecutive actives share
  // it; any silence gap shifts it). Frame energy = Σ bytes (exact
  // integers) over FABRICATED payloads — m15 is the same segmentation
  // re-based on REAL `AudioSystem`-decoded PCM; this formulation stays
  // for its distinct plan-shape lesson (modality gate filters BEFORE
  // the fan-out).
  //
  // Scale shape: explode is partition-local and bounded (frames/clip);
  // the ONE shuffle is the island window keyed by clip id — state per
  // clip is its own frames, never global. Only audio-bearing payloads
  // (m01's format rule: first byte ≥ 128 → wav/mp4) enter the explode,
  // so the filter prunes before the fan-out, not after.

  private val vadThr = 1024L // Σ of 8 bytes > 8×128 ⇒ "speech"

  private val m10 = Q(
    "m10_audio_vad_segments",
    (s, d) => {
      val nFrames = mediaBytes / frameBytes
      def frameEnergy(f: Int): Column =
        (0 until frameBytes).map { i =>
          hexByte(col("h"), f * frameBytes + i).cast("long")
        }.reduce(_ + _)
      val audio = graft.etl.Tables.spread(graft.etl.Tables.documents(s, d))
        .select(col("doc_id"), hexm(col("text")).as("h"))
        .filter(hexByte(col("h"), 0) >= 128)
      val frames = audio.select(col("doc_id"),
        posexplode(array((0 until nFrames).map(frameEnergy): _*))
          .as(Seq("f", "energy")))
        .select(col("doc_id"), col("f").cast("long").as("f"), col("energy"))
      val speech = frames.filter(col("energy") > vadThr)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("f"))
      speech.withColumn("island", col("f") - row_number().over(w))
        .groupBy(col("doc_id"), col("island"))
        .agg(min(col("f")).as("seg_start"), max(col("f")).as("seg_end"),
          count(lit(1)).as("n_frames"), sum(col("energy")).as("energy_sum"))
        .select(col("doc_id"), col("seg_start"), col("seg_end"),
          col("n_frames"), col("energy_sum"))
    },
    Some {
      val nFrames = mediaBytes / frameBytes
      val energySql = (0 until frameBytes)
        .map(i => hexByteSql("h", s"f*$frameBytes + $i"))
        .mkString("(", " + ", ")")
      s"""
      WITH m AS (SELECT doc_id, $hexmSql AS h FROM documents),
      a AS (SELECT doc_id, h FROM m WHERE ${hexByteSql("h", "0")} >= 128),
      fr AS (SELECT doc_id, h, unnest(range(0, $nFrames)) AS f FROM a),
      en AS (SELECT doc_id, f, CAST($energySql AS BIGINT) AS energy FROM fr),
      sp AS (SELECT doc_id, f, energy FROM en WHERE energy > $vadThr),
      isl AS (SELECT doc_id, f, energy,
                     f - row_number() OVER (PARTITION BY doc_id ORDER BY f)
                       AS island
              FROM sp)
      SELECT doc_id, CAST(min(f) AS BIGINT) AS seg_start,
             CAST(max(f) AS BIGINT) AS seg_end,
             CAST(count(*) AS BIGINT) AS n_frames,
             CAST(sum(energy) AS BIGINT) AS energy_sum
      FROM isl GROUP BY doc_id, island
    """ })

  // ---- m14: REAL javax.sound.sampled WAV decode → PCM features --------
  //
  // The m03 playbook at the audio seam: fabricate a deterministic 16-bit
  // PCM clip per doc (pure integer formula of doc_id), REALLY encode it
  // into a WAV container with `AudioSystem` on the executors, then
  // REALLY parse it back in the batched mapPartitions pipeline and
  // report sample statistics + a PCM checksum. WAV/PCM is lossless, so
  // the DuckDB oracle predicts the decoded samples from the SAME
  // integer formula without owning a codec — a parser bug (endianness,
  // header offset, sign extension) breaks the hash. The reported
  // sample_rate comes from the DECODED header, pinning that the real
  // parser read it. Zero shuffles; same batch loop as m03.

  /** Shared oracle CTE: doc_id → (seed, sample count, PCM list) mirror
    * of [[graft.etl.AudioDecode.syntheticSamples]].
    */
  private val pcmCte = """
      a AS (SELECT doc_id,
                   CAST(doc_id % 211 AS BIGINT) AS seed,
                   CAST(64 + 16*(doc_id % 8) AS BIGINT) AS n
            FROM documents),
      s AS (SELECT doc_id, n,
                   list_transform(range(0, n),
                     i -> (seed + 37*i) % 4001 - 2000) AS pcm
            FROM a)"""

  /** WAV corpus artifact (real `AudioSystem` encode) — same stored-table
    * contract as [[pngMedia]], shared by m14 + m15.
    */
  private def wavMedia(s: SparkSession, d: String): DataFrame =
    graft.etl.Artifacts.shared(s, d, "wav_pcm") {
      graft.etl.AudioDecode.syntheticWavs(s,
        graft.etl.Tables.spread(graft.etl.Tables.documents(s, d))
          .select(col("doc_id")))
    }

  private val m14 = Q(
    "m14_audio_decode",
    (s, d) => graft.etl.AudioDecode.decodePipeline(s, wavMedia(s, d)),
    Some(s"""
      WITH $pcmCte
      SELECT doc_id,
             CAST(${graft.etl.AudioDecode.sampleRate} AS INTEGER) AS sample_rate,
             CAST(n AS INTEGER) AS n_samples,
             CAST(list_sum(list_transform(pcm, v -> abs(v))) AS BIGINT) AS sum_abs,
             CAST(list_min(pcm) AS INTEGER) AS min_s,
             CAST(list_max(pcm) AS INTEGER) AS max_s,
             md5(array_to_string(pcm, ',')) AS pcm_md5
      FROM s
    """))

  // ---- m15: VAD segmentation over REAL decoded audio -------------------
  //
  // m10's gaps-and-islands segmentation re-based on the real codec:
  // frame energies (Σ |sample| over 16-sample frames) come from
  // REAL `AudioSystem`-decoded PCM in the batch loop, then the same
  // explode → threshold → island-window chain as m10. The decode pass
  // is shuffle-free; the ONE shuffle is the island window keyed by
  // clip id — state per clip is its own frames. m10 stays as the
  // fabricated-payload formulation (different plan-shape lesson:
  // filter-before-fanout on the modality gate).

  private val vadThrReal = 16000L

  private val m15 = Q(
    "m15_audio_vad_real",
    (s, d) => {
      val frames = graft.etl.AudioDecode.frameEnergyPipeline(s, wavMedia(s, d))
      val speech = frames.filter(col("energy") > vadThrReal)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("f"))
      speech.withColumn("island", col("f") - row_number().over(w))
        .groupBy(col("doc_id"), col("island"))
        .agg(min(col("f")).as("seg_start"), max(col("f")).as("seg_end"),
          count(lit(1)).as("n_frames"), sum(col("energy")).as("energy_sum"))
        .select(col("doc_id"), col("seg_start"), col("seg_end"),
          col("n_frames"), col("energy_sum"))
    },
    Some {
      val fs = graft.etl.AudioDecode.frameSamples
      s"""
      WITH $pcmCte,
      fr AS (SELECT doc_id, unnest(range(0, n // $fs)) AS f, pcm FROM s),
      en AS (SELECT doc_id, f,
                    CAST(list_sum(list_transform(range(0, $fs),
                      i -> abs(pcm[f*$fs + i + 1]))) AS BIGINT) AS energy
             FROM fr),
      sp AS (SELECT doc_id, f, energy FROM en WHERE energy > $vadThrReal),
      isl AS (SELECT doc_id, f, energy,
                     f - row_number() OVER (PARTITION BY doc_id ORDER BY f)
                       AS island
              FROM sp)
      SELECT doc_id, CAST(min(f) AS BIGINT) AS seg_start,
             CAST(max(f) AS BIGINT) AS seg_end,
             CAST(count(*) AS BIGINT) AS n_frames,
             CAST(sum(energy) AS BIGINT) AS energy_sum
      FROM isl GROUP BY doc_id, island
    """ })

  // ---- m16: 2x audio decimation through the real codec -----------------
  //
  // The audio twin of m04's NN half-scale: decode the WAV, keep every
  // 2nd sample (integer-exact decimation — output sample i = source
  // sample 2i, no filter, no float resampler), re-encode through the
  // REAL AudioSystem writer, parse again, report the stats. Both codec
  // directions run inside the timed distributed loop; losslessness
  // keeps the oracle closed-form. (A production anti-aliased resampler
  // replaces the kernel at the same seam; decimation is the variant
  // with an exact cross-engine spec.) Zero shuffles.

  private val m16 = Q(
    "m16_audio_decimate",
    (s, d) => graft.etl.AudioDecode.decimatePipeline(s, wavMedia(s, d)),
    Some(s"""
      WITH $pcmCte,
      h AS (SELECT doc_id, n // 2 AS hn,
                   list_transform(range(0, n // 2), i -> pcm[2*i + 1]) AS half
            FROM s)
      SELECT doc_id,
             CAST(${graft.etl.AudioDecode.sampleRate} AS INTEGER) AS sample_rate,
             CAST(hn AS INTEGER) AS n_samples,
             CAST(list_sum(list_transform(half, v -> abs(v))) AS BIGINT) AS sum_abs,
             CAST(list_min(half) AS INTEGER) AS min_s,
             CAST(list_max(half) AS INTEGER) AS max_s,
             md5(array_to_string(half, ',')) AS pcm_md5
      FROM h
    """))

  // ---- m11: shard manifest (WebDataset-style size-targeted shards) ----
  //
  // Multimodal training data ships as size-targeted archive shards
  // (tar/rec files a data loader streams sequentially); building them
  // starts with a MANIFEST: each item's byte offset in corpus order and
  // the shard it starts in. Byte sizes vary per item (fabricated
  // width×height here), so this is the t17 packing problem over BYTES —
  // the same [[graft.etl.PrefixSum]] two-level decomposition, never a
  // single-partition cumsum window. Items are assigned by START offset
  // (shards are approximately sized — the WebDataset convention), and
  // the output is the per-shard manifest an archiver consumes: item
  // count, exact byte total, and the [first,last] doc range, which is
  // CONTIGUOUS by construction because assignment follows doc order.

  private val shardBytes = 500000L
  private val manifestBucketW = 500L

  private val m11 = Q(
    "m11_shard_manifest",
    (s, d) => {
      val sizes = graft.etl.Tables.spread(graft.etl.Tables.documents(s, d))
        .select(col("doc_id"), hexm(col("text")).as("h"))
        .select(col("doc_id"),
          ((hexByte(col("h"), 1) + 1) * (hexByte(col("h"), 2) + 1))
            .cast("long").as("n_bytes"))
      graft.etl.PrefixSum
        .exclusive(sizes, "doc_id", "n_bytes", "start_off", manifestBucketW)
        .withColumn("shard_id", floor(col("start_off") / shardBytes).cast("long"))
        .groupBy(col("shard_id"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("n_bytes")).as("total_bytes"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
    },
    Some(s"""
      WITH m AS (
        SELECT doc_id,
               CAST((${hexByteSql("h", "1")} + 1) * (${hexByteSql("h", "2")} + 1)
                    AS BIGINT) AS n_bytes
        FROM (SELECT doc_id, $hexmSql AS h FROM documents)),
      o AS (
        SELECT doc_id, n_bytes,
               CAST(coalesce(sum(n_bytes) OVER (
                 ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS start_off
        FROM m)
      SELECT start_off // $shardBytes AS shard_id,
             count(*) AS n_items,
             CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
             min(doc_id) AS first_doc,
             max(doc_id) AS last_doc
      FROM o GROUP BY 1
    """))

  def all: Seq[Q] =
    Seq(m01, m02, m03, m04, m05, m06, m07, m08, m09, m10, m11, m12, m13,
      m14, m15, m16)
}
