package graft.sources

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Header-scanning CSV ingestion (reference fan_out_by_storeid.py:14–30,
  * verify_fanout.py:67–86; SURVEY.md §2.1 S2).
  *
  * BI-export CSVs carry 0..n meta rows (e.g. `Established At Year,2025,
  * 2024`) before the real header; the real header is the first row that
  * contains the key column (`商店序號` by default). Files without the key
  * column are warned and skipped, not failed (fan_out_by_storeid.py:28–30).
  *
  * Scale split: the *scan* touches only the head of each file (bounded
  * driver-side metadata pass over ≤ maxScanLines lines per file — the same
  * role as schema inference); the *data read* is fully distributed:
  * `spark.read.text` → per-file line index (zipWithIndex preserves file
  * offset order) → drop the prefix → `from_csv` with the discovered
  * all-string schema. Everything downstream is ordinary Spark.
  */
object HeaderScan {

  val defaultKeyCol = "商店序號"

  /** Result of scanning one file's head. */
  final case class HeaderInfo(
      path: String,
      prefixRows: Seq[String], // verbatim meta lines above the header
      columns: Seq[String], // trimmed header cells
      skipLines: Int) // prefix + header line count

  /** Minimal CSV line splitter for the header scan (quoted cells with
    * embedded commas supported; the distributed data path uses Spark's
    * real `from_csv` parser).
    */
  private[sources] def splitCsvLine(line: String): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inQ = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQ) {
        if (c == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') { sb += '"'; i += 1 }
          else inQ = false
        } else sb += c
      } else c match {
        case '"' => inQ = true
        case ',' => out += sb.result(); sb.clear()
        case _ => sb += c
      }
      i += 1
    }
    out += sb.result()
    out.toSeq
  }

  /** Driver-side head scan: locate the header row (first row containing
    * `keyCol`), collecting the meta rows above it. Returns None (with a
    * warning) when the key column never appears in the first
    * `maxScanLines` lines — mirroring the reference's warn-and-skip.
    */
  def scanHeader(
      spark: SparkSession,
      file: String,
      keyCol: String = defaultKeyCol,
      maxScanLines: Int = 100,
      encoding: String = "UTF-8"): Option[HeaderInfo] = {
    val p = new Path(file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(in, java.nio.charset.Charset.forName(encoding)))
      val prefix = ArrayBuffer.empty[String]
      var line = reader.readLine()
      // strip a UTF-8 BOM if present (utf-8-sig exports)
      if (line != null && line.nonEmpty && line.charAt(0) == '﻿')
        line = line.substring(1)
      var found: Option[HeaderInfo] = None
      var n = 0
      while (line != null && found.isEmpty && n < maxScanLines) {
        val cells = splitCsvLine(line).map(_.trim)
        if (cells.contains(keyCol))
          found = Some(HeaderInfo(file, prefix.toSeq, cells, prefix.length + 1))
        else { prefix += line; n += 1; line = reader.readLine() }
      }
      if (found.isEmpty)
        System.err.println(s"[headerscan] WARN: key column '$keyCol' not found in $file — skipping")
      found
    } finally in.close()
  }

  /** Distributed read of one header-scanned file: all-string schema from
    * the discovered header, prefix + header lines dropped by per-file
    * line index.
    *
    * Non-UTF-8 encodings (the reference's `--encoding` flag,
    * fan_out_by_storeid.py:57) decode each line's raw bytes with the
    * given charset — valid for any ASCII-newline-compatible charset
    * (latin-1, GBK, Big5, UTF-8, ...), which is also the constraint of
    * Hadoop's line reader itself.
    */
  def readFile(spark: SparkSession, info: HeaderInfo, encoding: String = "UTF-8"): DataFrame = {
    val schema = StructType(info.columns.map(c => StructField(c, StringType)))
    // zipWithIndex: partitions of a text read are ordered by file offset,
    // so the index is the 0-based line number.
    val rdd =
      if (java.nio.charset.Charset.forName(encoding) == java.nio.charset.StandardCharsets.UTF_8)
        spark.sparkContext.textFile(info.path)
      else {
        val enc = encoding
        spark.sparkContext
          .hadoopFile[org.apache.hadoop.io.LongWritable, org.apache.hadoop.io.Text,
            org.apache.hadoop.mapred.TextInputFormat](info.path)
          .map { case (_, t) => new String(t.getBytes, 0, t.getLength, enc) }
      }
    val lines = rdd.zipWithIndex().filter(_._2 >= info.skipLines).map(_._1)
    import spark.implicits._
    lines.toDF("_line")
      .select(from_csv(col("_line"), schema, Map.empty[String, String]).as("r"))
      .select(col("r.*"))
  }

  /** Scan + read every `*.csv` in a directory, one DataFrame per readable
    * file (schemas are inconsistent by design — csv_gen.py:45–56 — so
    * callers normalize/alias-resolve per file before any union). Each
    * frame carries its source file name in `_src` (README.md:54–58).
    */
  def readDirFrames(
      spark: SparkSession,
      dir: String,
      keyCol: String = defaultKeyCol,
      encoding: String = "UTF-8"): Seq[(HeaderInfo, DataFrame)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p).map(_.getPath)
      .filter(f => f.getName.toLowerCase.endsWith(".csv"))
      .sortBy(_.getName)
    files.toSeq.flatMap { f =>
      scanHeader(spark, f.toString, keyCol, encoding = encoding).map { info =>
        info -> readFile(spark, info, encoding).withColumn("_src", lit(f.getName))
      }
    }
  }

  /** Scan + read + union a directory (missing columns null-filled). For
    * alias-divergent schemas, prefer [[readDirFrames]] + per-file
    * resolution.
    */
  def readDir(
      spark: SparkSession,
      dir: String,
      keyCol: String = defaultKeyCol,
      encoding: String = "UTF-8"): DataFrame = {
    val parts = readDirFrames(spark, dir, keyCol, encoding).map(_._2)
    require(parts.nonEmpty, s"no readable CSVs with key column '$keyCol' in $dir")
    parts.reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
  }
}
