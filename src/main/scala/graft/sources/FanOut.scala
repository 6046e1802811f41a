package graft.sources

import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned fan-out sink (reference fan_out_by_storeid.py:36–48;
  * SURVEY.md §2.1 S5/S6): split rows of each source into
  * `out/{key}/{srcName}.csv`, optionally replaying meta prefix rows and a
  * UTF-8 BOM (`utf-8-sig`) at the top of every output file.
  *
  * The heavy lifting is Spark's dynamic-partition CSV write — one writer
  * per (task, key), iterator-based, constant memory (the reference's
  * explicit O(1)-rows constraint is free here, SURVEY.md §4). The exact
  * `{key}/{src}.csv` layout the reference promises is restored by a
  * metadata-only finalize pass: per-partition file rename/concat on the
  * FileSystem API (works on HDFS/object stores; per-key outputs are
  * report-sized by construction, so the pass is cheap relative to the
  * write).
  */
object FanOut {

  /** Fan out `df` by `keyCol` into `outDir/{key}/{srcName}.csv`.
    *
    * Blank/whitespace keys are dropped (fan_out_by_storeid.py:35–37).
    * `prefixRows` (meta rows from [[HeaderScan]]) and `bom` reproduce the
    * reference's per-file prefix replay + utf-8-sig output.
    */
  def write(
      df: DataFrame,
      keyCol: String,
      outDir: String,
      srcName: String,
      prefixRows: Seq[String] = Nil,
      bom: Boolean = false): Unit = {
    val spark = df.sparkSession
    val staging = s"$outDir/_staging_$srcName"
    val cleaned = df
      .withColumn(keyCol, trim(col(keyCol)))
      .filter(col(keyCol).isNotNull && col(keyCol) =!= "")
    // Partition on a duplicated helper column so the key stays in the CSV
    // row content (Spark drops partition columns from files; the reference
    // keeps the key cell — that's the invariant verify_fanout checks).
    val helper = "_gk"
    cleaned.withColumn(helper, col(keyCol)).write
      .mode("overwrite")
      .option("header", true)
      .partitionBy(helper)
      .csv(staging)
    finalizeLayout(spark, staging, outDir, helper, srcName, prefixRows, bom)
  }

  /** Move `staging/{key}={v}/part-*.csv` → `outDir/{v}/{srcName}.csv`,
    * concatenating multiple part files and prepending BOM + prefix rows +
    * (Spark-written) header. Pure FileSystem metadata/stream work.
    */
  private def finalizeLayout(
      spark: SparkSession,
      staging: String,
      outDir: String,
      keyCol: String,
      srcName: String,
      prefixRows: Seq[String],
      bom: Boolean): Unit = {
    val fs = new Path(outDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prefix = (if (bom) "﻿" else "") +
      (if (prefixRows.nonEmpty) prefixRows.mkString("", "\n", "\n") else "")
    fs.listStatus(new Path(staging))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$keyCol="))
      .foreach { partDir =>
        // Spark's own partition-value unescaping — NOT URLDecoder, whose
        // '+'-means-space rule corrupts keys containing '+' (Spark's
        // escapePathName leaves '+' literal)
        val key = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .unescapePathName(partDir.getPath.getName.stripPrefix(s"$keyCol="))
        val parts = fs.listStatus(partDir.getPath)
          .filter(_.getPath.getName.endsWith(".csv")).map(_.getPath).sortBy(_.getName)
        val dest = new Path(s"$outDir/$key/$srcName.csv")
        fs.mkdirs(dest.getParent)
        val out = fs.create(dest, true)
        try {
          if (prefix.nonEmpty)
            out.write(prefix.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          var wroteHeader = false
          parts.foreach { p =>
            val in = fs.open(p)
            try {
              val reader = new java.io.BufferedReader(
                new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
              var line = reader.readLine() // header line of this part file
              if (!wroteHeader && line != null) {
                out.write((line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
                wroteHeader = true
              }
              line = reader.readLine()
              while (line != null) {
                out.write((line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
                line = reader.readLine()
              }
            } finally in.close()
          }
        } finally out.close()
      }
    fs.delete(new Path(staging), true)
  }

  /** Read a fan-out layout back: `outDir/{key}/{srcName}.csv` for every
    * key directory, with the key recovered from the directory name (the
    * content invariant verify_fanout.py checks). All-string schema.
    *
    * Mirrors the verifier's per-file header re-scan (verify_fanout.py:
    * 69–79) without a per-file driver loop: ONE file's head is scanned for
    * the prefix/header structure (every file written by [[write]] shares
    * it), then the whole glob is read as text distributed and the
    * prefix/header lines are dropped by content. Meta lines don't contain
    * the key column and the header line's key cell is the column name
    * itself, so neither can collide with a data row (whose key cell is a
    * non-blank key value).
    *
    * Limitation (inherent to any line-oriented CSV read): quoted cells
    * with embedded newlines aren't reassembled. The reference's BI
    * exports don't produce them; switch to Spark's `multiLine` CSV
    * reader per file if a source ever does.
    */
  def read(spark: SparkSession, outDir: String, srcName: String, keyCol: String): DataFrame = {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val fs = new Path(outDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val first = fs.listStatus(new Path(outDir)).filter(_.isDirectory)
      .map(d => new Path(d.getPath, s"$srcName.csv")).find(fs.exists)
      .getOrElse(throw new IllegalArgumentException(
        s"no $srcName.csv under $outDir/*/"))
    val info = HeaderScan.scanHeader(spark, first.toString, keyCol)
      .getOrElse(throw new IllegalArgumentException(
        s"key column '$keyCol' not found in $first"))
    val schema = StructType(info.columns.map(c => StructField(c, StringType)))
    val prefixSet = info.prefixRows.toSet
    spark.read.text(s"$outDir/*/$srcName.csv")
      .select(col("value").as("_line"),
        regexp_extract(input_file_name(), s".*/([^/]+)/$srcName\\.csv$$", 1).as("_dir_key"))
      .withColumn("_line", regexp_replace(col("_line"), "^﻿", ""))
      .filter(!col("_line").isin(prefixSet.toSeq: _*))
      .select(from_csv(col("_line"), schema, Map.empty[String, String]).as("r"),
        // input_file_name is URI-percent-encoded; url_decode additionally
        // treats '+' as space (form encoding), so protect literal '+'
        // (never raw in a URI) by pre-escaping it
        url_decode(regexp_replace(col("_dir_key"), "\\+", "%2B")).as("_dir_key"))
      .select(col("r.*") +: Seq(col("_dir_key")): _*)
      .filter(col(keyCol) =!= keyCol) // drop each file's header line
  }
}
