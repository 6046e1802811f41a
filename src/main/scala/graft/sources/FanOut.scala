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
  * finalize pass whose DRIVER work is metadata-only: single-part keys
  * with no prefix/BOM are `FileSystem.rename`d, and any byte-level
  * concat (multi-part keys, prefix/BOM replay) runs distributed, one
  * task per key — at 100 TB the finalize scales with the cluster.
  */
object FanOut {

  /** Fan out `df` by `keyCol` into `outDir/{key}/{srcName}.csv`.
    *
    * Blank/whitespace keys are dropped (fan_out_by_storeid.py:35–37).
    * `prefixRows` (meta rows from [[HeaderScan]]) and `bom` reproduce the
    * reference's per-file prefix replay + utf-8-sig output.
    *
    * A key containing '/' nests directories (`US/East` →
    * `outDir/US/East/src.csv`) — byte-identical to the reference's
    * `os.path.join(out, key)`, and flagged by the same verify pass in
    * both systems (the depth-1 read glob won't see it). Callers wanting
    * path-safe keys sanitize before writing, as they would there.
    *
    * `encoding` selects the OUTPUT charset and `lineSep` the output
    * line terminator (the reference writes output in the input's
    * encoding — one `--encoding` for both, fan_out_by_storeid.py:14/:42
    * — and its `csv.writer` terminates rows with CRLF); the defaults
    * stay UTF-8 + LF (this library's documented normalize stance —
    * COVERAGE.md). Pass `encoding = "big5", lineSep = "\r\n"` for
    * byte-identical reference output (FanOutSpec pins it). `bom` is
    * the utf-8-sig marker and therefore requires UTF-8 output.
    */
  def write(
      df: DataFrame,
      keyCol: String,
      outDir: String,
      srcName: String,
      prefixRows: Seq[String] = Nil,
      bom: Boolean = false,
      encoding: String = "UTF-8",
      lineSep: String = "\n"): Unit = {
    val spark = df.sparkSession
    val staging = s"$outDir/_staging_$srcName"
    // reserved partition-helper name: a source column literally named
    // _gk would be silently overwritten and then stripped from the CSVs
    // by partitionBy — refuse it (schemas are arbitrary BI exports, so
    // this is an input-validation contract, not an internal invariant)
    require(!df.columns.contains("_gk"),
      "FanOut.write reserves column _gk; rename the conflicting input column")
    val cleaned = df
      .withColumn(keyCol, trim(col(keyCol)))
      .filter(col(keyCol).isNotNull && col(keyCol) =!= "")
    // Partition on a duplicated helper column so the key stays in the CSV
    // row content (Spark drops partition columns from files; the reference
    // keeps the key cell — that's the invariant verify_fanout checks).
    val helper = "_gk"
    require(!bom || java.nio.charset.Charset.forName(encoding) ==
      java.nio.charset.StandardCharsets.UTF_8,
      s"bom (utf-8-sig) requires UTF-8 output, got $encoding")
    // staging is ALWAYS UTF-8 + LF: Spark 4's CSV writer whitelists
    // charsets (big5 is rejected without a legacy flag) and caps the
    // write-side lineSep at one char, so non-default output encodings
    // are produced by the DISTRIBUTED finalize pass transcoding the
    // staging bytes (one task per key — same scale shape as the concat)
    cleaned.withColumn(helper, col(keyCol)).write
      .mode("overwrite")
      .option("header", true)
      .partitionBy(helper)
      .csv(staging)
    finalizeLayout(spark, staging, outDir, helper, srcName, prefixRows, bom,
      encoding, lineSep)
  }

  /** Hadoop `Configuration` isn't `java.io.Serializable`; it IS a Hadoop
    * `Writable`, so ship it to tasks via writeObject/readFields (the same
    * trick Spark uses internally for its own config broadcasts).
    */
  private[sources] class SerializableHadoopConf(@transient var value: org.apache.hadoop.conf.Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new org.apache.hadoop.conf.Configuration(false)
      value.readFields(in)
    }
  }

  /** One key's concat work item: (key, part-file paths). */
  private type KeyParts = (String, Seq[String])

  /** Move `staging/{key}={v}/part-*.csv` → `outDir/{v}/{srcName}.csv`.
    *
    * Scale contract: the driver touches METADATA only (listings, renames).
    *   - single part file, no prefix/BOM → `FileSystem.rename` (a true
    *     metadata op — the common case, since each key's rows land in few
    *     tasks);
    *   - multi-part or prefix/BOM → the byte concat runs DISTRIBUTED, one
    *     task per key over a parallelized key list. At 100× data the
    *     concat cost scales with the cluster, not with one driver thread.
    */
  private def finalizeLayout(
      spark: SparkSession,
      staging: String,
      outDir: String,
      keyCol: String,
      srcName: String,
      prefixRows: Seq[String],
      bom: Boolean,
      encoding: String,
      lineSep: String): Unit = {
    val fs = new Path(outDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prefix = (if (bom) "﻿" else "") +
      (if (prefixRows.nonEmpty) prefixRows.mkString("", lineSep, lineSep)
       else "")
    val plan: Array[KeyParts] = fs.listStatus(new Path(staging))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$keyCol="))
      .map { partDir =>
        // Spark's own partition-value unescaping — NOT URLDecoder, whose
        // '+'-means-space rule corrupts keys containing '+' (Spark's
        // escapePathName leaves '+' literal)
        val key = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .unescapePathName(partDir.getPath.getName.stripPrefix(s"$keyCol="))
        val parts = fs.listStatus(partDir.getPath)
          .filter(_.getPath.getName.endsWith(".csv"))
          .map(_.getPath.toString).sorted.toSeq
        (key, parts)
      }
    // non-default encoding or terminator ⇒ every key needs the
    // (distributed) transcode pass; the metadata-only rename fast path
    // is only byte-correct when staging bytes ARE the output bytes
    val transcode = java.nio.charset.Charset.forName(encoding) !=
      java.nio.charset.StandardCharsets.UTF_8 || lineSep != "\n"
    val (renameable, needConcat) =
      plan.partition { case (_, parts) =>
        parts.length == 1 && prefix.isEmpty && !transcode }
    renameable.foreach { case (key, parts) =>
      val dest = new Path(s"$outDir/$key/$srcName.csv")
      fs.mkdirs(dest.getParent)
      if (fs.exists(dest)) fs.delete(dest, false)
      if (!fs.rename(new Path(parts.head), dest))
        throw new java.io.IOException(
          s"fan-out finalize: rename ${parts.head} -> $dest failed")
      dropCrcSidecar(fs, dest)
    }
    if (needConcat.nonEmpty) {
      val serConf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
      val (out, src, pfx, enc, sep) = (outDir, srcName, prefix, encoding, lineSep)
      val slices = math.min(needConcat.length, spark.sparkContext.defaultParallelism)
      spark.sparkContext.parallelize(needConcat.toSeq, slices).foreach {
        case (key, parts) => concatKey(serConf.value, out, src, pfx, enc, sep, key, parts)
      }
      // Sweep orphaned attempt temps (crashed or speculation-killed
      // attempts that never renamed). Done HERE, after the job has
      // returned and every key holds a committed dest — a task-side
      // sweep could delete a live twin's tmp mid-write and leave the
      // key fileless. Driver cost is metadata-only (one listing per
      // concat key; no glob, so keys with glob metachars stay safe).
      needConcat.foreach { case (key, _) =>
        val dir = new Path(s"$outDir/$key")
        fs.listStatus(dir)
          .filter { st =>
            val n = st.getPath.getName
            n.contains(s"$srcName.csv.") &&
              (n.endsWith(".tmp") || n.endsWith(".tmp.crc"))
          }
          .foreach(st => fs.delete(st.getPath, false))
      }
    }
    fs.delete(new Path(staging), true)
  }

  /** Task-side concat of one key's part files (header kept once, prefix
    * replayed). Runs on executors — keep driver state out of here.
    *
    * Retry-safe: each attempt writes to an attempt-unique hidden temp
    * file and renames into place, so a retried or speculatively
    * duplicated task never interleaves bytes with another attempt on the
    * same destination stream — the last rename wins whole-file.
    */
  private def concatKey(
      conf: org.apache.hadoop.conf.Configuration,
      outDir: String,
      srcName: String,
      prefix: String,
      encoding: String,
      lineSep: String,
      key: String,
      parts: Seq[String]): Unit = {
    val cs = java.nio.charset.Charset.forName(encoding)
    val stagingCs = java.nio.charset.StandardCharsets.UTF_8 // staging is UTF-8+LF
    // Strict transcode: the reference Python opens the sink with the
    // target codec and raises UnicodeEncodeError on any unmappable
    // character (fan_out_by_storeid.py's `open(..., encoding=enc)`
    // default errors='strict'). Java's String.getBytes(Charset) instead
    // REPLACEs with '?' — silent corruption. REPORT restores the loud
    // failure contract; the message carries the key so a 1000-task run
    // points at the offending partition, not a stack of anonymous bytes.
    val strictEnc = cs.newEncoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    def encodeStrict(s: String): Array[Byte] =
      try {
        val bb = strictEnc.encode(java.nio.CharBuffer.wrap(s))
        val arr = new Array[Byte](bb.remaining()); bb.get(arr); arr
      } catch {
        case e: java.nio.charset.CharacterCodingException =>
          throw new java.io.IOException(
            s"fan-out: row for key '$key' contains characters not " +
              s"representable in $encoding (strict output-encoding, " +
              s"matching the reference's UnicodeEncodeError contract): " +
              s"${s.take(120)}", e)
      }
    val dest = new Path(s"$outDir/$key/$srcName.csv")
    val fs = dest.getFileSystem(conf)
    fs.mkdirs(dest.getParent)
    val attempt = Option(org.apache.spark.TaskContext.get())
      .map(_.taskAttemptId().toString)
      .getOrElse(java.util.UUID.randomUUID().toString)
    val tmp = new Path(dest.getParent, s".${dest.getName}.$attempt.tmp")
    val out = fs.create(tmp, true)
    try {
      if (prefix.nonEmpty) out.write(encodeStrict(prefix))
      var wroteHeader = false
      parts.foreach { p =>
        val in = fs.open(new Path(p))
        try {
          val reader = new java.io.BufferedReader(new java.io.InputStreamReader(in, stagingCs))
          var line = reader.readLine() // header line of this part file
          if (!wroteHeader && line != null) {
            out.write(encodeStrict(line + lineSep))
            wroteHeader = true
          }
          line = reader.readLine()
          while (line != null) {
            out.write(encodeStrict(line + lineSep))
            line = reader.readLine()
          }
        } finally in.close()
      }
    } finally out.close()
    // Commit by rename FIRST; only delete a pre-existing dest when the
    // rename refuses to clobber. A committed destination is therefore
    // never removed before its replacement exists, so two live
    // speculative/retried attempts can't strand the key fileless (each
    // attempt's tmp stays private to it — orphans from crashed attempts
    // are swept by the driver in finalizeLayout AFTER the job, never by
    // a peer task that might race a still-writing twin).
    if (!fs.rename(tmp, dest)) {
      if (fs.exists(dest)) fs.delete(dest, false)
      if (!fs.rename(tmp, dest)) {
        // lost the delete→rename window to a concurrent attempt that
        // committed identical content — fine as long as dest exists;
        // anything else is a real failure
        fs.delete(tmp, false)
        if (!fs.exists(dest))
          throw new java.io.IOException(
            s"fan-out concat: rename $tmp -> $dest failed")
      }
    }
    dropCrcSidecar(fs, dest)
    dropCrcSidecar(fs, tmp)
  }

  /** Delete the local-FS checksum sidecar (`.{name}.crc`) so the layout
    * is exactly the reference's plain `{key}/{src}.csv` files — a stale
    * sidecar would also fail later Hadoop reads of an output a user
    * edited in place. No-op on filesystems without sidecars (HDFS, S3).
    */
  private def dropCrcSidecar(fs: FileSystem, dest: Path): Unit = {
    val crc = new Path(dest.getParent, s".${dest.getName}.crc")
    if (fs.exists(crc)) fs.delete(crc, false)
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
    // srcName is user input: escape glob metacharacters so "data[1]"
    // reads back literally. The key regex extracts the PARENT DIRECTORY
    // generically instead of anchoring on srcName — the glob already
    // restricts the file set, and input_file_name() URI-encodes
    // characters like '[' so a literal srcName anchor would not match.
    val srcGlob = srcName.replaceAll("([\\[\\]{}*?\\\\])", "\\\\$1")
    spark.read.text(s"$outDir/*/$srcGlob.csv")
      .select(col("value").as("_line"),
        regexp_extract(input_file_name(), ".*/([^/]+)/[^/]+$", 1).as("_dir_key"))
      .withColumn("_line", regexp_replace(col("_line"), "^﻿", ""))
      // Prefix/meta lines are dropped by CONTENT equality: a line-split
      // text scan has no per-file line offsets, so position-based
      // skipping (the reference's pandas skiprows) isn't expressible
      // shuffle-free. Known limitation: a DATA row whose full CSV text
      // byte-equals a replayed meta line is dropped with it — reachable
      // only when a key cell equals the meta line's first cell AND every
      // other cell matches; the reference's dated report headers don't
      // collide with data rows in practice. A caller needing exactness
      // under adversarial keys should read per-file with positional skip.
      .filter(!col("_line").isin(prefixSet.toSeq: _*))
      .select(from_csv(col("_line"), schema, Map.empty[String, String]).as("r"),
        // input_file_name is URI-percent-encoded; url_decode additionally
        // treats '+' as space (form encoding), so protect literal '+'
        // (never raw in a URI) by pre-escaping it
        url_decode(regexp_replace(col("_dir_key"), "\\+", "%2B")).as("_dir_key"))
      .select(col("r.*") +: Seq(col("_dir_key")): _*)
      // null-SAFE header drop: a ragged data row null-fills the key cell,
      // and `null =!= header` is null (row silently dropped) — but that
      // row is exactly a content violation the verifier must see
      .filter(coalesce(col(keyCol), lit("")) =!= keyCol)
  }
}
