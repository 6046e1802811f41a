package graft.queries

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.{SchemaResolver, Tables, VerifyOps}
import graft.sources.{FanOut, HeaderScan}

/** End-to-end file-pipeline queries: the reference's fan-out sink,
  * header-scanning ingest, and post-hoc verification exercised through
  * real filesystem round-trips, with the results checked against DuckDB
  * oracles over the original tables (round-trip integrity == parity with
  * the source of truth).
  *
  * Temp layouts live under java.io.tmpdir and are rebuilt (overwrite) on
  * each run, so Verify and Bench are self-contained.
  */
object PipelineQueries {

  /** Temp layout path scoped by dataset AND process: a stale `{key}`
    * dir from a previous run over a different dataset would otherwise
    * survive into the read glob, and concurrent Bench/Verify processes
    * would clobber each other's staging dirs. MD5 of the dataset path
    * (not Int hashCode — collidable) keys the dataset dimension.
    */
  private def tmp(name: String, sfDir: String): String = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(sfDir.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    s"${System.getProperty("java.io.tmpdir")}/graft_${name}_" +
      s"${digest}_${ProcessHandle.current().pid()}"
  }

  private def deleteRecursively(path: String): Unit = {
    val f = new java.io.File(path)
    if (f.exists()) {
      val stream = java.nio.file.Files.walk(f.toPath)
      try stream.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => p.toFile.delete())
      finally stream.close()
    }
  }

  // ---- q15: fan-out write → exact {key}/{src}.csv layout → read back --

  /** Guards the check-then-write below — q15/q17/q31 may race on first
    * materialization within one JVM.
    */
  private val fanOutLock = new Object

  /** The events fan-out layout, materialized ONCE per (dataset, process)
    * and read back by q15 (round-trip), q17 (verify summary) and q31
    * (violation samples) — the write+finalize pipeline is the most
    * expensive filesystem work in the suite and its output is identical
    * for all three consumers (same checkpoint-the-expensive-intermediate
    * shape as the shared LSH pair table).
    */
  private def fanOutEvents(s: SparkSession, d: String): DataFrame = {
    val out = tmp("fanout_events", d)
    val marker = new java.io.File(out, "_LAYOUT_DONE")
    fanOutLock.synchronized {
      if (!marker.exists()) {
        deleteRecursively(out)
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("event_type"))
        FanOut.write(ev, "event_type", out, "events")
        marker.createNewFile()
      }
    }
    FanOut.read(s, out, "events", "event_type")
  }

  private val q15 = Q(
    "q15_fanout_roundtrip",
    (s, d) => {
      fanOutEvents(s, d)
        .groupBy(col("_dir_key").as("event_type"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"))
    },
    Some("""
      SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users
      FROM events GROUP BY 1
    """))

  // ---- q16: header-scanning CSV ingest over messy BI exports ----------

  /** Fabricate two BI-export-style CSVs from `nation` (driver-side — the
    * dimension is 25 rows): different column orders, alias headers, meta
    * prefix rows, a BOM on one file, and one decoy file without the key
    * column (must be warn-skipped).
    */
  private def fabricateMessyCsvs(s: SparkSession, d: String): String = {
    val dir = tmp("headerscan_in", d)
    deleteRecursively(dir)
    val rows = Tables.nation(s, d)
      .select(col("n_nationkey").cast("long"), col("n_name"),
        col("n_regionkey").cast("long"))
      .collect().sortBy(_.getLong(0))
    Files.createDirectories(Paths.get(dir))
    def write(name: String, content: String): Unit =
      Files.write(Paths.get(dir, name), content.getBytes(StandardCharsets.UTF_8))
    val (lo, hi) = rows.partition(_.getLong(0) < 13)
    write("export_a.csv",
      "Report Generated,2026-08-12\nSource,BI\n" +
        "商店序號,門市名稱,region\n" +
        lo.map(r => s"${r.getLong(0)},${r.getString(1)},${r.getLong(2)}").mkString("", "\n", "\n"))
    write("export_b.csv",
      "﻿Quarter,Q3\n" +
        "region, 商店序號 ,Store Name\n" + // shuffled order + padded header
        hi.map(r => s"${r.getLong(2)},${r.getLong(0)},${r.getString(1)}").mkString("", "\n", "\n"))
    write("decoy.csv", "a,b\n1,2\n") // no key column → warn + skip
    dir
  }

  private val q16 = Q(
    "q16_header_scan_ingest",
    (s, d) => {
      val dir = fabricateMessyCsvs(s, d)
      // alias resolution is per-file: the exports disagree on the
      // store-name header, so canonicalize before the union
      val named = HeaderScan.readDirFrames(s, dir, "商店序號")
        .map { case (_, df) =>
          SchemaResolver.ensureStoreNameCol(df)
            .select(col("商店序號"), col("門市名稱"), col("region"))
        }
        .reduce(_ unionByName _)
      named
        .groupBy(col("region").cast("long").as("n_regionkey"))
        .agg(count(lit(1)).as("n_nations"),
          countDistinct(col("門市名稱")).as("n_names"),
          sum(col("商店序號").cast("long")).as("key_sum"))
    },
    Some("""
      -- CAST: DuckDB sum(INTEGER) yields HUGEINT (pandas float64); Spark
      -- emits int64 — pin both grouping key and sum to BIGINT for the
      -- dtype-sensitive hash compare.
      SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey,
             count(*) AS n_nations,
             count(DISTINCT n_name) AS n_names,
             CAST(sum(n_nationkey) AS BIGINT) AS key_sum
      FROM nation GROUP BY 1
    """))

  // ---- q17: fan-out verification (file sets + content invariant) ------

  private val q17 = Q(
    "q17_verify_fanout",
    (s, d) => {
      val back = fanOutEvents(s, d)
      val present = back.select(col("_dir_key").as("event_type"), lit("events").as("src"))
      VerifyOps.summary(present, back, "event_type", Seq("events"))
    },
    Some("""
      SELECT CAST(0 AS BIGINT) AS n_missing, CAST(0 AS BIGINT) AS n_extra,
             CAST(0 AS BIGINT) AS n_violations,
             count(DISTINCT event_type) AS n_keys
      FROM events
    """))

  // ---- q31: bounded violation samples (verify_fanout.py:96–97) --------

  private val q31 = Q(
    "q31_violation_samples",
    (s, d) => {
      val back = fanOutEvents(s, d)
        .select(col("event_id"), col("event_type"), col("_dir_key"))
      // overlay synthetic violations (~1/97 of rows get a corrupted key
      // cell) so the bounded sampler has something to bound; the clean
      // round-trip rows must all survive as non-violations
      val corrupted = back.unionAll(
        back.filter(pmod(col("event_id").cast("long"), lit(97)) === 0)
          .withColumn("event_type",
            concat(lit("bad_"), pmod(col("event_id").cast("long"), lit(1000)))))
      VerifyOps.violationSamples(
        corrupted.select(col("event_type"), col("_dir_key")), "event_type", 5)
        .select(col("_dir_key").as("dir_key"), col("event_type").as("bad_key"),
          col("_rnk").as("rnk"), col("_n_file_violations").as("n_file_violations"))
    },
    Some("""
      WITH v AS (
        SELECT event_type AS dir_key,
               'bad_' || CAST(event_id % 1000 AS VARCHAR) AS bad_key
        FROM events WHERE event_id % 97 = 0),
      r AS (
        SELECT dir_key, bad_key,
               CAST(row_number() OVER (PARTITION BY dir_key ORDER BY bad_key) AS INTEGER) AS rnk,
               count(*) OVER (PARTITION BY dir_key) AS n_file_violations
        FROM v)
      SELECT dir_key, bad_key, rnk, n_file_violations FROM r WHERE rnk <= 5
    """))

  // ---- q43: hive-partitioned parquet write → partition-pruned read ----
  //
  // The lake-layout primitive the 100 TB story rests on: write the fact
  // partitioned by a low-cardinality column (`partitionBy` — one
  // directory per value, dynamic, no driver loop), then read it back
  // with a partition predicate. Catalyst turns the predicate into a
  // PartitionFilter — the scan LISTS only the matching directory and
  // never opens the other partitions' files (PlanAuditSpec asserts the
  // pruned plan). Oracle = the same filter over the original table
  // (layout round-trip ≡ source of truth).

  /** Guards q43's first materialization (same pattern as the fan-out). */
  private val partLock = new Object

  private def partitionedOrders(s: SparkSession, d: String): String = {
    val out = tmp("orders_bypriority", d)
    val marker = new java.io.File(out, "_LAYOUT_DONE")
    partLock.synchronized {
      if (!marker.exists()) {
        deleteRecursively(out)
        Tables.orders(s, d)
          .write.partitionBy("o_orderpriority").mode("overwrite").parquet(out)
        marker.createNewFile()
      }
    }
    out
  }

  private val q43 = Q(
    "q43_partition_prune",
    (s, d) => {
      val layout = partitionedOrders(s, d)
      s.read.parquet(layout)
        .filter(col("o_orderpriority") === "1-URGENT")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          // exact integer cents → order-independent sum, one division
          sum(round(col("o_totalprice") * 100).cast("long")).as("total_c"))
        .select(col("o_orderstatus"), col("n"),
          (col("total_c").cast("double") / 100.0).as("total"))
    },
    Some("""
      SELECT o_orderstatus, count(*) AS n,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS total
      FROM orders
      WHERE o_orderpriority = '1-URGENT'
      GROUP BY 1
    """))

  // ---- q47: schema evolution across lake snapshots --------------------
  //
  // The ingest reality every long-lived corpus hits: early snapshots
  // were written WITHOUT a column that later snapshots carry (here:
  // `lang` added in v2). The lake read must unify both vintages —
  // `mergeSchema` reconciles the parquet footers into one schema, the
  // snapshot directory name becomes a partition column via partition
  // discovery, and v1 rows surface the missing column as NULL (no
  // rewrite of old data). Oracle = the same per-snapshot semantics
  // computed from the source table (deterministic doc_id % 2 split).
  //
  // Scale note: mergeSchema footer reconciliation reads one footer per
  // FILE — fine per-snapshot-directory; for 10k+-file lakes pin the
  // merged schema in a table catalog instead and pass it explicitly
  // (the read path below is unchanged).

  private val evoLock = new Object

  private def evolvedDocs(s: SparkSession, d: String): String = {
    val out = tmp("docs_evolved", d)
    val marker = new java.io.File(out, "_LAYOUT_DONE")
    evoLock.synchronized {
      if (!marker.exists()) {
        deleteRecursively(out)
        val docs = Tables.documents(s, d)
        // v1 vintage: no lang column yet
        docs.filter(pmod(col("doc_id"), lit(2)) === 0)
          .select(col("doc_id"), col("n_chars"))
          .write.mode("overwrite").parquet(s"$out/snap=v1")
        // v2 vintage: lang added
        docs.filter(pmod(col("doc_id"), lit(2)) === 1)
          .select(col("doc_id"), col("n_chars"), col("lang"))
          .write.mode("overwrite").parquet(s"$out/snap=v2")
        marker.createNewFile()
      }
    }
    out
  }

  private val q47 = Q(
    "q47_schema_evolution",
    (s, d) => {
      val unified = s.read.option("mergeSchema", "true")
        .parquet(evolvedDocs(s, d))
      unified
        .groupBy(col("snap"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars").cast("long")).as("chars"))
    },
    Some("""
      SELECT 'v1' AS snap, CAST(NULL AS VARCHAR) AS lang,
             count(*) AS n_docs,
             CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS chars
      FROM documents WHERE doc_id % 2 = 0
      UNION ALL
      SELECT 'v2', lang, count(*), CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT)
      FROM documents WHERE doc_id % 2 = 1
      GROUP BY lang
    """))

  // ---- q49: small-file compaction planner -----------------------------
  //
  // The lake-maintenance twin of q43: a long-lived partitioned lake
  // accumulates one small file per ingest per partition, and read
  // amplification grows until a compaction job rewrites leaves into
  // target-sized outputs. The layout here is two-level — priority ×
  // ingest bucket (pmod(o_orderkey, 8) plays the per-ingest file),
  // written once and rediscovered via hive partition discovery — and
  // the PLANNER is metadata-sized work: rows per leaf (one agg), then
  // next-fit span packing by cumulative size inside each top-level
  // partition (the t17 seq_id shape: bin = cum_before div target).
  // The bucket column is DATA-derived, so the oracle reproduces leaf
  // stats from the base table and file-system state never leaks into
  // the contract.
  //
  // At 100 TB swap the row-count proxy for `_metadata.file_size` over
  // the real listing — same plan (one agg over the listing + one
  // window); the output table is exactly what the rewrite job executes
  // bin by bin.

  private val compactTarget = 1000L

  private def bucketedOrders(s: SparkSession, d: String): String = {
    val out = tmp("orders_buckets", d)
    val marker = new java.io.File(out, "_LAYOUT_DONE")
    partLock.synchronized {
      if (!marker.exists()) {
        deleteRecursively(out)
        Tables.orders(s, d)
          .withColumn("ingest", pmod(col("o_orderkey"), lit(8)))
          .write.partitionBy("o_orderpriority", "ingest")
          .mode("overwrite").parquet(out)
        marker.createNewFile()
      }
    }
    out
  }

  private val q49 = Q(
    "q49_compaction_plan",
    (s, d) => {
      val layout = bucketedOrders(s, d)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_orderpriority")).orderBy(col("ingest"))
      s.read.parquet(layout)
        .groupBy(col("o_orderpriority"), col("ingest"))
        .agg(count(lit(1)).as("n_rows"))
        .withColumn("cum_before", sum(col("n_rows")).over(w) - col("n_rows"))
        .select(col("o_orderpriority"), col("ingest").cast("long").as("ingest"),
          col("n_rows"), expr(s"cum_before div $compactTarget").as("bin"))
    },
    Some(s"""
      WITH leaves AS (
        SELECT o_orderpriority, o_orderkey % 8 AS ingest, count(*) AS n_rows
        FROM orders GROUP BY 1, 2),
      c AS (
        SELECT o_orderpriority, ingest, n_rows,
               sum(n_rows) OVER (PARTITION BY o_orderpriority
                                 ORDER BY ingest) - n_rows AS cum_before
        FROM leaves)
      SELECT o_orderpriority, CAST(ingest AS BIGINT) AS ingest,
             CAST(n_rows AS BIGINT) AS n_rows,
             CAST(cum_before // $compactTarget AS BIGINT) AS bin
      FROM c
    """))

  def all: Seq[Q] = Seq(q15, q16, q17, q31, q43, q47, q49)

  /** The partitioned layout + pruned scan, exposed for PlanAuditSpec's
    * partition-pruning assertion.
    */
  def prunedScanForAudit(s: SparkSession, d: String): DataFrame = {
    val layout = partitionedOrders(s, d)
    s.read.parquet(layout).filter(col("o_orderpriority") === "1-URGENT")
  }
}
