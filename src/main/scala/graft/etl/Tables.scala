package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver testdata layout
  * (`TESTDATA.md`: one parquet file per table under the sf dir).
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Redistribute an under-split scan across all cores before CPU-dense
    * derivation (regex normalization, shingling, hashing, vector math).
    *
    * The testdata parquet files are single row groups, so their scans
    * produce ONE partition — every expensive expression pipelined onto
    * the scan would run on one core of the machine. One cheap shuffle of
    * the raw rows buys full-width parallelism for everything after it.
    * On production multi-file/multi-row-group data the scan splits
    * already provide this; the helper is still the right tool whenever a
    * compact source feeds compute-heavy work (the classic "small input,
    * big CPU" shape — `spark.sql.files.maxPartitionBytes` cannot split
    * inside a row group).
    *
    * HASH-partitions on the first column (the tables' unique id) rather
    * than round-robin: round-robin repartition sorts the whole source
    * partition by every column first (`sortBeforeRepartition`, needed for
    * its determinism) — a single-task full sort that costs more than the
    * parallelism wins back. Hashing one id column is allocation-free and
    * deterministic by construction.
    */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // GUARD: on an already-parallel source (multi-file / multi-row-group
    // scans — the production case) spread is a NO-OP, so downstream
    // filters and projections push to the scan unimpeded (SpreadSpec
    // asserts this). The repartition+barrier below only engages for
    // under-split scans, where the barrier costs nothing the scan
    // hadn't already serialized. getNumPartitions plans the scan's
    // splits but runs no job.
    if (df.rdd.getNumPartitions >= target) df
    else
      df.repartition(target,
        org.apache.spark.sql.functions.col(df.columns.head))
        // lazy localCheckpoint = an optimizer barrier. Without it Catalyst
        // pushes every downstream filter below the repartition to the scan
        // — substitution inlines the filtered expression (e.g.
        // parseMonth∘fabrication appears ~8× in the pushed predicate) and
        // the whole thing evaluates on the scan's ONE core, which is
        // exactly what spread exists to avoid. Checkpointing the raw
        // spread rows (small by the premise of this helper) pins the
        // exchange in place; all derivation above it runs full-width.
        .localCheckpoint(false)
  }

  /** Split-compacted copy of a high-row-count table, built once per
    * (dataset, process) as an [[Artifacts.shared]] parquet: the driver
    * testdata ships each table as ONE parquet row group, so every scan
    * is a single partition and every agg's partial phase serializes on
    * one core (`maxPartitionBytes` cannot split inside a row group).
    * Rewriting the table once as defaultParallelism hash-keyed files
    * makes every later scan split-parallel AND keeps filter/column
    * pushdown (which the in-memory [[spread]] barrier deliberately
    * blocks). This is the standard lake fix for row-group-compact
    * exports: compact/split once at ingest, every downstream query
    * reads the splittable copy. Small dimensions stay raw — a 32-file
    * layout of 25 rows would cost more in open overhead than it buys.
    */
  private def splitLoad(
      spark: SparkSession, d: String, name: String, key: String): DataFrame =
    Artifacts.shared(spark, d, s"split_$name") {
      load(spark, d, name).repartition(
        spark.sparkContext.defaultParallelism,
        org.apache.spark.sql.functions.col(key))
    }

  def lineitem(spark: SparkSession, d: String): DataFrame =
    splitLoad(spark, d, "lineitem", "l_orderkey")
  def orders(spark: SparkSession, d: String): DataFrame =
    splitLoad(spark, d, "orders", "o_orderkey")
  def customer(spark: SparkSession, d: String): DataFrame = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = load(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame = load(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame = load(spark, d, "region")
  /** `events.parquet` has shipped `ts` as two physical types across driver
    * testdata generations: parquet TIMESTAMP(NANOS) (which Spark's
    * vectorized reader rejects outright, [PARQUET_TYPE_ILLEGAL] — read
    * nanos as a raw long via the legacy conf and integer-divide to micros)
    * and plain TIMESTAMP(MICROS) (which Spark reads natively as
    * TIMESTAMP_NTZ). Branch on the scanned schema so both layouts load to
    * the same `TimestampType` column; with the session timezone pinned to
    * UTC (Bench/Verify/Cli/specs) the NTZ→LTZ cast is numerically exact.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    // split artifact stores the POST-conversion frame (plain
    // TIMESTAMP(MICROS)), so consumers read it natively — the nanos
    // legacy branch runs only in the one-time build. The legacy conf is
    // SCOPED to that build (set/restore): leaving it on would silently
    // change every later TIMESTAMP(NANOS) parquet read in the session
    // to raw longs — action-at-a-distance on unrelated sources.
    // Artifacts.locked: the set/build/restore window is serialized
    // against every other artifact build, so a concurrent query that
    // triggers another Artifacts.shared cannot run inside the legacy-conf
    // window (the residual sequential-driver assumption is documented at
    // Artifacts.locked).
    Artifacts.locked {
      val key = "spark.sql.legacy.parquet.nanosAsLong"
      val old = spark.conf.getOption(key)
      spark.conf.set(key, "true")
      try
        Artifacts.shared(spark, d, "split_events") {
          eventsRaw(spark, d).repartition(
            spark.sparkContext.defaultParallelism,
            org.apache.spark.sql.functions.col("user_id"))
        }
      finally old match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  private def eventsRaw(spark: SparkSession, d: String): DataFrame = {
    val raw = load(spark, d, "events")
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.LongType
    raw.schema("ts").dataType match {
      // `div` (integer division) — `/` would go through double and lose
      // nanosecond-epoch precision (≈1.7e18 > 2^53).
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _        => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  /** documents/embeddings route through [[splitLoad]] (round 11): the
    * raw tables are single row groups, so the ~60 LLM-pipeline entries
    * that open with `spread(documents(...))` each paid a per-query
    * repartition + localCheckpoint materialization of the whole table
    * (the spread barrier — rebuilt every query because Bench/Verify
    * clear caches between queries) AND lost filter/column pushdown
    * behind the barrier. The split artifact pays ONE repartition per
    * process; every later scan is split-parallel from the files
    * themselves, so `spread` no-ops on it and predicates push all the
    * way into the parquet scan.
    */
  def documents(spark: SparkSession, d: String): DataFrame =
    splitLoad(spark, d, "documents", "doc_id")
  def embeddings(spark: SparkSession, d: String): DataFrame =
    splitLoad(spark, d, "embeddings", "vec_id")
}
