package graft

import graft.queries.Registry
import org.apache.spark.sql.catalyst.expressions.PredicateHelper
import org.apache.spark.sql.execution.{ColumnarToRowExec, FileSourceScanExec,
  FilterExec, InputAdapter, SparkPlan, WholeStageCodegenExec}

/** Whole-registry physical-plan invariants — the 100 TB design rules
  * that must never regress silently:
  *
  *   - no `CartesianProduct` anywhere (cross joins in the suite are all
  *     broadcast-nested-loop against broadcast-sized dimensions — month
  *     spines, centroid tables; an un-broadcast cartesian would be a
  *     data-explosion bug);
  *   - no Python or Scala UDFs (every operator is built-in expressions or
  *     native Catalyst expressions with codegen; typed `mapPartitions`
  *     for the media stubs shows as object serde, not UDF);
  *   - every source-translatable predicate sitting directly above a file
  *     scan is actually PUSHED to that scan (a regression that un-pushes
  *     a filter would otherwise only surface as bench noise).
  *
  * Planning only — fixtures fabricate at sf0.001, nothing large runs.
  */
class PlanAuditSpec extends SparkSpec with PredicateHelper {

  private lazy val sfDir = sf0001

  /** Planned once, shared by the registry-wide sweeps (building all 205
    * physical plans is the expensive part; the assertions are cheap).
    */
  private lazy val allPlans: Seq[(String, SparkPlan)] =
    Registry.all.map(q => q.name -> q.run(spark, sfDir).queryExecution.executedPlan)

  test("no query plans a CartesianProduct or a UDF") {
    val offenders = allPlans.flatMap { case (name, p) =>
      val plan = p.toString
      Seq(
        "CartesianProduct" -> "cartesian product",
        "BatchEvalPython" -> "python UDF",
        "PythonUDF" -> "python UDF",
        "Invoke.*\\bUDF\\b" -> "scala UDF")
        .collect { case (pat, label) if pat.r.findFirstIn(plan).isDefined =>
          s"$name: $label"
        }
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }

  /** A FilterExec whose effective child (through codegen plumbing —
    * attribute-preserving wrappers only) is a FileSourceScanExec, where
    * at least one deterministic conjunct over the scan's own columns
    * translates to a data-source Filter (Spark's own translation,
    * `DataSourceStrategy.translateFilter`), but the scan pushed NOTHING
    * down. That is exactly the un-pushed-predicate regression shape:
    * untranslatable conditions (array `size(...)`, arithmetic on the
    * column) are skipped — they cannot reach a parquet reader by design.
    */
  private def unpushedFilters(name: String, plan: SparkPlan): Seq[String] = {
    @annotation.tailrec
    def strip(p: SparkPlan): SparkPlan = p match {
      case w: WholeStageCodegenExec => strip(w.child)
      case i: InputAdapter => strip(i.child)
      case c: ColumnarToRowExec => strip(c.child)
      case other => other
    }
    plan.collect { case f: FilterExec =>
      strip(f.child) match {
        case scan: FileSourceScanExec =>
          val translatable = splitConjunctivePredicates(f.condition)
            .filter(_.deterministic)
            .filter(_.references.subsetOf(scan.outputSet))
            .flatMap(c => org.apache.spark.sql.GraftPlanProbe.translateFilter(c))
          // pushedDownFilters is protected; the scan node's own rendered
          // metadata carries the same fact unambiguously
          if (translatable.nonEmpty &&
              scan.toString.contains("PushedFilters: []"))
            Some(s"$name: filter [${f.condition}] above " +
              s"${scan.relation.fileFormat} scan pushed nothing down")
          else None
        case _ => None
      }
    }.flatten
  }

  test("registry-wide: every translatable filter above a file scan is pushed") {
    val offenders = allPlans.flatMap { case (name, p) => unpushedFilters(name, p) }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }

  test("pushdown guard negative control: a deliberately un-pushed filter is flagged") {
    // prove the guard can actually fire. Catalyst pushes every
    // translatable predicate into the scan node at plan time (even
    // `spark.sql.parquet.filterPushdown=false` only stops the READER
    // applying them — the metadata still lists them), so the offender
    // shape is synthesized directly: a translatable FilterExec grafted
    // above a bare scan that pushed nothing
    val base = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val filtered = base.filter(org.apache.spark.sql.functions.col("l_quantity") > 10)
    // optimizedPlan, not analyzed: the analyzer leaves the comparison
    // literal as cast(10 as double), which translateFilter rejects; the
    // optimizer folds it — the same shape real plans carry
    val cond = filtered.queryExecution.optimizedPlan.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
    }.get
    val scan = base.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.get
    assert(scan.toString.contains("PushedFilters: []"),
      s"control premise broken — bare scan claims pushed filters:\n$scan")
    val flagged = unpushedFilters("control", FilterExec(cond, scan))
    assert(flagged.nonEmpty,
      "guard failed to flag a translatable filter above a push-free scan")
  }

  /** BroadcastExchange build sides whose output carries BOTH pair
    * columns — i.e. a candidate-pair relation planned as a broadcast
    * build. That is the twilight-zone death shape (compressed stats
    * under the threshold, serialized rows in the gigabytes — observed
    * at 658M pairs on the 100x-skew replica); the shingle/size sides
    * ({a,_sha} / {b,_shb} / dimension tables) never carry both names.
    */
  private def broadcastPairOffenders(p: SparkPlan): Seq[String] =
    p.collect {
      case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
          if Set("a", "b").subsetOf(b.child.output.map(_.name).toSet) =>
        b.child.output.map(_.name).mkString("[", ",", "]")
    }

  /** BroadcastExchange build sides carrying ANY array-typed column —
    * the round-15 twilight-zone shape detected BY TYPE, not by column
    * name: an array-payload relation serializes ~15-20x its compressed
    * parquet stats, so a side whose stats sit under the threshold can
    * still blow driver.maxResultSize when collected for broadcast
    * (measured: the 100x-skew probe side, 3+ GiB serialized,
    * dev/scale_experiment_r15/t76_100x_skew_noconf_preguard.log; the
    * post-guard success run is t76_100x_skew_noconf.log). The r15
    * name-based detector (_sha/_shb) missed array relations under other
    * names — the streaming probes carry shingles as `sh` via
    * keep=Seq(ts,sh) (the r15 ADVICE hole).
    *
    * No exemption mechanism: every broadcast build carrying an array
    * column in an audited plan is an offender. The r16 verdict noted
    * the declared-bounded allowlist was dead weight (no call site used
    * it), so it was dropped (r16 ADVICE #4) — if a genuinely bounded
    * side ever needs to ride a broadcast through an audited plan,
    * reintroduce the exemption WITH the call that exercises it. (A
    * stats size floor would be useless here — at sf0.001 fixture scale
    * every side sits under any meaningful floor, so the floor would
    * exempt exactly the relations the audit exists to catch.)
    */
  private def broadcastArrayOffenders(p: SparkPlan): Seq[String] =
    p.collect {
      case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
          if b.child.output.exists(
            _.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]) =>
        b.child.output.map(a => s"${a.name}:${a.dataType.simpleString}")
          .mkString("[", ",", "]")
    }

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  // adversarial conf for the broadcast-guard pins: a threshold high
  // enough that EVERY side looks broadcastable to the planner (the
  // twilight zone made maximal), AQE off so the initial physical plan
  // is collectible (AdaptiveSparkPlanExec is a leaf to collect())
  private val twilightConf = Seq(
    "spark.sql.adaptive.enabled" -> "false",
    "spark.sql.autoBroadcastJoinThreshold" -> "1g")

  test("probe verify joins never broadcast the pair or shingle sides under ANY conf") {
    withConf(twilightConf: _*) {
      // t06-family entries are absent by construction: their frame is a
      // scan of the materialized lshpairs artifact (execution contract),
      // so the verify joins are not in the collectible plan — the
      // one-sided operator shape is pinned by the direct
      // verifyJaccard control test below instead
      Seq("t32_incremental_neardup", "t74_incremental_split_probe",
          "t76_exact_probe_neardup", "t77_stream_neardup_probe",
          "t78_stream_exact_probe").foreach { name =>
        val plan = Registry.queries(name)(spark, sfDir)
          .queryExecution.executedPlan
        val off = broadcastPairOffenders(plan)
        assert(off.isEmpty,
          s"$name broadcasts a candidate-pair relation: ${off.mkString("; ")}")
        val shOff = broadcastArrayOffenders(plan)
        assert(shOff.isEmpty,
          s"$name broadcasts an array-carrying side: ${shOff.mkString("; ")}")
        // EXACT-probe entries only: the exploded sub-label relation
        // (columns a/bidx/bh/_k) is quadratic-capable — each hot probe
        // row fans out by the INDEX bucket's heat — but the planner
        // sizes it from pre-explode stats. The split variants keep a
        // constant 2-label multiplier, so their `_k` relations stay
        // legitimately broadcastable.
        if (name.contains("exact")) {
          // the probe-side relation is the one carrying `a`; the
          // index-side label table ({b,bidx,bh,_k}) is linear in index
          // size with honest (explode-free) stats and stays free
          val kOff = plan.collect {
            case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
                if Set("a", "_k").subsetOf(b.child.output.map(_.name).toSet) =>
              b.child.output.map(_.name).mkString("[", ",", "]")
          }
          assert(kOff.isEmpty,
            s"$name broadcasts the exploded exact-probe-key relation: " +
              kOff.mkString("; "))
        }
        // the guard must not have banned broadcast wholesale: at this
        // fixture scale the narrow sides (band keys, hot tables, spines)
        // still ride broadcasts
        assert(plan.toString.contains("BroadcastHashJoin"),
          s"$name lost all broadcasts — guard over-applied:\n$plan")
      }
    }
  }

  test("broadcast-pair guard negative control: the unguarded join shape is flagged") {
    import spark.implicits._
    val cand = (1L to 50L).flatMap(a => (1L to 4L).map(b => (a, a + b)))
      .toDF("a", "b")
    val base = (1L to 300L)
      .map(i => (i, (1 to 50).map(j => s"sh_${i % 7}_$j")))
      .toDF("doc_id", "sh")
    val sa = base.select(
      org.apache.spark.sql.functions.col("doc_id").as("a"),
      org.apache.spark.sql.functions.col("sh").as("_sha"))
    val sb = base.select(
      org.apache.spark.sql.functions.col("doc_id").as("b"),
      org.apache.spark.sql.functions.col("sh").as("_shb"))
    withConf(twilightConf: _*) {
      // unguarded: the pair relation is the smallest side, so the
      // planner builds a broadcast out of it — the detector must fire
      val unguarded = cand.join(sa, Seq("a")).join(sb, Seq("b"))
        .queryExecution.executedPlan
      assert(broadcastPairOffenders(unguarded).nonEmpty,
        s"control premise broken — unguarded pair join did not broadcast " +
          s"the pair side:\n$unguarded")
      // same frames through the guarded operator: zero pair broadcasts
      // AND zero shingle-side broadcasts — both verify joins must plan
      // as shuffles regardless of how small the stats look
      val guarded = graft.etl.Dedup
        .verifyJaccard(base, base, "doc_id", "sh", cand, 0.0)
        .queryExecution.executedPlan
      assert(broadcastPairOffenders(guarded).isEmpty,
        s"guarded verify join still broadcasts the pair side:\n$guarded")
      assert(broadcastArrayOffenders(guarded).isEmpty,
        s"guarded verify join still broadcasts a shingle side:\n$guarded")
      // the probeBounded seam: a caller that DECLARES its probe batch
      // bounded gets the probe-side broadcast back (the scale-correct
      // plan for a genuinely small batch — it spares the corpus
      // shuffle), while the corpus side stays guarded
      val bounded = graft.etl.Dedup
        .verifyJaccard(base, base, "doc_id", "sh", cand, 0.0,
          probeBounded = true)
        .queryExecution.executedPlan
      assert(broadcastArrayOffenders(bounded)
          .exists(_.contains("_sha")),
        s"probeBounded=true did not restore the probe-side broadcast:\n$bounded")
      assert(!broadcastArrayOffenders(bounded).exists(_.contains("_shb")),
        s"probeBounded=true leaked broadcast onto the corpus side:\n$bounded")
    }
  }

  test("t52's ppJoin tree never broadcasts a pair or array-carrying side under ANY conf") {
    import org.apache.spark.sql.functions.col
    withConf(twilightConf: _*) {
      // the registry's t52 input via the SHARED builder (r16 verdict
      // #3 — one constructor, so this pinned plan IS the shipped plan
      // and cannot drift from it); the PUBLIC operator materializes
      // eagerly (execution contract), so the audit uses the lazy
      // ppJoinPairsPlan seam to see the verify-stage join tree
      val base = graft.queries.TextQueries.ppJoinBase(spark, sfDir)
      val (frame, release) =
        graft.etl.Dedup.ppJoinPairsPlan(base, "doc_id", "toks", 4, 5)
      try {
        val plan = frame.queryExecution.executedPlan
        val pairOff = broadcastPairOffenders(plan)
        assert(pairOff.isEmpty,
          s"ppJoin broadcasts a candidate-pair relation: ${pairOff.mkString("; ")}")
        val arrOff = broadcastArrayOffenders(plan)
        assert(arrOff.isEmpty,
          s"ppJoin broadcasts an array-carrying side (since r16 the " +
            s"collapse is a window, not an array-keyed join — nothing " +
            s"array-carrying should reach a join): ${arrOff.mkString("; ")}")
        // the guard must not have banned broadcast wholesale: the token
        // and size sides are linear scalar relations with honest stats —
        // at fixture scale they must still ride broadcasts
        assert(plan.toString.contains("BroadcastHashJoin"),
          s"ppJoin lost all broadcasts — guard over-applied:\n$plan")
      } finally release()
    }
  }

  test("ppJoin guard negative control: the unguarded inter-join shape is flagged") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // the inter join's exact shape with the guard deliberately removed:
    // a (small-stats) candidate-pair relation equi-joined to the token
    // table — under the adversarial threshold the planner builds a
    // broadcast out of the pair side, which is the twilight-zone death
    // at scale (quadratic-capable side collected to the driver)
    val cand = (1L to 40L).flatMap(a => (1L to 3L).map(b => (a, a + b)))
      .toDF("a", "b")
    val tok = (1L to 200L).flatMap(id => (1 to 30).map(j => (id, s"tok_$j")))
      .toDF("_id", "_tok")
    withConf(twilightConf: _*) {
      val unguarded = cand
        .join(tok.select(col("_id").as("a"), col("_tok")), Seq("a"))
        .join(tok.select(col("_id").as("_idb"), col("_tok").as("_tok2")),
          col("b") === col("_idb") && col("_tok") === col("_tok2"))
        .queryExecution.executedPlan
      assert(broadcastPairOffenders(unguarded).nonEmpty,
        s"control premise broken — unguarded inter join did not " +
          s"broadcast the pair side:\n$unguarded")
    }
  }

  test("probeBounded tripwire: a false bounded declaration fails loudly") {
    import org.apache.spark.sql.functions.{array, col, lit}
    // a probe one row past the documented bound, labeled "bounded": the
    // declaration is enforced with a capped count, so the call must
    // refuse instead of silently re-opening the broadcast death at scale
    val tooBig = spark.range(graft.etl.Dedup.probeBoundedMaxRows + 1L)
      .select(col("id").as("doc_id"), array(lit("sh")).as("sh"))
    val corpus = spark.range(10)
      .select(col("id").as("doc_id"), array(lit("sh")).as("sh"))
    val cand = spark.range(1).select(col("id").as("a"), col("id").as("b"))
    val e = intercept[IllegalArgumentException] {
      graft.etl.Dedup.verifyJaccard(tooBig, corpus, "doc_id", "sh", cand,
        0.5, probeBounded = true)
    }
    assert(e.getMessage.contains("probeBounded"),
      s"tripwire fired with the wrong message: ${e.getMessage}")
  }

  test("q43's scan prunes partitions: only the predicate's directory is read") {
    val scan = graft.queries.PipelineQueries
      .prunedScanForAudit(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), s"no partition filters:\n$scan")
    // the partition predicate must appear as a partition filter (pruned
    // at listing time), not a post-scan data Filter
    assert(
      "PartitionFilters: \\[[^\\]]*o_orderpriority".r.findFirstIn(scan).isDefined,
      s"o_orderpriority not pushed to partition pruning:\n$scan")
  }

  test("e24's tombstone exclusion is a broadcast ANTI-join before scoring") {
    val plan = Registry.queries("e24_ivf_tombstone_search")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // deletion-sized set → broadcast; anti semantics → LeftAnti. A
    // shuffled anti-join (corpus repartitioned to subtract a tiny set)
    // or a post-scoring filter would both be scale regressions.
    assert("BroadcastHashJoin .*LeftAnti".r.findFirstIn(plan).isDefined,
      s"tombstone mask is not a broadcast anti-join:\n$plan")
  }

  test("q54's funnel plans zero window operators (anchored aggs, not sorts)") {
    val plan = Registry.queries("q54_funnel")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the funnel must stay three filtered min-aggs + user-keyed joins; a
    // Window here would mean someone rephrased it as a per-user ordered
    // scan of the whole log
    assert(!plan.contains("Window"),
      s"funnel plan acquired a window operator:\n$plan")
  }

  test("q53's date filter reaches the orders scan; dims broadcast") {
    val plan = Registry.queries("q53_star_join")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the selective filter must be pushed to the parquet reader, not
    // evaluated above the join
    assert(
      "PushedFilters: \\[[^\\]]*o_orderdate".r.findFirstIn(plan).isDefined,
      s"o_orderdate not pushed to the orders scan:\n$plan")
    // nation/region (and at this scale customer) ride broadcast joins —
    // the fact side must never shuffle for a dimension
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"expected the dimension joins to broadcast:\n$plan")
  }

  test("q77's predicate reaches the ORC scan (pushed filter + pruned schema)") {
    val plan = Registry.queries("q77_orc_roundtrip")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Scan orc"), s"expected a native ORC scan:\n$plan")
    assert(
      "PushedFilters: \\[[^\\]]*l_quantity".r.findFirstIn(plan).isDefined,
      s"l_quantity filter not pushed to the ORC scan:\n$plan")
  }

  test("q69's co-bucketed join is a SortMergeJoin with ZERO exchange") {
    val plan = graft.queries.PipelineQueries
      .bucketedJoinForAudit(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"),
      s"co-bucketed join did not plan a SortMergeJoin:\n$plan")
    // the whole point of the bucketed layout: neither side shuffles —
    // bucket co-location is proven from catalog metadata at plan time
    assert(!plan.contains("Exchange"),
      s"bucketed join still shuffles (bucket metadata not used):\n$plan")
  }

  test("q78's five window functions share ONE Window operator") {
    val plan = Registry.queries("q78_window_suite")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // all five functions use the same (partition, order) spec, so
    // Catalyst must fuse them into one Window operator: a split would
    // mean a second shuffle+sort of the whole event log per extra spec
    val windowOps = "Window \\[".r.findAllIn(plan).length
    assert(windowOps == 1,
      s"expected exactly 1 Window operator, found $windowOps:\n$plan")
  }

  test("q59's distinct+sketch agg plans no Expand") {
    val plan = Registry.queries("q59_approx_distinct")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the two-level rewrite exists to avoid Expand (it doubles every
    // fact row before the shuffle); a regression re-planning
    // countDistinct+HLL in one agg would bring it back
    assert(!plan.contains("Expand"),
      s"q59 re-acquired an Expand:\n$plan")
  }

  test("t75's segmentation is a typed mapPartitions kernel, window-free") {
    // the production-vocab apply contract: the merge replay runs as
    // object-typed mapPartitions over the DISTINCT vocabulary (pure map
    // parallelism — a Window or per-word sort here would be a scale
    // regression), and the corpus-side join back must not plan a
    // cartesian (PlanAuditSpec's registry-wide sweep covers that; this
    // pins the kernel shape specifically)
    val plan = Registry.queries("t75_bpe_kernel_apply")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("MapPartitions"),
      s"t75 lost the mapPartitions kernel:\n$plan")
    assert(!plan.contains("Window "),
      s"t75 acquired a window:\n$plan")
  }
}
