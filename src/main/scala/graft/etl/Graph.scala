package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph propagation in exact integer fixed-point.
  *
  * PageRank-style link analysis is a standard corpus-curation signal
  * (domain-graph centrality is how web crawls rank sources for
  * training-data quality), and its Spark shape is the canonical
  * iterative join: contributions = edges ⋈ ranks grouped by dst. The
  * whole computation stays in integer micro-units — per-edge
  * contributions and the damping multiply use BIGINT floor division,
  * rounded once per step — so sums are order-independent and the result
  * is bit-reproducible against any engine that does the same integer
  * math (the cross-engine determinism rule from SCALE.md).
  *
  * Scale design (the [[Dedup.resolveClusters]] discipline): every
  * iteration is TWO keyed shuffles — edges ⋈ ranks on src, then the
  * contribution agg on dst — with an eager barrier per round so the
  * lineage never nests (iterative self-joins otherwise grow the plan
  * exponentially). The barrier's placement is the caller's
  * [[CheckpointPolicy]]: executor-local blocks by default (bench/local
  * runs), a reliable storage checkpoint for cluster jobs that must
  * survive executor loss mid-iteration. The edge list with out-degrees
  * is checkpointed ONCE and re-read each round; on a cluster you'd
  * persist it hash-partitioned by src so the per-round join is
  * shuffle-free on the edge side and only the node-sized rank table
  * moves.
  */
object Graph {

  /** Fixed `iters`-step PageRank over a directed edge list `(src, dst)`
    * with damping 0.85, all math in integer micro-units: every node
    * starts at 1e6; each step sets
    * `r(v) = 150000 + (Σ_{u→v} (r(u) div outdeg(u))) * 85 div 100`.
    *
    * Every node MUST appear as a src (a bidirected edge set satisfies
    * this by construction) — a dangling node would silently leak rank
    * mass, so callers feeding one-directional graphs either add
    * self-loops / reverse edges first or use [[pageRankDanglingMicro]],
    * which redistributes sink mass. Returns `(id, rank_micro)` for
    * every node.
    *
    * `policy` picks where each round's barrier materializes
    * ([[CheckpointPolicy]]): Local for bench/local runs, Reliable for
    * cluster jobs that must survive executor loss mid-iteration.
    */
  def pageRankMicro(edgesIn: DataFrame, iters: Int,
                    policy: CheckpointPolicy = CheckpointPolicy.Local): DataFrame = {
    val edges = policy.barrier(edgesIn.select(col("src"), col("dst")))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("odeg"))
    // (src, dst, odeg): the per-round join input, pinned once —
    // PRE-PARTITIONED and PRE-SORTED by src. localCheckpoint preserves
    // both the hash partitioning and the sort order (LogicalRDD keeps
    // outputPartitioning/outputOrdering; a parquet artifact would lose
    // them — persisting that layout durably is what bucketed+sorted
    // tables are for). Every round's edges ⋈ ranks SortMergeJoin then
    // finds the EDGE side fully satisfied — no exchange, no per-round
    // re-sort of the edge-sized table. The nodes spine gets the same
    // treatment on id, so the rank-rebuild join is also exchange-free,
    // and the rank table itself emerges partitioned by id — which is
    // exactly the clustering the NEXT round's join needs. Steady-state
    // round cost: ONE node-sized shuffle (the map-side-combined
    // contribution partials moving to their dst), nothing edge-sized.
    val withDeg = policy.barrier(edges.join(deg, Seq("src"))
      .repartition(col("src")).sortWithinPartitions(col("src")))
    val nodes = policy.barrier(edges.select(col("src").as("id")).distinct()
      .repartition(col("id")).sortWithinPartitions(col("id")))
    var ranks = nodes.select(col("id"), lit(1000000L).as("r"))
    for (round <- 1 to iters) {
      val contrib = withDeg.join(ranks, withDeg("src") === ranks("id"))
        .select(col("dst"), expr("r div odeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("sc"))
      ranks = nodes.join(contrib, nodes("id") === contrib("dst"), "left")
        .select(col("id"),
          (lit(150000L) + expr("coalesce(sc, 0L) * 85 div 100")).as("r"))
      // Eager barrier EVERY round. `ranks` is referenced once per round
      // (the contribution join; the rebuild consumes `contrib`, which
      // already contains it), so there is NO exponential re-evaluation
      // in an unbarriered chain — the barrier's entire measured benefit
      // (3 un-barriered rounds run ~2× slower than 3 barriered ones,
      // despite the extra materialization jobs) comes from plan
      // mechanics: under static planning, composing rounds into one
      // tree makes the checkpointed edge table appear multiple times,
      // and relation deduplication re-instances the repeats with fresh
      // attribute ids — divorcing them from the LogicalRDD's preserved
      // partitioning and re-inserting the edge-sized exchange+sort the
      // pre-partitioning exists to kill. With a per-round barrier each
      // round's tree references every checkpoint exactly once and the
      // round's only shuffle is the node-sized contribution partials
      // (GraphSpec pins it). Bounded lineage for long runs is the
      // secondary win.
      if (round < iters) ranks = policy.barrier(ranks)
    }
    IterStats.record("pagerank_rounds", iters)
    ranks.select(col("id"), col("r").as("rank_micro"))
  }

  /** PageRank generalized to DANGLING nodes (sinks with no out-edges) —
    * the real-link-graph case [[pageRankMicro]] excludes by contract.
    * Same damping (0.85) and integer micro-unit math, plus the standard
    * dangling-mass redistribution: each step the total rank mass sitting
    * on sink nodes is collected by ONE scalar aggregation and every node
    * receives an equal integer share before damping:
    *
    *   `r(v) = 150000 + (Σ_{u→v} (r(u) div outdeg(u)) + dm div N) * 85 div 100`
    *
    * where `dm = Σ_{u dangling} r(u)` and `N = |nodes|`. Without this a
    * sink leaks its mass every round and ranks drain toward the
    * teleport floor; with it mass is conserved up to the deterministic
    * integer floor losses (GraphSpec bounds them).
    *
    * Scale shape per round = [[pageRankMicro]]'s ONE node-sized shuffle
    * plus two O(1)-output aggregations: the dangling-mass scalar (a
    * map-side-combined sum over the sink subset) broadcast back into the
    * rank rebuild — the scalar never forces a shuffle of the rank table.
    * The node universe is src ∪ dst (dst-only nodes are the sinks).
    */
  def pageRankDanglingMicro(edgesIn: DataFrame, iters: Int,
                            policy: CheckpointPolicy = CheckpointPolicy.Local): DataFrame = {
    val edges = policy.barrier(edgesIn.select(col("src"), col("dst")))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("odeg"))
    val withDeg = policy.barrier(edges.join(deg, Seq("src"))
      .repartition(col("src")).sortWithinPartitions(col("src")))
    val nodes = policy.barrier(edges.select(col("src").as("id"))
      .unionAll(edges.select(col("dst").as("id"))).distinct()
      .repartition(col("id")).sortWithinPartitions(col("id")))
    // sinks: nodes that never appear as a src
    val dangling = policy.barrier(nodes
      .join(deg.select(col("src").as("id")), Seq("id"), "left_anti"))
    // one driver-side scalar, computed once (the resolveClusters
    // convergence-count discipline — a count, not a collect of rows)
    val nNodes = nodes.count()
    require(nNodes > 0, "pageRankDanglingMicro: empty edge set")
    var ranks = nodes.select(col("id"), lit(1000000L).as("r"))
    for (round <- 1 to iters) {
      val contrib = withDeg.join(ranks, withDeg("src") === ranks("id"))
        .select(col("dst"), expr("r div odeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("sc"))
      val share = ranks.join(dangling, Seq("id"))
        .agg(coalesce(sum(col("r")), lit(0L)).as("dm"))
        .select(expr(s"dm div ${nNodes}L").as("sh"))
      ranks = nodes.join(contrib, nodes("id") === contrib("dst"), "left")
        .crossJoin(broadcast(share)) // 1-row scalar — broadcast, no shuffle
        .select(col("id"),
          (lit(150000L) +
            expr("(coalesce(sc, 0L) + sh) * 85 div 100")).as("r"))
      if (round < iters) ranks = policy.barrier(ranks)
    }
    IterStats.record("pagerank_dangling_rounds", iters)
    ranks.select(col("id"), col("r").as("rank_micro"))
  }

  /** Connected components by alternating large-star / small-star rounds
    * (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    * the O(log n)-round alternative to [[Dedup.resolveClusters]]'s
    * min-label propagation, whose round count is O(component diameter).
    * Near-dup chains that daisy-chain (A~B~C~… with no short-cut edges)
    * have diameter ≈ length; at corpus scale a 1000-hop chain costs
    * propagation 1000 rounds but this ~10, because each star operation
    * HALVES path lengths instead of shrinking them by one.
    *
    * Per round, both operations are one keyed aggregation + one
    * equi-join over the edge set — no neighbor lists are ever
    * collected (the classic formulation reduces over Γ(u) as an
    * in-memory list; a celebrity node would blow that up, while a
    * groupBy-min + join-back stays map-side-partial and skew-free):
    *   - large-star: m(u) = min(Γ(u) ∪ {u}) over the bidirected edge
    *     set; every neighbor v > u re-attaches to m(u);
    *   - small-star: orient edges (big, small); m(u) = min over the
    *     smaller neighbors; they and u itself attach to m(u).
    * The fixpoint is a forest of stars, every node pointing at its
    * component's minimum id.
    *
    * Convergence is detected by comparing successive small-star outputs
    * via (count, Σ xxhash64(u,v)) — one tiny agg per round instead of a
    * two-sided anti-join (at 10⁹ edges the anti-join is another full
    * shuffle per round; the checksum is map-side-partial and its
    * false-convergence odds are ~2⁻⁶⁴ per round). Non-convergence
    * within `maxIter` throws — same no-silent-partial-fixpoint contract
    * as [[Dedup.resolveClusters]].
    *
    * Returns `(doc_id, cluster_rep)` for every node in `pairs`, the
    * exact output shape of [[Dedup.resolveClusters]].
    */
  def connectedComponentsLSS(pairs: DataFrame, aCol: String = "a",
                             bCol: String = "b", maxIter: Int = 15,
                             policy: CheckpointPolicy = CheckpointPolicy.Local): DataFrame = {
    def largeStar(e: DataFrame): DataFrame = {
      val bi = e.select(col("u"), col("v"))
        .unionAll(e.select(col("v").as("u"), col("u").as("v")))
      val mins = bi.groupBy(col("u")).agg(min(col("v")).as("_mn"))
        .select(col("u"), least(col("_mn"), col("u")).as("m"))
      bi.join(mins, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val or = e.select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .filter(col("u") =!= col("v"))
      val mins = or.groupBy(col("u")).agg(min(col("v")).as("m"))
      val nb = or.join(mins, Seq("u"))
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
      nb.unionAll(mins.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
    }
    def checksum(e: DataFrame): (Long, Long) = {
      // bit_xor, not sum: order-independent like sum but can't overflow
      // under ANSI mode (the edge set is distinct, so xor never
      // self-cancels a duplicate pair)
      val r = e.agg(count(lit(1)).as("n"),
        coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L)).as("h")).head()
      (r.getLong(0), r.getLong(1))
    }

    // node universe BEFORE self-edge removal: a node whose only pair is
    // a self-pair (or that only appears once the filter drops its edges)
    // must still appear in the output as its own singleton cluster —
    // resolveClusters returns it, and the two operators are documented
    // as interchangeable
    val allNodes = pairs.select(col(aCol).as("doc_id"))
      .unionAll(pairs.select(col(bCol).as("doc_id")))
      .distinct()
    var edges = policy.barrier(
      pairs.select(col(aCol).as("u"), col(bCol).as("v"))
        .filter(col("u") =!= col("v"))
        .distinct())
    var prev = checksum(edges)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // barrier per round: iterative self-joins otherwise nest the
      // whole round history into one Catalyst plan
      edges = policy.barrier(smallStar(largeStar(edges)))
      val cur = checksum(edges)
      converged = cur == prev
      prev = cur
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponentsLSS did not converge in $maxIter rounds — " +
          "pathological component structure; raise maxIter")
    // convergence rounds ride graph diameter — THE growth mode a scale
    // replica can shift; publish so bench variance is attributable
    IterStats.record("cc_lss_rounds", i)
    // fixpoint = stars oriented (member, center): every non-center node
    // has exactly one outgoing edge; centers appear only on the v side
    val members = edges.select(col("u").as("doc_id"), col("v").as("cluster_rep"))
    val centers = edges.select(col("v").as("doc_id")).distinct()
      .withColumn("cluster_rep", col("doc_id"))
    // every node also contributes (id, id): a component's min id is ≤
    // every member id, so the groupBy-min keeps true reps unchanged,
    // while self-pair-only / isolated nodes (absent from `edges`)
    // surface as their own singleton clusters
    members.unionAll(centers)
      .unionAll(allNodes.withColumn("cluster_rep", col("doc_id")))
      .groupBy(col("doc_id")).agg(min(col("cluster_rep")).as("cluster_rep"))
  }
}
