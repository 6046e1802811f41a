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
  * contribution agg on dst — with an eager localCheckpoint per round so
  * the lineage never nests (iterative self-joins otherwise grow the
  * plan exponentially). The edge list with out-degrees is checkpointed
  * ONCE and re-read each round; on a cluster you'd persist it
  * hash-partitioned by src so the per-round join is shuffle-free on the
  * edge side and only the node-sized rank table moves.
  */
object Graph {

  /** Fixed `iters`-step PageRank over a directed edge list `(src, dst)`
    * with damping 0.85, all math in integer micro-units: every node
    * starts at 1e6; each step sets
    * `r(v) = 150000 + (Σ_{u→v} (r(u) div outdeg(u))) * 85 div 100`.
    *
    * Every node MUST appear as a src (a bidirected edge set satisfies
    * this by construction) — a dangling node would silently leak rank
    * mass, so callers feeding one-directional graphs add self-loops or
    * reverse edges first. Returns `(id, rank_micro)` for every node.
    */
  def pageRankMicro(edgesIn: DataFrame, iters: Int): DataFrame = {
    val edges = edgesIn.select(col("src"), col("dst")).localCheckpoint()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("odeg"))
    // (src, dst, odeg): the per-round join input, pinned once
    val withDeg = edges.join(deg, Seq("src")).localCheckpoint()
    val nodes = edges.select(col("src").as("id")).distinct().localCheckpoint()
    var ranks = nodes.select(col("id"), lit(1000000L).as("r"))
    for (round <- 1 to iters) {
      val contrib = withDeg.join(ranks, withDeg("src") === ranks("id"))
        .select(col("dst"), expr("r div odeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("sc"))
      ranks = nodes.join(contrib, nodes("id") === contrib("dst"), "left")
        .select(col("id"),
          (lit(150000L) + expr("coalesce(sc, 0L) * 85 div 100")).as("r"))
      // lineage barrier every 3rd round, not every round: a 3-round-deep
      // nested join plan is well inside Catalyst's comfort zone, and each
      // eager checkpoint is a full job whose scheduling overhead exceeds
      // the work at node-table sizes. Unbounded iteration counts still
      // never nest more than 3 rounds of lineage.
      if (round % 3 == 0 && round < iters) ranks = ranks.localCheckpoint()
    }
    ranks.select(col("id"), col("r").as("rank_micro"))
  }
}
